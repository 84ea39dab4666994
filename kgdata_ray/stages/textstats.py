"""Text analysis over document corpora: token counting, quality
metrics, language ID, fingerprinting.

Reference analog: the per-record normalizers / predicate batteries
(``normalize_mention`` ``kgdata/wikidata/datasets/norm_mentions.py:48-51``,
``EasyTests`` rule battery ``kgdata/wikipedia/datasets/easy_tables.py:
36-61``) — stateless vectorized ``map_batches`` stages. The metric
definitions here are pinned so the DuckDB oracle SQL in
``__ray_entry__`` computes the identical values:

  - n_chars     = length(text)
  - n_tokens    = number of maximal \\S+ runs
  - n_punct     = count of chars in ``.,;:!?``
  - upper_ratio is intentionally NOT in the SQL-checked set (locale
    traps); it lives in the quality score only.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset
from ..functions.joins import default_join_partitions, resolve_join_partitions

_TOKEN_RE = re.compile(r"\S+")
_PUNCT_RE = re.compile(r"[.,;:!?]")

# small built-in stopword lists for the n-gram/stopword language heuristic
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "for", "that", "with",
           "on", "as", "are", "this", "it"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "für", "auf",
           "ein", "eine", "nicht", "den", "im", "zu"},
    "fr": {"le", "la", "les", "et", "de", "des", "un", "une", "est", "pour",
           "dans", "que", "qui", "sur", "avec"},
    "es": {"el", "la", "los", "las", "y", "de", "que", "en", "un", "una",
           "es", "por", "con", "para", "del"},
}


def doc_stats_batch(b: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, text) -> SQL-matchable per-doc stats."""
    text = b["text"]
    return pd.DataFrame(
        {
            "doc_id": b["doc_id"],
            "n_chars": text.str.len().astype("int64"),
            "n_tokens": text.str.count(_TOKEN_RE).astype("int64"),
            "n_punct": text.str.count(_PUNCT_RE).astype("int64"),
        }
    )


def doc_stats(ds: Dataset) -> Dataset:
    return ds.select_columns(["doc_id", "text"]).map_batches(
        doc_stats_batch, batch_format="pandas"
    )


def _quality_from_counts(n_chars: np.ndarray, n_tokens: np.ndarray,
                         n_punct: np.ndarray) -> np.ndarray:
    """Shared float core of the quality heuristic — both the pandas
    and the Arrow count paths feed this, so they can only differ in
    the regex count kernels (identical on any ASCII corpus; the re
    patterns are RE2-safe by construction)."""
    n_tokens = np.maximum(n_tokens, 1.0)
    mean_tok = (n_chars - n_tokens + 1) / n_tokens
    len_score = np.clip(n_chars / 500.0, 0, 1)
    punct_density = np.minimum(n_punct / n_tokens, 1.0)
    punct_score = 1.0 - np.abs(punct_density - 0.2)
    tok_score = 1.0 - np.clip(np.abs(mean_tok - 5.5) / 5.5, 0, 1)
    return np.round(0.4 * len_score + 0.3 * punct_score
                    + 0.3 * tok_score, 6)


def quality_score_batch(b: pd.DataFrame) -> pd.DataFrame:
    """Heuristic quality in [0,1]: length band + punctuation density +
    mean token length band (deterministic, unit-tested vs a naive
    reimplementation)."""
    text = b["text"]
    score = _quality_from_counts(
        text.str.len().to_numpy(np.float64),
        text.str.count(_TOKEN_RE).to_numpy(np.float64),
        text.str.count(_PUNCT_RE).to_numpy(np.float64))
    return pd.DataFrame({"doc_id": b["doc_id"], "quality": score})


def quality_score_arrow(t: "pa.Table", *, extra_cols: tuple = ()) \
        -> "pa.Table":
    """Arrow twin of :func:`quality_score_batch`: regex counts run as
    RE2 kernels over the Arrow string buffer (text never becomes
    Python objects), the float core is shared. ``extra_cols`` are
    carried through untouched (the curation pipelines keep text/lang
    alongside the score)."""
    import pyarrow.compute as pc

    text = t["text"]
    score = _quality_from_counts(
        pc.utf8_length(text).to_numpy(zero_copy_only=False)
        .astype(np.float64),
        pc.count_substring_regex(text, _TOKEN_RE.pattern)
        .to_numpy(zero_copy_only=False).astype(np.float64),
        pc.count_substring_regex(text, _PUNCT_RE.pattern)
        .to_numpy(zero_copy_only=False).astype(np.float64))
    cols = {"doc_id": t["doc_id"],
            "quality": pa.array(score, pa.float64())}
    for c in extra_cols:
        cols[c] = t[c]
    return pa.table(cols)


def quality_scores(ds: Dataset) -> Dataset:
    return ds.select_columns(["doc_id", "text"]).map_batches(
        quality_score_arrow, batch_format="pyarrow"
    )


# findall('[a-zäöüéèêàçñ]+') == split on the complement + drop empties;
# the split form runs as one RE2 kernel over the Arrow string buffer
_LANG_TOKEN_COMPLEMENT = "[^a-zäöüéèêàçñ]+"


def _lang_scores_arrow(text_col, langs, stop_arrays):
    """(scores n×L int64, has_tokens bool n): per-row stopword-hit
    counts per language, fully vectorized — one split kernel, one
    is_in + bincount per language. Tie-break and 'und' fall to the
    caller; semantics identical to the scalar findall loop."""
    import pyarrow.compute as pc

    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    n = len(text_col)
    parts = pc.split_pattern_regex(pc.utf8_lower(text_col),
                                   _LANG_TOKEN_COMPLEMENT)
    flat = pc.list_flatten(parts)
    pidx = pc.list_parent_indices(parts)
    keep = pc.not_equal(flat, "")
    toks = flat.filter(keep)
    rows = pidx.filter(keep).to_numpy(zero_copy_only=False)
    scores = np.zeros((n, len(langs)), dtype=np.int64)
    has = np.zeros(n, dtype=bool)
    has[rows] = True
    for j, arr in enumerate(stop_arrays):
        m = pc.is_in(toks, value_set=arr).to_numpy(zero_copy_only=False)
        scores[:, j] = np.bincount(rows[m], minlength=n)
    return scores, has


class LangId:
    """Stopword-overlap language ID (actor pool: stopword Arrow arrays
    built once per actor; per batch one RE2 split kernel + one
    is_in/bincount pass per language — no per-row Python loop).
    Deterministic tie-break: score desc, then language code asc;
    all-zero scores -> 'und'."""

    def __init__(self):
        self.langs = sorted(_STOPWORDS)
        self.stop_arrays = [
            pa.array(sorted(_STOPWORDS[lang]), pa.string())
            for lang in self.langs]
        self.lang_arr = np.array(self.langs, dtype=object)

    def __call__(self, t: pa.Table) -> pa.Table:
        scores, has = _lang_scores_arrow(t["text"], self.langs,
                                         self.stop_arrays)
        best = scores.argmax(axis=1)  # first max == (score desc, code asc)
        preds = self.lang_arr[best]
        preds[~has | (scores.max(axis=1, initial=0) == 0)] = "und"
        return pa.table({"doc_id": t["doc_id"],
                         "lang_pred": pa.array(preds, pa.string())})


def lang_id(ds: Dataset, *, concurrency=(1, 8)) -> Dataset:
    return ds.select_columns(["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=concurrency, num_cpus=0.5
    )


def fingerprint_batch(b: pd.DataFrame) -> pd.DataFrame:
    """md5 content fingerprint (matches DuckDB ``md5(text)``)."""
    return pd.DataFrame(
        {
            "doc_id": b["doc_id"],
            "fingerprint": [
                hashlib.md5(t.encode("utf-8")).hexdigest() for t in b["text"]
            ],
        }
    )


def fingerprints(ds: Dataset) -> Dataset:
    return ds.select_columns(["doc_id", "text"]).map_batches(
        fingerprint_batch, batch_format="pandas"
    )


def rolling_fingerprint_batch(b: pd.DataFrame, *, window: int = 64) -> pd.DataFrame:
    """Winnowing-style document fingerprint: min 32-bit rolling-window
    hash over the text (robust to small appends; rows-only check)."""
    from .dedup import char_shingle_hashes

    out = []
    for t in b["text"]:
        h = char_shingle_hashes(t, min(window, max(1, len(t))))
        out.append(int(h.min()) if h.size else 0)
    return pd.DataFrame(
        {"doc_id": b["doc_id"], "rolling_fp": pd.Series(out, dtype="int64")}
    )


def rolling_fingerprints(ds: Dataset) -> Dataset:
    return ds.select_columns(["doc_id", "text"]).map_batches(
        rolling_fingerprint_batch, batch_format="pandas"
    )


# Simplified RE2-safe BPE-style pre-tokenizer (GPT-2-ish without the
# lookahead): contraction suffixes, letter runs, digit runs, punct runs,
# whitespace runs. Shared verbatim with the DuckDB oracle so counts are
# value-exact on both engines (both re and RE2 use leftmost-first
# alternation).
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
_BPE_RE = re.compile(BPE_PATTERN)


def token_counts_batch(b: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, n_tokens, n_tokens_bpe): whitespace tokens + BPE-style
    pre-tokenizer segments (the token-count estimate a training-data
    pipeline budgets with)."""
    text = b["text"]
    return pd.DataFrame(
        {
            "doc_id": b["doc_id"],
            "n_tokens": text.str.count(_TOKEN_RE).astype("int64"),
            "n_tokens_bpe": text.str.count(_BPE_RE).astype("int64"),
        }
    )


def token_counts_arrow(t: "pa.Table") -> "pa.Table":
    """Arrow twin of :func:`token_counts_batch` (RE2 count kernels
    over the string buffer; identical counts on ASCII text — both
    patterns are RE2-safe and the corpus tokenizer contract is
    ASCII)."""
    import pyarrow.compute as pc

    text = t["text"]
    return pa.table({
        "doc_id": t["doc_id"],
        "n_tokens": pc.cast(
            pc.count_substring_regex(text, _TOKEN_RE.pattern), pa.int64()),
        "n_tokens_bpe": pc.cast(
            pc.count_substring_regex(text, BPE_PATTERN), pa.int64()),
    })


def token_counts(ds: Dataset) -> Dataset:
    return ds.select_columns(["doc_id", "text"]).map_batches(
        token_counts_arrow, batch_format="pyarrow"
    )


# PII patterns shared verbatim with the DuckDB oracle (RE2-safe: no
# lookarounds/backrefs; both re and RE2 match leftmost-longest enough
# for these shapes). A training-data pipeline scrubs before training;
# no reference analog (kgdata carries no PII stage).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
_EMAIL_RE = re.compile(EMAIL_PATTERN)
_PHONE_RE = re.compile(PHONE_PATTERN)


def pii_scrub_batch(b: pd.DataFrame, *, text_col: str = "text") -> pd.DataFrame:
    """(doc_id, clean_text, n_emails, n_phones): redact email/phone
    matches with typed placeholders; vectorized pandas str kernels
    with module-compiled patterns."""
    text = b[text_col]
    n_emails = text.str.count(_EMAIL_RE).astype("int64")
    n_phones = text.str.count(_PHONE_RE).astype("int64")
    clean = text.str.replace(_EMAIL_RE, "[EMAIL]", regex=True).str.replace(
        _PHONE_RE, "[PHONE]", regex=True
    )
    return pd.DataFrame(
        {
            "doc_id": b["doc_id"],
            "clean_text": clean,
            "n_emails": n_emails,
            "n_phones": n_phones,
        }
    )


def pii_scrub_arrow(t: "pa.Table", *, text_col: str = "text") \
        -> "pa.Table":
    """Arrow twin of :func:`pii_scrub_batch`: RE2 count + replace
    kernels straight over the string buffer (both patterns are
    RE2-safe by design — shared verbatim with the DuckDB oracle,
    which is RE2 too)."""
    import pyarrow.compute as pc

    text = t[text_col]
    clean = pc.replace_substring_regex(
        pc.replace_substring_regex(text, EMAIL_PATTERN, "[EMAIL]"),
        PHONE_PATTERN, "[PHONE]")
    return pa.table({
        "doc_id": t["doc_id"],
        "clean_text": clean,
        "n_emails": pc.cast(
            pc.count_substring_regex(text, EMAIL_PATTERN), pa.int64()),
        "n_phones": pc.cast(
            pc.count_substring_regex(text, PHONE_PATTERN), pa.int64()),
    })


def pii_scrub(ds: Dataset, *, text_col: str = "text") -> Dataset:
    return ds.select_columns(["doc_id", text_col]).map_batches(
        pii_scrub_arrow, fn_kwargs={"text_col": text_col},
        batch_format="pyarrow",
    )


def repetition_stats_batch(b: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, n_words, n_distinct_words, top_word_frac,
    repetition_ratio): word-level repetition quality signals (boilerplate
    and low-entropy documents score high). One vectorized explode +
    two grouped reductions per batch — no per-doc Python loop."""
    words = b["text"].str.lower().str.split()
    ex = words.explode()
    ex = ex[ex != ""]
    counts = ex.groupby([ex.index, ex]).size()
    n_words = counts.groupby(level=0).sum()
    distinct = counts.groupby(level=0).size()
    top = counts.groupby(level=0).max()
    out = pd.DataFrame(
        {
            "doc_id": b["doc_id"],
            "n_words": n_words.reindex(b.index, fill_value=0).astype("int64"),
            "n_distinct_words": distinct.reindex(b.index, fill_value=0)
            .astype("int64"),
        }
    )
    nw = out["n_words"].to_numpy(dtype=np.float64)
    nw_safe = np.where(nw == 0, 1.0, nw)
    out["top_word_frac"] = np.round(
        top.reindex(b.index, fill_value=0).to_numpy(dtype=np.float64)
        / nw_safe, 6
    )
    out["repetition_ratio"] = np.round(
        1.0 - out["n_distinct_words"].to_numpy(dtype=np.float64) / nw_safe, 6
    )
    return out


def repetition_stats_arrow(t: "pa.Table") -> "pa.Table":
    """Arrow twin of :func:`repetition_stats_batch`: whitespace split
    + (row, word) group counts run as Arrow kernels, the per-row
    reductions as a second exact group_by — the text never becomes
    Python objects. Unit-tested value-identical to the pandas twin."""
    import pyarrow.compute as pc

    col = t["text"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(t)
    parts = pc.utf8_split_whitespace(pc.utf8_lower(col))
    flat = pc.list_flatten(parts)
    pidx = pc.list_parent_indices(parts)
    keep = pc.not_equal(flat, "")
    pairs = pa.table({"row": pidx.filter(keep),
                      "w": flat.filter(keep)})
    cnt = pairs.group_by(["row", "w"]).aggregate([([], "count_all")])
    per_row = cnt.group_by("row").aggregate(
        [("count_all", "sum"), ("count_all", "count"),
         ("count_all", "max")])
    rows = per_row["row"].to_numpy(zero_copy_only=False)
    n_words = np.zeros(n, dtype=np.int64)
    n_words[rows] = per_row["count_all_sum"].to_numpy(
        zero_copy_only=False)
    distinct = np.zeros(n, dtype=np.int64)
    distinct[rows] = per_row["count_all_count"].to_numpy(
        zero_copy_only=False)
    top = np.zeros(n, dtype=np.int64)
    top[rows] = per_row["count_all_max"].to_numpy(zero_copy_only=False)
    nw = n_words.astype(np.float64)
    nw_safe = np.where(nw == 0, 1.0, nw)
    return pa.table({
        "doc_id": t["doc_id"],
        "n_words": pa.array(n_words, pa.int64()),
        "n_distinct_words": pa.array(distinct, pa.int64()),
        "top_word_frac": pa.array(
            np.round(top.astype(np.float64) / nw_safe, 6), pa.float64()),
        "repetition_ratio": pa.array(
            np.round(1.0 - distinct.astype(np.float64) / nw_safe, 6),
            pa.float64()),
    })


def repetition_stats(ds: Dataset) -> Dataset:
    return ds.select_columns(["doc_id", "text"]).map_batches(
        repetition_stats_arrow, batch_format="pyarrow"
    )


# word-level tokenization shared with the DuckDB oracles: lowercase,
# split on runs of non-alphanumerics (RE2-safe; identical semantics in
# Python re and DuckDB regexp_split_to_array)
WORD_SPLIT_PATTERN = "[^a-z0-9]+"


def tokens_arrow(col) -> "pa.Array":
    """Flattened lowercase word tokens of an Arrow string column — the
    zero-copy twin of the pandas ``str.lower().str.split(...).explode()``
    chain (same WORD_SPLIT_PATTERN; null rows and empty tokens
    dropped). Runs entirely in Arrow kernels: no per-row Python object
    exists at any point."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parts = pc.split_pattern_regex(pc.utf8_lower(col), WORD_SPLIT_PATTERN)
    flat = pc.list_flatten(parts)  # null rows vanish here
    return flat.filter(pc.not_equal(flat, ""))


def token_id_pairs_arrow(t: "pa.Table", id_col: str, text_col: str):
    """Aligned ``(ids, terms)`` Arrow arrays, one pair per token
    occurrence — the zero-copy twin of :func:`_explode_terms`. ``ids``
    carries the source row's ``id_col`` value via
    ``list_parent_indices`` (no ``np.repeat`` over Python strings)."""
    import pyarrow.compute as pc

    col = t[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parts = pc.split_pattern_regex(pc.utf8_lower(col), WORD_SPLIT_PATTERN)
    flat = pc.list_flatten(parts)
    idx = pc.list_parent_indices(parts)
    keep = pc.not_equal(flat, "")
    ids = t[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return ids.take(idx.filter(keep)), flat.filter(keep)


def term_tf_arrow(t: "pa.Table", id_col: str, text_col: str,
                  tf_name: str = "tf") -> "pa.Table":
    """Per-(id, term) token counts of a batch as an Arrow table —
    the grouped core shared by doc_top_terms / doc_corpus_freq.
    Arrow hash-group-by over the flattened token stream; output
    columns ``(id_col, term, tf_name)`` with int64 counts."""
    ids, terms = token_id_pairs_arrow(t, id_col, text_col)
    pairs = pa.table({id_col: ids, "term": terms})
    g = pairs.group_by([id_col, "term"]).aggregate([([], "count_all")])
    return g.rename_columns([id_col, "term", tf_name])


def _explode_terms(b: pd.DataFrame, id_col: str,
                   text_col: str) -> pd.DataFrame:
    """One (id, term) row per token occurrence, empties dropped."""
    toks = b[text_col].str.lower().str.split(WORD_SPLIT_PATTERN, regex=True)
    d = b[[id_col]].join(toks.rename("term")).explode("term")
    return d[d["term"].notna() & (d["term"] != "")]


def word_counts(ds: Dataset, *, text_col: str = "text",
                top_n: int = 200) -> Dataset:
    """Distributed word count → top-N terms by (count desc, term asc).
    Map-side combining: each block emits one (term, n) partial per
    distinct term, the shuffle moves vocabulary-sized partials (never
    token streams), then a grouped sum. The top-N cut is local top-N
    per block + one single-block merge — no second all-to-all (a
    global sort of the whole vocabulary just to keep 200 rows). The
    classic wordcount, shaped for a 100-TB corpus."""
    from ..functions.agg import grouped_blockwise

    def partial(t: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        vc = pc.value_counts(tokens_arrow(t[text_col]))
        return pa.table({"term": vc.field("values").cast(pa.string()),
                         "n": vc.field("counts").cast(pa.int64())})

    def final(t: "pa.Table") -> "pa.Table":
        out = t.group_by("term").aggregate([("n", "sum")])
        return out.rename_columns(["term", "n"])

    counts = grouped_blockwise(
        ds.map_batches(partial, batch_format="pyarrow"), ["term"], final,
        batch_format="pyarrow",
    )

    def local_top(b: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        out = b.sort_values(["n", "term"], ascending=[False, True],
                            kind="mergesort").head(top_n)
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        counts.map_batches(local_top, batch_format="pandas")
        .repartition(1)
        .map_batches(local_top, batch_format="pandas")
    )


def doc_top_terms(ds: Dataset, *, id_col: str = "doc_id",
                  text_col: str = "text", k: int = 3,
                  num_partitions: Optional[int] = None) -> Dataset:
    """Per-document top-k terms by (tf desc, term asc), each with its
    corpus document frequency — the integer core of TF-IDF (rank and
    weight derive from tf/df without any float in the certified
    output). Per-batch tf (a document lives in one row, so its counts
    never shuffle), distributed df via map-side-combined group count,
    top-k through the grouped shuffle, then one hash join on term."""
    num_partitions = resolve_join_partitions(num_partitions)
    from ..functions.agg import group_top_k, partial_group_count
    from ..functions.blocks import scrub_empty_blocks

    def tf_block(t: "pa.Table") -> "pa.Table":
        return term_tf_arrow(t, id_col, text_col)

    tf = ds.select_columns([id_col, text_col]).map_batches(
        tf_block, batch_format="pyarrow"
    ).materialize()  # consumed twice: df count + top-k
    df = partial_group_count(tf.select_columns(["term"]), "term",
                             count_name="df")
    top = group_top_k(tf, id_col, sort_cols=["tf", "term"],
                      ascending=[False, True], k=k)
    joined = scrub_empty_blocks(top).join(
        df, join_type="inner", num_partitions=num_partitions,
        on=("term",),
    )

    def order_cols(b: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        b["df"] = b["df"].astype("int64")
        return pa.Table.from_pandas(
            b[[id_col, "term", "tf", "df"]], preserve_index=False
        )

    return joined.map_batches(order_cols, batch_format="pandas")


def _word_ngrams_arrow(t: "pa.Table", id_col: str, text_col: str,
                       n: int) -> "pa.Table":
    """One (id, gram) row per word n-gram (space-joined), matching the
    SQL array-slice construction exactly — vectorized: one split
    kernel, n shifted Arrow slices joined element-wise, window
    validity by parent-row equality (a window is a gram iff all n
    tokens come from the same row)."""
    import pyarrow.compute as pc

    col = t[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parts = pc.split_pattern_regex(pc.utf8_lower(col), WORD_SPLIT_PATTERN)
    flat = pc.list_flatten(parts)
    pidx = pc.list_parent_indices(parts)
    keep = pc.not_equal(flat, "")
    toks = flat.filter(keep)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    rows = pidx.filter(keep).to_numpy(zero_copy_only=False)
    ids = t[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    m = len(toks) - n + 1
    if m <= 0:
        return pa.table({id_col: ids.slice(0, 0),
                         "g": pa.array([], pa.string())})
    if n == 1:
        return pa.table({id_col: ids.take(pa.array(rows)), "g": toks})
    windows = [toks.slice(j, m) for j in range(n)]
    grams = pc.binary_join_element_wise(*windows, " ")
    valid = rows[:m] == rows[n - 1:]
    return pa.table({
        id_col: ids.take(pa.array(rows[:m][valid])),
        "g": grams.filter(pa.array(valid)),
    })


def ngram_contamination(
    docs: Dataset, probe: Dataset, *, n: int = 4,
    id_col: str = "doc_id", text_col: str = "text",
) -> Dataset:
    """Benchmark-contamination check: ids of ``docs`` sharing any word
    ``n``-gram with any ``probe`` document — the decontamination pass a
    training corpus runs against evaluation sets. The probe gram set is
    benchmark-sized by contract, so the overlap test is a broadcast
    key-set semi join: the (huge) corpus gram stream never shuffles;
    only matched ids do, through one distinct. Per-batch pre-dedup of
    (id, gram) keeps the explode bounded."""
    from ..functions.agg import distinct_rows
    from ..functions.joins import semi_join

    def doc_grams(t: pa.Table) -> pa.Table:
        return _word_ngrams_arrow(t, id_col, text_col, n).group_by(
            [id_col, "g"]).aggregate([])

    def probe_grams(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = _word_ngrams_arrow(t, id_col, text_col, n)["g"]
        return pa.table({"g": pc.unique(g.combine_chunks() if isinstance(
            g, pa.ChunkedArray) else g)})

    probe_set = distinct_rows(
        probe.select_columns([id_col, text_col]).map_batches(
            probe_grams, batch_format="pyarrow"), ["g"],
    )
    hits = semi_join(
        docs.select_columns([id_col, text_col]).map_batches(
            doc_grams, batch_format="pyarrow"),
        probe_set, "g", plan="broadcast",
    )
    return distinct_rows(hits.select_columns([id_col]), [id_col])


def doc_corpus_freq(ds: Dataset, *, id_col: str = "doc_id",
                    text_col: str = "text",
                    num_partitions: Optional[int] = None) -> Dataset:
    """Two-pass corpus-statistics scoring: (doc, Σ corpus-frequency of
    each token occurrence, token count) — the integer-exact core of
    frequency-based quality scoring (rare-token documents score low,
    boilerplate scores high; divide driver-side for the mean). Pass 1
    builds global term counts (vocabulary-sized partials shuffle, never
    token streams); pass 2 joins per-doc tf against them on term and
    re-aggregates per doc. All counts int64, so results are
    batch-boundary- and order-independent."""
    num_partitions = resolve_join_partitions(num_partitions)
    from ..functions.agg import grouped_blockwise
    from ..functions.blocks import scrub_empty_blocks

    def tf_block(t: "pa.Table") -> "pa.Table":
        return term_tf_arrow(t, id_col, text_col)

    tf = ds.select_columns([id_col, text_col]).map_batches(
        tf_block, batch_format="pyarrow"
    ).materialize()  # consumed twice: global counts + the join

    def csum(t: "pa.Table") -> "pa.Table":
        out = t.group_by("term").aggregate([("tf", "sum")])
        return out.rename_columns(["term", "c"])

    cnt = grouped_blockwise(tf.select_columns(["term", "tf"]), ["term"],
                            csum, batch_format="pyarrow")

    j = scrub_empty_blocks(tf).join(
        cnt, join_type="inner", num_partitions=num_partitions,
        on=("term",),
    )

    def per_doc(t: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        tmp = pa.table({id_col: t[id_col],
                        "freq_sum": pc.multiply(t["tf"], t["c"]),
                        "n_tokens": t["tf"]})
        out = tmp.group_by(id_col).aggregate(
            [("freq_sum", "sum"), ("n_tokens", "sum")])
        return out.rename_columns([id_col, "freq_sum", "n_tokens"])

    parts = j.map_batches(per_doc, batch_format="pyarrow")
    return grouped_blockwise(parts, [id_col], per_doc_merge(id_col),
                             batch_format="pyarrow")


def per_doc_merge(id_col: str):
    """Arrow grouped sum of (freq_sum, n_tokens) partials per id."""
    def fn(t: "pa.Table") -> "pa.Table":
        out = t.group_by(id_col).aggregate(
            [("freq_sum", "sum"), ("n_tokens", "sum")])
        return out.rename_columns([id_col, "freq_sum", "n_tokens"])
    return fn


def chunk_documents(ds: Dataset, *, id_col: str = "doc_id",
                    text_col: str = "text", chunk_tokens: int = 32,
                    stride: int = 24) -> Dataset:
    """Fixed-size token-window passage chunking with overlap — the
    chunking stage of a RAG / training-data pipeline. One output row
    per (doc, window): windows start every ``stride`` tokens while the
    start is inside the document, each covering ``chunk_tokens`` tokens
    (the last may be shorter); empty documents produce no chunks.
    Embarrassingly parallel: a document lives in one row, so chunking
    is a pure per-batch flatMap — no shuffle anywhere."""
    import numpy as np

    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")

    def block(b: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        ids, idxs, texts, lens = [], [], [], []
        for doc, t in zip(b[id_col].to_numpy(), b[text_col]):
            toks = t.split() if isinstance(t, str) else []
            n = len(toks)
            for ci, s in enumerate(range(0, n, stride)):
                w = toks[s:s + chunk_tokens]
                ids.append(doc)
                idxs.append(ci)
                texts.append(" ".join(w))
                lens.append(len(w))
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "chunk_idx": pa.array(idxs, pa.int64()),
            "chunk_text": pa.array(texts, pa.string()),
            "n_tokens": pa.array(lens, pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        block, batch_format="pandas")


def inverted_index(ds: Dataset, *, id_col: str = "doc_id",
                   text_col: str = "text") -> Dataset:
    """Inverted index build: ``(term, df, postings)`` with ``postings``
    = comma-joined ascending doc ids — the IR-side analog of the
    reference's dataset→database materialization
    (``kgdata/scripts/dataset2db.py``: a keyed artifact other jobs
    probe). Tokenization shared with :func:`word_counts`
    (``WORD_SPLIT_PATTERN``). Vectorized explode + per-doc dedup per
    block, cross-block distinct, then ONE grouped shuffle on the term;
    the per-group string join is bounded by each term's posting size
    (cap postings upstream for web-scale hot terms)."""
    import numpy as np

    from ..functions.agg import distinct_rows, grouped_blockwise

    def explode(t: pa.Table) -> pa.Table:
        ids, terms = token_id_pairs_arrow(t, id_col, text_col)
        # per-block dedup: Arrow group_by with no aggregates = distinct
        return pa.table({"term": terms, id_col: ids}).group_by(
            ["term", id_col]).aggregate([])

    pairs = distinct_rows(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["term", id_col])

    def block(b: pd.DataFrame) -> pa.Table:
        b = b.sort_values(["term", id_col], kind="mergesort")
        g = b.groupby("term", sort=False)[id_col]
        out = pd.DataFrame({
            "df": g.size().astype("int64"),
            "postings": g.agg(
                lambda s: ",".join(s.astype(str))),
        }).reset_index()
        return pa.Table.from_pandas(out[["term", "df", "postings"]],
                                    preserve_index=False)

    return grouped_blockwise(pairs, ["term"], block)


def sequence_packing(ds: Dataset, id_col: str, tokens_col: str,
                     *, capacity: int = 512) -> Dataset:
    """GPT-style sequence packing layout: documents laid head-to-tail
    in ``id_col`` order and cut into fixed-``capacity`` token bins —
    documents MAY span bins (the standard pretraining packing);
    output is one ``(id, bin_id)`` row per bin a document touches.

    Distributed prefix sum (same shape as
    ``functions/agg.py:zip_with_index``): range-partition sort by id,
    per-block token sums to the driver (ONE int per block, never
    rows), then each block lays out its documents with its offset and
    emits bin rows fully vectorized."""
    import numpy as np
    import ray
    import ray.data as rd

    sorted_ds = ds.select_columns([id_col, tokens_col]).sort(id_col)
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def _sum(t: pa.Table) -> int:
        import pyarrow.compute as pc

        return int(pc.sum(t[tokens_col]).as_py() or 0)

    sums = ray.get([_sum.remote(r) for r in refs])
    offsets = [0]
    for s in sums[:-1]:
        offsets.append(offsets[-1] + s)

    @ray.remote
    def _explode(t: pa.Table, off: int) -> pa.Table:
        n = t[tokens_col].to_numpy().astype(np.int64)
        starts = off + np.concatenate(
            ([0], np.cumsum(n[:-1]))) if len(n) else np.array(
            [], dtype=np.int64)
        first = starts // capacity
        last = (starts + np.maximum(n, 1) - 1) // capacity
        reps = (last - first + 1).astype(np.int64)
        total = int(reps.sum())
        idx = np.arange(total, dtype=np.int64)
        grp_start = np.repeat(np.cumsum(reps) - reps, reps)
        bins = np.repeat(first, reps) + (idx - grp_start)
        return pa.table({
            id_col: pa.array(np.repeat(t[id_col].to_numpy(), reps)),
            "bin_id": pa.array(bins, pa.int64()),
        })

    out_refs = [_explode.remote(r, o) for r, o in zip(refs, offsets)]
    return rd.from_arrow_refs(out_refs)


def unigram_logprob_scores(ds: Dataset, *, id_col: str = "doc_id",
                           text_col: str = "text",
                           ndigits: int = 6,
                           plan: str = "broadcast") -> Dataset:
    """Unigram language-model quality score per document:
    ``avg_neg_logp`` = mean over the doc's tokens of
    ``-ln(count(token)/N)`` under the corpus's own unigram
    distribution — the cheap stand-in for LM-perplexity filtering in
    training-data curation (high score = rare-token-heavy = candidate
    junk). Two passes: corpus counts (map-side combined, vocabulary-
    sized result broadcast once), then one streaming scoring pass.
    Scores round to ``ndigits`` so float summation order never shows.
    Token-less documents drop out (they have no distribution).

    ``plan="broadcast"`` ships the vocabulary dict to every worker —
    the fast path while the vocab fits worker memory. A web-scale
    heavy-tailed vocabulary (typos, URLs) does not, so
    ``plan="join"`` keeps the count table distributed: explode
    (doc, term), ONE hash join on the term, grouped mean per doc —
    nothing vocabulary-sized ever leaves the cluster. Both plans are
    pytest-asserted equal."""
    import numpy as np
    import ray

    from ..functions.agg import partial_group_count
    from ..functions.broadcast import get_broadcast

    def explode(b: pd.DataFrame) -> pa.Table:
        toks = (b[text_col].str.lower()
                .str.split(WORD_SPLIT_PATTERN, regex=True))
        n = toks.str.len().to_numpy()
        terms = np.concatenate(toks.to_numpy()) if len(b) else \
            np.array([], dtype=object)
        out = pd.DataFrame({"term": terms})
        out = out[out["term"] != ""]
        return pa.Table.from_pandas(out, preserve_index=False)

    counts_ds = partial_group_count(
        ds.select_columns([text_col]).map_batches(
            explode, batch_format="pandas"),
        "term", count_name="n").materialize()
    total = float(counts_ds.sum("n"))

    if plan == "join":
        return _unigram_join_plan(ds, counts_ds, total, id_col,
                                  text_col, ndigits)

    counts = counts_ds.to_pandas()
    ref = ray.put(dict(zip(counts["term"], counts["n"])))

    def score(b: pd.DataFrame) -> pa.Table:
        lut = get_broadcast(ref)
        ids, nt, sc = [], [], []
        toks = (b[text_col].str.lower()
                .str.split(WORD_SPLIT_PATTERN, regex=True))
        for i, ts in zip(b[id_col], toks):
            ts = [t for t in ts if t]
            if not ts:
                continue
            p = np.array([lut[t] for t in ts], dtype=np.float64) / total
            ids.append(i)
            nt.append(len(ts))
            sc.append(round(float(np.mean(-np.log(p))), ndigits))
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_tokens": pa.array(nt, pa.int64()),
            "avg_neg_logp": pa.array(sc, pa.float64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pandas")


def _unigram_join_plan(ds: Dataset, counts_ds: Dataset, total: float,
                       id_col: str, text_col: str,
                       ndigits: int) -> Dataset:
    """Distributed scoring: (doc, term) explode -> hash join on term
    -> grouped mean per doc. The count table never collects."""
    import numpy as np

    from ..functions.agg import grouped_blockwise
    from ..functions.blocks import scrub_empty_blocks

    def explode_ids(b: pd.DataFrame) -> pa.Table:
        toks = (b[text_col].str.lower()
                .str.split(WORD_SPLIT_PATTERN, regex=True))
        nn = toks.str.len().to_numpy()
        ids = np.repeat(b[id_col].to_numpy(), nn)
        terms = np.concatenate(toks.to_numpy()) if len(b) else \
            np.array([], dtype=object)
        out = pd.DataFrame({id_col: ids, "term": terms})
        out = out[out["term"] != ""]
        return pa.Table.from_pandas(out, preserve_index=False)

    pairs = scrub_empty_blocks(
        ds.select_columns([id_col, text_col]).map_batches(
            explode_ids, batch_format="pandas"))
    j = pairs.join(counts_ds, join_type="inner", num_partitions=default_join_partitions(),
                   on=("term",), right_on=("term",))

    def neg_logp(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: b[id_col],
            "nlp": -np.log(b["n"].to_numpy(dtype=np.float64) / total),
        })

    scored = scrub_empty_blocks(j).map_batches(neg_logp,
                                               batch_format="pandas")

    def per_doc(b: pd.DataFrame) -> pa.Table:
        g = b.groupby(id_col, sort=False)["nlp"]
        out = pd.DataFrame({
            "n_tokens": g.size().astype("int64"),
            "avg_neg_logp": g.mean().round(ndigits),
        }).reset_index()
        return pa.Table.from_pandas(
            out[[id_col, "n_tokens", "avg_neg_logp"]],
            preserve_index=False)

    return grouped_blockwise(scored, [id_col], per_doc)


def bigram_counts(ds: Dataset, *, text_col: str = "text") -> Dataset:
    """Global adjacent-word-pair counts (w1, w2, n) — the count table
    a bigram language model / BPE-merge scorer trains from. Map-side
    combining exactly like :func:`word_counts`: each block emits one
    partial per distinct pair (the shuffle moves pair-vocabulary
    partials, never the token stream), then a grouped sum. Tokens are
    the raw space-separated words (matching the corpus format and the
    SQL oracle's split)."""
    from ..functions.agg import grouped_blockwise

    def partial(t: "pa.Table") -> pa.Table:
        import pyarrow.compute as pc

        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # split(" ") exactly (empties kept — the raw-format contract)
        parts_l = pc.split_pattern(col, " ")
        flat = pc.list_flatten(parts_l)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        rows = pc.list_parent_indices(parts_l).to_numpy(
            zero_copy_only=False)
        m = len(flat) - 1
        if m < 1:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        same = rows[:m] == rows[1:]
        pairs = pa.table({"w1": flat.slice(0, m).filter(pa.array(same)),
                          "w2": flat.slice(1, m).filter(pa.array(same))})
        g = pairs.group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return g.rename_columns(["w1", "w2", "n"])

    parts = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow"
    )

    def final(t: "pa.Table") -> pa.Table:
        out = t.group_by(["w1", "w2"]).aggregate([("n", "sum")])
        return out.rename_columns(["w1", "w2", "n"])

    return grouped_blockwise(parts, ["w1", "w2"], final,
                             batch_format="pyarrow")


def chunk_lang_consistency(
    ds: Dataset, *, id_col: str = "doc_id", text_col: str = "text",
    chunk_tokens: int = 32, stride: int = 24,
    concurrency=(1, 8),
) -> Dataset:
    """Per-document language consistency across passage chunks — the
    mixed-language / wrong-language-span detector of an LLM-corpus
    quality pipeline: chunk with :func:`chunk_documents`, language-ID
    every chunk (same stopword scorer + tie-break as :class:`LangId`),
    then per document report ``(n_chunks, majority_lang,
    consistency_milli)`` where consistency_milli = 1000 *
    majority_count // n_chunks (integer-exact). Majority tie-break is
    pinned: count desc, then language code asc ('und' sorts with the
    rest). Empty documents produce no chunks and no output row.

    Scale shape: chunk + score are shuffle-free per-batch maps; the
    only shuffle is a (doc_id, lang) count — output-sized, never
    text."""
    from ..functions.agg import grouped_blockwise
    from ..functions.blocks import scrub_empty_blocks

    chunks = chunk_documents(ds, id_col=id_col, text_col=text_col,
                             chunk_tokens=chunk_tokens, stride=stride)

    class _ChunkLang:
        def __init__(self):
            self.langs = sorted(_STOPWORDS)
            self.stop_arrays = [
                pa.array(sorted(_STOPWORDS[lang]), pa.string())
                for lang in self.langs]
            self.lang_arr = np.array(self.langs, dtype=object)

        def __call__(self, t: pa.Table) -> pa.Table:
            scores, has = _lang_scores_arrow(t["chunk_text"], self.langs,
                                             self.stop_arrays)
            best = scores.argmax(axis=1)
            preds = self.lang_arr[best]
            preds[~has | (scores.max(axis=1, initial=0) == 0)] = "und"
            return pa.table({id_col: t[id_col],
                             "lang_pred": pa.array(preds, pa.string())})

    preds = chunks.map_batches(_ChunkLang, batch_format="pyarrow",
                               concurrency=concurrency, num_cpus=0.5)
    counts = scrub_empty_blocks(
        preds.groupby([id_col, "lang_pred"]).count())

    def majority(b: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        b = b.sort_values([id_col, "count()", "lang_pred"],
                          ascending=[True, False, True], kind="mergesort")
        g = b.groupby(id_col, sort=False)
        tot = g["count()"].transform("sum")
        first = g.cumcount() == 0
        top = b[first]
        return pa.table({
            id_col: pa.array(top[id_col].to_numpy(np.int64), pa.int64()),
            "n_chunks": pa.array(tot[first].to_numpy(np.int64), pa.int64()),
            "majority_lang": pa.array(top["lang_pred"].tolist(),
                                      pa.string()),
            "consistency_milli": pa.array(
                1000 * top["count()"].to_numpy(np.int64)
                // tot[first].to_numpy(np.int64), pa.int64()),
        })

    return grouped_blockwise(counts, [id_col], majority)


def keyword_extract(
    ds: Dataset, *, id_col: str = "doc_id", text_col: str = "text",
    k: int = 5,
) -> Dataset:
    """Per-document keyword extraction: the top-``k`` terms by TF-IDF
    -> (doc_id, term, tfidf_micro, rank). Tokens are the corpus's raw
    space-separated words (same split as :func:`word_counts`, matching
    the SQL oracle's string_split).

    Score = ``floor(tf * ln(N / df) * 1e6 + 0.5)`` frozen to int64
    micro-units on BOTH sides (engine and DuckDB), rank ordered by
    (tfidf_micro DESC, term ASC) — fully pinned, so this is one of the
    pure-SQL-oracle operators (no golden parquet).

    Scale shape: a document is one row, so tf AND the per-doc top-k
    are row-local (no shuffle); the only exchange is the
    vocabulary-sized df count (map-side combined), broadcast once via
    ray.put. For a web-scale heavy-tailed vocabulary swap the
    broadcast for the distributed join plan exactly as
    :func:`unigram_logprob_scores` documents."""
    import ray

    from ..functions.agg import partial_group_count
    from ..functions.broadcast import get_broadcast

    def explode_distinct(b: pd.DataFrame) -> pa.Table:
        toks = b[text_col].str.split(" ")
        lens = toks.str.len().to_numpy(np.int64)
        flat = (np.concatenate(toks.to_numpy()) if len(b)
                else np.array([], dtype=object))
        row = np.repeat(np.arange(len(b), dtype=np.int64), lens)
        pairs = pd.DataFrame({"row": row, "term": flat})
        pairs = pairs[pairs["term"] != ""].drop_duplicates()
        return pa.table({"term": pa.array(pairs["term"].to_numpy(object),
                                          pa.string())})

    df_ds = partial_group_count(
        ds.select_columns([text_col]).map_batches(
            explode_distinct, batch_format="pandas"),
        "term", count_name="df").materialize()
    n_docs = int(ds.count())
    dfp = df_ds.to_pandas()
    lut_ref = ray.put(dict(zip(dfp["term"], dfp["df"].astype(int))))

    def topk(b: pd.DataFrame) -> pa.Table:
        lut = get_broadcast(lut_ref)
        toks = b[text_col].str.split(" ")
        lens = toks.str.len().to_numpy(np.int64)
        flat = (np.concatenate(toks.to_numpy()) if len(b)
                else np.array([], dtype=object))
        doc = np.repeat(b[id_col].to_numpy(np.int64), lens)
        pairs = pd.DataFrame({"doc": doc, "term": flat})
        pairs = pairs[pairs["term"] != ""]
        tf = (pairs.groupby(["doc", "term"], sort=False)
              .size().reset_index(name="tf"))
        dfv = tf["term"].map(lut).to_numpy(np.float64)
        tf["s"] = np.floor(
            tf["tf"].to_numpy(np.float64)
            * np.log(float(n_docs) / dfv) * 1e6 + 0.5).astype(np.int64)
        tf = tf.sort_values(["doc", "s", "term"],
                            ascending=[True, False, True],
                            kind="mergesort")
        g = tf.groupby("doc", sort=False)
        tf["rank"] = g.cumcount().astype("int64")
        top = tf[tf["rank"] < k]
        return pa.table({
            id_col: pa.array(top["doc"].to_numpy(np.int64), pa.int64()),
            "term": pa.array(top["term"].to_numpy(object), pa.string()),
            "tfidf_micro": pa.array(top["s"].to_numpy(np.int64),
                                    pa.int64()),
            "rank": pa.array(top["rank"].to_numpy(np.int64), pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        topk, batch_format="pandas")
