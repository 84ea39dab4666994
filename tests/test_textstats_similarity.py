"""Text analysis + similarity search vs naive oracles."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from kgdata_ray.stages.similarity import build_ivf, knn_bruteforce, knn_ivf
from kgdata_ray.stages.textstats import (
    doc_stats,
    fingerprints,
    lang_id,
    quality_scores,
    rolling_fingerprints,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_pdf():
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


def test_doc_stats(docs_pdf):
    got = doc_stats(rd.read_parquet(f"{SF}/documents.parquet")).to_pandas()
    got = got.set_index("doc_id").sort_index()
    tok = re.compile(r"\S+")
    punct = re.compile(r"[.,;:!?]")
    for r in docs_pdf.head(50).itertuples():
        assert got.loc[r.doc_id, "n_chars"] == len(r.text)
        assert got.loc[r.doc_id, "n_tokens"] == len(tok.findall(r.text))
        assert got.loc[r.doc_id, "n_punct"] == len(punct.findall(r.text))


def test_fingerprints(docs_pdf):
    got = fingerprints(rd.read_parquet(f"{SF}/documents.parquet")).to_pandas()
    got = got.set_index("doc_id")
    for r in docs_pdf.head(20).itertuples():
        assert got.loc[r.doc_id, "fingerprint"] == hashlib.md5(
            r.text.encode()
        ).hexdigest()


def test_quality_and_rolling_fp_deterministic():
    ds = rd.read_parquet(f"{SF}/documents.parquet")
    q1 = quality_scores(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    q2 = quality_scores(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert q1.equals(q2)
    assert ((q1["quality"] >= 0) & (q1["quality"] <= 1)).all()
    f1 = rolling_fingerprints(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    f2 = rolling_fingerprints(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert f1.equals(f2)


def test_lang_id():
    ds = rd.from_items(
        [
            {"doc_id": 1, "text": "the cat and the dog are in the house"},
            {"doc_id": 2, "text": "der Hund und die Katze sind nicht im Haus"},
            {"doc_id": 3, "text": "le chat et le chien sont dans la maison"},
            {"doc_id": 4, "text": "el perro y el gato en la casa es bonito"},
            {"doc_id": 5, "text": "zzz qqq 12345"},
        ]
    )
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(ds).take_all()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "und"}


def _brute_knn(k=5, n_queries=8):
    df = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    mat = np.vstack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ids = df["vec_id"].to_numpy()
    qids = sorted(ids[:n_queries])
    sims = np.round(mat[np.isin(ids, qids)] @ mat.T, 6)
    out = {}
    for qi, q in enumerate(qids):
        order = sorted(
            ((s, int(i)) for s, i in zip(sims[qi], ids) if i != q),
            key=lambda t: (-t[0], t[1]),
        )
        out[q] = [i for _, i in order[:k]]
    return qids, out


def test_knn_bruteforce_matches_numpy():
    qids, want = _brute_knn()
    got = knn_bruteforce(
        rd.read_parquet(f"{SF}/embeddings.parquet"), qids, k=5
    ).to_pandas()
    for q in qids:
        g = got[got["query_id"] == q].sort_values("rank")
        assert list(g["neighbor_id"]) == want[q], q


def test_knn_ivf_recall():
    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    qids, want = _brute_knn()
    index = build_ivf(ds, num_centroids=8, seed=13)
    got = knn_ivf(ds, qids, index, k=5, nprobe=4).to_pandas()
    hits = total = 0
    for q in qids:
        g = set(got[got["query_id"] == q]["neighbor_id"])
        hits += len(g & set(want[q]))
        total += len(want[q])
    assert hits / total >= 0.6, hits / total


def test_knn_block_cross_equals_bruteforce():
    import pandas as pd
    import ray.data as rd

    from kgdata_ray.stages.similarity import knn_block_cross, knn_bruteforce

    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = list(range(12))
    a = knn_bruteforce(ds, qids, k=5).to_pandas()
    queries = ds.map_batches(
        lambda b: b[b["vec_id"] < 12], batch_format="pandas"
    )
    # small target block size so the cross product really spans blocks
    b = knn_block_cross(
        rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet"),
        queries, k=5, target_block_rows=16,
    ).to_pandas()
    cols = ["query_id", "neighbor_id", "rank", "cosine"]
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols).reset_index(drop=True),
        b[cols].sort_values(cols).reset_index(drop=True),
    )


def test_pii_scrub_batch():
    import pandas as pd

    from kgdata_ray.stages.textstats import pii_scrub_batch

    b = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "mail a.b+c@ex-ample.co.uk and x@y.io now",
                "call +1-555-0142 or +44-555-9999 today",
                "nothing here",
            ],
        }
    )
    out = pii_scrub_batch(b)
    assert out["clean_text"].tolist() == [
        "mail [EMAIL] and [EMAIL] now",
        "call [PHONE] or [PHONE] today",
        "nothing here",
    ]
    assert out["n_emails"].tolist() == [2, 0, 0]
    assert out["n_phones"].tolist() == [0, 2, 0]


def test_repetition_stats_batch():
    import pandas as pd

    from kgdata_ray.stages.textstats import repetition_stats_batch

    b = pd.DataFrame(
        {
            "doc_id": [7, 8],
            "text": ["a a a b", "x y z"],
        }
    )
    out = repetition_stats_batch(b).set_index("doc_id")
    assert out.loc[7, "n_words"] == 4
    assert out.loc[7, "n_distinct_words"] == 2
    assert out.loc[7, "top_word_frac"] == 0.75
    assert out.loc[7, "repetition_ratio"] == 0.5
    assert out.loc[8, "repetition_ratio"] == 0.0


def test_knn_ivf_distributed_batching_invariant_and_recall():
    """Per-query-probe IVF over a large query Dataset: shuffled input
    row order + many small blocks must produce exactly the same result
    table, and recall vs exact brute force stays sane."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kgdata_ray.stages.similarity import (
        build_ivf,
        knn_bruteforce,
        knn_ivf_distributed,
    )

    path = "/root/testdata/sf0.001/embeddings.parquet"
    ds = rd.read_parquet(path)
    index = build_ivf(ds, num_centroids=8, seed=13)

    def is_query(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["vec_id"] % 7 == 0]

    def run(corpus):
        q = corpus.map_batches(is_query, batch_format="pandas")
        out = knn_ivf_distributed(
            corpus, q, index, k=5, nprobe=2, chunk_rows=16
        ).to_pandas()
        cols = ["query_id", "neighbor_id", "rank", "cosine"]
        return out[cols].sort_values(cols).reset_index(drop=True)

    a = run(ds)

    # adversarial layout: random row order, many tiny blocks
    pdf = pq_df = rd.read_parquet(path).to_pandas()
    shuffled = pq_df.sample(frac=1.0, random_state=5).reset_index(drop=True)
    b = run(rd.from_pandas(shuffled).repartition(13))
    pd.testing.assert_frame_equal(a, b)

    # recall vs brute force over the same query ids
    qids = sorted(pdf[pdf["vec_id"] % 7 == 0]["vec_id"].tolist())
    exact = knn_bruteforce(ds, qids, k=5).to_pandas()
    hits = total = 0
    for q in qids:
        g = set(a[a["query_id"] == q]["neighbor_id"])
        w = set(exact[exact["query_id"] == q]["neighbor_id"])
        hits += len(g & w)
        total += len(w)
    assert hits / total >= 0.5, hits / total


def test_chunk_lang_consistency_majority_tiebreak(ray_session):
    """Equal chunk votes resolve to the lexicographically smaller
    language; consistency is integer-exact milli."""
    import ray.data as rd

    from kgdata_ray.stages.textstats import chunk_lang_consistency

    en = "the and of to a in is for that with on as are this it"
    de = "der die das und ist von mit für auf ein eine nicht den im zu"
    # 2 chunks (chunk_tokens=15, stride=15): one pure en, one pure de
    docs = rd.from_items([
        {"doc_id": 1, "text": en + " " + de},
        {"doc_id": 2, "text": en + " " + en + " " + de},  # 2 en + 1 de
        {"doc_id": 3, "text": ""},  # no chunks, no row
    ])
    got = (chunk_lang_consistency(docs, chunk_tokens=15, stride=15)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [1, 2]
    assert got.loc[0, "majority_lang"] == "de"  # tie 1-1 -> 'de' < 'en'
    assert got.loc[0, "n_chunks"] == 2
    assert got.loc[0, "consistency_milli"] == 500
    assert got.loc[1, "majority_lang"] == "en"
    assert got.loc[1, "consistency_milli"] == 1000 * 2 // 3


def test_chunk_lang_consistency_four_langs_und_and_overlap(ray_session):
    """Richer corpus: all four stopword languages plus numeric 'und'
    chunks, an overlapping stride (chunks share tokens), and block
    layout invariance."""
    import ray.data as rd

    from kgdata_ray.stages.textstats import chunk_lang_consistency

    en = "the and of to a in is for that with on as are this it"
    de = "der die das und ist von mit für auf ein eine nicht den im zu"
    fr = "le la les et de des un une est pour dans que qui sur avec"
    es = "el la los las y de que en un una es por con para del"
    num = "111 222 333 444 555 666 777 888 999 000 123 456 789 321 654"
    docs = rd.from_items([
        {"doc_id": 1, "text": " ".join([fr, fr, fr, es])},  # mostly fr
        {"doc_id": 2, "text": " ".join([es, es])},          # pure es
        {"doc_id": 3, "text": " ".join([num, num])},        # all 'und'
        {"doc_id": 4, "text": " ".join([en, de, fr, es])},  # 4-way tie
    ])
    kw = dict(chunk_tokens=15, stride=15)
    a = chunk_lang_consistency(docs, **kw).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = chunk_lang_consistency(docs.repartition(3), **kw).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    r = a.set_index("doc_id")
    assert r.loc[1, "majority_lang"] == "fr"
    assert r.loc[1, "consistency_milli"] == 750
    assert r.loc[2, "majority_lang"] == "es"
    assert r.loc[2, "consistency_milli"] == 1000
    assert r.loc[3, "majority_lang"] == "und"  # no stopword hits at all
    assert r.loc[4, "majority_lang"] == "de"   # 4-way tie -> min code
    assert r.loc[4, "consistency_milli"] == 250
    # overlapping stride: chunks share tokens but counts stay exact
    ov = chunk_lang_consistency(docs, chunk_tokens=15, stride=10) \
        .to_pandas().set_index("doc_id")
    assert ov.loc[2, "majority_lang"] == "es"
    assert ov.loc[2, "n_chunks"] > r.loc[2, "n_chunks"]


def test_arrow_twins_match_pandas_batch_scorers():
    import pandas as pd
    """quality/token/pii Arrow twins must be value-identical to the
    pandas batch scorers (same float core; RE2 == re on ASCII)."""
    import pyarrow as pa

    from kgdata_ray.stages.textstats import (
        pii_scrub_arrow,
        pii_scrub_batch,
        quality_score_arrow,
        quality_score_batch,
        token_counts_arrow,
        token_counts_batch,
    )

    texts = [
        "",
        "short",
        "a b  c   d.e,f;g:h!i?j",
        "Bob's e-mail is bob.smith+tag@example.co.uk, call +1-555-0100",
        "word " * 200 + "tail!!!",
        "  leading and trailing  ",
        "punct....only,,,;;;",
        "'s 'll 've 're don't 123abc 42 @@##",
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    b = t.to_pandas()

    pd.testing.assert_frame_equal(
        quality_score_arrow(t).to_pandas(), quality_score_batch(b))
    pd.testing.assert_frame_equal(
        token_counts_arrow(t).to_pandas(), token_counts_batch(b))
    pd.testing.assert_frame_equal(
        pii_scrub_arrow(t).to_pandas(), pii_scrub_batch(b))


def test_repetition_and_langid_vectorized_twins():
    import pandas as pd
    import pyarrow as pa

    from kgdata_ray.stages.textstats import (
        _STOPWORDS,
        LangId,
        repetition_stats_arrow,
        repetition_stats_batch,
    )

    texts = [" a  b ", "", "x", "  ", "a a a b", "Z z z", "tab\tsep\nnl",
             "the cat and the dog", "der Hund und die Katze",
             "le chat et le chien", "zzz qqq 12345"]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    b = t.to_pandas()
    pd.testing.assert_frame_equal(
        repetition_stats_arrow(t).to_pandas(), repetition_stats_batch(b))

    # scalar reference of the original findall loop
    token_re = re.compile(r"[a-zäöüéèêàçñ]+")
    langs = sorted(_STOPWORDS)
    sets = [_STOPWORDS[lang] for lang in langs]
    ref = []
    for text in texts:
        toks = token_re.findall(text.lower())
        if not toks:
            ref.append("und")
            continue
        scores = [sum(tk in s for tk in toks) for s in sets]
        best = max(range(len(langs)), key=lambda i: (scores[i], -i))
        ref.append(langs[best] if scores[best] > 0 else "und")
    got = LangId()(t).to_pandas()["lang_pred"].tolist()
    assert got == ref
