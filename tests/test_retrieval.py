"""BM25 / BPE / scalar-quantization operators vs self-contained naive
reimplementations (plain Python loops, no engine helpers)."""

import math
import re

import numpy as np
import pandas as pd

_SPLIT = re.compile(r"[^a-z0-9]+")

DOCS = [
    "the quick hash join beats the slow sort merge join",
    "window functions sort the frame then aggregate",
    "hash hash hash everywhere a hash table",
    "nothing relevant here at all",
    "sort sort window hash",
    "",
]


def _naive_bm25(docs, terms, k1=1.2, b=0.75):
    toks = [[t for t in _SPLIT.split(d.lower()) if t] for d in docs]
    n = len(docs)
    avgdl = sum(len(t) for t in toks) / n
    df = {q: sum(1 for t in toks if q in t) for q in terms}
    scores = {}
    hits = {}
    for i, ts in enumerate(toks):
        s = 0
        h = 0
        for q in terms:
            tf = ts.count(q)
            if not tf or not df[q]:
                continue
            idf = math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
            w = (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * (len(ts) / avgdl)))
            s += math.floor(idf * w * 1e6 + 0.5)
            h += 1
        if h:
            scores[i] = s
            hits[i] = h
    return scores, hits


def test_bm25_topk_matches_naive(ray_session):
    import ray.data as rd

    from kgdata_ray.stages.retrieval import bm25_topk

    df = pd.DataFrame({"doc_id": np.arange(len(DOCS), dtype=np.int64),
                       "text": DOCS})
    got = bm25_topk(rd.from_pandas(df), ["hash", "sort", "window"],
                    k=10).to_pandas()
    want_scores, want_hits = _naive_bm25(DOCS,
                                         ["hash", "sort", "window"])
    assert dict(zip(got["doc_id"], got["score_fx"])) == want_scores
    assert dict(zip(got["doc_id"], got["n_hit"])) == want_hits
    # ordered by (score desc, doc_id asc)
    assert list(got["score_fx"]) == sorted(got["score_fx"],
                                           reverse=True)


def test_bm25_topk_cut(ray_session):
    import ray.data as rd

    from kgdata_ray.stages.retrieval import bm25_topk

    df = pd.DataFrame({"doc_id": np.arange(len(DOCS), dtype=np.int64),
                       "text": DOCS})
    got = bm25_topk(rd.from_pandas(df), ["hash"], k=2).to_pandas()
    assert len(got) == 2
    ws, _ = _naive_bm25(DOCS, ["hash"])
    top2 = sorted(ws.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert list(zip(got["doc_id"], got["score_fx"])) == top2


def _naive_bpe(docs, n_merges):
    vocab = {}
    for d in docs:
        for w in _SPLIT.split(d.lower()):
            if w:
                vocab[w] = vocab.get(w, 0) + 1
    out = []
    syms = {w: list(w) for w in vocab}
    for _ in range(n_merges):
        pc = {}
        for w, n in vocab.items():
            for a, b in zip(syms[w], syms[w][1:]):
                pc[(a, b)] = pc.get((a, b), 0) + n
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((l, r, c))
        for w in vocab:
            s, res, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    res.append(l + r)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            syms[w] = res
    return out


def test_bpe_merges_matches_naive(ray_session):
    import ray.data as rd

    from kgdata_ray.stages.retrieval import bpe_merges

    df = pd.DataFrame({"text": DOCS * 3})
    got = bpe_merges(rd.from_pandas(df), n_merges=6).to_pandas()
    want = _naive_bpe(DOCS * 3, 6)
    assert list(zip(got["lhs"], got["rhs"], got["pair_count"])) == want
    assert list(got["step"]) == list(range(len(want)))


def test_bpe_merges_batched_rounds_match_sequential(ray_session):
    """Realistic merge count: the batched-round rule (maximal
    symbol-disjoint strictly-above-boundary prefix per round) must
    reproduce sequential greedy BPE rule-for-rule at n_merges=64 —
    including tie-break order, on a corpus rich enough to force both
    conflict-stops and count ties."""
    import ray.data as rd

    from kgdata_ray.stages.retrieval import bpe_merges

    rng = np.random.default_rng(11)
    words = ["the", "theory", "there", "other", "mother", "thermal",
             "ingest", "ingesting", "sing", "ring", "string", "spring",
             "hash", "hashing", "shard", "shuffle", "shingle", "single",
             "data", "dataset", "database", "date", "update", "updated"]
    docs = [" ".join(rng.choice(words, size=30)) for _ in range(40)]
    df = pd.DataFrame({"text": docs})
    got = bpe_merges(rd.from_pandas(df), n_merges=64).to_pandas()
    want = _naive_bpe(docs, 64)
    assert list(zip(got["lhs"], got["rhs"], got["pair_count"])) == want
    assert list(got["step"]) == list(range(len(want)))


def test_bpe_merges_created_pair_outranks_batch(ray_session):
    """Regression: a merge applied in a round can CREATE a pair (here
    (aa, aa) from the run 'aaaaaa') whose count out-ranks later
    batch-accepted pairs; the created-pair bound must reject those so
    batched rounds still equal sequential greedy. Word counts
    {'aa': 1, 'bbbb': 3, 'baaaaaa': 5}: round-1 counts (a,a)=26,
    (b,b)=9, (b,a)=5 — the naive boundary rule would accept
    [(a,a), (b,b)] but sequential greedy learns [(a,a), (aa,aa)=10]."""
    import ray.data as rd

    from kgdata_ray.stages.retrieval import bpe_merges

    docs = ["aa", "bbbb bbbb bbbb"] + ["baaaaaa"] * 5
    df = pd.DataFrame({"text": docs})
    got = bpe_merges(rd.from_pandas(df), n_merges=2).to_pandas()
    want = _naive_bpe(docs, 2)
    assert list(zip(got["lhs"], got["rhs"], got["pair_count"])) == want
    assert want[1][0] == "aa" and want[1][1] == "aa"  # the created pair


def test_scalar_quantize_roundtrip(ray_session):
    import ray.data as rd

    from kgdata_ray.stages.similarity import scalar_quantize

    rng = np.random.RandomState(3)
    v = rng.randn(50, 8)
    df = pd.DataFrame({"vec_id": np.arange(50, dtype=np.int64),
                       "embedding": [list(map(float, x)) for x in v]})
    got = (scalar_quantize(rd.from_pandas(df)).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    assert len(got) == 50
    # naive per-vector integer recompute
    scale = 1 << 20
    fx = np.floor(v * scale).astype(object)  # python ints via object
    mn = fx.min(axis=0)
    mx = fx.max(axis=0)
    span = np.maximum(mx - mn, 1)
    for i in range(50):
        code = (fx[i] - mn) * 255 // span
        deq = mn + code * span // 255
        err = int(((fx[i] - deq) ** 2).sum())
        assert got["codes_hex"][i] == bytes(int(c) for c in code).hex()
        assert int(got["err_fx"][i]) == err
    # codes actually reconstruct close to the original
    assert (got["err_fx"].to_numpy() >= 0).all()


def test_bpe_encode_matches_naive(ray_session):
    import ray.data as rd

    from kgdata_ray.stages.retrieval import bpe_encode, bpe_merges

    docs = DOCS * 2 + ["zzz qqq", ""]
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64),
                       "text": docs})
    ds = rd.from_pandas(df)
    mt = bpe_merges(ds, n_merges=5).take_all()
    merges = [(r["lhs"], r["rhs"]) for r in mt]
    got = (bpe_encode(ds, merges).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    def apply(word):
        s = list(word)
        for l, r in merges:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        return s

    for i, t in enumerate(docs):
        want = sum(len(apply(w)) for w in _SPLIT.split(t.lower()) if w)
        assert int(got["n_bpe_tokens"][i]) == want
    # merges actually shrink the token stream vs characters
    assert got["n_bpe_tokens"].sum() < sum(
        len(w) for t in docs for w in _SPLIT.split(t.lower()) if w)


def test_hybrid_rrf_fusion_semantics(ray_session):
    """RRF fuses the two legs with exact integer contributions: a doc
    ranked in both legs outranks single-leg docs with worse ranks, and
    every rrf_fx equals 1_000_000 // (60+lex) + 1_000_000 // (60+dense)
    recomputed from the reported per-leg ranks."""
    import ray.data as rd

    from kgdata_ray.stages.retrieval import hybrid_rrf_topk

    rng = np.random.default_rng(5)
    n, d = 40, 8
    docs = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [f"hash sort doc {i} " + "filler " * (i % 5)
                 for i in range(n)],
    })
    emb = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [rng.normal(size=d).astype(np.float32).tolist()
                      for _ in range(n)],
    })
    got = hybrid_rrf_topk(
        rd.from_pandas(docs), rd.from_pandas(emb),
        ["hash", "sort"], query_vec_id=3, k=10, k_cand=15,
    ).to_pandas()
    assert len(got) == 10
    for _, r in got.iterrows():
        want = 0
        if r["lex_rank"]:
            want += 1_000_000 // (60 + int(r["lex_rank"]))
        if r["dense_rank"]:
            want += 1_000_000 // (60 + int(r["dense_rank"]))
        assert int(r["rrf_fx"]) == want
        assert int(r["doc_id"]) != 3 or r["dense_rank"] == 0  # self excluded
    # sorted by (rrf_fx desc, doc_id asc)
    key = list(zip(-got["rrf_fx"], got["doc_id"]))
    assert key == sorted(key)
    # both legs contribute: at least one fused doc carries both ranks
    assert ((got["lex_rank"] > 0) & (got["dense_rank"] > 0)).any()
