"""fix_transitive_qualifiers: hoist transitive self-qualifier values
into new statements, strip self-qualifiers, count the strips — an
independent scalar reimplementation of the reference semantics
(kgdata/wikidata/datasets/entities.py:263-286) over the flat model.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from kgdata_ray.stages.extract import fix_transitive_qualifiers

TRANSITIVE = frozenset({"located_in", "part_of"})


def _golden(stmts: pd.DataFrame, quals: pd.DataFrame) -> pd.DataFrame:
    """Scalar per-entity loop mirroring the reference's nested-dict
    walk (NOT the engine's join/groupby plan)."""
    out_rows = []
    pred_of = stmts.set_index("stmt_id")
    hoist_seen: dict[tuple, int] = {}
    n_self: dict[int, int] = {}
    for q in quals.itertuples(index=False):
        if q.stmt_id not in pred_of.index:
            continue
        s = pred_of.loc[q.stmt_id]
        if q.qpred != s["pred"]:
            continue
        n_self[q.stmt_id] = n_self.get(q.stmt_id, 0) + 1
        if s["pred"] in TRANSITIVE:
            key = (s["subj"], s["pred"], q.qval)
            if key not in hoist_seen or q.stmt_id < hoist_seen[key]:
                hoist_seen[key] = q.stmt_id
    for s in stmts.itertuples(index=False):
        out_rows.append((s.stmt_id, s.subj, s.pred, s.obj, s.rank,
                         n_self.get(s.stmt_id, 0)))
    for (subj, pred, qval), src in hoist_seen.items():
        src_rank = int(pred_of.loc[src]["rank"])
        out_rows.append((-src, subj, pred, qval, src_rank, 0))
    return pd.DataFrame(out_rows, columns=[
        "stmt_id", "subj", "pred", "obj", "rank", "n_self_quals"])


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_fix_transitive_qualifiers_matches_scalar_golden():
    # deterministic synthetic world: 40 statements, qualifier fan-out
    # 0-4 per statement, self-qualifiers planted on ~half
    stmts = pd.DataFrame({
        "stmt_id": pd.array(range(1, 41), dtype="int64"),
        "subj": [f"u{i % 7}" for i in range(1, 41)],
        "pred": [["located_in", "part_of", "contains", "member_of"][i % 4]
                 for i in range(1, 41)],
        "obj": [f"c{i % 5}" for i in range(1, 41)],
        "rank": pd.array([i % 3 for i in range(1, 41)], dtype="int64"),
    })
    qrows = []
    for i in range(1, 41):
        for j in range(i % 5):
            qpred = ["located_in", "part_of", "contains", "member_of"][
                (i + j) % 4]
            qrows.append((i, qpred, f"e{(i * 3 + j) % 9}"))
    # duplicate qualifier values on one transitive statement (dedup path)
    qrows.append((4, "member_of", "e1"))
    qrows.append((5, "located_in", "e1"))
    qrows.append((5, "located_in", "e1"))
    quals = pd.DataFrame(qrows, columns=["stmt_id", "qpred", "qval"])
    quals["stmt_id"] = quals["stmt_id"].astype("int64")

    got = fix_transitive_qualifiers(
        rd.from_arrow(pa.Table.from_pandas(stmts, preserve_index=False)),
        rd.from_arrow(pa.Table.from_pandas(quals, preserve_index=False)),
        TRANSITIVE,
    ).to_pandas()
    want = _golden(stmts, quals)

    assert set(got.columns) == set(want.columns)
    pd.testing.assert_frame_equal(
        _sorted(got[want.columns.tolist()]).astype(
            {"rank": "int64", "n_self_quals": "int64"}),
        _sorted(want).astype({"rank": "int64", "n_self_quals": "int64"}),
    )
    # the hoisted rows exist and self-qualifier strips were counted
    assert (got["stmt_id"] < 0).any()
    assert (got["n_self_quals"] > 0).any()


def test_fix_transitive_qualifiers_no_self_quals():
    stmts = pd.DataFrame({
        "stmt_id": pd.array([1, 2], dtype="int64"),
        "subj": ["a", "b"],
        "pred": ["located_in", "contains"],
        "obj": ["x", "y"],
        "rank": pd.array([0, 1], dtype="int64"),
    })
    quals = pd.DataFrame({
        "stmt_id": pd.array([1, 2], dtype="int64"),
        "qpred": ["member_of", "part_of"],  # never equals owning pred
        "qval": ["e1", "e2"],
    })
    got = fix_transitive_qualifiers(
        rd.from_arrow(pa.Table.from_pandas(stmts, preserve_index=False)),
        rd.from_arrow(pa.Table.from_pandas(quals, preserve_index=False)),
        TRANSITIVE,
    ).to_pandas()
    assert len(got) == 2
    assert (got["n_self_quals"] == 0).all()
    assert (got["stmt_id"] > 0).all()
