"""In-pipeline invariant checks — the reference's real conformance
layer (SURVEY §5): uniqueness post-conditions
(``kgdata/spark/common.py:162-202`` ``are_records_unique``,
``kgdata/wikidata/datasets/entities.py:150-157``) and count
preservation.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from .agg import grouped_blockwise


def duplicate_keys(
    ds: Dataset, cols: Sequence[str], *, max_examples: int = 20
) -> list[dict]:
    """Key tuples appearing more than once (up to ``max_examples``,
    with their counts) — empty list means the keys are unique."""
    cols = list(cols)

    def pre(b: pd.DataFrame) -> pa.Table:
        out = b.groupby(cols, sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(out, preserve_index=False)

    def final(b: pd.DataFrame) -> pa.Table:
        out = b.groupby(cols, sort=False)["n"].sum().reset_index()
        return pa.Table.from_pandas(out[out["n"] > 1], preserve_index=False)

    dups = grouped_blockwise(
        ds.map_batches(pre, batch_format="pandas"), cols, final
    )
    return dups.take(max_examples)


def assert_unique(ds: Dataset, cols: Sequence[str]) -> None:
    """Raise (with example rows) unless ``cols`` tuples are unique —
    the reference's post-condition pattern, fail-fast with evidence."""
    dups = duplicate_keys(ds, cols)
    if dups:
        raise AssertionError(
            f"duplicate keys on {list(cols)}: {dups[:5]} "
            f"({len(dups)}+ shown)"
        )


def assert_count_preserved(before: int, after: int, *, what: str = "rows") -> None:
    if before != after:
        raise AssertionError(f"{what} count changed: {before} -> {after}")


def expectation_violations(
    ds: Dataset, id_col: str, rules: "dict[str, object]",
) -> Dataset:
    """Data-quality expectation gate: evaluate every rule on every row
    in ONE streaming pass and emit ``(id_col, rule)`` per violation —
    the ingest-validation report a 100-TB pipeline runs before
    publishing a dataset (the distributed generalization of this
    module's uniqueness post-conditions). ``rules`` maps a rule name to
    a vectorized predicate ``pd.DataFrame -> bool array`` that is TRUE
    where the row VIOLATES the expectation."""
    names = list(rules)

    def flag(b: pd.DataFrame) -> pa.Table:
        ids, rl = [], []
        for name in names:
            mask = pd.Series(rules[name](b), index=b.index,
                             dtype=bool)
            if mask.any():
                ids.append(b.loc[mask, id_col])
                rl.extend([name] * int(mask.sum()))
        if not ids:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "rule": pa.array([], pa.string())})
        out = pd.DataFrame({id_col: pd.concat(ids, ignore_index=True),
                            "rule": rl})
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.map_batches(flag, batch_format="pandas")
