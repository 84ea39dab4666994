"""Block hygiene at shuffle boundaries.

Ray 2.49's sort-based ``groupby``/``map_groups`` emits empty,
schema-less pandas blocks for empty sort partitions, and ``map_batches``
does not run UDFs on empty blocks — so such blocks survive any
per-batch fix-up and crash Arrow hash joins downstream
(``No match ... for key field reference ... on right side``).

``repartition(n)`` rebuilds blocks through a block builder, dropping
the schema-less empties and unifying the format to Arrow.
:func:`scrub_empty_blocks` is that scrub; apply it to any
``map_groups`` output that feeds ``Dataset.join``.
"""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset


def scrub_empty_blocks(ds: Dataset, *, target_blocks: int = 8) -> Dataset:
    """Rebuild blocks (drops schema-less empties; unifies to Arrow)."""
    return ds.repartition(target_blocks)


def rename_cols(ds: Dataset, mapping: dict[str, str]) -> Dataset:
    """pandas-block-safe column rename.

    ``Dataset.rename_columns`` plans a Project that calls Arrow's
    ``Table.rename_columns`` on the raw block and crashes on pandas
    blocks (Ray 2.49). This converts each batch to Arrow and renames
    there. Empty schema-less blocks pass through untouched (map UDFs
    skip them) — scrub before an Arrow join if those matter.
    """

    def fn(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.schema.names])

    return ds.map_batches(fn, batch_format="pyarrow")


def melt(ds: Dataset, *, id_vars: list[str], value_vars: list[str],
         var_name: str = "variable", value_name: str = "value") -> Dataset:
    """Wide→long unpivot: one output row per (input row, value var).
    Embarrassingly parallel — a stateless per-batch ``pandas.melt``,
    no shuffle; value columns must share one dtype (Arrow long format
    has a single value column)."""
    import pandas as pd

    def fn(b: pd.DataFrame) -> pa.Table:
        out = pd.melt(b, id_vars=id_vars, value_vars=value_vars,
                      var_name=var_name, value_name=value_name)
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.map_batches(fn, batch_format="pandas")


def union_by_name(datasets: "list[Dataset]", *,
                  schemas: "list[pa.Schema] | None" = None) -> Dataset:
    """Schema-harmonizing UNION ALL BY NAME: aligns every input to the
    name-unified, type-promoted schema (missing columns become typed
    nulls) and unions — what a 100-TB ingest needs when parquet shards
    drift (new columns appear, int32 widens to int64).
    ``Dataset.union`` itself requires identical schemas.

    Pass ``schemas`` explicitly when an input is a mapped pipeline:
    ``Dataset.schema()`` on a non-read plan EXECUTES it (the
    schema-probe trap; parquet reads answer from metadata for free)."""
    if schemas is None:
        schemas = [ds.schema().base_schema for ds in datasets]
    target = pa.unify_schemas(schemas, promote_options="permissive")

    def align(t: pa.Table) -> pa.Table:
        cols = []
        for f in target:
            if f.name in t.schema.names:
                cols.append(t[f.name].cast(f.type))
            else:
                cols.append(pa.nulls(len(t), f.type))
        return pa.Table.from_arrays(cols, schema=target)

    aligned = [ds.map_batches(align, batch_format="pyarrow")
               for ds in datasets]
    out = aligned[0]
    for ds in aligned[1:]:
        out = out.union(ds)
    return out
