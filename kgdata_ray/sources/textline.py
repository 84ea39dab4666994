"""Line-oriented sources: the Ray-native re-expression of the
reference's core ``Dataset`` abstraction (file glob + per-line
deserializer + pre/post filters, ``kgdata/dataset.py:44-57``, applied
in ``get_rdd`` ``kgdata/dataset.py:97-110``).

The reference stores everything as ndjson/TSV text parts; this engine's
native format is Parquet, but ingestion from the reference's format is
a first-class source: ``read_ndjson_lines`` reads text lines, applies
the raw-string prefilter BEFORE parsing and the record postfilter
AFTER, batch-at-a-time.
"""

from __future__ import annotations

import json
from typing import Callable, Optional, Union

import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data import Dataset


def read_text_lines(
    paths: Union[str, list[str]],
    *,
    deserialize: Callable[[str], dict],
    prefilter: Optional[Callable[[str], bool]] = None,
    postfilter: Optional[Callable[[dict], bool]] = None,
) -> Dataset:
    """glob/paths of text files -> Dataset of parsed records.

    Mirrors the reference semantics exactly: ``prefilter`` sees the raw
    line (cheap string test avoids parse cost), ``deserialize`` maps
    line -> record dict, ``postfilter`` sees the record. The per-batch
    loop is unavoidable for line protocols; parsing happens once per
    line with no Python-level row objects leaving the stage.
    """
    ds = rd.read_text(paths)

    def parse(b: pd.DataFrame) -> pa.Table:
        records = []
        for line in b["text"]:
            if prefilter is not None and not prefilter(line):
                continue
            rec = deserialize(line)
            if postfilter is not None and not postfilter(rec):
                continue
            records.append(rec)
        return pa.Table.from_pylist(records)

    return ds.map_batches(parse, batch_format="pandas")


def read_ndjson(
    paths: Union[str, list[str]],
    *,
    prefilter: Optional[Callable[[str], bool]] = None,
    postfilter: Optional[Callable[[dict], bool]] = None,
) -> Dataset:
    """ndjson parts -> Dataset (the reference's dominant storage
    format)."""
    return read_text_lines(
        paths, deserialize=json.loads, prefilter=prefilter,
        postfilter=postfilter,
    )


def read_tsv(
    paths: Union[str, list[str]],
    columns: list[str],
    *,
    prefilter: Optional[Callable[[str], bool]] = None,
) -> Dataset:
    """TSV parts -> Dataset with named columns (reference
    ``kgdata/misc/funcs.py:10-12`` tab-split records)."""

    def deser(line: str) -> dict:
        parts = line.split("\t")
        return dict(zip(columns, parts))

    return read_text_lines(paths, deserialize=deser, prefilter=prefilter)


def write_ndjson(ds: Dataset, out_dir: str) -> None:
    """Dataset -> ndjson part files (interop back to the reference's
    on-disk format)."""
    ds.write_json(out_dir)


def write_single_text_file(
    ds: Dataset,
    path: str,
    *,
    serialize: Callable[[dict], str] = json.dumps,
    sort_key: Optional[str] = None,
) -> int:
    """One text line per record into ONE file (reference
    ``save_as_single_text_file``, ``extended_rdd.py:212-229``:
    coalesce(1) -> single part). A single output file forces a single
    writer, so the driver streams batches to disk (bounded memory) —
    use only for small exports; big outputs belong in partitioned
    parquet (``state.manifest.write_dataset``). Returns the line
    count."""
    if sort_key is not None:
        ds = ds.sort(sort_key)
    n = 0
    with open(path, "w", encoding="utf-8") as f:
        for batch in ds.iter_batches(batch_size=8192, batch_format="pandas"):
            for rec in batch.to_dict("records"):
                f.write(serialize(rec))
                f.write("\n")
                n += 1
    return n
