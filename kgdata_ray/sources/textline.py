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
    compression: Optional[str] = None,
) -> Dataset:
    """glob/paths of text files -> Dataset of parsed records.

    Mirrors the reference semantics exactly: ``prefilter`` sees the raw
    line (cheap string test avoids parse cost), ``deserialize`` maps
    line -> record dict, ``postfilter`` sees the record. The per-batch
    loop is unavoidable for line protocols; parsing happens once per
    line with no Python-level row objects leaving the stage.
    ``compression`` ("gzip"/"zstd") reads the reference's compressed
    text parts via Arrow's decompressing stream.
    """
    if compression:
        ds = rd.read_text(
            paths, arrow_open_stream_args={"compression": compression})
    else:
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
    compression: Optional[str] = None,
) -> Dataset:
    """ndjson parts -> Dataset (the reference's dominant storage
    format; pass ``compression="gzip"/"zstd"`` for compressed parts)."""
    return read_text_lines(
        paths, deserialize=json.loads, prefilter=prefilter,
        postfilter=postfilter, compression=compression,
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


# MySQL-dump backslash escapes (the reference parses page/redirect SQL
# dumps with a csv reader configured for this dialect,
# kgdata/wikidata/datasets/page_ids.py:74-106)
_SQL_UNESCAPE = {"n": "\n", "t": "\t", "r": "\r", "0": "\0",
                 "Z": "\x1a", "b": "\b"}


def parse_sql_values(line: str) -> list[list[Optional[str]]]:
    """Rows from one MySQL-dump ``INSERT INTO `t` VALUES (...),(...);``
    line: a list of column lists, values as strings with quotes/escapes
    resolved. Bare ``NULL`` (and empty bare values) become ``None`` —
    a typed null, where the reference substitutes ``chr(0)``. A
    character-level state machine, not the reference's csv-reader
    recipe: single-quoted strings honor both backslash escapes and
    doubled quotes, and commas/parens inside strings never split."""
    i = line.find(" VALUES ")
    if i < 0:
        return []
    s = line[i + 8 :]
    n = len(s)
    rows: list[list[Optional[str]]] = []
    j = 0
    while j < n:
        if s[j] != "(":
            j += 1
            continue
        j += 1
        row: list[Optional[str]] = []
        buf: list[str] = []
        was_quoted = False
        while j < n:
            c = s[j]
            if c == "'":
                was_quoted = True
                j += 1
                while j < n:
                    c = s[j]
                    if c == "\\" and j + 1 < n:
                        nxt = s[j + 1]
                        buf.append(_SQL_UNESCAPE.get(nxt, nxt))
                        j += 2
                    elif c == "'":
                        if j + 1 < n and s[j + 1] == "'":
                            buf.append("'")  # doubled-quote escape
                            j += 2
                        else:
                            j += 1
                            break
                    else:
                        buf.append(c)
                        j += 1
            elif c in ",)":
                v = "".join(buf)
                row.append(v if was_quoted
                           else (None if v in ("", "NULL") else v))
                buf = []
                was_quoted = False
                j += 1
                if c == ")":
                    rows.append(row)
                    break
            else:
                buf.append(c)
                j += 1
    return rows


def read_sql_dump(
    paths: Union[str, list[str]],
    columns: list[str],
    *,
    table: Optional[str] = None,
) -> Dataset:
    """MySQL dump file(s) -> Dataset with named string columns (nulls
    typed). The reference ingests page-id / redirect dumps this way
    (``page_dump().flatMap(parse_sql_values)``, page_ids.py:41); here
    the INSERT prefilter runs before parsing and each line's tuples are
    emitted batch-at-a-time. Rows whose arity does not match
    ``columns`` are dropped (the dumps carry other statements)."""
    needle = f"INSERT INTO `{table}`" if table else "INSERT INTO "
    ds = rd.read_text(paths)

    def parse(b: pd.DataFrame) -> pa.Table:
        cols: list[list[Optional[str]]] = [[] for _ in columns]
        for line in b["text"]:
            if needle not in line:
                continue
            for row in parse_sql_values(line):
                if len(row) != len(columns):
                    continue
                for c, v in zip(cols, row):
                    c.append(v)
        return pa.table(
            {name: pa.array(vals, pa.string())
             for name, vals in zip(columns, cols)}
        )

    return ds.map_batches(parse, batch_format="pandas")


def write_ndjson(
    ds: Dataset, out_dir: str, *, compression: Optional[str] = None,
) -> list[str]:
    """Dataset -> ndjson ``part-*`` files, optionally gzip- or
    zstd-compressed — interop back to the reference's on-disk format,
    which writes gz/zstd text parts (``kgdata/spark/common.py:
    500-566``). One part per block, written inside the block task via
    pyarrow's CompressedOutputStream (no driver funnel; codecs are
    Arrow-native, no extra libraries). Returns the part file names.
    For resumable partitioned engine output use
    ``state.manifest.write_dataset`` — this sink is the export path."""
    import os
    import uuid

    if compression not in (None, "gzip", "zstd"):
        raise ValueError(f"unsupported compression: {compression!r}")
    os.makedirs(out_dir, exist_ok=True)
    ext = {None: "", "gzip": ".gz", "zstd": ".zst"}[compression]

    def write_block(t: pa.Table) -> pa.Table:
        empty = pa.table({"part": pa.array([], pa.string()),
                          "rows": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        name = f"part-{uuid.uuid4().hex}.ndjson{ext}"
        path = os.path.join(out_dir, name)
        payload = ("\n".join(
            json.dumps(r, sort_keys=True, default=str)
            for r in t.to_pylist()) + "\n").encode("utf-8")
        if compression:
            with pa.CompressedOutputStream(path, compression) as f:
                f.write(payload)
        else:
            with open(path, "wb") as f:
                f.write(payload)
        return pa.table({"part": pa.array([name], pa.string()),
                         "rows": pa.array([t.num_rows], pa.int64())})

    parts = ds.map_batches(
        write_block, batch_size=None, batch_format="pyarrow",
    ).to_pandas()
    return sorted(parts["part"])


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
