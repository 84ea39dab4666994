"""PropQuery: the reference's record-filter mini-language
(``kgdata/misc/query.py:6-45``) re-expressed over Dataset columns.

Grammar (same operators as the reference):
    ``field = value``      equality on a (possibly dotted) field path
    ``value in field``     membership: field is a list column or a
                           string column (substring)

Dotted paths index nested struct columns. Values are parsed as int /
float when they look numeric, else kept as strings.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pandas as pd
from ray.data import Dataset

_EQ_RE = re.compile(r"^\s*([\w.]+)\s*=\s*(.+?)\s*$")
_IN_RE = re.compile(r"^\s*(.+?)\s+in\s+([\w.]+)\s*$")


def _coerce(v: str):
    v = v.strip()
    if re.fullmatch(r"-?\d+", v):
        return int(v)
    if re.fullmatch(r"-?\d*\.\d+", v):
        return float(v)
    return v.strip("'\"")


@dataclass(frozen=True)
class PropQuery:
    field: str
    value: object
    op: str  # "eq" | "in"

    @classmethod
    def parse(cls, expr: str) -> "PropQuery":
        m = _IN_RE.match(expr)
        if m and not _EQ_RE.match(expr):
            return cls(field=m.group(2), value=_coerce(m.group(1)), op="in")
        m = _EQ_RE.match(expr)
        if m:
            return cls(field=m.group(1), value=_coerce(m.group(2)), op="eq")
        raise ValueError(f"cannot parse PropQuery: {expr!r}")

    def _resolve(self, b: pd.DataFrame) -> pd.Series:
        parts = self.field.split(".")
        col = b[parts[0]]
        for p in parts[1:]:
            col = col.map(
                lambda v, _p=p: v.get(_p) if isinstance(v, dict) else None
            )
        return col

    def mask(self, b: pd.DataFrame) -> pd.Series:
        col = self._resolve(b)
        if self.op == "eq":
            return col == self.value
        # list columns surface as numpy arrays per cell after Arrow ->
        # pandas conversion; accept anything container-like
        def contains(v) -> bool:
            if v is None:
                return False
            try:
                return self.value in v
            except TypeError:
                return False

        return col.map(contains)


def prop_filter(ds: Dataset, expr: str) -> Dataset:
    """Filter a Dataset with a PropQuery expression string."""
    q = PropQuery.parse(expr)

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        return b[q.mask(b)]

    return ds.map_batches(fn, batch_format="pandas")
