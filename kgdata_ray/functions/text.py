"""Text normalization kernels.

``normalize_mention`` reproduces the semantics of the reference's
mention normalizer (``kgdata/wikidata/datasets/norm_mentions.py:48-51``:
fix NBSP, lowercase, strip non ``[\\w- ]`` chars, collapse whitespace)
in two implementations that are tested equal:

  - :func:`normalize_mention` — scalar Python (used by the oracle).
  - :func:`normalize_mention_series` — vectorized pandas string kernel
    (used inside ``map_batches`` stages).
"""

from __future__ import annotations

import re

import pandas as pd

_NBSP = " "
# Anything that is not a word char, hyphen or space is dropped.
_STRIP_RE = re.compile(r"[^\w\- ]", re.UNICODE)
_WS_RE = re.compile(r"\s+")


def normalize_mention(s: str) -> str:
    """Scalar mention normalizer (oracle-side)."""
    s = s.replace(_NBSP, " ")
    s = s.lower()
    s = _STRIP_RE.sub("", s)
    s = _WS_RE.sub(" ", s)
    return s.strip()


def normalize_mention_series(s: pd.Series) -> pd.Series:
    """Vectorized pandas equivalent of :func:`normalize_mention`."""
    out = s.str.replace(_NBSP, " ", regex=False)
    out = out.str.lower()
    out = out.str.replace(_STRIP_RE, "", regex=True)
    out = out.str.replace(_WS_RE, " ", regex=True)
    return out.str.strip()


_TOKEN_RE = re.compile(r"\S+")


def count_tokens(s: str) -> int:
    """Whitespace token count (scalar)."""
    return len(_TOKEN_RE.findall(s))


def normalize_mention_arrow(arr):
    """pyarrow-compute implementation of :func:`normalize_mention`
    (RE2 kernels, zero pandas). RE2's ``\\w`` is ASCII-only vs
    Python's unicode ``\\w`` — equivalent on the engine's mention
    charset (tested against the scalar version over the noise
    generator's alphabet)."""
    import pyarrow.compute as pc

    a = pc.replace_substring(arr, " ", " ")
    a = pc.utf8_lower(a)
    a = pc.replace_substring_regex(a, r"[^\w\- ]", "")
    a = pc.replace_substring_regex(a, r"\s+", " ")
    return pc.utf8_trim_whitespace(a)


def json_extract_fields(ds, json_col: str, fields: dict,
                        *, drop: bool = True):
    """Parse a JSON-string column and project named scalar fields into
    typed columns: ``fields`` maps output column name → (json key,
    pandas dtype). The reference parses JSON per record everywhere
    (orjson in every loader, e.g. ``kgdata/wikidata/datasets/entities.py``
    deser fns); the per-row ``loads`` is inherent to JSON-typed
    payloads — it's a C loop per batch, with column assembly and
    casting vectorized. Missing keys / null JSON become NaN/None: a
    non-nullable integer dtype is silently widened to its pandas
    nullable twin (``int64`` → ``Int64``) when any value is missing,
    instead of crashing the batch (round-3 ADVICE)."""
    try:
        import orjson as _json
    except ImportError:  # orjson isn't baked into every env
        import json as _json

    def parse(b: pd.DataFrame) -> pd.DataFrame:
        parsed = [
            _json.loads(s) if isinstance(s, str) and s else {}
            for s in b[json_col]
        ]
        out = b.drop(columns=[json_col]) if drop else b.copy()
        for name, (key, dtype) in fields.items():
            vals = [p.get(key) for p in parsed]
            s = pd.Series(vals, index=b.index)
            dt = pd.api.types.pandas_dtype(dtype)
            if (s.isna().any()
                    and pd.api.types.is_integer_dtype(dt)
                    and not isinstance(dt, pd.api.extensions.ExtensionDtype)):
                dt = pd.api.types.pandas_dtype(
                    str(dt).replace("uint", "UInt").replace("int", "Int"))
            out[name] = s.astype(dt)
        return out

    return ds.map_batches(parse, batch_format="pandas")
