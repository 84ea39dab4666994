"""Property-based tests (hypothesis) for the pure parsing / selection
kernels — no Ray session needed, so examples are cheap and plentiful."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kgdata_ray.sources.textline import parse_sql_values


def _render_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, int):
        return str(v)
    out = (
        v.replace("\\", "\\\\")
        .replace("'", "\\'")
        .replace("\n", "\\n")
        .replace("\t", "\\t")
        .replace("\r", "\\r")
        .replace("\0", "\\0")
        .replace("\x1a", "\\Z")
        .replace("\b", "\\b")
    )
    return f"'{out}'"


_scalar = st.one_of(
    st.none(),
    st.integers(min_value=-10**9, max_value=10**9),
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",)
        ),
        max_size=24,
    ),
)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.lists(_scalar, min_size=1, max_size=5),
                min_size=1, max_size=4))
def test_parse_sql_values_roundtrip(rows):
    # every row rendered with the same arity as itself — the parser is
    # schema-free, so ragged rows are fine
    rendered = ",".join(
        "(" + ",".join(_render_value(v) for v in r) + ")" for r in rows
    )
    line = f"INSERT INTO `t` VALUES {rendered};"
    got = parse_sql_values(line)
    # quoted strings always survive verbatim (even '' and 'NULL');
    # only a bare NULL renders to None
    want = [[None if v is None else str(v) for v in r] for r in rows]
    assert got == want


@settings(max_examples=150, deadline=None)
@given(st.lists(st.lists(_scalar, min_size=1, max_size=5),
                min_size=1, max_size=4))
def test_parse_sql_values_doubled_quote_escape(rows):
    # the alternate MySQL escape: '' instead of \'
    def render(v):
        if v is None:
            return "NULL"
        if isinstance(v, int):
            return str(v)
        out = v.replace("\\", "\\\\").replace("'", "''")
        out = (out.replace("\n", "\\n").replace("\t", "\\t")
               .replace("\r", "\\r").replace("\0", "\\0")
               .replace("\x1a", "\\Z").replace("\b", "\\b"))
        return f"'{out}'"

    rendered = ",".join(
        "(" + ",".join(render(v) for v in r) + ")" for r in rows
    )
    got = parse_sql_values(f"INSERT INTO `t` VALUES {rendered};")
    # quoted strings always survive verbatim (even '' and 'NULL');
    # only a bare NULL renders to None
    want = [[None if v is None else str(v) for v in r] for r in rows]
    assert got == want


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.floats(allow_nan=False, allow_infinity=False,
                       width=32),
             min_size=1, max_size=200),
    st.floats(min_value=0.0, max_value=1.0),
)
def test_disc_index_matches_duckdb_quantile_disc(vals, q):
    """The order-statistic index used by global/grouped quantiles is
    exactly DuckDB's quantile_disc semantics."""
    from kgdata_ray.functions.stats import _disc_index

    vals = sorted(vals)
    want = duckdb.execute(
        "SELECT quantile_disc(v, ?) FROM (SELECT unnest(?) AS v)",
        [q, vals],
    ).fetchone()[0]
    got = vals[_disc_index(q, len(vals))]
    assert got == want


def test_parse_sql_values_ignores_prefix_noise():
    assert parse_sql_values("no values keyword here") == []
    assert parse_sql_values(
        "INSERT INTO `t` VALUES (1,'a,b'),(NULL,'c)d');"
    ) == [["1", "a,b"], [None, "c)d"]]


# --------------------------------------------------------------------------
# levenshtein: compare against DuckDB's implementation on random pairs


@given(
    st.text(alphabet="abcde ", max_size=12),
    st.text(alphabet="abcde ", max_size=12),
)
@settings(max_examples=200, deadline=None)
def test_levenshtein_matches_duckdb(a, b):
    from kgdata_ray.stages.strsim import levenshtein

    exp = duckdb.sql(
        "SELECT levenshtein(?, ?)", params=[a, b]).fetchone()[0]
    assert levenshtein(a, b) == exp


# --------------------------------------------------------------------------
# Bloom filter: never a false negative, whatever the key distribution


@given(st.lists(st.integers(min_value=-2**62, max_value=2**62),
                min_size=1, max_size=300))
@settings(max_examples=50, deadline=None)
def test_bloom_membership_no_false_negatives(keys):
    import numpy as np

    from kgdata_ray.functions.bloom import (
        _key_hash64,
        _positions,
        bloom_contains,
    )

    arr = np.asarray(keys, dtype=np.int64)
    m_bits = 1 << 12
    bits = np.zeros(m_bits // 64, dtype=np.uint64)
    h = _key_hash64(arr)
    for pos in _positions(h, 4, m_bits):
        np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
    assert bloom_contains(bits, 4, arr).all()


# --------------------------------------------------------------------------
# GIF walk: synthetic frames round-trip for arbitrary parameters


@given(st.integers(min_value=1, max_value=255),
       st.integers(min_value=1, max_value=255),
       st.integers(min_value=0, max_value=32))
@settings(max_examples=100, deadline=None)
def test_gif_roundtrip_property(w, h, nf):
    from kgdata_ray.stages.multimodal import (
        gif_bytes_frames,
        parse_gif_frames,
    )

    assert parse_gif_frames(gif_bytes_frames(w, h, nf)) == (w, h, nf)


# --------------------------------------------------------------------------
# WAV walk: round-trip for arbitrary parameters


@given(st.sampled_from([8000, 11025, 16000, 22050, 44100, 48000]),
       st.integers(min_value=1, max_value=8),
       st.sampled_from([8, 16, 24, 32]),
       st.integers(min_value=0, max_value=500))
@settings(max_examples=100, deadline=None)
def test_wav_roundtrip_property(sr, ch, bits, nf):
    from kgdata_ray.stages.multimodal import parse_wav_header, wav_bytes

    assert parse_wav_header(wav_bytes(sr, ch, bits, nf)) == \
        (sr, ch, bits, nf)
