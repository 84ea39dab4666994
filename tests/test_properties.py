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
