"""Normalize kernels: scalar vs pandas vs pyarrow implementations
agree on the mention charset (incl. the synth noise alphabet)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from kgdata_ray.functions.text import (
    normalize_mention,
    normalize_mention_arrow,
    normalize_mention_series,
)

# the charset mentions can contain: names, digits, hyphens, NBSP noise,
# casing noise, double spaces, trailing commas (synth.py _render_mention)
_ALPHABET = st.sampled_from(
    list("abcdefghijKLMNOPqrstuvwXYZ0123456789 -, .!?'\"")
)
_MENTION = st.text(alphabet=_ALPHABET, min_size=0, max_size=40)


@settings(max_examples=300, deadline=None)
@given(st.lists(_MENTION, min_size=1, max_size=20))
def test_three_implementations_agree(strings):
    scalar = [normalize_mention(s) for s in strings]
    series = normalize_mention_series(pd.Series(strings, dtype="object")).tolist()
    arrow = normalize_mention_arrow(pa.array(strings, pa.string())).to_pylist()
    assert scalar == series == arrow


def test_known_cases():
    cases = {
        "Alice Smith,": "alice smith",
        "  ACME  Corp ": "acme corp",
        "foo-bar_baz!?": "foo-bar_baz",
        "": "",
    }
    for raw, want in cases.items():
        assert normalize_mention(raw) == want
