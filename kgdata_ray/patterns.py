"""Shared spec constants for the transcript KG-extraction task.

These constants define WHAT a triple is (sentence templates and the
predicate vocabulary). Both the distributed Ray pipeline
(``kgdata_ray.stages.extract``) and the independent pure-Python oracle
(``kgdata_ray.oracle``) implement extraction against this same spec —
mirroring how the reference fixes its statement grammar in
``kgdata/wikidata/models/wdentity.py:101-203`` and parses it in two
engines (Python + Rust).
"""

from __future__ import annotations

import re

# Relation phrase (as it appears in text) -> predicate id.
RELATION_PHRASES: dict[str, str] = {
    "works at": "works_at",
    "is located in": "located_in",
    "uses": "uses_tool",
    "was founded in": "founded_in",
}

# Predicates whose object is a LITERAL value, not an entity mention —
# the analog of the reference's non-entity WDValue types
# (time/quantity, ``kgdata/wikidata/models/wdvalue.py:20-27``). Literal
# objects bypass entity linking; they are normalized but never looked
# up or canonicalized.
LITERAL_PREDICATES = frozenset({"founded_in"})

# One sentence = "<subject mention> <phrase> <object mention>."
# Subject/object mentions never contain sentence-ending punctuation, so a
# lazy char class bounded by [.!?] cannot cross sentence boundaries.
SENTENCE_RE = re.compile(
    r"([^.!?]+?)\s+(works at|is located in|uses|was founded in)\s+([^.!?]+?)[.]"
)

PREDICATES = tuple(sorted(set(RELATION_PHRASES.values())))

# Transcript schema (BASELINE.json input_hint).
TRANSCRIPT_COLUMNS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")
