"""Pure-Python single-process oracle extractor (FIXTURES.md F4).

Independent, loop-based implementation of the transcript→KG semantics
(reconstruct → parse relation sentences → normalize + link mentions →
canonicalize via redirect chains → dedup). The Ray pipeline in
``kgdata_ray.pipelines.kg`` is scored against this oracle's
(subj, pred, obj) set at P/R ≥ 0.95 (BASELINE.md), mirroring how the
reference enforces pipeline post-conditions in
``kgdata/wikidata/datasets/entities.py:150-157``.

Everything here is deliberately naive per-row Python: it is the
correctness reference, not the engine.
"""

from __future__ import annotations

import re
from collections import defaultdict
from typing import Any

import pyarrow as pa

from .patterns import LITERAL_PREDICATES, RELATION_PHRASES, SENTENCE_RE

_ORACLE_STRIP_RE = re.compile(r"[^\w\- ]", re.UNICODE)
_ORACLE_WS_RE = re.compile(r"\s+")


def normalize_mention(s: str) -> str:
    """Independent copy of the mention-normalization SPEC (NBSP →
    space, casefold to lower, drop all but word chars/hyphen/space,
    collapse whitespace, trim). Deliberately NOT imported from
    ``functions.text``: a bug in the engine's normalizer must fail the
    P/R gate, not silently pass both sides (round-3 VERDICT note on
    the one shared leaf)."""
    s = s.replace(" ", " ").lower()
    s = _ORACLE_STRIP_RE.sub("", s)
    return _ORACLE_WS_RE.sub(" ", s).strip()


def build_alias_index(gazetteer: pa.Table) -> dict[str, str]:
    """normalized alias -> best entity id, ranked by (freq_global desc,
    entity_id asc) — the reference's candidate-ranking tie-break
    (``mention_to_entities.py:59-62`` plus pinned ties per SURVEY §7.4)."""
    buckets: dict[str, list[tuple[int, str]]] = defaultdict(list)
    d = gazetteer.to_pydict()
    for eid, alias, fg in zip(d["entity_id"], d["alias"], d["freq_global"]):
        buckets[normalize_mention(alias)].append((fg, eid))
    index: dict[str, str] = {}
    for norm, cands in buckets.items():
        cands.sort(key=lambda c: (-c[0], c[1]))
        index[norm] = cands[0][1]
    return index


def resolve_redirects(redirects: pa.Table) -> dict[str, str]:
    """src -> final canonical id, chains fully collapsed
    (pointer chasing with cycle guard; analog of
    ``entity_redirections.py:93-127``)."""
    d = redirects.to_pydict()
    direct = dict(zip(d["src_id"], d["dst_id"]))
    final: dict[str, str] = {}
    for src in direct:
        cur, seen = src, {src}
        while cur in direct:
            cur = direct[cur]
            if cur in seen:  # cycle: deterministic min-id winner
                cur = min(seen)
                break
            seen.add(cur)
        final[src] = cur
    return final


def extract_triples(
    transcripts: pa.Table,
    gazetteer: pa.Table,
    redirects: pa.Table,
) -> list[dict[str, Any]]:
    """Golden triples with provenance: (subj, pred, obj, conv_id,
    turn_idx), deduped on (subj, pred, obj) keeping the first occurrence
    in (conv_id, turn_idx) order."""
    alias_index = build_alias_index(gazetteer)
    canon = resolve_redirects(redirects)

    convs: dict[str, list[tuple[int, str]]] = defaultdict(list)
    d = transcripts.to_pydict()
    for cid, tix, text in zip(d["conv_id"], d["turn_idx"], d["text"]):
        convs[cid].append((tix, text))

    raw: list[tuple[str, str, str, str, int]] = []
    for cid in sorted(convs):
        turns = sorted(convs[cid])  # stable turn ordering (the invariant)
        for tix, text in turns:
            for m in SENTENCE_RE.finditer(text):
                pred = RELATION_PHRASES[m.group(2)]
                subj_id = alias_index.get(normalize_mention(m.group(1)))
                if subj_id is None:
                    continue  # unlinkable mention -> dropped
                subj = canon.get(subj_id, subj_id)
                if pred in LITERAL_PREDICATES:
                    # literal object: normalized value, no linking
                    obj = normalize_mention(m.group(3))
                else:
                    obj_id = alias_index.get(normalize_mention(m.group(3)))
                    if obj_id is None:
                        continue
                    obj = canon.get(obj_id, obj_id)
                raw.append((subj, pred, obj, cid, tix))

    seen: set[tuple[str, str, str]] = set()
    out: list[dict[str, Any]] = []
    for subj, pred, obj, cid, tix in sorted(
        raw, key=lambda r: (r[3], r[4], r[0], r[1], r[2])
    ):
        key = (subj, pred, obj)
        if key in seen:
            continue
        seen.add(key)
        out.append(
            {"subj": subj, "pred": pred, "obj": obj,
             "conv_id": cid, "turn_idx": tix}
        )
    return out


def extract_mentions(
    transcripts: pa.Table, gazetteer: pa.Table
) -> list[dict[str, Any]]:
    """Golden mention occurrences (conv_id, turn_idx, mention_norm):
    every normalized-alias token-run occurrence in normalized turn text
    (nested aliases counted, matching the all-occurrences semantics of
    ``stages.mentions.detect_mentions_ngram``). Dict-lookup n-gram scan
    — independent of the engine's Arrow ``index_in`` implementation."""
    norm_aliases = {
        normalize_mention(a)
        for a in gazetteer.column("alias").to_pylist()
        if normalize_mention(a)
    }
    max_n = max(len(a.split(" ")) for a in norm_aliases)
    out: list[dict[str, Any]] = []
    d = transcripts.to_pydict()
    for cid, tix, text in zip(d["conv_id"], d["turn_idx"], d["text"]):
        toks = normalize_mention(text).split(" ")
        for n in range(1, max_n + 1):
            for i in range(len(toks) - n + 1):
                gram = " ".join(toks[i : i + n])
                if gram in norm_aliases:
                    out.append(
                        {"conv_id": cid, "turn_idx": tix, "mention_norm": gram}
                    )
    return out


def extract_raw_candidates(transcripts: pa.Table) -> list[dict[str, Any]]:
    """Golden raw triple candidates (pre-linking): every anchored
    relation-sentence match per turn, whitespace-trimmed exactly like
    the engine's per-sentence extraction."""
    import re

    anchored = re.compile(
        r"^\s*([^.!?]+?)\s+(works at|is located in|uses|was founded in)"
        r"\s+([^.!?]+?)\s*$"
    )
    out: list[dict[str, Any]] = []
    d = transcripts.to_pydict()
    for cid, tix, text in zip(d["conv_id"], d["turn_idx"], d["text"]):
        for part in text.split("."):
            m = anchored.match(part)
            if not m:
                continue
            out.append(
                {
                    "conv_id": cid, "turn_idx": tix,
                    "subj_raw": m.group(1),
                    "pred": RELATION_PHRASES[m.group(2)],
                    "obj_raw": m.group(3),
                }
            )
    return out


def extract_unlinkable(
    transcripts: pa.Table, gazetteer: pa.Table
) -> list[dict[str, Any]]:
    """Golden unlinkable-mention quarantine rows: raw triple candidates
    whose subject or (non-literal) object has no gazetteer candidate,
    with the engine's error labels (semantics of
    ``stages.linking.unlinkable_mentions``)."""
    import re

    alias_index = build_alias_index(gazetteer)
    # the engine extracts per sentence-split part with an anchored regex
    # (whitespace trimmed); reproduce that trimming here
    anchored = re.compile(
        r"^\s*([^.!?]+?)\s+(works at|is located in|uses|was founded in)"
        r"\s+([^.!?]+?)\s*$"
    )
    out: list[dict[str, Any]] = []
    d = transcripts.to_pydict()
    for cid, tix, text in zip(d["conv_id"], d["turn_idx"], d["text"]):
        for part in text.split("."):
            m = anchored.match(part)
            if not m:
                continue
            pred = RELATION_PHRASES[m.group(2)]
            subj_bad = alias_index.get(normalize_mention(m.group(1))) is None
            obj_bad = (
                pred not in LITERAL_PREDICATES
                and alias_index.get(normalize_mention(m.group(3))) is None
            )
            if not (subj_bad or obj_bad):
                continue
            err = " ".join(
                lbl for lbl, bad in
                (("subj_unlinkable", subj_bad), ("obj_unlinkable", obj_bad))
                if bad
            )
            out.append(
                {
                    "conv_id": cid, "turn_idx": tix,
                    "subj_raw": m.group(1), "pred": pred,
                    "obj_raw": m.group(3), "error": err,
                }
            )
    return out


def triple_set(triples: list[dict[str, Any]]) -> set[tuple[str, str, str]]:
    return {(t["subj"], t["pred"], t["obj"]) for t in triples}


def precision_recall(
    predicted: set[tuple[str, str, str]],
    golden: set[tuple[str, str, str]],
) -> tuple[float, float]:
    if not predicted or not golden:
        return (0.0, 0.0)
    tp = len(predicted & golden)
    return tp / len(predicted), tp / len(golden)
