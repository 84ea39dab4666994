"""Mention detection: vectorized n-gram matcher vs a brute-force
per-alias oracle; regex actor variant sanity."""

from __future__ import annotations

import pytest

from kgdata_ray.functions.text import normalize_mention
from kgdata_ray.stages.mentions import detect_mentions, detect_mentions_ngram
from kgdata_ray.synth import gazetteer_table, transcripts_dataset, transcripts_table


def _brute_occurrences(transcripts, aliases):
    """All (conv_id, turn_idx, alias_norm) occurrences: for each alias
    independently, token-run matches in normalized text (nested aliases
    counted)."""
    out = []
    norm_aliases = sorted({normalize_mention(a) for a in aliases if normalize_mention(a)})
    d = transcripts.to_pydict()
    for cid, tix, text in zip(d["conv_id"], d["turn_idx"], d["text"]):
        toks = normalize_mention(text).split(" ")
        for a in norm_aliases:
            at = a.split(" ")
            n = len(at)
            for i in range(len(toks) - n + 1):
                if toks[i : i + n] == at:
                    out.append((cid, tix, a))
    return sorted(out)


def test_ngram_matcher_vs_bruteforce(small_cfg):
    gz = gazetteer_table(small_cfg)
    aliases = gz.column("alias").to_pylist()
    tt = transcripts_table(small_cfg)
    want = _brute_occurrences(tt, aliases)

    ds = detect_mentions_ngram(transcripts_dataset(small_cfg), aliases)
    got = sorted(
        (r["conv_id"], int(r["turn_idx"]), r["mention_norm"])
        for r in ds.take_all()
    )
    assert got == want


def test_regex_matcher_subset(small_cfg):
    """The regex alternation (longest-first, non-overlapping) finds a
    subset of the all-occurrences matcher, and every relation sentence
    yields at least its longest mentions."""
    gz = gazetteer_table(small_cfg)
    aliases = gz.column("alias").to_pylist()
    rx = {
        (r["conv_id"], int(r["turn_idx"]), r["mention_norm"])
        for r in detect_mentions(transcripts_dataset(small_cfg), aliases).take_all()
    }
    ng = {
        (r["conv_id"], int(r["turn_idx"]), r["mention_norm"])
        for r in detect_mentions_ngram(
            transcripts_dataset(small_cfg), aliases
        ).take_all()
    }
    assert rx <= ng
    assert len(rx) > 0


def test_join_plan_equals_ngram_matcher(small_cfg):
    import ray.data as rd

    from kgdata_ray.stages.mentions import detect_mentions_join
    from kgdata_ray.synth import gazetteer_table

    gz = gazetteer_table(small_cfg)
    aliases = gz.column("alias").to_pylist()
    ng = sorted(
        (r["conv_id"], int(r["turn_idx"]), r["mention_norm"])
        for r in detect_mentions_ngram(
            transcripts_dataset(small_cfg), aliases
        ).take_all()
    )
    jj = sorted(
        (r["conv_id"], int(r["turn_idx"]), r["mention_norm"])
        for r in detect_mentions_join(
            transcripts_dataset(small_cfg), rd.from_arrow(gz)
        ).take_all()
    )
    assert jj == ng
