"""Deterministic synthetic-world generator (FIXTURES.md F1-F3).

Produces, as a pure function of a :class:`SynthConfig`:

  - the **gazetteer** (entity_id, alias, freq_global, freq_doc) with
    ambiguous aliases shared across entities and "legacy" aliases that
    resolve to redirected old ids (analog of
    ``kgdata/wikidata/datasets/mention_to_entities.py``),
  - the **redirects** table (src_id, dst_id) with multi-hop chains
    (analog of ``kgdata/wikidata/datasets/entity_redirections.py``),
  - the **transcripts** table (conv_id, turn_idx, role, text, tool, ts)
    with Zipf-skewed conversation lengths, per-conversation shuffled
    turn order, unicode/NBSP noise in mentions, and relation sentences
    drawn from :mod:`kgdata_ray.patterns`.

Generation is row-deterministic given (seed, conv index) only — the
distributed generator (``transcripts_dataset``, a ``map_batches`` over
``ray.data.range``) and the driver-side generator
(``transcripts_table``) produce the exact same multiset of rows at any
parallelism, which is what lets the same fixture scale from unit tests
to the bench without external data.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

import numpy as np
import pyarrow as pa

from .patterns import RELATION_PHRASES

# --------------------------------------------------------------------------
# Config

EPOCH_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in microseconds

# bump when generation semantics change (invalidates bench caches)
SYNTH_VERSION = 2


@dataclass(frozen=True)
class SynthConfig:
    n_convs: int
    n_entities: int
    seed: int = 42
    long_conv_every: int = 613  # every k-th conversation is very long (skew)
    p_relation: float = 0.5  # a non-tool sentence is a relation sentence
    p_tool: float = 0.12  # a turn is a tool turn
    p_unknown: float = 0.04  # a mention is out-of-gazetteer (must be dropped)

    @property
    def n_redirects(self) -> int:
        return max(3, self.n_entities // 8)


def config_for_sf(sf: float, seed: int = 42) -> SynthConfig:
    n_convs = max(50, int(sf * 1_000_000))
    n_entities = max(40, min(20_000, n_convs // 10))
    return SynthConfig(n_convs=n_convs, n_entities=n_entities, seed=seed)


_SF_RE = re.compile(r"sf([0-9.]+)")


def sf_from_dir(sf_dir: str, default: float = 0.01) -> float:
    m = _SF_RE.search(sf_dir)
    if not m:
        return default
    try:
        return float(m.group(1).rstrip("."))
    except ValueError:
        return default


# --------------------------------------------------------------------------
# Word pools (no relation-phrase words: works/uses/located/at/in excluded)

_FIRSTS = [
    "Alice", "Bruno", "Carla", "Dmitri", "Elena", "Farid", "Greta", "Hiro",
    "Ines", "Jonas", "Keiko", "Lars", "Mira", "Nadia", "Omar", "Priya",
    "Quinn", "Rosa", "Sven", "Tara", "Ugo", "Vera", "Wen", "Yusuf",
]
_LASTS = [
    "Stone", "Rivera", "Okafor", "Takeda", "Novak", "Haddad", "Lindqvist",
    "Moreau", "Petrov", "Santos", "Weber", "Nakamura", "Olsen", "Rahman",
    "Silva", "Tanaka", "Ueda", "Vargas", "Wagner", "Yamada", "Zhang",
    "Kovacs", "Bauer", "Costa",
]
_ORG_HEADS = [
    "Acme", "Borealis", "Cascade", "Deltaline", "Everpeak", "Fathom",
    "Gridware", "Helios", "Ironleaf", "Juniper", "Kestrel", "Lumina",
    "Meridian", "Nimbus", "Orchid", "Pinnacle", "Quartz", "Redwood",
    "Sableworks", "Tidewater", "Umbra", "Vantage", "Westbrook", "Zephyr",
]
_ORG_TAILS = ["Labs", "Corp", "Systems", "Industries", "Group", "Software",
              "Analytics", "Dynamics"]
_PLACE_HEADS = [
    "Ashford", "Brightwater", "Coldspring", "Dunmore", "Eastvale",
    "Fernhill", "Glenrock", "Harlow", "Ivybridge", "Jadeport", "Kingsmere",
    "Larkspur", "Maplewood", "Northgate", "Oakhurst", "Pineford",
    "Quarryton", "Ridgewell", "Silverbrook", "Thornbury", "Umberfield",
    "Violetta", "Windermere", "Yellowpine",
]
_PLACE_TAILS = ["City", "Valley", "Harbor", "Heights", "Falls", "Plains"]
_TOOL_HEADS = [
    "Greptool", "Parsekit", "Fetchly", "Sortmaster", "Hashforge",
    "Linkbot", "Queryon", "Vectron", "Chunker", "Dedupler", "Rankwise",
    "Tracely", "Mapline", "Batchly", "Shardex", "Streamon",
]
_FILLER = [
    "Thanks for the update",
    "Let me check that for you",
    "The results look good so far",
    "Could you clarify the last point",
    "Here is a quick summary of the thread",
    "That matches what we expected",
    "I will follow up tomorrow morning",
    "Noted and logged for the record",
    "Please rerun the previous step",
    "Everything is consistent on my side",
]
_TOOL_NAMES = ["search", "browser", "python", "calculator", "retriever"]

ETYPES = ("person", "org", "place", "tool")


def _name_for(etype: str, j: int) -> str:
    """Unique display name for the j-th entity of a type (combinatorial)."""
    if etype == "person":
        a, b = j % len(_FIRSTS), (j // len(_FIRSTS)) % len(_LASTS)
        rep = j // (len(_FIRSTS) * len(_LASTS))
        name = f"{_FIRSTS[a]} {_LASTS[b]}"
    elif etype == "org":
        a, b = j % len(_ORG_HEADS), (j // len(_ORG_HEADS)) % len(_ORG_TAILS)
        rep = j // (len(_ORG_HEADS) * len(_ORG_TAILS))
        name = f"{_ORG_HEADS[a]} {_ORG_TAILS[b]}"
    elif etype == "place":
        a, b = j % len(_PLACE_HEADS), (j // len(_PLACE_HEADS)) % len(_PLACE_TAILS)
        rep = j // (len(_PLACE_HEADS) * len(_PLACE_TAILS))
        name = f"{_PLACE_HEADS[a]} {_PLACE_TAILS[b]}"
    else:  # tool
        a = j % len(_TOOL_HEADS)
        rep = j // len(_TOOL_HEADS)
        name = _TOOL_HEADS[a]
    if rep > 0:
        name = f"{name} {rep + 1}"
    return name


# --------------------------------------------------------------------------
# World: entities + gazetteer + redirects + render options


def _freq_global(i: int) -> int:
    """Zipf-ish popularity, strictly decreasing for small i (hot-entity skew)."""
    return 3_000_000 // (i + 2)


@dataclass
class World:
    cfg: SynthConfig
    entity_ids: list[str]
    etypes: list[str]
    names: list[str]
    # per entity: list of (surface alias, linked id) render options
    options: list[list[tuple[str, str]]]
    option_weights: list[np.ndarray]
    pools: dict[str, np.ndarray]  # etype -> entity indices
    gazetteer: list[tuple[str, str, int, int]]  # (entity_id, alias, fg, fd)
    redirects: list[tuple[str, str]]  # (src_id, dst_id), multi-hop chains


def build_world(cfg: SynthConfig) -> World:
    n = cfg.n_entities
    entity_ids = [f"E{i:07d}" for i in range(n)]
    etypes, names = [], []
    type_counters = {t: 0 for t in ETYPES}
    for i in range(n):
        t = ETYPES[i % 4]
        j = type_counters[t]
        type_counters[t] += 1
        etypes.append(t)
        names.append(_name_for(t, j))

    # redirect chains: R{k} -> R{k-1} (if k % 3 != 0) else -> E{k % n}
    redirects: list[tuple[str, str]] = []
    final_target: dict[str, str] = {}
    for k in range(cfg.n_redirects):
        src = f"R{k:07d}"
        if k % 3 == 0:
            dst = entity_ids[k % n]
            final_target[src] = dst
        else:
            dst = f"R{k - 1:07d}"
            final_target[src] = final_target[dst]
        redirects.append((src, dst))

    # legacy aliases: old id R{k} carries "<final-target name> legacy <k>"
    legacy_for_entity: dict[int, tuple[str, str]] = {}  # entity idx -> (alias, old_id)
    gazetteer: list[tuple[str, str, int, int]] = []
    for k, (src, _dst) in enumerate(redirects):
        tgt = final_target[src]
        ti = int(tgt[1:])
        alias = f"{names[ti]} legacy {k}"
        fg = _freq_global(ti) // 10 + 1
        gazetteer.append((src, alias, fg, fg // 2 + 1))
        legacy_for_entity.setdefault(ti, (alias, src))

    options: list[list[tuple[str, str]]] = []
    option_weights: list[np.ndarray] = []
    for i in range(n):
        fg = _freq_global(i)
        full = names[i]
        short = names[i].split(" ")[0]
        gazetteer.append((entity_ids[i], full, fg, fg // 2 + 1))
        gazetteer.append((entity_ids[i], short, fg // 3 + 1, fg // 6 + 1))
        opts = [(full, entity_ids[i]), (short, entity_ids[i])]
        wts = [0.72, 0.14]
        if i in legacy_for_entity:
            alias, old_id = legacy_for_entity[i]
            opts.append((alias, old_id))
            wts.append(0.14)
        w = np.asarray(wts)
        options.append(opts)
        option_weights.append(w / w.sum())

    pools = {
        t: np.asarray([i for i in range(n) if etypes[i] == t], dtype=np.int64)
        for t in ETYPES
    }
    return World(
        cfg=cfg, entity_ids=entity_ids, etypes=etypes, names=names,
        options=options, option_weights=option_weights, pools=pools,
        gazetteer=gazetteer, redirects=redirects,
    )


def gazetteer_table(cfg: SynthConfig) -> pa.Table:
    w = build_world(cfg)
    eid, alias, fg, fd = zip(*w.gazetteer)
    return pa.table(
        {
            "entity_id": pa.array(eid, pa.string()),
            "alias": pa.array(alias, pa.string()),
            "freq_global": pa.array(fg, pa.int64()),
            "freq_doc": pa.array(fd, pa.int64()),
        }
    )


def redirects_table(cfg: SynthConfig) -> pa.Table:
    w = build_world(cfg)
    src, dst = zip(*w.redirects)
    return pa.table(
        {"src_id": pa.array(src, pa.string()), "dst_id": pa.array(dst, pa.string())}
    )


# --------------------------------------------------------------------------
# Transcript generation (pure per conversation)

_RELS = list(RELATION_PHRASES.keys())
_REL_SUBJ_TYPE = {"works at": "person", "is located in": "org",
                  "uses": "person", "was founded in": "org"}
_REL_OBJ_TYPE = {"works at": "org", "is located in": "place",
                 "uses": "tool", "was founded in": None}  # None = literal


def _pick_entity(rng: np.random.Generator, pool: np.ndarray) -> int:
    """Zipf-weighted pick from a type pool (hot head, long tail)."""
    z = int(rng.zipf(1.4))
    return int(pool[(z - 1) % len(pool)])


def _render_mention(rng: np.random.Generator, world: World, ei: int) -> str:
    opts = world.options[ei]
    k = int(rng.choice(len(opts), p=world.option_weights[ei]))
    s, _linked = opts[k]
    r = rng.random()
    if r < 0.15:
        s = s.upper()
    elif r < 0.30:
        s = s.lower()
    if rng.random() < 0.20 and " " in s:
        first, rest = s.split(" ", 1)
        s = first + " " + rest  # NBSP noise
    if rng.random() < 0.10:
        s = s.replace(" ", "  ", 1)  # double-space noise
    if rng.random() < 0.10:
        s = s + ","  # trailing-comma noise
    return s


def _relation_sentence(rng: np.random.Generator, world: World) -> str:
    phrase = _RELS[int(rng.integers(0, len(_RELS)))]
    si = _pick_entity(rng, world.pools[_REL_SUBJ_TYPE[phrase]])
    if rng.random() < world.cfg.p_unknown:
        subj = f"Visitor {int(rng.integers(0, 99999))}"
    else:
        subj = _render_mention(rng, world, si)
    obj_type = _REL_OBJ_TYPE[phrase]
    if obj_type is None:  # literal-valued predicate (year)
        obj = str(1900 + int(rng.integers(0, 126)))
    else:
        oi = _pick_entity(rng, world.pools[obj_type])
        obj = _render_mention(rng, world, oi)
    return f"{subj} {phrase} {obj}."


def gen_conv_columns(world: World, gidx: int) -> dict[str, list[Any]]:
    """All turns of conversation ``gidx`` as column lists (shuffled order)."""
    cfg = world.cfg
    rng = np.random.default_rng([cfg.seed, gidx])
    if cfg.long_conv_every and gidx % cfg.long_conv_every == 0 and gidx > 0:
        n_turns = 200 + int(rng.integers(0, 100))  # long-conversation skew
    else:
        n_turns = int(rng.integers(2, 12))
    conv_id = f"conv-{gidx:08d}"

    texts: list[str] = []
    roles: list[str] = []
    tools: list[str] = []
    for t in range(n_turns):
        if rng.random() < cfg.p_tool:
            name = _TOOL_NAMES[int(rng.integers(0, len(_TOOL_NAMES)))]
            roles.append("tool")
            tools.append(name)
            texts.append('{"tool": "%s", "status": "ok", "latency_ms": %d}'
                         % (name, int(rng.integers(1, 2000))))
            continue
        roles.append("user" if t % 2 == 0 else "assistant")
        tools.append("")
        n_sent = 1 + (1 if rng.random() < 0.30 else 0)
        sents = []
        for _ in range(n_sent):
            if rng.random() < cfg.p_relation:
                sents.append(_relation_sentence(rng, world))
            else:
                sents.append(_FILLER[int(rng.integers(0, len(_FILLER)))] + ".")
        texts.append(" ".join(sents))

    order = rng.permutation(n_turns)  # turns written shuffled (FIXTURES F1)
    return {
        "conv_id": [conv_id] * n_turns,
        "turn_idx": [int(i) for i in order],
        "role": [roles[i] for i in order],
        "text": [texts[i] for i in order],
        "tool": [tools[i] for i in order],
        "ts": [EPOCH_US + gidx * 3_600_000_000 + int(i) * 60_000_000
               for i in order],
    }


_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def _columns_to_table(cols: dict[str, list[Any]]) -> pa.Table:
    return pa.table(
        {
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "role": pa.array(cols["role"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "tool": pa.array(cols["tool"], pa.string()),
            "ts": pa.array(cols["ts"], pa.timestamp("us")),
        },
        schema=_SCHEMA,
    )


def transcripts_table(cfg: SynthConfig) -> pa.Table:
    """Driver-side generation (tests / oracle); identical rows to the
    distributed generator at any parallelism."""
    world = build_world(cfg)
    parts = [_columns_to_table(gen_conv_columns(world, g))
             for g in range(cfg.n_convs)]
    return pa.concat_tables(parts).combine_chunks()


class GenerateTranscripts:
    """Actor-pool batch generator: ``ray.data.range(n_convs)`` ids in,
    transcript turns out. World rebuild happens once per actor
    (``__init__``), not per batch."""

    def __init__(self, cfg: SynthConfig):
        self.world = build_world(cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        merged: dict[str, list[Any]] = {k: [] for k in _SCHEMA.names}
        for gidx in batch["id"].to_pylist():
            cols = gen_conv_columns(self.world, int(gidx))
            for k in merged:
                merged[k].extend(cols[k])
        return _columns_to_table(merged)


def transcripts_dataset(cfg: SynthConfig, *, conv_per_block: int = 2000):
    """Distributed transcript generation as a Ray Dataset."""
    import ray.data as rd

    n_blocks = max(1, cfg.n_convs // conv_per_block)
    ds = rd.range(cfg.n_convs, override_num_blocks=n_blocks)
    return ds.map_batches(
        GenerateTranscripts,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=conv_per_block,
        concurrency=(1, 8),
    )


def transcripts_cache_dir(cfg: SynthConfig):
    """Where :func:`transcripts_source` materializes a config's
    transcripts (keyed by generator version + every config knob, so a
    semantics bump or a different world never reads a stale cache)."""
    import os
    from pathlib import Path

    root = Path(os.environ.get("KGBENCH_CACHE", "/tmp/kgbench"))
    return root / (
        f"transcripts_v{SYNTH_VERSION}_c{cfg.n_convs}"
        f"_e{cfg.n_entities}_s{cfg.seed}"
    )


def transcripts_source(cfg: SynthConfig):
    """The transcripts table as a *parquet-backed* Dataset: generate
    once with :func:`transcripts_dataset`, persist through the
    manifest-validated sink, then serve every later consumer with a
    plain ``read_parquet``. Same deterministic rows as the generator
    (write+read is content-preserving); what changes is the cost
    model — synthesis is paid once per (version, config) instead of
    once per query, which is exactly how a real deployment reads its
    dump: parsed once to parquet, then many pipelines read the
    columns they need."""
    import ray.data as rd

    from .state.manifest import has_complete_data, write_dataset

    out = transcripts_cache_dir(cfg)
    params = {"v": SYNTH_VERSION, "n_convs": cfg.n_convs,
              "n_entities": cfg.n_entities, "seed": cfg.seed}
    if not has_complete_data(out, params=params):
        write_dataset(
            transcripts_dataset(cfg), out, name="transcripts",
            params=params, min_rows_per_file=65_536,
        )
    return rd.read_parquet(sorted(str(p) for p in out.glob("*.parquet")))
