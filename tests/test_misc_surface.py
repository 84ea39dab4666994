"""Sharded lookup actors, text-line sources, PropQuery, invariant
checks, unlinkable quarantine, CLI."""

from __future__ import annotations

import json
import subprocess
import sys

import pandas as pd
import pytest
import ray
import ray.data as rd

from kgdata_ray.functions.checks import assert_unique, duplicate_keys
from kgdata_ray.functions.propquery import PropQuery, prop_filter
from kgdata_ray.sources.textline import read_ndjson, read_tsv
from kgdata_ray.stages.extract import extract_raw
from kgdata_ray.stages.linking import best_candidate_map, unlinkable_mentions
from kgdata_ray.state.lookup import ShardedDict, lookup_column
from kgdata_ray.synth import gazetteer_table, transcripts_dataset


def test_sharded_dict_lookup():
    d = {f"k{i}": i * 10 for i in range(100)}
    sd = ShardedDict.from_dict(d, num_shards=4)
    assert sd.total_size() == 100
    keys = ["k3", "k99", "missing", "k0"]
    assert sd.lookup(keys) == [30, 990, None, 0]

    ds = rd.from_items([{"k": f"k{i}"} for i in range(0, 50, 7)])
    got = lookup_column(ds, sd, key_col="k", out_col="v").to_pandas()
    assert list(got["v"]) == [i * 10 for i in range(0, 50, 7)]


def test_sharded_dict_miss_handler_read_through():
    calls = []

    def fallback(missing):
        calls.append(list(missing))
        return {k: f"fetched:{k}" for k in missing if k != "gone"}

    sd = ShardedDict.from_dict({"a": 1, "b": 2}, num_shards=2,
                               on_miss=fallback)
    got = sd.lookup(["a", "x", "y", "gone", "b", "x"])
    assert got == [1, "fetched:x", "fetched:y", None, 2, "fetched:x"]
    # handler called once with the DISTINCT missing keys
    assert calls == [["gone", "x", "y"]]

    # read-through cache: fetched keys now live in the shards, so the
    # next lookup never reaches the handler ("gone" misses again)
    assert sd.lookup(["x", "y", "gone"]) == ["fetched:x", "fetched:y", None]
    assert calls == [["gone", "x", "y"], ["gone"]]
    assert sd.total_size() == 4

    # cache_misses=False leaves the shards untouched
    sd2 = ShardedDict.from_dict({}, num_shards=2)
    assert sd2.lookup(["q"], on_miss=lambda m: {"q": 7},
                      cache_misses=False) == [7]
    assert sd2.total_size() == 0


def test_read_ndjson_with_filters(tmp_path):
    p = tmp_path / "part-0.json"
    rows = [{"id": i, "kind": "a" if i % 2 else "b"} for i in range(10)]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    ds = read_ndjson(
        str(p),
        prefilter=lambda line: '"kind": "a"' in line,  # raw-string filter
        postfilter=lambda rec: rec["id"] > 3,
    )
    got = sorted(r["id"] for r in ds.take_all())
    assert got == [5, 7, 9]


def test_parse_sql_values():
    from kgdata_ray.sources.textline import parse_sql_values

    line = (
        "INSERT INTO `page` VALUES "
        "(1,'plain',NULL),"
        "(2,'it\\'s, a (tricky) one','x\\\\y'),"
        "(3,'doubled ''quote''','tab\\there'),"
        "(4,'',12.5);"
    )
    assert parse_sql_values(line) == [
        ["1", "plain", None],
        ["2", "it's, a (tricky) one", "x\\y"],
        ["3", "doubled 'quote'", "tab\there"],
        ["4", "", "12.5"],  # quoted empty string stays a string
    ]
    assert parse_sql_values("CREATE TABLE `page` (x int);") == []
    assert parse_sql_values("-- comment line") == []


def test_read_sql_dump_roundtrip(tmp_path):
    from kgdata_ray.sources.textline import read_sql_dump

    p = tmp_path / "dump.sql"
    p.write_text(
        "-- header\n"
        "CREATE TABLE `t` (noise);\n"
        "INSERT INTO `t` VALUES (1,'a'),(2,NULL);\n"
        "INSERT INTO `other` VALUES (9,'skipme');\n"
        "INSERT INTO `t` VALUES (3,'c,d');\n"
    )
    got = (
        read_sql_dump(str(p), ["k", "v"], table="t")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(got["k"]) == ["1", "2", "3"]
    assert list(got["v"]) == ["a", None, "c,d"]


def test_sql_values_roundtrip_query():
    from kgdata_ray.pipelines.queries import q_sql_values_roundtrip

    df = q_sql_values_roundtrip("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 25
    assert str(df["n_nationkey"].dtype) == "int32"
    assert df.loc[df["n_nationkey"] == 1, "n_comment"].iloc[0] == \
        "it's #1 (a\\b),"
    assert df.loc[df["n_nationkey"] == 3, "n_comment"].isna().all()


def test_read_tsv(tmp_path):
    p = tmp_path / "part-0.tsv"
    p.write_text("a\t1\nb\t2\n")
    ds = read_tsv(str(p), ["name", "val"])
    got = {r["name"]: r["val"] for r in ds.take_all()}
    assert got == {"a": "1", "b": "2"}


def test_prop_query():
    ds = rd.from_items(
        [
            {"id": 1, "tags": ["x", "y"], "meta": {"lang": "en"}},
            {"id": 2, "tags": ["z"], "meta": {"lang": "de"}},
        ]
    )
    assert PropQuery.parse("meta.lang = en").op == "eq"
    got = prop_filter(ds, "meta.lang = en").take_all()
    assert [r["id"] for r in got] == [1]
    got = prop_filter(ds, "z in tags").take_all()
    assert [r["id"] for r in got] == [2]
    got = prop_filter(ds, "id = 2").take_all()
    assert [r["id"] for r in got] == [2]


def test_uniqueness_checks():
    ds = rd.from_items([{"k": 1, "v": "a"}, {"k": 1, "v": "b"}, {"k": 2, "v": "c"}])
    dups = duplicate_keys(ds, ["k"])
    assert len(dups) == 1 and dups[0]["k"] == 1 and dups[0]["n"] == 2
    with pytest.raises(AssertionError):
        assert_unique(ds, ["k"])
    assert_unique(ds, ["k", "v"])  # no raise


def test_unlinkable_quarantine(small_cfg):
    gz = gazetteer_table(small_cfg)
    raw = extract_raw(transcripts_dataset(small_cfg))
    bad = unlinkable_mentions(raw, best_candidate_map(gz)).to_pandas()
    # the synth world plants ~4% unknown "Visitor N" subjects
    assert len(bad) > 0
    assert set(bad["error"]) <= {"subj_unlinkable", "obj_unlinkable",
                                 "subj_unlinkable obj_unlinkable"}
    assert bad["subj_raw"].str.contains("Visitor").any()


def test_cli_list_queries():
    out = subprocess.run(
        [sys.executable, "-m", "kgdata_ray", "list-queries"],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    ).stdout
    assert "pricing_summary" in out and "sql-checked" in out
    # round 3: every registry query is oracle-backed (the sketch family
    # reads golden parquet) — no rows-only entries remain
    assert "minhash_pairs" in out
    assert "rows-only" not in out


def test_write_single_text_file(tmp_path):
    import json

    import ray.data as rd

    from kgdata_ray.sources.textline import write_single_text_file

    ds = rd.from_items([{"id": i, "v": f"x{i}"} for i in range(100)])
    path = str(tmp_path / "out.jsonl")
    n = write_single_text_file(ds, path, sort_key="id")
    assert n == 100
    lines = [json.loads(x) for x in open(path)]
    assert [r["id"] for r in lines] == list(range(100))


def test_verify_single_target():
    import pytest
    import ray.data as rd

    from kgdata_ray.stages.canonicalize import verify_single_target

    ok = rd.from_items(
        [{"src_id": "a", "dst_id": "b"}, {"src_id": "b", "dst_id": "c"},
         {"src_id": "a", "dst_id": "b"}]  # duplicate row is fine
    )
    verify_single_target(ok)

    bad = rd.from_items(
        [{"src_id": "a", "dst_id": "b"}, {"src_id": "a", "dst_id": "c"}]
    )
    with pytest.raises(ValueError, match="multiple targets"):
        verify_single_target(bad)


def test_write_read_ndjson_compressed_roundtrip(tmp_path, ray_session):
    """gz/zstd part-file interop: write compressed ndjson parts from a
    Dataset, read them back through the decompressing reader, recover
    the exact records (reference writes gz/zstd text parts)."""
    import gzip
    import pandas as pd
    import ray.data as rd

    from kgdata_ray.sources.textline import read_ndjson, write_ndjson

    df = pd.DataFrame({"k": list(range(50)),
                       "s": [f"v{i}" for i in range(50)]})
    for comp, ext in (("gzip", ".gz"), ("zstd", ".zst"), (None, "")):
        out = tmp_path / (comp or "plain")
        parts = write_ndjson(rd.from_pandas(df), str(out),
                             compression=comp)
        assert parts and all(p.endswith(f".ndjson{ext}") for p in parts)
        got = (read_ndjson([str(out / p) for p in parts],
                           compression=comp)
               .to_pandas().sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(got[["k", "s"]], df)
    # the gzip part really is gzip on disk
    gz = next((tmp_path / "gzip").glob("part-*.ndjson.gz"))
    with gzip.open(gz, "rt") as f:
        assert f.readline().startswith("{")
