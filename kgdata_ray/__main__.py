"""CLI — the reference exposes every dataset as a generic CLI command
(``make_dataset_cli``, ``kgdata/dataset.py:561-683``); here every
registered query/pipeline is runnable by name and the flagship
pipeline has a dedicated checkpointed command.

Examples:
    python -m kgdata_ray build-triples --sf 0.01 --out /tmp/kg \\
        --workdir /tmp/kg_ck
    python -m kgdata_ray query pricing_summary \\
        --sf-dir /root/testdata/sf0.01 --out /tmp/q
    python -m kgdata_ray list-queries
    python -m kgdata_ray ingest-ndjson --paths '/data/part-*.json' \\
        --out /tmp/parquet

The CLI owns the Ray session (guarded init); library code never calls
``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "ignore_reinit_error": True, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from . import context

    context.configure()
    return ray


def _write(result, out: str | None) -> None:
    import pandas as pd
    from ray.data import Dataset

    if out is None:
        if isinstance(result, Dataset):
            result = result.limit(20).to_pandas()
        print(result if isinstance(result, pd.DataFrame) else result)
        return
    if isinstance(result, pd.DataFrame):
        import ray.data as rd

        result = rd.from_pandas(result)
    result.write_parquet(out)
    print(f"wrote {out}")


def cmd_build_triples(args) -> None:
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .pipelines.kg import kg_triples, kg_triples_checkpointed
    from .synth import (config_for_sf, gazetteer_table, redirects_table,
                        transcripts_dataset)

    cfg = config_for_sf(args.sf)
    gz, rt = gazetteer_table(cfg), redirects_table(cfg)
    if args.transcripts:
        transcripts = rd.read_parquet(args.transcripts)
    else:
        transcripts = transcripts_dataset(cfg)
    if args.workdir:
        out = kg_triples_checkpointed(
            transcripts, gz, rt, args.workdir, linking=args.linking
        )
    else:
        out = kg_triples(transcripts, gz, rt, linking=args.linking)
    out.write_parquet(args.out)
    print(f"wrote triples to {args.out}")
    ray.shutdown()


def cmd_query(args) -> None:
    ray = _ray_session(args.num_cpus)
    from .pipelines.queries import queries

    reg = queries()
    if args.name not in reg:
        print(f"unknown query {args.name!r}; see list-queries", file=sys.stderr)
        sys.exit(2)
    _write(reg[args.name](args.sf_dir), args.out)
    ray.shutdown()


def cmd_list_queries(_args) -> None:
    from .pipelines.queries import oracle_sql, queries

    sql = set(oracle_sql())
    for name in sorted(queries()):
        kind = "sql-checked" if name in sql else "rows-only"
        print(f"{name:28s} {kind}")


def cmd_ingest_ndjson(args) -> None:
    ray = _ray_session(args.num_cpus)
    from .sources.textline import read_ndjson

    ds = read_ndjson(args.paths)
    ds.write_parquet(args.out)
    print(f"wrote {args.out}")
    ray.shutdown()


def cmd_diff(args) -> None:
    """Diff two parquet dataset directories by key (reference
    ``compare`` CLI, ``kgdata/dataset.py:470-558``)."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .functions.hashing import diff_datasets

    d = diff_datasets(
        rd.read_parquet(args.a), rd.read_parquet(args.b), args.key
    ).to_pandas()
    if d.empty:
        print("datasets identical")
    else:
        print(d.to_string(index=False))
    ray.shutdown()


def cmd_checksum(args) -> None:
    """Order-independent dataset checksum (reference fold-based hash)."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .functions.hashing import commutative_checksum

    print(hex(commutative_checksum(rd.read_parquet(args.path))))
    ray.shutdown()


def cmd_verify_triples(args) -> None:
    """Post-condition check on a triples directory: unique (s,p,o) keys
    (reference entities.py:150-157 invariants)."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .functions.checks import assert_unique

    ds = rd.read_parquet(args.path)
    assert_unique(ds, ["subj", "pred", "obj"])
    print(f"OK: {ds.count()} triples, (subj, pred, obj) unique")
    ray.shutdown()


def cmd_check_oracles(args) -> None:
    """Pre-flight mirror of the driver's CORRECTNESS gate: run every
    registered query at --sf-dir, run its DuckDB oracle SQL, compare
    row count / schema dtypes / values (column-name-sorted, row-sorted
    — the driver's hash is equivalent), print one JSON summary line per
    query plus a final tally. Queries without oracle SQL are reported
    as rows-only."""
    import duckdb
    import pandas as pd

    ray = _ray_session(args.num_cpus)
    from .oracle_sketch import ensure_sketch_oracles
    from .oracle_tables import ensure_oracle_tables
    from .pipelines.queries import oracle_sql, queries
    from .synth import sf_from_dir

    ensure_oracle_tables(sf_from_dir(args.sf_dir))
    ensure_sketch_oracles(args.sf_dir)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{args.sf_dir}/{t}.parquet')")
    reg, sql = queries(), oracle_sql(args.sf_dir)
    only = set(args.only.split(",")) if args.only else None
    n_pass = n_fail = n_rows_only = 0
    for name in sorted(reg):
        if only and name not in only:
            continue
        try:
            res = reg[name](args.sf_dir)
            df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
            if name not in sql:
                n_rows_only += 1
                print(json.dumps({"q": name, "rows": len(df),
                                  "status": "rows_only"}))
                continue
            ora = con.execute(sql[name]).df()
            cols = sorted(df.columns)
            a = df[cols].sort_values(cols).reset_index(drop=True)
            b = ora[sorted(ora.columns)][cols].sort_values(cols)
            b = b.reset_index(drop=True)
            dtypes_ok = list(a.dtypes.astype(str)) == list(b.dtypes.astype(str))
            try:
                pd.testing.assert_frame_equal(a, b)
                values_ok = True
            except AssertionError:
                values_ok = False
            ok = len(a) == len(b) and dtypes_ok and values_ok
            n_pass += ok
            n_fail += not ok
            print(json.dumps({
                "q": name, "rows": len(a), "oracle_rows": len(b),
                "dtypes": dtypes_ok, "values": values_ok,
                "status": "pass" if ok else "FAIL",
            }))
        except Exception as e:  # noqa: BLE001 — per-query isolation
            n_fail += 1
            print(json.dumps({"q": name, "status": "ERROR",
                              "err": repr(e)[:200]}))
    print(json.dumps({"pass": n_pass, "fail": n_fail,
                      "rows_only": n_rows_only}))
    ray.shutdown()
    if n_fail:
        sys.exit(1)


def cmd_bench(args) -> None:
    import subprocess
    from pathlib import Path

    bench = Path(__file__).resolve().parent.parent / "bench.py"
    cmd = [sys.executable, str(bench)] + (["--scaling"] if args.scaling else [])
    out = subprocess.run(cmd, capture_output=True, text=True)
    print(out.stdout.strip().splitlines()[-1] if out.stdout.strip() else out.stderr[-500:])


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="kgdata_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build-triples", help="flagship transcripts->KG pipeline")
    b.add_argument("--sf", type=float, default=0.01)
    b.add_argument("--transcripts", help="existing transcript parquet dir "
                   "(default: synthesize at --sf)")
    b.add_argument("--out", required=True)
    b.add_argument("--workdir", help="checkpoint dir (enables stage resume)")
    b.add_argument("--linking", choices=["broadcast", "join"], default="broadcast")
    b.add_argument("--num-cpus", type=int)
    b.set_defaults(fn=cmd_build_triples)

    q = sub.add_parser("query", help="run a registered query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--out")
    q.add_argument("--num-cpus", type=int)
    q.set_defaults(fn=cmd_query)

    lq = sub.add_parser("list-queries", help="list registered queries")
    lq.set_defaults(fn=cmd_list_queries)

    ing = sub.add_parser("ingest-ndjson", help="ndjson parts -> parquet")
    ing.add_argument("--paths", required=True)
    ing.add_argument("--out", required=True)
    ing.add_argument("--num-cpus", type=int)
    ing.set_defaults(fn=cmd_ingest_ndjson)

    df = sub.add_parser("diff", help="diff two parquet dataset dirs by key")
    df.add_argument("--a", required=True)
    df.add_argument("--b", required=True)
    df.add_argument("--key", required=True)
    df.add_argument("--num-cpus", type=int)
    df.set_defaults(fn=cmd_diff)

    ck = sub.add_parser("checksum", help="order-independent dataset checksum")
    ck.add_argument("path")
    ck.add_argument("--num-cpus", type=int)
    ck.set_defaults(fn=cmd_checksum)

    vt = sub.add_parser("verify-triples", help="uniqueness post-conditions")
    vt.add_argument("path")
    vt.add_argument("--num-cpus", type=int)
    vt.set_defaults(fn=cmd_verify_triples)

    co = sub.add_parser("check-oracles",
                        help="run every query vs its DuckDB oracle")
    co.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    co.add_argument("--only", help="comma-separated query names")
    co.add_argument("--num-cpus", type=int)
    co.set_defaults(fn=cmd_check_oracles)

    be = sub.add_parser("bench", help="run bench.py")
    be.add_argument("--scaling", action="store_true")
    be.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
