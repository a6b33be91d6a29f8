"""Command-line surface: ``python -m data_pipeline_zeal_spark <cmd>``.

The reference ships as runnable services (producer / processor / API —
reference ``producer/src/main.py``, ``processor/src/main.py``,
``api/src/main.py``); this engine's equivalent is one CLI over the same
capabilities:

  list                       show every registered query (oracle-backed?)
  query NAME [--sf-dir DIR]  run one registered query, print rows
  sql "SELECT ..."           ad-hoc ANSI SQL over the fixture tables
  generate N --out PATH      producer role: synthesize N wire-format
                             JSONL events (feed them to the streaming
                             pipeline or load_wire_events)
  serve [--port P]           API role: aggregate the fixture events and
                             serve the reference's REST query routes

``python bench.py`` times the headline suite;
``python examples/run_local_pipeline.py`` runs the full
producer→processor→API lifecycle in one process.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _entry_module():
    """Import the driver-contract module (repo root, one level above the
    package) — it owns the query registry."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if root not in sys.path:
        sys.path.insert(0, root)
    import __spark_entry__ as em

    return em


def _rows_out(df, limit: int, as_json: bool) -> None:
    if as_json:
        for r in df.limit(limit).collect():
            print(json.dumps(r.asDict(recursive=True), default=str))
    else:
        df.show(limit, truncate=False)


def cmd_list(_args) -> int:
    em = _entry_module()
    oracles = set(em.oracle_sql())
    for name in sorted(em.queries()):
        print(f"{name:36s} {'oracle' if name in oracles else 'rows-only'}")
    return 0


def cmd_query(args) -> int:
    em = _entry_module()
    q = em.queries()
    if args.name not in q:
        print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
        return 2
    from .session import get_spark

    spark = get_spark(app_name=f"cli-{args.name}")
    _rows_out(q[args.name](spark, args.sf_dir), args.limit, args.json)
    spark.stop()
    return 0


def cmd_sql(args) -> int:
    from .io import sql
    from .session import get_spark

    spark = get_spark(app_name="cli-sql")
    _rows_out(sql(spark, args.sf_dir, args.statement), args.limit, args.json)
    spark.stop()
    return 0


def cmd_generate(args) -> int:
    from pyspark.sql import functions as F

    from .session import get_spark
    from .sources.generator import generate_events

    spark = get_spark(app_name="cli-generate")
    events = generate_events(spark, args.n, num_users=args.users)
    events.select(
        F.to_json(F.struct(*[F.col(c) for c in events.columns])).alias("value")
    ).write.mode("overwrite").text(args.out)
    print(f"wrote {args.n} wire-format events to {args.out}")
    spark.stop()
    return 0


def cmd_serve(args) -> int:
    """API role (reference ``api/src/main.py``): aggregate the fixture
    events and serve the REST query surface over the result."""
    from .api_http import QueryApiServer
    from .io import load_table
    from .operators.hourly import aggregate_events
    from .session import get_spark

    spark = get_spark(app_name="cli-serve")
    agg = aggregate_events(load_table(spark, args.sf_dir, "events")).cache()
    agg.count()  # materialize once before the first request
    srv = QueryApiServer(agg, port=args.port).start()
    print(f"serving on http://127.0.0.1:{srv.port}")
    rc = 0
    if args.smoke:
        import urllib.request

        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/health", timeout=10
        ) as r:
            ok = json.loads(r.read()) == {"status": "healthy"}
        print("smoke:", "ok" if ok else "FAILED")
        rc = 0 if ok else 1
    else:  # pragma: no cover - interactive serving loop
        import time

        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            pass
    srv.stop()
    agg.unpersist()
    return rc


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m data_pipeline_zeal_spark",
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries").set_defaults(fn=cmd_list)

    def _common(sp):
        sp.add_argument(
            "--sf-dir",
            default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
            help="fixture directory (default $SPARK_GRAFT_SF_DIR)",
        )
        sp.add_argument("--limit", type=int, default=20, help="max rows to print")
        sp.add_argument(
            "--json", action="store_true", help="JSONL output instead of a table"
        )

    qp = sub.add_parser("query", help="run one registered query")
    qp.add_argument("name")
    _common(qp)
    qp.set_defaults(fn=cmd_query)

    sp = sub.add_parser("sql", help="ad-hoc SQL over the fixture tables")
    sp.add_argument("statement")
    _common(sp)
    sp.set_defaults(fn=cmd_sql)

    vp = sub.add_parser("serve", help="serve the REST query surface")
    vp.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    vp.add_argument("--port", type=int, default=0)
    vp.add_argument(
        "--smoke", action="store_true",
        help="probe /health once and exit (for tests/CI)",
    )
    vp.set_defaults(fn=cmd_serve)

    gp = sub.add_parser("generate", help="synthesize wire-format JSONL events")
    gp.add_argument("n", type=int)
    gp.add_argument("--out", required=True)
    gp.add_argument("--users", type=int, default=200)
    gp.set_defaults(fn=cmd_generate)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
