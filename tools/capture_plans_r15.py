"""Capture .explain('formatted') for the round-15-touched queries.

Usage: python tools/capture_plans_r15.py <repo_root> <suffix> [out_dir]

Runs against the registry in <repo_root> (so the round-start worktree
captures the 'before' plans) and writes plans/r15/<name>_<suffix>.txt.
The distributed trainers' registered queries now return driver-folded
local frames, so for those the INTERNAL per-iteration frame is rebuilt
through the operator API and explained — the plan the timed work
actually runs (same convention as the r14 probe captures).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = sys.argv[1]
SUFFIX = sys.argv[2]
OUT = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/plans/r15"
SF = "/root/testdata/sf0.001"

sys.path.insert(0, REPO)

#: registered queries captured end-to-end
PLAIN = [
    "train_kmeans_distributed",
    "train_pq_distributed",
    "train_classifier_distributed",
    "basket_rules",
    "part_pagerank",
    "versioned_matview_refresh",
    "dedup_clusters",
    "dedup_pipeline",
    "retrieval_quality",
    "text_quality_classifier",
]


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def write(name: str, text: str) -> None:
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, f"{name}_{SUFFIX}.txt"), "w") as f:
        f.write(text)
    print("wrote", name)


def main() -> None:
    import __spark_entry__ as em
    from data_pipeline_zeal_spark.io import load_table
    from data_pipeline_zeal_spark.session import get_spark

    spark = get_spark(app_name=f"plans-r15-{SUFFIX}", shuffle_partitions=8)
    Q = em.queries()
    for name in PLAIN:
        spark.catalog.clearCache()
        try:
            write(name, explain_str(Q[name](spark, SF)))
        except Exception as e:  # noqa: BLE001
            write(name, f"CAPTURE FAILED: {e}")

    # internal per-iteration frames of the distributed trainers — the
    # plans the iteration jobs actually execute
    import numpy as np
    from pyspark.sql import functions as F

    from data_pipeline_zeal_spark.operators import similarity as S
    from data_pipeline_zeal_spark.operators import text as T
    from data_pipeline_zeal_spark.functions.vector import norm

    emb = load_table(spark, SF, "embeddings")
    docs = load_table(spark, SF, "documents")

    try:
        base = emb.select(
            "vec_id", S.as_double(F.col("embedding")).alias("v")
        )
        try:
            from data_pipeline_zeal_spark.io import (
                scale_partitions,
                with_min_parallelism,
            )

            X = with_min_parallelism(
                base, scale_partitions(base)
            ).localCheckpoint(eager=True)
            C = np.zeros((8, 64))
            it = X.select("v").mapInPandas(
                S._kmeans_partials_kernel(C, normalize=True),
                "cell int, n long, s array<double>",
            )
        except (ImportError, AttributeError):
            # round-start registry: JVM argmax + posexplode aggregate
            from data_pipeline_zeal_spark.io import with_min_parallelism
            from data_pipeline_zeal_spark.functions.vector import dot as _dot

            nrm = norm(F.col("v"))
            X = (
                with_min_parallelism(base)
                .withColumn(
                    "__nrm", F.when(nrm == 0, F.lit(1.0)).otherwise(nrm)
                )
                .select(
                    "vec_id",
                    F.transform("v", lambda x: x / F.col("__nrm")).alias("v"),
                )
                .localCheckpoint(eager=True)
            )
            C = np.zeros((8, 64))
            scored = F.array(
                *[
                    F.struct(
                        _dot(F.col("v"), F.lit([float(x) for x in c])).alias(
                            "d"
                        ),
                        F.lit(-j).alias("negcell"),
                    )
                    for j, c in enumerate(C)
                ]
            )
            cell = (-F.array_max(scored)["negcell"]).cast("int")
            it = (
                X.select(cell.alias("cell"), "v")
                .select("cell", F.posexplode("v"))
                .groupBy("cell", "pos")
                .agg(F.sum("col").alias("s"), F.count(F.lit(1)).alias("n"))
            )
        write("kmeans_iteration", explain_str(it))
    except Exception as e:  # noqa: BLE001
        write("kmeans_iteration", f"CAPTURE FAILED: {e}")

    try:
        pos = F.col("lang") == "en"
        try:
            labels = docs.select("doc_id", pos.cast("int").alias("y"))
            tf = (
                docs.select(
                    "doc_id",
                    F.explode(
                        __import__(
                            "data_pipeline_zeal_spark.functions.textfn",
                            fromlist=["tokens"],
                        ).tokens("text")
                    ).alias("tok"),
                )
                .select(
                    "doc_id", T._feature_expr(F.col("tok"), 4096).alias("feat")
                )
                .groupBy("doc_id", "feat")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            grouped = tf.groupBy("doc_id").agg(
                F.collect_list("feat").alias("feats"),
                F.collect_list("cnt").alias("cnts"),
            )
            doc_feats = (
                labels.join(grouped, "doc_id", "left")
                .select("y", "feats", "cnts")
                .localCheckpoint(eager=True)
            )
            it = doc_feats.mapInPandas(
                T._lr_partials_kernel(np.zeros(4096), 0.0, 4096),
                "gw array<double>, gb double",
            )
            write("classifier_iteration", explain_str(it))
        except AttributeError:
            write(
                "classifier_iteration",
                "round-start registry has no kernel; see the r14 "
                "sentinel-row join form in the before capture of "
                "train_classifier_distributed",
            )
    except Exception as e:  # noqa: BLE001
        write("classifier_iteration", f"CAPTURE FAILED: {e}")

    spark.stop()


if __name__ == "__main__":
    main()
