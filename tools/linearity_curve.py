"""Three-decade candidate-volume scale law for the embedding near-dup
paths (round-7 directive #3).

Measures, at threshold 0.4 over isotropic 64-dim embeddings:

* **cells** (IVF-cell blocking, adaptive ``n_cells = n/8``, nassign 4):
  candidate pairs PER VECTOR — the claim is this stays ~constant as n
  grows (O(n·cell) total volume).
* **lsh** (solved band layout for the threshold, 754x13): candidate
  pairs as a FRACTION of all C(n,2) pairs — the claim is this stays a
  ~constant fraction (i.e. quadratic total volume; why `auto` routes
  low thresholds to cells).

Points: the sf0.01 fixture (n=500), the sf0.1 fixture (n=2 000), and a
synthesized 20 000-vector set from ``generator.generate_embeddings`` —
same geometry (hash-derived isotropic normals), one decade past sf0.1.

Run:  python tools/linearity_curve.py            (~2-4 min on local[32])
Output: one JSON line per point + a final summary line; paste the table
into SCALE.md.  Deterministic end-to-end (hash-derived vectors, hash-
ordered k-means sample, argmax assignment, solved layout).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_pipeline_zeal_spark.functions.vector import as_double  # noqa: E402
from data_pipeline_zeal_spark.io import load_table  # noqa: E402
from data_pipeline_zeal_spark.operators import dedup  # noqa: E402
from data_pipeline_zeal_spark.operators.similarity import (  # noqa: E402
    derive_band_layout,
)
from data_pipeline_zeal_spark.session import get_spark  # noqa: E402
from data_pipeline_zeal_spark.sources.generator import (  # noqa: E402
    generate_embeddings,
)

THRESHOLD = 0.4
NASSIGN = 4
SYNTH_N = 20_000


def measure(spark, name: str, emb) -> dict:
    e = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    n = e.count()
    all_pairs = n * (n - 1) // 2

    n_cells = max(8, n // 8)
    t0 = time.perf_counter()
    cells_cand = dedup.cell_candidate_pairs(
        e, n_cells=n_cells, nassign=NASSIGN
    ).count()
    cells_sec = time.perf_counter() - t0

    bands, planes, predicted_bg = derive_band_layout(
        THRESHOLD, background=max(-0.99, min(0.0, THRESHOLD - 0.1))
    )
    t0 = time.perf_counter()
    lsh_cand = dedup.lsh_candidate_pairs(e, bands, planes).count()
    lsh_sec = time.perf_counter() - t0

    point = {
        "point": name,
        "n": n,
        "all_pairs": all_pairs,
        "cells": {
            "n_cells": n_cells,
            "nassign": NASSIGN,
            "candidates": cells_cand,
            "per_vector": round(cells_cand / n, 1),
            "fraction_of_pairs": round(cells_cand / all_pairs, 4),
            "sec": round(cells_sec, 1),
        },
        "lsh": {
            "layout": f"{bands}x{planes}",
            "predicted_bg": round(predicted_bg, 4),
            "candidates": lsh_cand,
            "per_vector": round(lsh_cand / n, 1),
            "fraction_of_pairs": round(lsh_cand / all_pairs, 4),
            "sec": round(lsh_sec, 1),
        },
    }
    print(json.dumps(point), flush=True)
    return point


def main() -> None:
    spark = get_spark(app_name="linearity-curve")
    points = [
        measure(
            spark, "sf0.01", load_table(spark, "/root/testdata/sf0.01", "embeddings")
        ),
        measure(
            spark, "sf0.1", load_table(spark, "/root/testdata/sf0.1", "embeddings")
        ),
        measure(
            spark,
            f"synth{SYNTH_N}",
            generate_embeddings(spark, SYNTH_N, num_partitions=32),
        ),
    ]
    print(
        json.dumps(
            {
                "threshold": THRESHOLD,
                "cells_per_vector": [p["cells"]["per_vector"] for p in points],
                "lsh_fraction": [p["lsh"]["fraction_of_pairs"] for p in points],
                "n": [p["n"] for p in points],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
