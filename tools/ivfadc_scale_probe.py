"""Measure the IVFADC cell-growth law (round-8): recall and scanned
fraction for ``similarity.ivf_pq_topk`` with FIXED cells vs
``n_cells="auto"`` (the faiss sqrt(n) rule), on CLUSTERED synthetic
embeddings — the real ANN geometry, where recall concentrates in the
query's own cells — across a decade of corpus sizes.

The claim under test: with fixed cells the scanned fraction is constant
(nprobe/n_cells — linear absolute bytes as the corpus grows), while
sqrt(n) growth shrinks it toward zero WITHOUT losing recall on
clustered data.  The isotropic fixture cannot show this (there, recall
≈ scanned fraction by construction); the clustered generator mode
exists exactly for this probe.

Deterministic end-to-end (hash-derived data, hash-ordered trainers) —
re-run to reproduce the SCALE.md table verbatim:

    python tools/ivfadc_scale_probe.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_zeal_spark.session import get_spark  # noqa: E402
from data_pipeline_zeal_spark.operators import similarity  # noqa: E402
from data_pipeline_zeal_spark.sources.generator import (  # noqa: E402
    generate_embeddings,
)

SIZES = [2_000, 20_000]
K = 10
NPROBE = 6


def main() -> None:
    spark = get_spark(app_name="ivfadc-scale-probe")
    print("| n | cells | scanned frac | recall@10 |")
    print("|---|---|---|---|")
    for n in SIZES:
        emb = generate_embeddings(
            spark, n, clusters=max(8, round(n ** 0.5)), cluster_scale=1.0
        ).cache()
        emb.count()
        qids = [r.vec_id for r in emb.orderBy("vec_id").limit(10).collect()]
        exact = {
            (r.query_id, r.vec_id)
            for r in similarity.cosine_topk(emb, qids, k=K).collect()
        }
        for cells in (8, "auto"):
            resolved = (
                similarity.auto_n_cells(n) if cells == "auto" else cells
            )
            got = {
                (r.query_id, r.vec_id)
                for r in similarity.ivf_pq_topk(
                    emb, qids, k=K, n_cells=cells, nprobe=NPROBE
                ).collect()
            }
            recall = len(got & exact) / len(exact)
            frac = min(1.0, NPROBE / resolved)
            print(
                f"| {n} | {resolved}{' (auto)' if cells == 'auto' else ''} "
                f"| {frac:.3f} | {recall:.3f} |"
            )
        emb.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
