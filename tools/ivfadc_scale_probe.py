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

    python tools/ivfadc_scale_probe.py          # cell-growth law
    python tools/ivfadc_scale_probe.py rank     # cell-RANKING crossover
                                                # (r11 verdict directive #2)
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


def rank_crossover() -> None:
    """Driver-side cell-ranking cost: the exact interpreted _dot_lr fold
    vs the numpy matmul path of ann_index._rank_cells, at model sizes up
    to the n_cells="auto" regime (sqrt(100 TB / row) ~ 10^4-10^5 cells).
    No Spark needed — the loop under test runs on the driver.  Also
    asserts both paths produce IDENTICAL nprobe shortlists on every
    measured size (the seeded geometry has no near-ties; the parity pin
    for near-tie behavior lives in tests/test_ivfadc_index.py)."""
    import random
    import time

    from data_pipeline_zeal_spark.operators import ann_index

    rng = random.Random(0xCE11)
    dim, n_q, nprobe = 64, 64, 8
    print("| n_cells | queries | exact fold | numpy | speedup |")
    print("|---|---|---|---|---|")
    for n_cells in (32, 256, 1024, 4096, 16384):
        cents = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_cells)]
        qvecs = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_q)]
        import math as m

        cnorms = [m.sqrt(ann_index._dot_lr(c, c)) for c in cents]
        t0 = time.perf_counter()
        exact = ann_index._rank_cells(qvecs, cents, cnorms, nprobe, "exact")
        t_exact = time.perf_counter() - t0
        t0 = time.perf_counter()
        vec = ann_index._rank_cells(qvecs, cents, cnorms, nprobe, "numpy")
        t_vec = time.perf_counter() - t0
        assert exact == vec, f"shortlist mismatch at n_cells={n_cells}"
        print(
            f"| {n_cells} | {n_q} | {t_exact*1000:.1f} ms "
            f"| {t_vec*1000:.2f} ms | {t_exact/t_vec:.0f}x |"
        )


if __name__ == "__main__":
    import sys as _sys

    if len(_sys.argv) > 1 and _sys.argv[1] == "rank":
        rank_crossover()
    else:
        main()
