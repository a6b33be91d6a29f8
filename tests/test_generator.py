"""Synthetic-embedding generator: fixture-shape parity, determinism
under arbitrary partitioning, isotropic geometry (the scale-law probe
behind tools/linearity_curve.py)."""

from __future__ import annotations


def test_generate_embeddings_matches_fixture_shape(spark):
    """Synthetic embeddings must match the fixture schema/geometry and be
    deterministic under any partitioning (scale-law probe contract)."""
    from data_pipeline_zeal_spark.sources.generator import generate_embeddings

    df = generate_embeddings(spark, 200, num_partitions=5)
    assert df.schema.simpleString() == (
        "struct<vec_id:bigint,embedding:array<float>,label:int>"
    )
    rows = df.orderBy("vec_id").collect()
    assert [r.vec_id for r in rows] == list(range(200))
    assert all(len(r.embedding) == 64 for r in rows)
    assert all(0 <= r.label <= 9 for r in rows)
    again = generate_embeddings(spark, 200, num_partitions=1).orderBy("vec_id").collect()
    assert rows == again
    # isotropic standard normals: mean ~0, var ~1 over 200x64 draws
    import numpy as np

    arr = np.array([r.embedding for r in rows])
    assert abs(arr.mean()) < 0.05 and abs(arr.std() - 1.0) < 0.05
