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


def test_clustered_embeddings_deterministic_and_structured(spark):
    """clusters=k mode: deterministic under repartitioning, labels carry
    the cluster id, and same-cluster cosine dominates cross-cluster —
    the structure the IVFADC scale probe relies on."""
    import numpy as np

    from data_pipeline_zeal_spark.sources.generator import generate_embeddings

    a = generate_embeddings(spark, 200, clusters=5).orderBy("vec_id").collect()
    b = (
        generate_embeddings(spark, 200, clusters=5, num_partitions=7)
        .orderBy("vec_id")
        .collect()
    )
    assert a == b  # partitioning-independent
    X = np.array([r.embedding for r in a], dtype=np.float64)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    lab = np.array([r.label for r in a])
    assert set(lab) <= set(range(5))
    S = X @ X.T
    same = S[lab[:, None] == lab[None, :]].mean()
    diff = S[lab[:, None] != lab[None, :]].mean()
    assert same > diff + 0.2, (same, diff)
