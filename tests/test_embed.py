"""Embedding transforms: L2 normalization and distributed PCA.

PCA has no SQL oracle (eigendecomposition); these gates pin it against an
independent numpy recompute instead — the same role test_quality.py plays
for the sketch operators.
"""

from __future__ import annotations

import numpy as np
import pytest

from wp_motor_spark.operators import embed


def _toy(spark, n=40, d=6, seed=7):
    rng = np.random.RandomState(seed)
    # anisotropic cloud: variance concentrated in two known directions
    base = rng.randn(n, d) * np.array([5.0, 3.0, 0.5, 0.3, 0.2, 0.1])[:d]
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    return base, spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_l2_normalize_unit_norm_and_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], ["vec_id", "embedding"]
    )
    out = {r["vec_id"]: r for r in embed.normalize_embeddings(df).collect()}
    assert out[1]["l2_norm"] == pytest.approx(5.0)
    assert out[1]["unit"] == pytest.approx([0.6, 0.8])
    # zero vector maps to zero, not NaN
    assert out[2]["l2_norm"] == 0.0
    assert out[2]["unit"] == [0.0, 0.0]


def test_gram_pass_matches_numpy(spark):
    X, df = _toy(spark)
    g, s, n = embed._gram_and_mean(df, "embedding", X.shape[1])
    assert n == len(X)
    np.testing.assert_allclose(g, X.T @ X, rtol=1e-9)
    np.testing.assert_allclose(s, X.sum(axis=0), rtol=1e-9)


def test_pca_components_match_numpy_eigh(spark):
    X, df = _toy(spark)
    comps, evals, mean = embed.pca_components(df, k=3, dim=X.shape[1])
    # orthonormal rows
    np.testing.assert_allclose(comps @ comps.T, np.eye(3), atol=1e-9)
    # eigenvalues descending and equal to numpy's covariance spectrum
    ref = np.linalg.eigvalsh(np.cov(X, rowvar=False))[::-1][:3]
    np.testing.assert_allclose(evals, ref, rtol=1e-9)
    assert evals[0] >= evals[1] >= evals[2]
    # variance concentrates where we injected it: top-2 capture >90%
    total = np.trace(np.cov(X, rowvar=False))
    assert evals[:2].sum() / total > 0.9


def test_pca_project_matches_driver_recompute(spark):
    X, df = _toy(spark)
    comps, _, mean = embed.pca_components(df, k=3, dim=X.shape[1])
    got = {
        r["vec_id"]: np.asarray(r["pc"])
        for r in embed.pca_project(df, k=3, dim=X.shape[1]).collect()
    }
    want = (X - X.mean(axis=0)) @ comps.T
    for i in range(len(X)):
        np.testing.assert_allclose(got[i], want[i], rtol=1e-8, atol=1e-10)


def test_pca_sign_convention_deterministic(spark):
    X, df = _toy(spark)
    c1, _, _ = embed.pca_components(df, k=2, dim=X.shape[1])
    c2, _, _ = embed.pca_components(df, k=2, dim=X.shape[1])
    np.testing.assert_array_equal(c1, c2)
    for row in c1:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_int8_quantization_bounds_and_recall(spark):
    X, df = _toy(spark, n=60, d=6, seed=13)
    from pyspark.sql import functions as F

    from wp_motor_spark.operators import similarity

    q = embed.quantize_embeddings(df)
    rows = {r["vec_id"]: r for r in q.collect()}
    for i in range(len(X)):
        r = rows[i]
        assert all(-127 <= int(v) <= 127 for v in r["qvec"])
        recon = np.array([int(v) * r["scale"] for v in r["qvec"]])
        # per-component error bounded by half a quantization step
        assert np.max(np.abs(recon - X[i])) <= r["scale"] / 2 + 1e-12
    # recall@5 of quantized search vs exact float search
    queries = df.where(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(df, queries, k=5).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in embed.quantized_topk(df, queries, k=5).collect()
    }
    assert len(got & exact) / len(exact) >= 0.9
