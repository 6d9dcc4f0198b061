"""Embedding-column transforms: L2 normalization and distributed PCA.

Extensions beyond the reference surface (BASELINE.json north star): an
embedding corpus usually needs (a) unit-norm vectors before any cosine
machinery and (b) dimensionality reduction before clustering/ANN when the
raw dim is large. Both stay DataFrame-native:

- `l2_normalize`: pure JVM array expressions (`transform`/`aggregate`) —
  map-only, no UDF, oracle-checkable in DuckDB list functions.
- `pca_project`: the classic two-pass distributed PCA. Pass 1 reduces the
  corpus to a d×d Gram matrix + mean via ONE aggregation (partial
  combine map-side: each partition ships d² floats, not its rows); the
  eigendecomposition of the tiny d×d matrix runs on the driver in numpy
  (d ≤ a few hundred — microseconds); pass 2 projects every row against
  the broadcast component matrix with an Arrow-batched GEMM. At 100 TB
  the driver never sees more than d² doubles, and both passes are full
  scans with no shuffle beyond the d²-sized aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import ArrayType, DoubleType

from wp_motor_spark.operators.similarity import norm


def l2_normalize(vec: Column, eps: float = 1e-12) -> Column:
    """Unit-norm array<double>; the zero vector maps to itself (norm
    clamped at `eps`) instead of NaNs."""
    n = F.greatest(norm(vec), F.lit(float(eps)))
    return F.transform(vec, lambda x: x.cast("double") / n)


def normalize_embeddings(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, norm, unit) — original L2 norm plus the normalized vector."""
    v = F.col(vec_col)
    return df.select(
        F.col(id_col),
        F.round(norm(v), 6).alias("l2_norm"),
        F.transform(l2_normalize(v), lambda x: F.round(x, 6)).alias("unit"),
    )


def _gram_and_mean(
    df: DataFrame, vec_col: str, dim: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """One distributed pass → (sum of outer products, column sums, n).

    The flattened outer product is built with JVM array expressions
    (`flatten(transform(v, x -> transform(v, y -> x*y)))`) and summed
    element-wise by `array_agg`-free aggregate: we explode to (idx, val)?
    No — that would shuffle d² rows per document. Instead each partition's
    pandas batch computes Xᵀ X locally (Arrow in, d² doubles out) and only
    those partials are reduced.
    """
    d2 = dim * dim

    def part(batches):
        g = np.zeros((dim, dim), dtype=np.float64)
        s = np.zeros(dim, dtype=np.float64)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack(pdf["v"].to_numpy())
            g += X.T @ X
            s += X.sum(axis=0)
            n += len(X)
        # flat layout: g occupies [0, d²), s occupies [d², d²+d), n at d²+d
        flat = np.concatenate([g.reshape(d2), s, [float(n)]])
        yield pd.DataFrame({"idx": np.arange(d2 + dim + 1), "val": flat})

    # reduce as (idx, val) rows: partial aggregation combines map-side, the
    # shuffle carries ≤ d²+d+1 rows per partition regardless of corpus
    # size, and the driver collects exactly d²+d+1 summed cells — no
    # single-row giant array, no collect_list. (A 512-dim corpus on 10⁵
    # partitions still shuffles only ~26 GB spread over 32 reducers and
    # lands 262k doubles on the driver.)
    parts = df.select(F.col(vec_col).cast("array<double>").alias("v")).mapInPandas(
        part, schema="idx long, val double"
    )
    cells = parts.groupBy("idx").agg(F.sum("val").alias("v")).collect()
    flat = np.zeros(d2 + dim + 1, dtype=np.float64)
    for r in cells:
        flat[r["idx"]] = r["v"]
    g = flat[:d2].reshape(dim, dim)
    s = flat[d2 : d2 + dim]
    return g, s, int(flat[-1])


def pca_components(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None, k: int = 8
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(components[k,d], explained_variance[k], mean[d]) from the Gram
    pass. Deterministic sign convention: each component's
    largest-|coefficient| entry is made positive, so runs and platforms
    agree bit-for-bit down to LAPACK rounding."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    g, s, n = _gram_and_mean(df, vec_col, dim)
    mean = s / n
    cov = (g - np.outer(mean, s) - np.outer(s, mean) + n * np.outer(mean, mean)) / (
        n - 1
    )
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, evals[order], mean


def pca_project(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """(id, pc: array<double>[k]) — centered projection onto the top-k
    principal components. Components are broadcast via closure (k×d
    doubles); the projection is an Arrow-batched GEMM per partition."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    comps, _, mean = pca_components(df, vec_col=vec_col, dim=dim, k=k)
    comps_b = comps.copy()
    mean_b = mean.copy()

    def proj(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack(pdf["v"].to_numpy()) - mean_b
            P = X @ comps_b.T
            yield pd.DataFrame({"id": pdf["id"], "pc": list(P)})

    out = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    ).mapInPandas(proj, schema="id long, pc array<double>")
    return out.select(F.col("id").alias(id_col), "pc")


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: (id, scale, qvec) with
    qvec[i] = round(v[i] / scale), scale = max|v| / 127. A 4x memory cut
    for ANN corpora (the difference between an in-memory index and a
    spilling one at 10^9 x 768 dims); reconstruction error is bounded by
    scale/2 per component. Pure JVM array expressions, map-only."""
    v = F.col(vec_col)
    amax = F.greatest(
        F.array_max(F.transform(v, lambda x: F.abs(x.cast("double")))),
        F.lit(1e-12),
    )
    scale = (amax / 127.0).alias("scale")
    qvec = F.transform(
        v, lambda x: F.round(x.cast("double") / (amax / 127.0), 0).cast("tinyint")
    ).alias("qvec")
    return df.select(F.col(id_col), scale, qvec)


def dequantize(scale: Column, qvec: Column) -> Column:
    return F.transform(qvec, lambda q: q.cast("double") * scale)


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k over the INT8 corpus: the corpus scan
    reads (id, scale, qvec) — a quarter of the float traffic — and the
    dot products run on dequantized values against the broadcast float
    queries. Same plan shape as brute_force_topk; recall gate lives in
    tests/test_embed.py."""
    from pyspark.sql import Window

    from wp_motor_spark.operators.similarity import cosine

    q = quantize_embeddings(corpus, vec_col=vec_col, id_col=id_col)
    c = q.select(
        F.col(id_col).alias("neighbor_id"),
        dequantize(F.col("scale"), F.col("qvec")).alias("__cv"),
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__qv"),
    )
    scored = c.join(F.broadcast(qs), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id", "neighbor_id", cosine(F.col("__qv"), F.col("__cv")).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def zca_whiten(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    eps: float = 1e-5,
) -> DataFrame:
    """ZCA whitening (Kessy et al. 2018, "Optimal whitening and
    decorrelation"): W = U diag(1/sqrt(λ+eps)) Uᵀ from the covariance
    eigendecomposition — the unique whitening transform closest to the
    identity, the standard pre-step before cosine retrieval / linear
    probes when embedding dimensions are correlated.

    Scale shape: covariance comes from the SAME single-pass partial-Gram
    reduction PCA uses (`_gram_and_mean` — d×d floats per partition, one
    driver-side sum; no shuffle of the vectors themselves), the d×d
    eigendecomposition is driver-side (d is the embedding width, not the
    corpus), and the whitening GEMM is a map-only Arrow batch per
    partition with W broadcast via closure. Gate (tests/test_quality.py,
    QUALITY_r{N}): the whitened corpus covariance is the identity within
    tolerance."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    g, s, n = _gram_and_mean(df, vec_col, dim)
    mean = s / n
    cov = (g - np.outer(mean, s) - np.outer(s, mean) + n * np.outer(mean, mean)) / (
        n - 1
    )
    evals, evecs = np.linalg.eigh(cov)
    w = evecs @ np.diag(1.0 / np.sqrt(np.maximum(evals, 0.0) + eps)) @ evecs.T
    mean_b, w_b = mean.copy(), w.copy()

    def apply(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf["v"].to_numpy()) - mean_b
            yield pd.DataFrame({"id": pdf["id"], "white": list(x @ w_b)})

    return (
        df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .mapInPandas(apply, schema="id long, white array<double>")
        .select(F.col("id").alias(id_col), "white")
    )
