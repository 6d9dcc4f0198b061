"""Distributed Bloom filter: no false negatives, FPR near target, and
the bloom-prefiltered incremental dedup agrees exactly with the plain
anti-join version."""

from __future__ import annotations

from pyspark.sql import functions as F

from wp_motor_spark.operators import bloom, dedup


def test_bloom_no_false_negatives_and_fpr(spark):
    seen = spark.range(0, 3000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("d")
    )
    bf = bloom.bloom_build(seen, "d", n_expected=3000, fpp=0.01)
    assert bloom.bloom_filter_rows(seen, "d", bf, keep_hits=True).count() == 3000
    fresh = spark.range(100000, 115000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("d")
    )
    fp = bloom.bloom_filter_rows(fresh, "d", bf, keep_hits=True).count()
    assert fp / 15000 < 0.03  # target fpp=0.01, generous noise margin
    # the two partitions of a probe are a partition of the input
    miss = bloom.bloom_filter_rows(fresh, "d", bf, keep_hits=False).count()
    assert fp + miss == 15000


def test_bloom_probe_matches_numpy_reference(spark):
    import numpy as np

    seen = spark.range(0, 500).select(F.concat(F.lit("x"), F.col("id")).alias("d"))
    bf = bloom.bloom_build(seen, "d", n_expected=500, fpp=0.05)
    # every set bit index must be < m, words packed length m/64
    assert len(bf.words) == bf.m // 64
    assert int(np.sum([bin(int(w)).count("1") for w in bf.words])) <= 500 * bf.k


def test_incremental_dedup_bloom_agrees_with_exact(spark):
    docs = [(i, f"text number {i % 40}") for i in range(100)]  # heavy dups
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    batch = df.where("doc_id % 2 = 1")
    seen = df.where("doc_id % 2 = 0")
    plain = {r["doc_id"] for r in dedup.incremental_dedup(batch, seen).collect()}
    bloomed = {
        r["doc_id"]
        for r in dedup.incremental_dedup_bloom(
            batch, seen, n_expected=100, fpp=0.01
        ).collect()
    }
    assert plain == bloomed
