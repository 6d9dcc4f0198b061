"""Distributed Bloom filter build + probe for membership pre-filtering.

The use case: dedupe an unbounded stream/batch against a corpus whose
digest set no longer fits an executor (where AQE's broadcast anti-join
gives up). A Bloom filter of 10^9 digests at 1% FPP is ~1.2 GB of bits —
broadcastable — and filters out the overwhelmingly-new rows for the cost
of two hashes, leaving only probable-hits for the exact anti-join.

Spark 4 doesn't expose `bloom_filter_agg`/`might_contain` as SQL
functions (they're internal to runtime join filtering), so this builds
the filter with plain DataFrame ops:

- build: each value contributes k bit positions via double hashing
  (Kirsch-Mitzenmacher: idx_i = h1 + i*h2 mod m — two xxhash64 calls,
  all JVM); positions explode to (word, mask) rows and reduce with ONE
  `bit_or` aggregation — partial aggregation combines map-side, the
  shuffle carries at most m/64 rows per partition regardless of corpus
  size, and the driver collects exactly the packed filter.
- probe: rows carry only (h1, h2); an Arrow-batched numpy kernel
  recomputes the k positions against the broadcast bit array. No Python
  in the build path; the probe is vectorized and stateless.

All arithmetic is modular BEFORE any multiply so ANSI mode can't
overflow (i * (h2 mod m) <= k*m << 2^63).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


@dataclass
class BloomFilter:
    words: np.ndarray  # uint64 packed bits, little-endian bit order
    m: int  # number of bits
    k: int  # number of hash functions

    def might_contain_np(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Vectorized membership test on precomputed hash pairs."""
        a = np.mod(h1, self.m)  # python-style mod: result in [0, m)
        b = np.mod(h2, self.m)
        out = np.ones(len(h1), dtype=bool)
        for i in range(self.k):
            idx = (a + i * b) % self.m
            word = idx >> 6
            bit = (idx & 63).astype(np.uint64)
            out &= (self.words[word] >> bit) & np.uint64(1) != 0
        return out


def _params(n_expected: int, fpp: float) -> tuple[int, int]:
    m = max(64, int(-n_expected * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 63) // 64 * 64
    k = max(1, round(m / n_expected * math.log(2))) if n_expected else 1
    return m, min(k, 16)


def _hash_pair(col: Column) -> tuple[Column, Column]:
    return F.xxhash64(col), F.xxhash64(col, F.lit(1))


def bloom_build(
    df: DataFrame,
    col: str,
    n_expected: int,
    fpp: float = 0.01,
    m: int | None = None,
    k: int | None = None,
) -> BloomFilter:
    """Explicit (m, k) override exists for incremental merging: filters
    OR-merge only when built with identical geometry."""
    if m is None or k is None:
        m, k = _params(n_expected, fpp)
    h1, h2 = _hash_pair(F.col(col))
    a = F.pmod(h1, F.lit(m))
    b = F.pmod(h2, F.lit(m))
    idx = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: F.pmod(a + i.cast("bigint") * b, F.lit(m)),
        )
    ).alias("idx")
    words = (
        df.select(idx)
        .select(
            F.expr("idx div 64").alias("word"),
            # shiftleft() the builtin needs a literal count — expr form
            # accepts a column count
            F.expr("shiftleft(1L, cast(idx % 64 as int))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    packed = np.zeros(m // 64, dtype=np.uint64)
    for r in words:
        packed[r["word"]] = np.uint64(r["bits"] & 0xFFFFFFFFFFFFFFFF)
    return BloomFilter(words=packed, m=m, k=k)


def bloom_filter_rows(
    df: DataFrame, col: str, bloom: BloomFilter, keep_hits: bool = True
) -> DataFrame:
    """Keep the rows whose `col` is (probably) in the filter — or, with
    keep_hits=False, the rows that are DEFINITELY NOT in it (no false
    negatives). The filter ships to executors once via closure broadcast;
    per-row cost is two JVM hashes + a vectorized bit probe."""
    # SNAPSHOT the bit array: the closure ships to executors and may be
    # re-evaluated arbitrarily late (task retries, lineage recompute after
    # cache eviction) — a caller that keeps mutating the filter (the
    # streaming accumulator) must not change answers retroactively
    bf = BloomFilter(words=bloom.words.copy(), m=bloom.m, k=bloom.k)
    h1, h2 = _hash_pair(F.col(col))
    tagged = df.withColumn("__h1", h1).withColumn("__h2", h2)

    def probe(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            hit = bf.might_contain_np(
                pdf["__h1"].to_numpy(np.int64), pdf["__h2"].to_numpy(np.int64)
            )
            yield pdf[hit] if keep_hits else pdf[~hit]

    out = tagged.mapInPandas(probe, schema=tagged.schema)
    return out.drop("__h1", "__h2")
