"""Deterministic K-fold scale-up of a testdata SF directory (r17, r16
verdict item 6: make the low/high-core scaling block measure COMPUTE, not
per-query job overhead — sf0.1 is too small for that, and no sf1 ships).

    python tools/gen_scale_data.py [--k 10] [--src /root/testdata/sf0.1] \
                                   [--out /tmp/sfscale1]

Each table is unioned K times with replica-shifted keys so joins stay
consistent (orders.o_custkey references the shifted customer keys, etc.).
Replicas are DECORRELATED where identity copies would create quadratic
blow-ups a real 10x corpus would not have:

- documents: every 3rd word (offset replica%3) gets a per-replica suffix,
  so word 3-gram shingles never match across replicas — near-dup pair
  counts grow linearly, as in a real crawl scale-up;
- embeddings: per-(replica, dim) deterministic sign flips — within-replica
  cosines (and therefore the near-dup cluster structure) are EXACTLY
  preserved, cross-replica vectors decorrelate;
- events keep their timestamps (per-day density grows with the corpus,
  which is what a bigger tenant looks like) and shift event/user ids.

Output is measurement data ONLY: nothing oracle-checked runs against it,
bench.py never reads it unless SPARK_GRAFT_SF_DIR points at it, and the
generator touches no query code.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

# (table, [key columns to shift by replica * stride])
_SHIFTS = {
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
    "events": {"event_id": 100_000, "user_id": 10_000},
    "customer": {"c_custkey": 15_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000, "l_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "supplier": {"s_suppkey": 1_000},
    # dimensions stay single-copy
    "nation": None,
    "region": None,
}


def _replica(df: DataFrame, table: str, r: int) -> DataFrame:
    shifts = _SHIFTS[table]
    out = df
    for col, stride in (shifts or {}).items():
        out = out.withColumn(col, F.col(col) + F.lit(r * stride))
    if table == "documents" and r > 0:
        off = r % 3
        words = F.split(F.col("text"), " ")
        perturbed = F.array_join(
            F.transform(
                words,
                lambda w, i: F.when(
                    i % 3 == F.lit(off), F.concat(w, F.lit(f"_r{r}"))
                ).otherwise(w),
            ),
            " ",
        )
        out = out.withColumn("text", perturbed)
    if table == "embeddings" and r > 0:
        flipped = F.transform(
            F.col("embedding"),
            lambda x, i: x
            * F.when(
                F.pmod(F.xxhash64(F.lit(r) * 4096 + i), 2) == 0, F.lit(-1.0)
            ).otherwise(F.lit(1.0)).cast("float"),
        )
        out = out.withColumn("embedding", flipped.cast("array<float>"))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sfscale1")
    args = ap.parse_args()

    from wp_motor_spark.session import get_spark

    spark = get_spark(app_name="gen_scale_data")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)
    for table in _SHIFTS:
        src = os.path.join(args.src, f"{table}.parquet")
        base = spark.read.parquet(src)
        if _SHIFTS[table] is None:
            scaled = base
        else:
            scaled = _replica(base, table, 0)
            for r in range(1, args.k):
                scaled = scaled.unionByName(_replica(base, table, r))
        # one file, like the source layout (the scan-parallelism question
        # is part of what the scaling run measures)
        tmp = os.path.join(args.out, f"__{table}")
        scaled.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            p for p in os.listdir(tmp) if p.endswith(".parquet")
        )
        os.replace(os.path.join(tmp, part), os.path.join(args.out, f"{table}.parquet"))
        import shutil

        shutil.rmtree(tmp)
        print(f"{table}: {base.count()} x {args.k if _SHIFTS[table] else 1} rows")
    spark.stop()


if __name__ == "__main__":
    main()
