"""Scale utilities: skew salting and bucketed co-located joins.

These are the two knobs the 100TB design reaches for when AQE alone
isn't enough (SCALE.md):

- `salted_join`: a hot key (one device spamming logs, one null-ish id)
  overloads a single shuffle partition in a non-broadcastable join.
  Salting replicates the SMALL side `salt_n` times and scatters the big
  side uniformly, so the hot key spreads over `salt_n` partitions.
  (AQE's skew-join split handles sort-merge cases; salting is the
  explicit, planner-independent form that also fixes aggregations.)
- `two_phase_agg`: partial aggregation on (key, salt), then final on key.
  Spark's hash aggregate already does map-side partials for sums/counts;
  the explicit form matters for `collect_set`/`approx_count_distinct`-
  style aggs where one key's state would otherwise concentrate.
- `write_bucketed` / `bucketed_table`: pre-shuffle fact tables on their
  join key at write time; repeated joins on that key then run with NO
  exchange on either side (bucket-local).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join on `key` with the big side's hot keys scattered over `salt_n`
    sub-keys. `small` is replicated salt_n times (use only when it's too
    big to broadcast but small enough to replicate)."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1))).alias("__salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_n))
    )
    out = big_salted.join(small_rep, [key, "__salt"], how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    agg_col: str,
    salt_n: int = 32,
) -> DataFrame:
    """Skew-safe distinct-collect: partial collect_set on (keys, salt),
    then merge — one hot key's set is built by salt_n tasks, not one."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(agg_col)), F.lit(salt_n))
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        F.collect_set(agg_col).alias("__part")
    )
    return (
        partial.groupBy(*keys)
        .agg(F.array_distinct(F.flatten(F.collect_list("__part"))).alias(f"{agg_col}_set"))
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist `df` bucketed+sorted by `key`: joins/aggs on `key` against
    other tables bucketed the same way need no exchange at read time."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key).sortBy(key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_partitioned_layout(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    target_files_per_partition: int = 1,
) -> None:
    """Write with query-aware physical layout: hive-style directory
    partitioning on `partition_cols` (equality predicates on them become
    partition PRUNING — the scan never lists, opens, or reads excluded
    directories) plus optional `sort_cols` clustering inside each file
    (tightens parquet min/max page stats, so range predicates skip row
    groups).

    The repartition before the write is what makes the layout real at
    scale: without it every task writes a sliver into every partition
    directory (tasks x partitions tiny files — the classic small-file
    explosion); repartitioning by the partition columns sends each
    directory's data to `target_files_per_partition` tasks, and
    `sortWithinPartitions` then clusters rows inside the files.
    """
    parted = df.repartition(
        *[F.col(c) for c in partition_cols]
    ) if target_files_per_partition == 1 else df.repartition(
        target_files_per_partition * 8, *[F.col(c) for c in partition_cols]
    )
    if sort_cols:
        parted = parted.sortWithinPartitions(*partition_cols, *sort_cols)
    parted.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def bucketed_range_join(
    facts: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: int | None = None,
) -> DataFrame:
    """Point-in-interval join that scales past a broadcastable interval
    side. A raw `lo <= p AND p < hi` predicate has no equi-key, so
    Catalyst can only broadcast-nested-loop it — fine for KnowDB-sized
    dims (the ip4 enrichment path), quadratic death otherwise.

    Standard bucketing rewrite: pick a width, explode each interval to
    the buckets it overlaps, map each point to its bucket, EQUI-join on
    the bucket, then re-check the exact predicate. Shuffle is
    |facts| + |intervals| x avg_buckets_per_interval rows with full
    partition parallelism. Width trades duplication (wide intervals ->
    many buckets) against bucket fan-in; a reasonable default is the
    median interval width, passed by the caller who knows it.

    Returns facts columns + matched interval columns (inner join; a
    point in k overlapping intervals emits k rows, exactly like the
    predicate join would).
    """
    if bucket_width is None or bucket_width <= 0:
        raise ValueError("bucket_width must be a positive int")
    p = F.col(point_col)
    lo, hi = F.col(lo_col), F.col(hi_col)
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(lo / bucket_width),
                # hi is exclusive: the last covered bucket is the one
                # containing hi-1
                F.floor((hi - 1) / bucket_width),
            )
        ),
    )
    fx = facts.withColumn("__b", F.floor(p / bucket_width))
    out = fx.join(iv, "__b").where((lo <= p) & (p < hi))
    return out.drop("__b")


def zorder_key(*cols: Column, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of N non-negative int columns (`bits`
    each, clamped; N * bits <= 63): sorting/range-partitioning by this
    key clusters EVERY dimension simultaneously, so parquet row-group
    min/max stats prune on any of the predicates — the standard
    multi-dim layout trick (Delta/Iceberg OPTIMIZE ZORDER) expressed as
    a plain column.

    Unrolled shift/mask expression — pure JVM, whole-stage codegen, and
    the identical arithmetic runs verbatim in SQL oracles."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs at least two columns")
    if n * bits > 63:
        raise ValueError("n_cols * bits must fit a signed 64-bit key")
    clamped = [
        F.least(F.greatest(c.cast("bigint"), F.lit(0)), F.lit((1 << bits) - 1))
        for c in cols
    ]
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(clamped):
            out = out + F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), n * i + j
            )
    return out


def zorder_key_sql(a: str, b: str, bits: int = 16) -> str:
    """The same Morton interleave as a SQL expression string (DuckDB /
    ANSI): used by oracles so both engines compute identical keys."""
    ca = f"least(greatest(CAST({a} AS BIGINT), 0), {(1 << bits) - 1})"
    cb = f"least(greatest(CAST({b} AS BIGINT), 0), {(1 << bits) - 1})"
    parts = []
    for i in range(bits):
        parts.append(f"((({ca} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({cb} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(parts) + ")"
