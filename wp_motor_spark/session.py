"""SparkSession factory with scale-appropriate defaults.

Tuned for correctness-vs-oracle (UTC session timezone, deterministic) and for
the 100TB design point (AQE on, skew-join handling, sane shuffle sizing).
On a real cluster only ``shuffle_partitions`` / memory knobs change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    """min(24g, ~25% of system RAM), floor 2g — the 24g local[32] bench
    sizing, degraded gracefully on smaller hosts. Detection reads
    MemTotal (Linux); anything unreadable falls back to the 24g bench
    default, and WP_DRIVER_MEM always wins (see caller)."""
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemTotal:"):
                    total_gib = int(line.split()[1]) / (1024 * 1024)
                    return f"{max(2, min(24, int(total_gib // 4)))}g"
    except OSError:
        pass
    return "24g"


def get_spark(
    app_name: str = "wp_motor_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("WP_SHUFFLE_PARTITIONS", str(max(cpus, 32)))
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Determinism / oracle parity
        .config("spark.sql.session.timeZone", "UTC")
        # Driver testdata writes TIMESTAMP(NANOS) parquet, which Spark
        # rejects by default; read as long and convert at the loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Runtime re-planning: coalesce small shuffle partitions, split skewed
        # ones — essential at 100TB where static planning is always wrong.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE re-plan (incl. partition coalescing) for persisted
        # DataFrames too: off, every _track_persist intermediate keeps the
        # static shuffle-partition count, so tiny cached tables fan every
        # downstream stage out to N near-empty tasks (measured: 8-round
        # greedy loop over a 256k-row cache, 32->AQE-sized partitions cut
        # the loop wall ~20% locally; at scale AQE sizes from bytes, so
        # this stays data-driven, guide §2.2).
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for the few pandas-UDF paths (batched, columnar transfer).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Broadcast dims up to 64MB — KnowDB-style enrichment tables are small.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Shuffle/IO codec (guide §2.3: "measure both"): full-suite A/B at
        # sf0.1 — zstd 246.1 s / 72.1k ev/s/core probe vs lz4 236.6 s /
        # 92.0k. Local shuffles are CPU-bound over tiny partitions, so
        # zstd's ratio buys nothing here; on a network-bound cluster flip
        # WP_IO_CODEC=zstd and re-measure.
        .config("spark.io.compression.codec", os.environ.get("WP_IO_CODEC", "lz4"))
        .config("spark.ui.enabled", "false")
        # local-mode heap sizing (guide §5): in local[N] the ONE driver JVM
        # hosts all N executor threads, so 8g forced constant GC under the
        # 32-thread suite — full-bench A/B at sf0.1 (same box, back-to-back):
        # 8g 270.7 s suite / 38k ev/s/core probe vs 24g 252.8 s / 108.7k.
        # 24g is ~20% of the 128 GiB bench box, leaving room for Python
        # workers; on a real cluster spark.executor.memory is sized
        # separately and this knob only feeds the (small) driver. r17
        # (ADVICE): the default is capped at ~25% of detected system
        # memory so a cgroup-limited dev/CI host doesn't fail to start a
        # 24g JVM; WP_DRIVER_MEM still overrides outright.
        .config("spark.driver.memory",
                os.environ.get("WP_DRIVER_MEM", _default_driver_mem()))
    )
    return builder.getOrCreate()
