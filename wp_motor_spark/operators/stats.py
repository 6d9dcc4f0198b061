"""Windowed dimensional counters — the reference's stats subsystem.

Reference (SURVEY.md §2.9): per-stage windowed (dimension -> counters)
maps, emitted every window_sec with a top-N cap
(crates/wp-stats/src/{collector/mod.rs,model/*}; conf wparse.toml:24-41:
window_sec=60, top_n=20). Measures: total, success, suc_rate, speed
(model/measure.rs:152-196).

Spark: groupBy(window(ts), dims) aggregation + rank<=N — partial (map-side)
aggregation makes the shuffle carry only (window, dims) partials, safe at
any scale. Works identically over a stream (Structured Streaming windowed
agg with watermark) and a batch frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# The reference's reports RETAIN 2x the requested top-N: collect_stat sorts
# by total desc and truncates to `max * TOP_N_MULTIPLIER` (collector/
# mod.rs:18,155 "keep 2x the requested max to allow for better merging and
# filtering"), and report merges re-truncate to the same bound
# (stat_report.rs:14,148). Nothing downstream ever cuts to exactly top_n —
# the emitted report carries the 2x set (test_top_n_multiplier pins it).
TOP_N_MULTIPLIER = 2


def windowed_counts(
    df: DataFrame,
    ts_col: str,
    dims: list[str],
    window_sec: int = 60,
    top_n: int | None = 20,
    success_pred: Column | None = None,
    retain_multiplier: int = TOP_N_MULTIPLIER,
) -> DataFrame:
    """Tumbling-window dimensional counters with reference measures.

    Output: window_start, window_end, dims..., total, success, suc_rate,
    speed (events/sec), ranked by total desc and capped at
    top_n * retain_multiplier per window (the reference report retention;
    pass retain_multiplier=1 for an exact top-N cut). The reference's
    per-collector LRU bound (max(top_n, 5) most-recently-updated dims,
    collector/mod.rs:14,47-52) is a sharded-state artifact of its
    single-pass runtime, not reproduced by a full groupBy — the merged
    2x retention is the cross-shard contract.
    """
    win = F.window(F.col(ts_col), f"{window_sec} seconds")
    agg = [
        F.count(F.lit(1)).alias("total"),
        (
            F.count_if(success_pred) if success_pred is not None else F.count(F.lit(1))
        ).alias("success"),
    ]
    out = (
        df.groupBy(win.alias("w"), *dims)
        .agg(*agg)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *dims,
            "total",
            "success",
            # suc_rate is a PERCENT (measure.rs suc_rate: suc/total*100,
            # test_suc_rate_normal pins 7/10 -> 70.0)
            F.round(F.col("success") / F.col("total") * 100, 4).alias("suc_rate"),
            F.round(F.col("total") / F.lit(window_sec), 4).alias("speed"),
        )
    )
    if top_n is not None:
        w = Window.partitionBy("window_start").orderBy(
            F.desc("total"), *[F.asc(d) for d in dims]
        )
        out = out.withColumn("rank", F.row_number().over(w)).where(
            F.col("rank") <= top_n * max(1, retain_multiplier)
        )
    return out


def streaming_windowed_counts(
    stream: DataFrame,
    ts_col: str,
    dims: list[str],
    window_sec: int = 60,
    watermark_sec: int | None = None,
    success_pred: Column | None = None,
) -> DataFrame:
    """Streaming form of the stats window. The reference is purely
    processing-time (SURVEY.md §2.9 — no event-time reasoning); passing
    watermark_sec adds event-time lateness handling as an extension.

    No top-N here: ranking inside an unfinished window isn't defined for
    append-mode streams — cap in the sink query or on the completed batch.
    """
    if watermark_sec:
        stream = stream.withWatermark(ts_col, f"{watermark_sec} seconds")
    win = F.window(F.col(ts_col), f"{window_sec} seconds")
    agg = [
        F.count(F.lit(1)).alias("total"),
        (
            F.count_if(success_pred) if success_pred is not None else F.count(F.lit(1))
        ).alias("success"),
    ]
    return (
        stream.groupBy(win.alias("w"), *dims)
        .agg(*agg)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *dims,
            "total",
            "success",
            # suc_rate is a PERCENT (measure.rs suc_rate: suc/total*100,
            # test_suc_rate_normal pins 7/10 -> 70.0)
            F.round(F.col("success") / F.col("total") * 100, 4).alias("suc_rate"),
            F.round(F.col("total") / F.lit(window_sec), 4).alias("speed"),
        )
    )


def alert(
    stats_df: DataFrame, measure: str, threshold: float, op: str = ">="
) -> DataFrame:
    """Threshold alerting over the stats stream (src/stat/alert_system.rs:7-112)."""
    c = F.col(measure)
    cond = {
        ">=": c >= threshold,
        ">": c > threshold,
        "<=": c <= threshold,
        "<": c < threshold,
        "==": c == threshold,
    }[op]
    return stats_df.where(cond).withColumn(
        "alert", F.format_string(f"{measure} {op} {threshold}: %s", c.cast("string"))
    )


def match_stat_target(target: str, name: str) -> bool:
    """StatReq target matching (wp-stats model/request.rs match_target +
    dimension.rs StatTarget serde spellings): 'all' matches every rule,
    'ignore' matches none, any other string is an EXACT item match.
    '*' is accepted as an alias for 'all' (the glob spelling our
    stat_specs default used before this parity pass)."""
    if target in ("all", "*"):
        return True
    if target == "ignore":
        return False
    return target == name
