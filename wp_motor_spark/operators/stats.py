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


def windowed_counts(
    df: DataFrame,
    ts_col: str,
    dims: list[str],
    window_sec: int = 60,
    top_n: int | None = 20,
    success_pred: Column | None = None,
) -> DataFrame:
    """Tumbling-window dimensional counters with reference measures.

    Output: window_start, window_end, dims..., total, success, suc_rate,
    speed (events/sec), ranked and capped at top_n per window.
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
            F.round(F.col("success") / F.col("total"), 4).alias("suc_rate"),
            F.round(F.col("total") / F.lit(window_sec), 4).alias("speed"),
        )
    )
    if top_n is not None:
        w = Window.partitionBy("window_start").orderBy(
            F.desc("total"), *[F.asc(d) for d in dims]
        )
        out = out.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= top_n)
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
            F.round(F.col("success") / F.col("total"), 4).alias("suc_rate"),
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
