"""Stateful streaming extensions.

The reference engine is purely processing-time and has NO stateful
streaming operators (SURVEY.md §2.9 — no event-time, no stream dedup, no
sessionization). This package is the Spark-native extension surface the
north star asks for on top of parity: event-time sessionization with
bounded state (`applyInPandasWithState`) and watermark-bounded streaming
dedup, plus SpaceSaving streaming heavy hitters (fixed-memory top-k).
Batch twins live in queries.user_sessions / operators.dedup /
queries.countmin_heavy_hitters.
"""

from wp_motor_spark.streaming.state import (
    dedup_stream,
    ewma_anomaly_stream,
    heavy_hitters_stream,
    sessionize_stream,
)

__all__ = ["dedup_stream", "ewma_anomaly_stream", "heavy_hitters_stream", "sessionize_stream"]
