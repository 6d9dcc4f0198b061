"""Monitor/prometheus sink: streaming progress -> metrics exposition.

Reference: the prometheus external connector (connectors/sink.d/
{30,40}-prometheus.toml) and the monitor infra sink. Spark-first shape:
a StreamingQueryListener aggregates per-query progress (rows/s, batch
durations) and renders Prometheus text exposition format — scrape the
file or serve it; no client library needed.
"""

from __future__ import annotations

import threading

from pyspark.sql.streaming import StreamingQueryListener


class MetricsListener(StreamingQueryListener):
    """Collects the latest progress per streaming query."""

    def __init__(self):
        self._lock = threading.Lock()
        self.progress: dict[str, dict] = {}

    # StreamingQueryListener contract
    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        with self._lock:
            self.progress[p.name or p.id] = {
                "batch_id": p.batchId,
                "input_rows_per_second": p.inputRowsPerSecond or 0.0,
                "processed_rows_per_second": p.processedRowsPerSecond or 0.0,
                "num_input_rows": p.numInputRows,
                "duration_ms": (p.durationMs or {}).get("triggerExecution", 0),
            }

    def onQueryTerminated(self, event):
        pass

    def onQueryIdle(self, event):
        pass

    # ---- exposition ----

    def prometheus_text(self) -> str:
        """Render current metrics in Prometheus text exposition format."""
        lines = [
            "# TYPE wp_input_rows_per_second gauge",
            "# TYPE wp_processed_rows_per_second gauge",
            "# TYPE wp_num_input_rows counter",
            "# TYPE wp_trigger_duration_ms gauge",
        ]
        with self._lock:
            for name, m in sorted(self.progress.items()):
                lbl = f'{{query="{name}"}}'
                lines.append(f"wp_input_rows_per_second{lbl} {m['input_rows_per_second']}")
                lines.append(
                    f"wp_processed_rows_per_second{lbl} {m['processed_rows_per_second']}"
                )
                lines.append(f"wp_num_input_rows{lbl} {m['num_input_rows']}")
                lines.append(f"wp_trigger_duration_ms{lbl} {m['duration_ms']}")
        return "\n".join(lines) + "\n"

    def write_exposition(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.prometheus_text())


def attach(spark) -> MetricsListener:
    listener = MetricsListener()
    spark.streams.addListener(listener)
    return listener
