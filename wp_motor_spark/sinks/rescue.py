"""Sink failure rescue + replay (reference: src/sinks/rescue.rs,
src/sinks/backends/test_rescue.rs, docs/usage/en/01-cli/05-wprescue.md).

When a sink write fails, the already-formatted lines are spooled to
``<rescue_dir>/<sink_name>/`` as versioned JSONL entries
(``{"version":1,"kind":"raw","raw":"<line>"}`` — the rescue.rs
RescueEntry wire shape), written distributed via Spark (no driver
loop). ``replay`` is the wprescue flow: read every sink's spool,
decode entries, re-write to the (now healthy) sink, and drain the
spool on success. Exactly-once is NOT promised across a crash between
re-write and drain — same as the reference's flush-interval window.

The ``test_rescue`` sink kind is the failure-injection proxy
(ASinkTestProxy + HealthController in test_rescue.rs): a file sink
that refuses writes while ``<path>/.unhealthy`` exists, letting tests
drive the fail -> rescue -> heal -> replay loop deterministically.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

RESCUE_VERSION = 1


class SinkUnhealthyError(RuntimeError):
    """Raised by the test_rescue sink while its health marker is down."""


def health_marker(path: str) -> str:
    return os.path.join(path, ".unhealthy")


def set_healthy(path: str, healthy: bool) -> None:
    """HealthController analog: toggle the test_rescue sink's health."""
    marker = health_marker(path)
    if healthy:
        if os.path.exists(marker):
            os.remove(marker)
    else:
        os.makedirs(path, exist_ok=True)
        open(marker, "w").close()


def write_or_raise(lines: DataFrame, path: str) -> None:
    """test_rescue sink write: a plain append-text file sink that fails
    while the health marker is down (ASinkTestProxy.send -> Err)."""
    if os.path.exists(health_marker(path)):
        raise SinkUnhealthyError(path)
    lines.write.mode("append").text(path)


def rescue_lines(lines: DataFrame, rescue_dir: str, sink_name: str) -> int:
    """Spool formatted lines for a failed sink as RescueEntry JSONL.

    Returns the number of lines rescued by THIS call (not the cumulative
    spool size — two consecutive failures report their own batch counts).
    The count rides the write job via observe(): no second scan of the
    spool, and no recompute of `lines` (whose lineage was the failed
    action and may be expensive)."""
    from pyspark.sql import Observation

    dest = os.path.join(rescue_dir, sink_name)
    obs = Observation()
    entries = lines.observe(obs, F.count(F.lit(1)).alias("n")).select(
        F.to_json(
            F.struct(
                F.lit(RESCUE_VERSION).alias("version"),
                F.lit("raw").alias("kind"),
                F.col("line").alias("raw"),
            )
        ).alias("value")
    )
    entries.write.mode("append").text(dest)
    return int(obs.get["n"])


def read_rescued(spark: SparkSession, rescue_dir: str, sink_name: str) -> DataFrame:
    """Decode one sink's spool back to a `line` DataFrame. Unknown kinds
    or versions are passed through untouched as raw text (forward
    compatibility, rescue.rs RescueEntry::parse fallback)."""
    return decode_entries(spark.read.text(os.path.join(rescue_dir, sink_name)))


def decode_entries(raw: DataFrame) -> DataFrame:
    """RescueEntry JSONL -> `line` rows (shared by whole-spool and
    per-file reads)."""
    parsed = F.from_json(
        F.col("value"), "version INT, kind STRING, raw STRING"
    )
    return raw.select(
        F.when(
            (parsed["kind"] == "raw") & parsed["raw"].isNotNull(), parsed["raw"]
        )
        .otherwise(F.col("value"))
        .alias("line")
    )


def spool_files(rescue_dir: str, sink_name: str) -> list[str]:
    """One sink's spool part files, oldest-write order — the natural
    replay chunks for rate-limited re-delivery (each failed batch wrote
    its own part files)."""
    dest = os.path.join(rescue_dir, sink_name)
    if not os.path.isdir(dest):
        return []
    return sorted(
        os.path.join(dest, f)
        for f in os.listdir(dest)
        if f.startswith("part-")
    )


def pending_sinks(rescue_dir: str) -> list[str]:
    if not os.path.isdir(rescue_dir):
        return []
    return sorted(
        d
        for d in os.listdir(rescue_dir)
        if os.path.isdir(os.path.join(rescue_dir, d))
    )


def drain(rescue_dir: str, sink_name: str) -> None:
    shutil.rmtree(os.path.join(rescue_dir, sink_name), ignore_errors=True)
