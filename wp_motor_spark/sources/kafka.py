"""Kafka source helpers (reference: connectors/source.d/30-kafka.toml —
consumer config passthrough; topology wpsrc.toml [[source_kafka]]).

Spark's built-in kafka connector does the heavy lifting; these helpers
map the reference's config spelling onto it and decode the value column
to the raw-line shape the pipeline consumes. Requires the
spark-sql-kafka package on the classpath (not bundled in this container —
calls raise a clear error without it)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _apply_conf(reader, brokers: str, topics: list[str], config: list[str] | None):
    reader = reader.option("kafka.bootstrap.servers", brokers).option(
        "subscribe", ",".join(topics)
    )
    for entry in config or []:
        # reference spelling: ["enable.auto.commit = true", ...]
        k, _, v = entry.partition("=")
        k = k.strip()
        v = v.strip()
        if k == "auto.offset.reset":  # reference name -> spark option
            reader = reader.option("startingOffsets", "earliest" if v == "earliest" else "latest")
        elif k:
            reader = reader.option(f"kafka.{k}", v)
    return reader


def read_kafka_stream(
    spark: SparkSession,
    brokers: str,
    topics: list[str],
    config: list[str] | None = None,
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming kafka source -> DataFrame[value] raw lines.

    ``max_offsets_per_trigger`` is the rate limit (reference speed_limit)."""
    reader = _apply_conf(spark.readStream.format("kafka"), brokers, topics, config)
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return reader.load().select(F.col("value").cast("string").alias("value"))


def read_kafka_batch(
    spark: SparkSession,
    brokers: str,
    topics: list[str],
    config: list[str] | None = None,
) -> DataFrame:
    reader = _apply_conf(spark.read.format("kafka"), brokers, topics, config)
    return reader.load().select(F.col("value").cast("string").alias("value"))


def sink_options(params: dict) -> dict:
    """Reference kafka-sink connector params (connectors/sink.d/
    30-kafka.toml: brokers/topic/config/num_partitions/replication) ->
    Spark kafka-writer options.

    num_partitions/replication are topic-ADMIN settings the reference
    applies when auto-creating the topic; Spark's writer cannot create
    topics, so they are dropped here (create the topic out-of-band).
    Already-spark-spelled keys (kafka.*, topic) pass through unchanged so
    hand-written workspaces can use either spelling.
    """
    out: dict = {}
    for k, v in (params or {}).items():
        if k == "brokers":
            out["kafka.bootstrap.servers"] = v
        elif k == "config":
            for entry in v or []:
                ck, _, cv = entry.partition("=")
                if ck.strip():
                    out[f"kafka.{ck.strip()}"] = cv.strip()
        elif k in ("num_partitions", "replication"):
            continue
        else:
            out[k] = v
    return out
