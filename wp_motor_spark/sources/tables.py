"""Parquet table loader with schema normalization.

The driver's testdata has shipped `events.ts` in two physical shapes over
time:

* parquet TIMESTAMP(NANOS) — Spark reads it only via
  spark.sql.legacy.parquet.nanosAsLong, so the column arrives as LongType
  epoch-nanoseconds;
* parquet timestamp[us] with no timezone — Spark infers TIMESTAMP_NTZ,
  which breaks instant-typed call sites (`unix_micros`, window range
  arithmetic, streaming watermarks).

Normalize BOTH back to a plain TimestampType. The session timezone is
pinned UTC (ensure_session_confs), so NTZ→TZ is a value-preserving
reinterpretation and keeps DuckDB oracle hash parity; the nanos branch
floor-truncates ns→us exactly the way DuckDB/pandas read the same file.
Mirrors the reference's policy of normalizing every input to one canonical
Time type (crates/wp-lang/src/eval/value/parser/physical/time/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

# columns we know carry epoch-nanos when read with nanosAsLong
_NANO_TS_COLUMNS = {"ts"}


def ensure_session_confs(spark: SparkSession) -> None:
    """The driver calls queries() with ITS OWN SparkSession — make the
    runtime-settable confs we depend on hold there too: nanos-timestamp
    parquet reads (events.ts is TIMESTAMP(NANOS)) and UTC wall-clocks
    (oracle parity for every timestamp-valued comparison)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # static-conf locked sessions keep their builder values


# (applicationId, sf_dir, name) -> DataFrame: file listing + schema read
# happen once per session instead of once per query
_CACHE: dict[tuple, DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    if key in _CACHE:
        return _CACHE[key]
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for f in df.schema.fields:
        if isinstance(f.dataType, T.TimestampNTZType):
            # timestamp[us] parquet (no TZ) → Spark TIMESTAMP_NTZ. Session
            # TZ is pinned UTC, so this cast reinterprets the same wall
            # clock as the same instant — value-preserving, oracle-safe.
            df = df.withColumn(f.name, F.col(f.name).cast(T.TimestampType()))
        elif f.name in _NANO_TS_COLUMNS and isinstance(f.dataType, T.LongType):
            # integer division: epoch-nanos (~1.7e18) exceed double's 2^53
            # exact range, so float divide + floor can land 1µs off DuckDB's
            # exact truncation and break oracle hash parity. `div` truncates
            # toward zero; the CASE corrects to floor semantics so pre-1970
            # (negative) nanos round the same way DuckDB's epoch math does.
            df = df.withColumn(
                f.name,
                F.timestamp_micros(
                    F.expr(
                        f"`{f.name}` div 1000 - "
                        f"(CASE WHEN `{f.name}` < 0 AND `{f.name}` % 1000 != 0 "
                        f"THEN 1 ELSE 0 END)"
                    )
                ),
            )
    _CACHE[key] = df
    return _CACHE[key]
