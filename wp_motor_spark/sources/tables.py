"""Parquet table loader with schema normalization.

The driver's testdata stores `events.ts` as parquet TIMESTAMP(NANOS), which
Spark reads only via spark.sql.legacy.parquet.nanosAsLong — the column
arrives as LongType nanoseconds. Normalize such columns back to
TimestampType (floor-truncate ns -> us, matching how DuckDB/pandas read the
same file at microsecond precision).
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
        if f.name in _NANO_TS_COLUMNS and isinstance(f.dataType, T.LongType):
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
