"""Reference DataType -> Spark SQL type mapping.

Mirrors the reference's runtime value model (wp-model-core Value/DataType
variants; parser factory dispatch at
crates/wp-lang/src/eval/value/parser/factory.rs:41-103 and the grammar's
builtin_type whitelist, docs/usage/en/03-wpl/06-grammar-reference.md).

String-shaped semantic types (domain/email/url/sn/hex/...) stay StringType —
their *validation* lives in the extraction regex, not the storage type.
"""

from __future__ import annotations

from pyspark.sql import types as T

# dtype key (normalized WPL type name) -> Spark type
SPARK_TYPE_FOR: dict[str, T.DataType] = {
    "chars": T.StringType(),
    "symbol": T.StringType(),
    "peek_symbol": T.StringType(),
    "sn": T.StringType(),
    "hex": T.StringType(),
    "base64": T.StringType(),
    "url": T.StringType(),
    "domain": T.StringType(),
    "email": T.StringType(),
    "id_card": T.StringType(),
    "mobile_phone": T.StringType(),
    "http/agent": T.StringType(),
    "http/method": T.StringType(),
    "ip": T.StringType(),
    "ip_net": T.StringType(),
    "digit": T.LongType(),
    "port": T.LongType(),
    "http/status": T.LongType(),
    "float": T.DoubleType(),
    "bool": T.BooleanType(),
    "time": T.TimestampType(),
    "time/clf": T.TimestampType(),
    "time_iso": T.TimestampType(),
    "time_3339": T.TimestampType(),
    "time_2822": T.TimestampType(),
    "time_timestamp": T.TimestampType(),
    "kv": T.MapType(T.StringType(), T.StringType()),
    "kvarr": T.MapType(T.StringType(), T.StringType()),
    "json": T.StringType(),  # raw json kept; subfield refs project out of it
    "exact_json": T.StringType(),
    "obj": T.StringType(),
    "proto_text": T.StringType(),
    "http/request": T.StructType(
        [
            T.StructField("method", T.StringType()),
            T.StructField("uri", T.StringType()),
            T.StructField("proto", T.StringType()),
        ]
    ),
    # auto runs the reference's typed cascade (factory.rs:28-39): tag +
    # per-row dynamic value (wpl/compiler.py::_auto_cascade)
    "auto": T.StructType(
        [T.StructField("t", T.StringType()), T.StructField("v", T.VariantType())]
    ),
    "_": T.StringType(),
}


def spark_type_name(dtype: str) -> str:
    return SPARK_TYPE_FOR.get(dtype, T.StringType()).simpleString()
