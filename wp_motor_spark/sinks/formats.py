"""Record formatters: one output line per record.

Mirrors the reference's wp-data-fmt crate (formats whitelist
src/sinks/backends/file.rs:52-74: json, csv, show, kv, raw, proto-text).
All formatters are Column expressions (JVM-side); NULL fields are dropped
from json/kv output exactly like the reference drops Ignore values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

INTERNAL_COLS = ("value", "_rule", "_disposition", "_residue")


def data_columns(df: DataFrame) -> list[str]:
    return [c for c in df.columns if c not in INTERNAL_COLS]


def _stringify(df: DataFrame, name: str) -> Column:
    dt = df.schema[name].dataType
    c = F.col(name)
    if isinstance(dt, (T.StructType, T.ArrayType, T.MapType)):
        return F.to_json(c)
    if isinstance(dt, T.TimestampType):
        return F.date_format(c, "yyyy-MM-dd HH:mm:ss")
    return c.cast("string")


def json_line(df: DataFrame, cols: list[str] | None = None) -> Column:
    """to_json over the record struct; nulls dropped (Ignore semantics)."""
    cols = cols or data_columns(df)
    return F.to_json(F.struct(*[F.col(c) for c in cols]))


def kv_line(df: DataFrame, cols: list[str] | None = None, sep: str = " ") -> Column:
    """k=v pairs joined by `sep`; null fields dropped."""
    cols = cols or data_columns(df)
    pairs = [
        F.when(F.col(c).isNotNull(), F.concat(F.lit(c + "="), _stringify(df, c)))
        for c in cols
    ]
    return F.concat_ws(sep, *pairs)


def csv_line(df: DataFrame, cols: list[str] | None = None, sep: str = ",") -> Column:
    """Positional CSV; nulls render empty; values with sep/quotes quoted."""
    cols = cols or data_columns(df)
    def esc(c: Column) -> Column:
        needs = c.contains(sep) | c.contains('"') | c.contains("\n")
        quoted = F.concat(F.lit('"'), F.replace(c, F.lit('"'), F.lit('""')), F.lit('"'))
        return F.when(needs, quoted).otherwise(c)
    return F.concat_ws(sep, *[esc(F.coalesce(_stringify(df, c), F.lit(""))) for c in cols])


def raw_line(df: DataFrame) -> Column:
    """The original input line (requires the `value` passthrough column)."""
    if "value" in df.columns:
        return F.col("value").cast("string")
    return json_line(df)


def show_line(df: DataFrame, cols: list[str] | None = None) -> Column:
    """Debug format: name: value per field, | separated (fmt=show)."""
    cols = cols or data_columns(df)
    pairs = [
        F.when(F.col(c).isNotNull(), F.concat(F.lit(c + ": "), _stringify(df, c)))
        for c in cols
    ]
    return F.concat_ws(" | ", *pairs)


def proto_text_line(df: DataFrame, cols: list[str] | None = None) -> Column:
    """proto-text style: `field: "value"` lines in one record block."""
    cols = cols or data_columns(df)
    pairs = [
        F.when(
            F.col(c).isNotNull(),
            F.concat(F.lit(c + ': "'), _stringify(df, c), F.lit('"')),
        )
        for c in cols
    ]
    return F.concat_ws(" ", *pairs)


_FORMATS = {
    "json": json_line,
    "kv": kv_line,
    "csv": csv_line,
    "show": show_line,
    "proto-text": proto_text_line,
}


def format_lines(df: DataFrame, fmt: str = "json", cols: list[str] | None = None) -> DataFrame:
    """DataFrame -> single `line` STRING column in the requested format."""
    fmt = fmt.lower()
    if fmt == "raw":
        return df.select(raw_line(df).alias("line"))
    if fmt not in _FORMATS:
        raise ValueError(f"unknown sink format {fmt!r} (file.rs:64 whitelist)")
    return df.select(_FORMATS[fmt](df, cols).alias("line"))
