"""Whole-line preprocessors applied before field parsing.

Reference: grammar `preproc` production + builtins
crates/wp-lang/src/eval/builtins/{base64.rs,hex.rs,quotation.rs,bom.rs};
executed left-to-right (crates/wp-lang/src/eval/runtime/vm_unit.rs:63-95).

A failed decode yields NULL, which makes every rule regex miss — same
net routing as the reference (decode failure -> parse miss).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_B64_RE = r"^[A-Za-z0-9+/\s]*={0,2}\s*$"
_HEX_RE = r"^(?:[0-9A-Fa-f]{2}\s*)+$"
# BOM table (strip/bom, crates/wp-lang/src/eval/builtins/bom.rs): UTF-8 BOM
# survives a utf-8 decode as U+FEFF; UTF-16/32 BOMs can't appear in a decoded
# string column, so the FEFF strip covers the string-typed pipeline. The
# reference removes BOMs at ALL positions (remove_all_boms byte scan),
# not only a leading run.
_BOM = "﻿"


def apply_preprocs(col: Column, preprocs: list[str]) -> Column:
    out = col
    for step in preprocs:
        if step == "decode/base64":
            out = F.when(
                out.rlike(_B64_RE), F.unbase64(F.regexp_replace(out, r"\s+", ""))
            ).cast("string")
        elif step == "decode/hex":
            out = F.when(out.rlike(_HEX_RE), F.unhex(F.regexp_replace(out, r"\s+", ""))).cast(
                "string"
            )
        elif step == "unquote/unescape":
            # quotation.rs unescape_bytes: drop every UNESCAPED '"', and
            # resolve '\X' -> X for any X (no control-char interpretation;
            # '\n' -> 'n'); a trailing lone backslash is dropped. One
            # left-to-right regex scan replicates the byte loop exactly:
            # the '\\(.)' alternative consumes escape pairs first, so a
            # '\"' never reaches the bare-quote alternative, and Java
            # substitutes "" for $1 when that group didn't participate.
            out = F.regexp_replace(out, r'(?s)\\(.)|\\$|"', "$1")
        elif step == "strip/bom":
            out = F.replace(out, F.lit(_BOM), F.lit(""))
        elif step.startswith("plg_pipe/"):
            from wp_motor_spark.wpl.registry import get_plg_pipe

            out = get_plg_pipe(step.split("/", 1)[1])(out)
        else:
            raise ValueError(f"unknown preprocessor {step!r}")
    return out


def strip_bom_binary(col: Column) -> Column:
    """Byte-level BOM removal for BINARY columns (archive members, raw
    frames) — strip/bom parity for the reference's RawData::Bytes path
    (bom.rs remove_all_boms, bom.rs:26-87).

    Removes BOM byte sequences at ALL positions, scanning left to right
    with the reference's detection order (bom.rs detect_bom_at): UTF-8
    (EF BB BF), UTF-32 LE (FF FE 00 00, checked BEFORE UTF-16 LE),
    UTF-32 BE (00 00 FE FF, checked BEFORE UTF-16 BE), UTF-16 LE
    (FF FE), UTF-16 BE (FE FF). Consecutive and mixed-type BOMs are all
    removed; BOM-free input passes through unchanged.

    Arrow-batched pandas UDF: binary columns are opaque to the built-in
    string functions, and this runs on the cold archive-ingest path, not
    the per-event hot loop. At 100 TB the scan is map-only — no shuffle,
    no driver involvement.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _strip_series(s):
        def scan(b):
            if b is None:
                return None
            out = bytearray()
            has_bom = False
            i, n = 0, len(b)
            while i < n:
                rest = n - i
                # detection order = bom.rs detect_bom_at (UTF-32 first)
                if rest >= 3 and b[i] == 0xEF and b[i + 1] == 0xBB and b[i + 2] == 0xBF:
                    i += 3
                    has_bom = True
                elif rest >= 4 and b[i] == 0xFF and b[i + 1] == 0xFE and b[i + 2] == 0 and b[i + 3] == 0:
                    i += 4
                    has_bom = True
                elif rest >= 4 and b[i] == 0 and b[i + 1] == 0 and b[i + 2] == 0xFE and b[i + 3] == 0xFF:
                    i += 4
                    has_bom = True
                elif rest >= 2 and b[i] == 0xFF and b[i + 1] == 0xFE:
                    i += 2
                    has_bom = True
                elif rest >= 2 and b[i] == 0xFE and b[i + 1] == 0xFF:
                    i += 2
                    has_bom = True
                else:
                    out.append(b[i])
                    i += 1
            return bytes(out) if has_bom else bytes(b)

        return s.map(scan)

    # explicit annotations: `from __future__ import annotations` stringifies
    # inline hints, which pandas_udf's typehint inspection rejects
    _strip_series.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _strip = pandas_udf(_strip_series, "binary")
    return _strip(col)
