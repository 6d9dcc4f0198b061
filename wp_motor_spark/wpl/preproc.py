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
