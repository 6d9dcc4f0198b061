"""WPL tokenizer letter-gap experiment (r17, guide §4.2): can moving the
probe rule's 11-group anchored tokenizer from JVM regex expressions to an
Arrow-native RE2 pass (`pyarrow.compute.extract_regex` inside mapInArrow)
beat the documented 417k rows/s single-thread JVM floor?

The JVM arm is the shipped plan's parts stage (regexp_replace -> $1..$11
joined on \\x01). The Arrow arm ships ONE string column across the Python
boundary, runs RE2 extract_regex per batch, joins the 11 groups with the
same delimiter (vectorized binary_join_element_wise), and falls back to
the original line for non-matching rows — value-identical output, checked
by an order-insensitive row-hash sum over both arms.

    python tools/arrow_tokenizer_experiment.py [n_rows]

Measurement-only: nothing in the query surface imports this.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from wp_motor_spark.session import get_spark  # noqa: E402
from wp_motor_spark.wpl import compile_rule, parse_wpl  # noqa: E402
from wp_motor_spark.wpl.generator import generate_lines  # noqa: E402

CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DELIM = "\x01"


def _name_groups(pattern: str) -> str:
    """Number -> named capturing groups ((?P<gN>...) — RE2 needs names).
    Only bare '(' not followed by '?' opens a capturing group; escaped
    parens and char-class parens don't occur unescaped in WPL output."""
    out = []
    n = 0
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\":
            out.append(pattern[i : i + 2])
            i += 2
            continue
        if c == "(" and not pattern.startswith("(?", i):
            n += 1
            out.append(f"(?P<g{n}>")
            i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    spark = get_spark(app_name="arrow_tokenizer_experiment")
    spark.sparkContext.setLogLevel("ERROR")

    wpl = open("/root/reference/tests/instance/wpl/example/simple/parse.wpl").read()
    rule = parse_wpl(wpl)[0]
    cr = compile_rule(rule)
    named = _name_groups(cr.pattern)
    n_groups = cr.n_groups

    lines = generate_lines(spark, rule, n).persist()
    lines.count()

    repl = DELIM.join(f"${i}" for i in range(1, n_groups + 1))
    jvm = lines.select(
        F.regexp_replace("value", cr.pattern, repl).alias("joined")
    )

    def arrow_parts(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            col = batch.column(0)
            st = pc.extract_regex(col, named)
            fields = [pc.struct_field(st, f"g{i}") for i in range(1, n_groups + 1)]
            joined = pc.binary_join_element_wise(*fields, pa.scalar(DELIM))
            joined = pc.if_else(pc.is_null(joined), col, joined)
            yield pa.RecordBatch.from_arrays([joined.cast(pa.string())], ["joined"])

    arrow = lines.select("value").mapInArrow(arrow_parts, "joined string")

    def timed(df, label):
        def one():
            t0 = time.perf_counter()
            df.select(F.max(F.xxhash64("joined"))).collect()
            return time.perf_counter() - t0

        one()  # warm
        wall = min(one(), one())
        us = wall / n * 1e6
        print(
            f"{label:18s} {wall:7.3f}s  {n/wall:>12,.0f} rows/s "
            f"{n/wall/CORES:>10,.0f} /core  {us:6.2f} us/row"
        )
        return wall

    print(f"rows={n} cores={CORES} groups={n_groups}")
    # interleave arms to absorb shared-box drift
    w_jvm1 = timed(jvm, "jvm regex #1")
    w_arw1 = timed(arrow, "arrow re2 #1")
    w_jvm2 = timed(jvm, "jvm regex #2")
    w_arw2 = timed(arrow, "arrow re2 #2")

    # order-insensitive value-equivalence: sum of row hashes must match
    hs = F.sum(F.xxhash64("joined").cast("decimal(38,0)"))  # ANSI: no long overflow
    s_jvm = jvm.select(hs).collect()[0][0]
    s_arw = arrow.select(hs).collect()[0][0]
    print(f"equivalence: jvm_hash_sum={s_jvm} arrow_hash_sum={s_arw} "
          f"match={s_jvm == s_arw}")
    print(f"best jvm {min(w_jvm1, w_jvm2):.3f}s vs best arrow "
          f"{min(w_arw1, w_arw2):.3f}s")

    # ---- e2e: full extract (typed casts + disposition + residue) + OML,
    # with the parts stage swapped for the Arrow pass (extract()'s exact
    # downstream, consuming a mapInArrow-produced __parts column)
    from pyspark.sql import types as T

    from wp_motor_spark.oml.compiler import compile_oml
    from wp_motor_spark.wpl.compiler import _no_pushdown

    om = compile_oml(
        open("/root/reference/tests/instance/oml/example_adm.oml").read()
    )

    def arrow_parts_frame(df, col="value"):
        assert not cr.rule.preprocs  # probe rule: none; library gate would check
        idx = df.columns.index(col)
        out_schema = T.StructType(
            list(df.schema.fields)
            + [T.StructField("__parts", T.ArrayType(T.StringType()))]
        )

        def fn(batches):
            import pyarrow as pa
            import pyarrow.compute as pc

            for b in batches:
                v = b.column(idx)
                st = pc.extract_regex(v, named)
                fields = [
                    pc.fill_null(pc.struct_field(st, f"g{i}"), "")
                    for i in range(1, n_groups + 1)
                ]
                joined = pc.binary_join_element_wise(*fields, pa.scalar(DELIM))
                joined = pc.if_else(pc.is_valid(st), joined, v)
                parts = pc.split_pattern(joined, pa.scalar(DELIM).as_py())
                yield b.append_column(
                    "__parts", parts.cast(pa.list_(pa.string()))
                )

        return df.mapInArrow(fn, out_schema)

    def extract_with(parts_frame_fn, df):
        """CompiledRule.extract()'s body with the __parts source swapped."""
        value = F.col("value")
        if parts_frame_fn is None:
            tmp = df.withColumn("__parts", _no_pushdown(cr.parts_col(value)))
        else:
            tmp = parts_frame_fn(df)
        pcol = F.col("__parts")
        named_cols = cr.field_columns(pcol)
        disp = cr.disposition_col(value, pcol)
        return tmp.select(
            *[c.alias(nm) for nm, c in named_cols],
            F.lit(cr.key).alias("_rule"),
            disp.alias("_disposition"),
            cr.residue_col(pcol).alias("_residue"),
        )

    def timed_wide(df, label):
        cols = [F.col(c).cast("string") for c in df.columns]

        def one():
            t0 = time.perf_counter()
            df.select(F.max(F.xxhash64(*cols))).collect()
            return time.perf_counter() - t0

        one()
        wall = min(one(), one())
        print(
            f"{label:18s} {wall:7.3f}s  {n/wall:>12,.0f} rows/s "
            f"{n/wall/CORES:>10,.0f} /core  {wall/n*1e6:6.2f} us/row"
        )
        return wall

    def e2e(parts_fn):
        parsed = extract_with(parts_fn, lines)
        return om.apply(parsed.drop("_rule", "_disposition", "_residue"))

    w_j1 = timed_wide(e2e(None), "e2e jvm #1")
    w_a1 = timed_wide(e2e(arrow_parts_frame), "e2e arrow #1")
    w_j2 = timed_wide(e2e(None), "e2e jvm #2")
    w_a2 = timed_wide(e2e(arrow_parts_frame), "e2e arrow #2")

    def hashsum(df):
        cols = [F.col(c).cast("string") for c in df.columns]
        return df.select(
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)"))
        ).collect()[0][0]

    hj, ha = hashsum(e2e(None)), hashsum(e2e(arrow_parts_frame))
    print(f"e2e equivalence: jvm={hj} arrow={ha} match={hj == ha}")
    print(f"best e2e jvm {min(w_j1, w_j2):.3f}s vs arrow {min(w_a1, w_a2):.3f}s")
    lines.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
