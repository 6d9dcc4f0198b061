"""A/B experiments for the WPL hot-path at 8M rows: stage deltas of the real
probe pipeline plus targeted variants (time parse, http/request split,
forcing-hash mode, partition count).

    python tools/profile_variants.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from wp_motor_spark.oml.compiler import compile_oml  # noqa: E402
from wp_motor_spark.session import get_spark  # noqa: E402
from wp_motor_spark.wpl import compile_rule, parse_wpl  # noqa: E402
from wp_motor_spark.wpl.compiler import _time_cast, _typed_column  # noqa: E402
from wp_motor_spark.wpl.generator import generate_lines  # noqa: E402

CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def bench(df, force_cast: bool = False):
    if force_cast:
        cols = [F.col(c).cast("string") for c in df.columns]
    else:
        cols = [F.col(c) for c in df.columns]

    def one():
        t0 = time.perf_counter()
        df.select(F.max(F.xxhash64(*cols))).collect()
        return time.perf_counter() - t0

    one()
    return min(one(), one())


def report(label, wall, n):
    us = wall / n * 1e6
    print(
        f"{label:36s} {wall:7.3f}s {n/wall:>12,.0f} rows/s "
        f"{n/wall/CORES:>10,.0f}/core {us:6.3f} us/row",
        flush=True,
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    spark = get_spark(app_name="profile_variants")
    spark.sparkContext.setLogLevel("ERROR")

    wpl = open("/root/reference/tests/instance/wpl/example/simple/parse.wpl").read()
    oml = open("/root/reference/tests/instance/oml/example_adm.oml").read()
    rule = parse_wpl(wpl)[0]
    cr = compile_rule(rule)
    om = compile_oml(oml)

    lines = generate_lines(spark, rule, n).persist()
    lines.count()
    print(f"rows={n} cores={CORES} partitions={lines.rdd.getNumPartitions()}")
    time_out = next(o for o in cr.outputs if o.dtype.startswith("time"))
    print(f"time dtype = {time_out.dtype}")

    # --- stage deltas of the real pipeline
    report("0 scan+hash", bench(lines), n)
    repl = "\x01".join(f"${i}" for i in range(1, cr.n_groups + 1))
    report(
        "1 regexp_replace",
        bench(lines.select(F.regexp_replace("value", cr.pattern, repl).alias("r"))),
        n,
    )
    parts = cr.parts_col(F.col("value"))
    report("2 replace+split", bench(lines.select(parts.alias("p"))), n)
    raw_cols = [
        F.try_element_at(parts, F.lit(o.group)).alias(f"c{o.group}") for o in cr.outputs
    ]
    report("3 raw string fields", bench(lines.select(*raw_cols)), n)
    report("4 extract()", bench(cr.extract(lines)), n)
    parsed = cr.extract(lines)
    out = om.apply(parsed.drop("value", "_rule", "_disposition", "_residue"))
    report("5 extract+OML", bench(out), n)
    report("5b extract+OML cast-force", bench(out, True), n)

    # --- time parse variants on the real raw token
    tcol = F.try_element_at(parts, F.lit(time_out.group))
    raw_tok = lines.select(tcol.alias("t")).persist()
    raw_tok.count()
    t = F.col("t")
    report("t0 token only", bench(raw_tok), n)
    report("t1 current _time_cast", bench(raw_tok.select(_time_cast(t, time_out.dtype).alias("ts"))), n)
    report("t2 try_cast(timestamp)", bench(raw_tok.select(t.try_cast("timestamp").alias("ts"))), n)
    report("t3 try_to_timestamp nofmt", bench(raw_tok.select(F.try_to_timestamp(t).alias("ts"))), n)
    decomp = F.try_make_timestamp(
        F.substring(t, 1, 4).try_cast("int"),
        F.substring(t, 6, 2).try_cast("int"),
        F.substring(t, 9, 2).try_cast("int"),
        F.substring(t, 12, 2).try_cast("int"),
        F.substring(t, 15, 2).try_cast("int"),
        F.substring(t, 18, 2).try_cast("int"),
    )
    report("t4 fixed-width make_timestamp", bench(raw_tok.select(decomp.alias("ts"))), n)
    raw_tok.unpersist()

    # --- http/request variants on the real raw token
    req_out = next(o for o in cr.outputs if o.dtype == "http/request")
    rcol = F.try_element_at(parts, F.lit(req_out.group))
    raw_req = lines.select(rcol.alias("r")).persist()
    raw_req.count()
    r = F.col("r")
    report("r0 token only", bench(raw_req), n)
    report("r1 current http/request", bench(raw_req.select(_typed_column(req_out, r).alias("s"))), n)
    report(
        "r2 substring_index",
        bench(
            raw_req.select(
                F.when(
                    r.isNotNull(),
                    F.struct(
                        F.substring_index(r, " ", 1).alias("method"),
                        F.substring_index(F.substring_index(r, " ", 2), " ", -1).alias("uri"),
                        F.substring_index(r, " ", -1).alias("proto"),
                    ),
                ).alias("s")
            )
        ),
        n,
    )
    p2 = F.split(r, " ", 3)
    report(
        "r3 literal-space split",
        bench(
            raw_req.select(
                F.when(
                    r.isNotNull(),
                    F.struct(
                        p2.getItem(0).alias("method"),
                        p2.getItem(1).alias("uri"),
                        p2.getItem(2).alias("proto"),
                    ),
                ).alias("s")
            )
        ),
        n,
    )
    raw_req.unpersist()

    # --- partition sensitivity
    for parts_n in (64, 128):
        re_lines = lines.repartition(parts_n).persist()
        re_lines.count()
        parsed2 = cr.extract(re_lines)
        out2 = om.apply(parsed2.drop("value", "_rule", "_disposition", "_residue"))
        report(f"p extract+OML p={parts_n}", bench(out2), n)
        re_lines.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
