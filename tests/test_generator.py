"""wpgen round-trip property: generated lines must parse back with the same
rule (reference: tests/wpgen_rule_exec.rs generator/parser duality)."""

import pytest
from pyspark.sql import functions as F

from wp_motor_spark.wpl import compile_rule, parse_wpl
from wp_motor_spark.wpl.generator import generate_lines

REF = "/root/reference"

NGINX_WPL = open(f"{REF}/tests/instance/wpl/example/simple/parse.wpl").read()

CLF_RULE = """
rule clf {
  (ip:sip,2*_,time/clf:t<[,]>,http/request",http/status:st,digit:bytes)
}
"""

KV_RULE = r"""
rule kvs {
  (time_3339:ts,sn:dev,3*kv\,)
}
"""


@pytest.mark.parametrize("wpl,n", [(NGINX_WPL, 200), (CLF_RULE, 200), (KV_RULE, 100)])
def test_roundtrip(spark, wpl, n):
    rule = parse_wpl(wpl)[0]
    lines = generate_lines(spark, rule, n)
    cr = compile_rule(rule)
    parsed = cr.extract(lines)
    ok = parsed.where(F.col("_disposition") == "success").count()
    assert ok == n, parsed.where(F.col("_disposition") != "success").first()


def test_deterministic(spark):
    a = generate_lines(spark, CLF_RULE, 10).collect()
    b = generate_lines(spark, CLF_RULE, 10).collect()
    assert a == b
    c = generate_lines(spark, CLF_RULE, 10, seed=7).collect()
    assert a != c


def test_overrides(spark):
    rule = parse_wpl(CLF_RULE)[0]
    lines = generate_lines(
        spark, rule, 50, overrides={"sip": {"choices": ["1.1.1.1"]}, "bytes": {"range": (10, 20)}}
    )
    cr = compile_rule(rule)
    rows = cr.extract(lines).collect()
    assert all(r["sip"] == "1.1.1.1" for r in rows)
    assert all(10 <= r["bytes"] < 20 for r in rows)


def test_rule_generator_24_field_round_trip(spark):
    """Reference tests/actor_workflows.rs::rule_generator_end_to_end
    _processing: the 24-field comma-separated generation rule — every
    generated line must re-parse through its own rule with disposition
    success (generate -> parse round trip, engine_check parity)."""
    from wp_motor_spark.wpl import compile_rule, parse_wpl
    from wp_motor_spark.wpl.generator import generate_lines

    rule_text = (
        r"package /test_pkg { rule test { (digit,time,sn,chars,time,kv,sn,"
        r"chars,time,time,ip,kv,chars,kv,kv,chars,kv,kv,chars,chars,ip,"
        r"chars,http/request,http/agent)\,} }"
    )
    rules = parse_wpl(rule_text)
    lines = generate_lines(spark, rules[0], 50, seed=3)
    out = compile_rule(rules[0]).extract(
        lines.withColumnRenamed(lines.columns[0], "value")
    )
    by_disp = {r["_disposition"]: r["count"] for r in
               out.groupBy("_disposition").count().collect()}
    assert by_disp == {"success": 50}
