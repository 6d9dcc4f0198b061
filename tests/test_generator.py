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


def test_gen_field_toml_scopes(spark):
    """gen_field.toml (FieldsGenRule, generator/rule.rs): the instance's
    own sip ip-scope constrains generated addresses to [beg, end], and the
    constrained lines still parse under the package's parse.wpl."""
    import ipaddress

    from wp_motor_spark.wpl import compile_rule, parse_wpl
    from wp_motor_spark.wpl.generator import (
        generate_lines,
        load_gen_field_overrides,
    )

    inst = "/root/reference/tests/instance/wpl/example/simple"
    rule = parse_wpl(open(f"{inst}/gen_rule.wpl").read())[0]
    ov = load_gen_field_overrides(open(f"{inst}/gen_field.toml").read())
    assert ov == {"sip": {"ip_range": ("10.0.10.0", "10.0.100.255")}}
    lines = generate_lines(spark, rule, 100, overrides=ov, seed=5)
    rows = [r[0] for r in lines.collect()]
    lo = ipaddress.ip_address("10.0.10.0")
    hi = ipaddress.ip_address("10.0.100.255")
    assert all(lo <= ipaddress.ip_address(r.split()[0]) <= hi for r in rows)
    cr = compile_rule(parse_wpl(open(f"{inst}/parse.wpl").read())[0])
    out = cr.extract(lines.withColumnRenamed(lines.columns[0], "value"))
    assert out.where("_disposition = 'success'").count() == 100


def test_gen_field_fmt_and_scope_variants(spark):
    """digit scope + gen_fmt template, float scope, chars choices — the
    remaining FieldGenConf variants."""
    from wp_motor_spark.wpl import parse_wpl
    from wp_motor_spark.wpl.generator import (
        generate_lines,
        load_gen_field_overrides,
    )

    ov = load_gen_field_overrides(
        """
[items.code]
gen_type = "digit"
gen_fmt = "SN-{val}"
[items.code.scope.digit]
beg = 100
end = 200

[items.ratio]
gen_type = "float"
[items.ratio.scope.float]
beg = 1.0
end = 2.0

[items.word]
gen_type = "chars"
scope = { chars = ["alpha", "beta"] }
"""
    )
    rule = parse_wpl("rule g { (sn:code,float:ratio,chars:word) }")[0]
    rows = [
        r[0].split() for r in generate_lines(spark, rule, 50, overrides=ov).collect()
    ]
    assert all(c.startswith("SN-") and 100 <= int(c[3:]) < 200 for c, _, _ in rows)
    assert all(1.0 <= float(f) < 2.0 for _, f, _ in rows)
    assert {w for _, _, w in rows} <= {"alpha", "beta"}
