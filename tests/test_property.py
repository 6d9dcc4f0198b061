"""Property-based WPL tests (hypothesis): for a random simple rule, every
generated line must parse back successfully — the generator/parser duality
the reference asserts in tests/wpgen_rule_exec.rs, over a much wider rule
space than the fixed fixtures."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from wp_motor_spark.wpl import compile_rule, parse_wpl
from wp_motor_spark.wpl.generator import generate_lines

# field types that are safely composable in any order with whitespace seps
_TYPES = st.sampled_from(
    ["ip", "digit", "float", "bool", "hex", "sn", "time_3339", "http/status",
     "domain", "email", "chars", "url"]
)


@st.composite
def simple_rules(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    fields = []
    for i in range(n):
        t = draw(_TYPES)
        quoted = t == "chars" and draw(st.booleans())
        fields.append((t, f"f{i}", quoted))
    parts = []
    for t, name, quoted in fields:
        parts.append(f"{t}:{name}" + ('"' if quoted else ""))
    return "rule prop { (" + ",".join(parts) + ") }"


_spark_holder = {}


@pytest.fixture(scope="module", autouse=True)
def _hold_spark(spark):
    _spark_holder["s"] = spark
    yield
    _spark_holder.clear()


@given(rule_text=simple_rules())
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_generated_lines_parse(rule_text):
    spark = _spark_holder["s"]
    rule = parse_wpl(rule_text)[0]
    lines = generate_lines(spark, rule, 20)
    parsed = compile_rule(rule).extract(lines)
    bad = parsed.where(F.col("_disposition") != "success")
    assert bad.count() == 0, (rule_text, bad.first())
