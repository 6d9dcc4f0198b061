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


# ---------------------------------------------------------------- r8 surfaces


@st.composite
def _speed_profiles(draw):
    kind = draw(st.sampled_from(
        ["constant", "sinusoidal", "stepped", "ramp", "random_walk"]
    ))
    if kind == "constant":
        return {"type": kind, "rate": draw(st.integers(1, 100000))}
    if kind == "sinusoidal":
        return {
            "type": kind,
            "base": draw(st.integers(1, 50000)),
            "amplitude": draw(st.integers(0, 50000)),
            "period_secs": draw(st.floats(0.1, 1000)),
        }
    if kind == "stepped":
        steps = draw(st.lists(
            st.tuples(st.floats(0.1, 60), st.integers(1, 50000)),
            min_size=1, max_size=5,
        ))
        return {
            "type": kind,
            "steps": [[d, r] for d, r in steps],
            "loop_forever": draw(st.booleans()),
        }
    if kind == "ramp":
        return {
            "type": kind,
            "start": draw(st.integers(1, 50000)),
            "end": draw(st.integers(1, 50000)),
            "duration_secs": draw(st.floats(0.1, 1000)),
        }
    return {
        "type": kind,
        "base": draw(st.integers(1, 50000)),
        "variance": draw(st.floats(0.0, 1.0)),
    }


@given(profile=_speed_profiles(), t=st.floats(0, 10000))
@settings(max_examples=200, deadline=None)
def test_speed_profiles_always_positive_and_bounded(profile, t):
    """controller.rs invariants: every model floors at 1 row/s and stays
    within its documented envelope."""
    from wp_motor_spark.wpl.speed_profile import SpeedController

    rate = SpeedController(profile, seed=1).speed_at(t)
    assert rate >= 1
    kind = profile["type"]
    if kind == "constant":
        assert rate == profile["rate"]
    elif kind == "sinusoidal":
        assert rate <= profile["base"] + profile["amplitude"]
    elif kind == "stepped":
        assert rate in {r for _, r in profile["steps"]}
    elif kind == "ramp":
        lo = min(profile["start"], profile["end"])
        hi = max(profile["start"], profile["end"])
        assert lo <= rate <= hi or rate == 1
    elif kind == "random_walk":
        assert rate <= profile["base"] * (1 + profile["variance"]) + 1


@given(profile=_speed_profiles(),
       d1=st.floats(0.5, 100), d2=st.floats(0.5, 100))
@settings(max_examples=60, deadline=None)
def test_planned_rows_monotone_in_duration(profile, d1, d2):
    from wp_motor_spark.wpl.speed_profile import SpeedController

    lo, hi = sorted([d1, d2])
    a = SpeedController(profile, seed=2).planned_rows(lo)
    b = SpeedController(profile, seed=2).planned_rows(hi)
    assert a <= b


def _trim_quotes_ref(s: str) -> str:
    """Literal port of sqlite_ext.rs trim_quotes, as the test oracle."""
    t = s.strip()
    b = t.encode("utf-8", "surrogatepass")
    if len(b) >= 2:
        hidx = 0
        if len(b) >= 2 and b[0:1] == b"\\" and b[1:2] in (b'"', b"'"):
            hidx = 1
        if len(b) >= 2:
            tidx = len(b) - 1
            head, tail = b[hidx], b[tidx]
            if (head == ord('"') and tail == ord('"')) or (
                head == ord("'") and tail == ord("'")
            ):
                start = hidx + 1
                end_excl = tidx
                if tidx >= 1 and b[tidx - 1 : tidx] == b"\\":
                    end_excl = tidx - 1
                if start <= end_excl:
                    return b[start:end_excl].decode("utf-8", "surrogatepass")
                return ""
    return t


@given(s=st.text(
    alphabet=st.sampled_from(list("ab \"'\\x1")), min_size=0, max_size=8
))
@settings(max_examples=150, deadline=None)
def test_trim_quotes_matches_reference_port(s):
    from wp_motor_spark import knowdb as K

    spark = _spark_holder["s"]
    got = (
        spark.createDataFrame([(s,)], ["v"])
        .select(K.trim_quotes(F.col("v")).alias("t"))
        .collect()[0]["t"]
    )
    assert got == _trim_quotes_ref(s), repr(s)


import re as _re


def _cidr4_ref(s: str):
    """Literal port of sqlite_ext.rs parse_cidr4 -> (min, max) or (0, 0):
    Ipv4Addr::from_str octets (no leading zeros/signs/spaces, <= 255) and
    u32::from_str prefix (optional '+', leading zeros fine, <= 32)."""
    t = s.strip().strip('"')
    parts = t.split("/")
    if len(parts) != 2:
        return 0, 0
    ip_s, pfx_s = parts
    if not _re.fullmatch(
        r"(0|[1-9]\d{0,2})\.(0|[1-9]\d{0,2})\.(0|[1-9]\d{0,2})\.(0|[1-9]\d{0,2})",
        ip_s,
    ):
        return 0, 0
    vals = [int(x) for x in ip_s.split(".")]
    if any(v > 255 for v in vals):
        return 0, 0
    if not _re.fullmatch(r"\+?\d+", pfx_s):
        return 0, 0
    pfx = int(pfx_s)
    if pfx > 32:
        return 0, 0
    ip = (vals[0] << 24) | (vals[1] << 16) | (vals[2] << 8) | vals[3]
    mask = 0 if pfx == 0 else (0xFFFFFFFF << (32 - pfx)) & 0xFFFFFFFF
    return ip & mask, (ip & mask) | (~mask & 0xFFFFFFFF)


@given(
    a=st.integers(0, 255), b=st.integers(0, 255),
    c=st.integers(0, 255), d=st.integers(0, 255),
    pfx=st.integers(-2, 40),
    junk=st.sampled_from(["", " ", '"', "/", "x", "08"]),
)
@settings(max_examples=120, deadline=None)
def test_cidr4_matches_reference_port(a, b, c, d, pfx, junk):
    from wp_motor_spark import knowdb as K

    spark = _spark_holder["s"]
    s = f"{a}.{b}.{c}.{d}/{pfx}{junk}"
    want = _cidr4_ref(s)
    row = (
        spark.createDataFrame([(s,)], ["v"])
        .select(
            K.cidr4_min(F.col("v")).alias("lo"),
            K.cidr4_max(F.col("v")).alias("hi"),
        )
        .collect()[0]
    )
    assert (row["lo"], row["hi"]) == want, s


def _ip4_text_ref(v) -> str:
    """Literal port of sqlite_ext.rs ip4_text + ipv4_from_u32: integer
    values wrap `i as u32`; TEXT trims then parse::<u64>() (digits with
    optional leading '+', must fit u64) and truncates as u32; parse
    failure -> 0."""
    if isinstance(v, int):
        u = v & 0xFFFFFFFF
    else:
        s = v.strip()
        body = s[1:] if s.startswith("+") else s
        if body.isdigit() and int(body) <= 0xFFFFFFFFFFFFFFFF:
            u = int(body) & 0xFFFFFFFF
        else:
            u = 0
    return f"{(u >> 24) & 255}.{(u >> 16) & 255}.{(u >> 8) & 255}.{u & 255}"


@settings(max_examples=30, deadline=None)
@given(
    st.one_of(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.text(
            alphabet="0123456789+- .abc\t",
            max_size=24,
        ),
        st.integers(min_value=0, max_value=2**32 + 10).map(str),
    )
)
def test_ip4_text_matches_reference_port(v):
    from wp_motor_spark import knowdb as K

    spark = _spark_holder["s"]
    col = "bigint" if isinstance(v, int) else "string"
    got = (
        spark.createDataFrame([(v,)], schema=f"v {col}")
        .select(K.ip4_text(F.col("v")).alias("t"))
        .collect()[0]["t"]
    )
    assert got == _ip4_text_ref(v), repr(v)
