"""Reference-unit-test sweep: src/sources/syslog/normalize.rs (4 tests).

The dependency-light syslog normalizer: RFC5424 first, STRICT RFC3164
second (valid month list, exact HH:MM:SS, single spaces), plaintext
passthrough last; pri decodes to facility/severity NAMES."""

from wp_motor_spark.sources.syslog import normalize


def _norm(spark, line):
    df = spark.createDataFrame([(line,)], ["value"])
    return normalize(df).first()


def test_normalize_rfc5424(spark):
    r = _norm(spark, "<14>1 2024-10-05T12:34:56Z host app 123 - - hello world")
    assert r["message"] == "hello world"
    assert r["pri"] == 14
    assert r["facility"] == "user"
    assert r["severity"] == "info"


def test_normalize_rfc3164(spark):
    r = _norm(spark, "<34>Oct 11 22:14:15 mymachine su: 'su root' failed")
    assert "su root" in r["message"]
    assert r["pri"] == 34
    assert r["facility"] == "auth"
    assert r["severity"] == "crit"


def test_normalize_plaintext(spark):
    r = _norm(spark, "just plaintext")
    assert r["message"] == "just plaintext"
    assert r["pri"] is None and r["facility"] is None and r["severity"] is None


def test_non_standard_format_should_not_strip(spark):
    """normalize.rs test_non_standard_format_should_not_strip: four
    near-miss headers must pass through whole (msg_start == 0); the
    standard RFC3164 line strips."""
    cases_passthrough = [
        # ISO timestamp after <pri> is NOT RFC3164
        "<11>2025-07-07 09:42:43,132 sentinel - info message",
        # missing space after month
        "<158>Jul23 17:18:36 skyeye SyslogClient[1]: message",
        # invalid month
        "<34>Xyz 11 22:14:15 mymachine su: test",
        # bad time separators
        "<34>Oct 11 22-14-15 mymachine su: test",
    ]
    for line in cases_passthrough:
        r = _norm(spark, line)
        assert r["message"] == line, line
        assert r["pri"] is None, line
    # the standard form parses and strips the header
    r = _norm(spark, "<158>Jul 23 17:18:36 skyeye SyslogClient[1]: message")
    assert r["message"] == "message"
    assert r["pri"] == 158
    assert r["facility"] == "local3"  # 158/8 = 19
    assert r["severity"] == "info"  # 158%8 = 6


def test_facility_severity_name_tables(spark):
    """normalize.rs facility_name/severity_name edge rows: kern/emerg at 0,
    local7/debug at the top, 'unknown' past the table."""
    r = _norm(spark, "<0>1 - - - - - - m")
    assert r["facility"] == "kern" and r["severity"] == "emerg"
    r = _norm(spark, "<191>1 - - - - - - m")
    assert r["facility"] == "local7" and r["severity"] == "debug"
    r = _norm(spark, "<999>1 - - - - - - m")
    assert r["facility"] == "unknown"  # 999/8 = 124 past the table


def test_header_mode_new_names_and_aliases(spark):
    """src/sources/syslog/mod.rs test_syslog_header_mode_new_names +
    test_syslog_header_mode_legacy_aliases: raw==keep (untouched),
    skip==strip (header removed, no tags), tag==parse (header removed,
    meta tag columns attached)."""
    from wp_motor_spark.sources.syslog import apply_header_mode

    line = "<34>Oct 11 22:14:15 mymachine su: hello"
    df = spark.createDataFrame([(line,)], ["value"])
    for mode in ("raw", "keep"):
        out = apply_header_mode(df, mode)
        assert out.first()["value"] == line
        assert "pri" not in out.columns
    for mode in ("skip", "strip"):
        out = apply_header_mode(df, mode)
        assert out.first()["value"] == "hello"
        assert "pri" not in out.columns
    for mode in ("tag", "parse"):
        out = apply_header_mode(df, mode)
        r = out.first()
        assert r["value"] == "hello"
        assert r["pri"] == 34 and r["host"] == "mymachine"
