"""Reference-unit-test sweep: wp-oml/src/core/evaluator/transform/pipe/
other.rs (11 tests) — the path/url/base64/escape/time/skip/nth/
starts_with/map_to pipe family, driven with the reference's own inputs
and expected values."""

import pytest

from wp_motor_spark.oml.compiler import compile_oml


def _run(spark, conf, data, schema=None):
    if schema:
        df = spark.createDataFrame([tuple(data.values())], schema)
    else:
        df = spark.createDataFrame([tuple(data.values())], list(data.keys()))
    return compile_oml(conf).apply(df).first().asDict()


def test_pipe_path_get(spark):
    """other.rs test_pipe_path_get: path(name) takes the basename of a
    windows path."""
    r = _run(
        spark,
        "name : t\n---\nX : chars =  pipe take(A1) | path(name);\n",
        {"A1": "C:\\Users\\wplab\\AppData\\Local\\Temp\\B8A93152-2B59-"
               "426D-BE5F-5521D4D2D957\\api-ms-win-core-file-l1-2-1.dll"},
    )
    assert r["X"] == "api-ms-win-core-file-l1-2-1.dll"


def test_pipe_url_get(spark):
    """other.rs test_pipe_url_get: url(domain|host|uri|path|params) over a
    full URL with port, query and fragment."""
    r = _run(
        spark,
        "name : t\n---\n"
        "A : chars =  pipe read(A1) | url(domain);\n"
        "B : chars =  pipe read(A1) | url(host);\n"
        "C : chars =  pipe read(A1) | url(uri);\n"
        "D : chars =  pipe read(A1) | url(path);\n"
        "E : chars =  pipe read(A1) | url(params);\n",
        {"A1": "https://a.b.com:8888/OneCollector/1.0?cors=true&"
               "content-type=application/x-json-stream#id1"},
    )
    assert r["A"] == "a.b.com"
    assert r["B"] == "a.b.com:8888"
    assert r["C"] == ("/OneCollector/1.0?cors=true&content-type="
                      "application/x-json-stream#id1")
    assert r["D"] == "/OneCollector/1.0"
    assert r["E"] == "cors=true&content-type=application/x-json-stream"


def test_pipe_base64_roundtrip_and_imap(spark):
    """other.rs test_pipe_base64: encode|decode() round-trips; the Imap
    charset decodes a real POST-header blob."""
    b64 = ("UE9TVCAvYWNjb3VudCBIVFRQLzEuMQ0KSG9zdDogZnRwLXh0by5lbmVyZ3ltb3N0"
           "LmNvbTo2MTIyMg0KVXNlci1BZ2VudDogTW96aWxsYS81LjAgKE1hY2ludG9zaDsg"
           "SW50ZWwgTWFjIE9TIFggMTBfMTVfNykgQXBwbGVXZWJLaXQvNTM3LjM2IChLSFRN"
           "TCwgbGlrZSBHZWNrbykgQ2hyb21lLzEwMS4wLjAuMCBTYWZhcmkvNTM3LjM2DQpD"
           "b250ZW50LUxlbmd0aDogMTE0DQpDb25uZWN0aW9uOiBjbG9zZQ0KQ29udGVudC1U"
           "eXBlOiBhcHBsaWNhdGlvbi94LXd3dy1mb3JtLXVybGVuY29kZWQNCkFjY2VwdC1F"
           "bmNvZGluZzogZ3ppcA0KDQo=")
    r = _run(
        spark,
        "name : t\n---\n"
        "X : chars =  pipe take(A1) | base64_encode | base64_decode() ;\n"
        "Y : chars =  pipe take(B2) | base64_decode(Imap) ;\n",
        {"A1": "hello1", "B2": b64},
    )
    assert r["X"] == "hello1"
    assert r["Y"].startswith("POST /account HTTP/1.1")
    assert "ftp-xto.energymost.com:61222" in r["Y"]


def test_escape_roundtrips(spark):
    """other.rs test_html_escape / test_str_escape / test_json_escape:
    html and json escape|unescape round-trip (incl. an emoji); str_escape
    backslash-escapes the quote."""
    r = _run(
        spark,
        "name : t\n---\n"
        "X : chars =  pipe take(A1) | html_escape | html_unescape;\n"
        "Y : chars =  pipe take(B1) | str_escape  ;\n"
        "Z : chars =  pipe take(C1) | json_escape  | json_unescape ;\n",
        {"A1": "<html>", "B1": 'html"1_', "C1": "This is a crab: 🦀"},
    )
    assert r["X"] == "<html>"
    assert r["Y"] == r'html\"1_'
    assert r["Z"] == "This is a crab: 🦀"


def test_pipe_time_to_ts(spark):
    """other.rs test_pipe_time: a time(2000-10-10 0:0:0) literal converts
    to epoch seconds/millis/micros with the reference's own expected
    values (971107200 — the literal carries the reference's +08:00
    fixed-offset semantics pinned in the earlier time-family sweep)."""
    r = _run(
        spark,
        "name : t\n---\nY  =  time(2000-10-10 0:0:0);\n"
        "X  =  pipe  read(Y) | Time::to_ts ;\n"
        "Z  =  pipe  read(Y) | Time::to_ts_ms ;\n"
        "U  =  pipe  read(Y) | Time::to_ts_us ;\n",
        {"A1": "x"},
    )
    assert r["X"] == 971107200
    assert r["Z"] == 971107200000
    assert r["U"] == 971107200000000


def test_pipe_skip_empty(spark):
    """other.rs test_pipe_skip: skip_empty turns a zero digit and an empty
    array into the absent field (from_ignore); collect keeps the raw
    values."""
    r = _run(
        spark,
        "name : t\n---\n"
        "Y  =  pipe  read(A1) | skip_empty ;\n"
        "Z  =  pipe  read(A2) | skip_empty ;\n",
        {"A1": 0, "A2": []},
        schema="A1 long, A2 array<string>",
    )
    assert r["Y"] is None and r["Z"] is None


def test_pipe_nth_get_obj(spark):
    """other.rs test_pipe_obj_get: read an array-of-objects field, nth(0)
    then get a nested path (columnar carrier: JSON text)."""
    val = '[{"path": "c:\\\\x\\\\test.exe", "size": 189446}]'
    r = _run(
        spark,
        "name : t\n---\nY  =  pipe read(current_process) | nth(0) | get(path) ;\n",
        {"current_process": val},
    )
    assert r["Y"] == "c:\\x\\test.exe"


def test_pipe_starts_with_gate(spark):
    """other.rs test_pipe_start_with: starts_with passes the value through
    on match and yields the absent field otherwise."""
    ok = _run(spark,
              "name : t\n---\nX  =  pipe take(url) | starts_with('https://');\n",
              {"url": "https://example.com"})
    assert ok["X"] == "https://example.com"
    no = _run(spark,
              "name : t\n---\nX  =  pipe take(url) | starts_with('https://');\n",
              {"url": "http://example.com"})
    assert no.get("X") is None


def test_pipe_map_to(spark):
    """other.rs test_pipe_map_to: map_to replaces any present value with
    the constant."""
    r = _run(spark,
             "name : t\n---\nA  =  pipe take(status) | map_to('success');\n",
             {"status": "200"})
    assert r["A"] == "success"
