"""protocol/json.rs parity sweep (r12): the reference's own JSON field
test bodies driven against the engine.

Representation (documented in wpl/compiler.py): the reference flattens a
JSON value into dynamic per-key DataFields ('a/b' nesting, 'k[i]' array
elements, json_impl.rs proc_value); a static Spark schema cannot hold a
dynamic key set, so undeclared keys land in ONE map<string,string>
column named by the field (kv fields use the same map shape). Declared
refs stay individual typed columns, and sub-parsers receive the
SOURCE-ESCAPED leaf text exactly like json_impl.rs feeds fpu.parse the
raw `v.to_string()` slice (its str mode).
"""

import json

import pytest
from pyspark.sql import functions as F

from wp_motor_spark.wpl import compile_rule, parse_wpl

REF_JSON = (
    "/root/reference/crates/wp-lang/src/eval/value/parser/protocol/json.rs"
)


def _fixture(name: str) -> str:
    import re

    src = open(REF_JSON).read()
    return re.search(r'const %s: &str = r#"(.*?)"#;' % name, src, re.S).group(1)


def _one(spark, rule_src, data):
    cr = compile_rule(parse_wpl(rule_src)[0])
    df = spark.createDataFrame([(data,)], ["value"])
    return cr.extract(df).first()


def test_json_std_validity(spark):
    """json.rs test_json_std: the serde deserializer FAILS the field on
    '{"a":1,"b":2,"c":  "a" : 1 } }' — validity is a guard, not a
    lenient JsonPath get. Duplicate keys stay legal (test_json_long's
    doubled vuln_type; serde last-wins)."""
    assert _one(spark, "rule t {(json)}", '{"a":1,"b":2}')["_disposition"] == "success"
    assert (
        _one(spark, "rule t {(json)}", '{"a":1,"b":2,"c": { "a" : 1 } }')[
            "_disposition"
        ]
        == "success"
    )
    assert (
        _one(spark, "rule t {(json)}", '{"a":1,"b":2,"c":  "a" : 1 } }')[
            "_disposition"
        ]
        == "miss"
    )
    assert (
        _one(spark, "rule t {(json)}", '{"a":1,"a":2}')["_disposition"] == "success"
    )


def test_json_flatten_map(spark):
    """Bare json flattens every leaf into the remainder map: '/' paths
    for nesting (test_json_long), 'k[i]' for arrays (test_json_6), null
    leaves dropped, numbers keep their source literal — a u64 past
    i64::MAX survives verbatim (test_json_big_integer_downgrade), and
    string leaves keep the SOURCE-ESCAPED form."""
    r = _one(
        spark,
        r"rule t { (json)\, }",
        '{"name": "中国", "value": 96, "key" : ["a","b","c"], "z": null}',
    )
    assert r["_disposition"] == "success"
    assert r["json"] == {
        "name": "中国",
        "value": "96",
        "key[0]": "a",
        "key[1]": "b",
        "key[2]": "c",
    }
    big = str(2**63)
    r = _one(spark, "rule t {(json)}", '{"big": %s, "i": -42, "f": 3.1415}' % big)
    assert r["json"] == {"big": big, "i": "-42", "f": "3.1415"}
    r = _one(spark, "rule t {(json)}", r'{"p":"c:\\u\\f","n":{"q":"a\nb"}}')
    assert r["json"] == {"p": r"c:\\u\\f", "n/q": r"a\nb"}


def test_json_tianyan_wildcards(spark):
    """json.rs test_json_tianyan/2/3 over the reference's own LONG_DATA:
    `_@_origin*` (name-prefix wildcard) + `_@payload/packet_data` leave
    exactly 57 undeclared leaves; `_@*` leaves nothing; the tianyan3
    declaration set emits ONLY ip@alarm_sip and ip@_origin/sip — the
    default subfield NAME keeps the '/' path, and a bare `json@_origin`
    container declaration emits no field of its own."""
    data = _fixture("LONG_DATA")
    r = _one(spark, "rule t {(json(_@_origin*,_@payload/packet_data))}", data)
    assert r["_disposition"] == "success"
    m = r["json"]
    assert len(m) == 57
    assert not [k for k in m if k.startswith("_origin") or k == "payload/packet_data"]

    r = _one(spark, "rule t {(json(_@*))}", data)
    assert r["_disposition"] == "success"
    d = {
        k: v
        for k, v in r.asDict().items()
        if k not in ("_disposition", "_rule", "_residue", "value") and v is not None
    }
    assert d == {}

    r = _one(
        spark,
        "rule t {(json(_@*,ip@alarm_sip , json@_origin, _@_origin/*,ip@_origin/sip)) }",
        data,
    )
    assert r["_disposition"] == "success"
    d = {
        k: v
        for k, v in r.asDict().items()
        if k not in ("_disposition", "_rule", "_residue", "value") and v is not None
    }
    assert d == {"alarm_sip": "10.111.6.136", "_origin/sip": "10.111.134.201"}


def test_json_multiline_and_ws_residue(spark):
    """The serde reader spans newlines (LONG_DATA is pretty-printed) and
    a trailing '\\n' is whitespace residue = full consumption (jt1/jt2
    fixtures end in newline and parse clean in the reference)."""
    data = _fixture("JSON_DATA1")
    r = _one(spark, r"rule t {(json(chars@action/text)\\\0)}", data)
    assert r["_disposition"] == "success"
    assert r["action/text"] == (
        "父进程 /bin/bash（pid：105123）创建进程 /usr/bin/curl（pid：105129）"
        "启动参数：-fsL http://localhost:8080/api/health/ 。来源：进程创建监控"
    )
    r = _one(spark, r"rule t {(json\0)}", _fixture("JSON_DATA2"))
    assert r["_disposition"] == "success"


def test_json_chars_source_escaped(spark):
    """json.rs test_json_9 / test_json_str_mode_decoded_pipe: chars
    subfields keep the raw escaped source ('c:\\\\users...' keeps BOTH
    backslashes); json_unescape() decodes exactly once (the old decoded
    extraction double-unescaped '\\f' into a formfeed)."""
    data9 = (
        r'{"file_path":"c:\\users\\fc\\desktop\\x","state":"已处理","n":1}'
    )
    r = _one(spark, "rule t { (json(chars@file_path,_@*)) }", data9)
    assert r["file_path"] == r"c:\\users\\fc\\desktop\\x"

    r = _one(
        spark,
        "rule t {(json(chars@path,chars@txt) | take(path) | json_unescape() "
        "| take(txt) | json_unescape())}",
        r'{"path":"c:\\users\\fc\\file","txt":"line1\nline2"}',
    )
    assert r["_disposition"] == "success"
    assert r["path"] == r"c:\users\fc\file"
    assert r["txt"] == "line1\nline2"


def test_json_bare_ref_cascade_on_raw(spark):
    """json.rs test_json_take_chars2: a bare @ref subfield's auto
    cascade runs over the RAW ESCAPED leaf — escaped json-in-string
    ('{\\"text\\"...') is NOT valid JSON, so it stays chars with the
    source backslashes (the decoded form would wrongly re-parse)."""
    data = (
        r'{"action": "{\"text\": \"10.91.7.38 ok\", \"html\": \"<span>x</span>\"}"}'
    )
    r = (
        compile_rule(parse_wpl("rule t { (json(@action,_@*))}")[0])
        .extract(spark.createDataFrame([(data,)], ["value"]))
        .select(
            F.col("_disposition"),
            F.col("action.t").alias("t"),
            F.to_json("action.v").alias("v"),
        )
        .first()
    )
    assert r["_disposition"] == "success"
    assert r["t"] == "chars"
    assert json.loads(r["v"]).startswith(r'{\"text\": \"10.91.7.38 ok\"')


def test_json_pipe_targets_last_declared(spark):
    """json.rs test_json_pipe_auto_last_behavior: a field-level pipe with
    no take() operates on the LAST DECLARED subfield (b) — never on the
    undeclared-key remainder map."""
    r = _one(
        spark,
        r"rule t { (json(chars@a, chars@b) | json_unescape()) }",
        r'{"a":"noop","b":"line1\nline2","extra":1}',
    )
    assert r["_disposition"] == "success"
    assert r["b"] == "line1\nline2"
    assert r["json"] == {"extra": "1"}

    # take + guards address declared columns and remainder-map keys alike
    r = _one(
        spark,
        r"rule t { (json(chars@name, chars@code) | take(name) "
        r"| chars_has( -99) | take(code) | chars_has( aaa)) }",
        r'{"name": -99, "code": "aaa"}',
    )
    assert r["_disposition"] == "success"
    r = _one(
        spark,
        r"rule t { (json | f_digit_has( age,18 ) ) }",
        r'{  "name": "china","age": 18}',
    )
    assert r["_disposition"] == "success"
    r = _one(
        spark,
        r"rule t { (json | f_digit_has( age,19 ) ) }",
        r'{ "name": "china", "age": 18}',
    )
    assert r["_disposition"] == "miss"
    r = _one(spark, r"rule t { (json | f_has( age1 ) ) }", r'{ "age": 18}')
    assert r["_disposition"] == "miss"


def test_json_base64_subfield_and_symbol_guard(spark):
    """json.rs test_json_base64 (base64@a decodes, _@c drops the key from
    the remainder while b stays) and test_json_4/5 (symbol guard inside a
    two-json sequence with ',' separator)."""
    r = _one(
        spark,
        "rule t {(json(base64@a:_a, _@c))}",
        '{"a":"aGVsbG8=","b":2,"c": "gogogo"}',
    )
    assert r["_disposition"] == "success"
    assert r["_a"] == "hello"
    assert r["json"] == {"b": "2"}

    r = _one(
        spark,
        r"rule t { (json(symbol(中国)@name,digit@value:cpu),json)\, }",
        '{"name": "中国", "value": 96}, {"name": "空闲内存(kB)", "value": 10243}',
    )
    assert r["_disposition"] == "success"
    assert r["cpu"] == 96
