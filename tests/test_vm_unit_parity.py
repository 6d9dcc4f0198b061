"""Reference-unit-test sweep: eval/runtime/vm_unit.rs (14 tests),
eval/builtins/bom.rs (24 tests), ast/syntax/wpl_sep.rs (16 tests).

Each case pins the reference's own assertion against this engine:
vm_unit.rs asserts parse success and (for most) full input consumption
(`assert_eq!(data, "")`); bom.rs asserts the exact BOM-stripped output;
wpl_sep.rs asserts field/separator read+consume behavior. Pure-Rust
concerns (serde roundtrips, Display impls, registry introspection) have
no engine surface and are covered where our equivalents exist
(registry.py uppercase-normalized names, tests below).

Dispositions: the reference tests assert WINNOW-level success —
parse_groups() -> Ok with residue returned alongside. Our _disposition
adds the processor.rs routing layer on top (success / partial by the
<=20% residue rule), so cases with deliberate residue accept either
label and pin the residue string exactly.
"""

import pytest
from pyspark.sql import functions as F

from wp_motor_spark.wpl import compile_rule, parse_wpl
from wp_motor_spark.wpl.preproc import apply_preprocs, strip_bom_binary


def _one(spark, wpl, line):
    cr = compile_rule(parse_wpl(wpl)[0])
    return cr.extract(spark.createDataFrame([(line,)], ["value"])).first()


# ---------------------------------------------------------------- vm_unit.rs

HUAWEI = (
    "<190>May 15 2023 07:09:12 KM-KJY-DC-USG12004-B02 "
    "%%01POLICY/6/POLICYPERMIT(l):CID=0x814f041e;vsys=CSG_Security, protocol=6"
)


@pytest.mark.parametrize(
    "name,wpl,line,want_residue",
    [
        # log_test_ty (vm_unit.rs:297): *auto over a syslog-prefixed line
        ("log_test_ty", r"rule t { (*auto\s) }",
         '<158> May 15 14:19:16 skyeye SyslogClient[1]: 2023-05-15 '
         '14:19:16|10.180.8.8|alarm| {"_origin": 1}', None),
        # log_test_ips (vm_unit.rs:309): kv-style firewall audit lines
        ("log_test_ips_1", r"rule t { (*auto\s) }",
         'id=tos time="2023-05-15 09:11:53" fw=OS  pri=5 type=mgmt '
         'user=superman src=10.111.233.51 op="Modify pwd of manager" '
         'result=0 recorder=manager_so msg="null"', None),
        ("log_test_ips_2", r"rule t { (*auto\s) }",
         'id=tos time="2023-05-15 09:11:53" fw=OS  pri=5 type=mgmt '
         'user=superman src=10.111.233.51 op="system admininfo modify '
         'name zhaolei new_password QXF5dW53ZWleMDIwNw== privilege config '
         'login_type local comment 安全管理员 add" result=0 recorder=config '
         'msg="nuid=tos time="2023-05-15 09:11:53" fw=OS  pri=5 type=mgmt '
         'user=superman src=10.111.233.51 op="webtr webadmin show" '
         'result=-1 recorder=config msg="error -8010 : 无效输入，分析" ', None),
        # log_test_nginx (vm_unit.rs:323): assert_eq!(data, "")
        ("log_test_nginx", r"rule t { (*auto\s) }",
         '192.168.1.2 - - [06/Aug/2019:12:12:19 +0800] "GET /nginx-logo.png '
         'HTTP/1.1" 200 368 "http://119.122.1.4/" "Mozilla/5.0 (Macintosh; '
         'Intel Mac OS X 10_14_5) AppleWebKit/537.36 (KHTML, like Gecko) '
         'Chrome/75.0.3770.142 Safari/537.36" "-"', ""),
        # test_huawei_default (vm_unit.rs:335): assert_eq!(data, "")
        ("test_huawei_default", r"rule t { (*auto\s) }",
         "<190>May 15 2023 07:09:12 KM-KJY-DC-USG12004-B02 "
         "%%01POLICY/6/POLICYPERMIT(l):CID=0x814f041e;vsys=CSG_Security, "
         "protocol=6, source-ip=10.111.117.49, source-port=34616, "
         "destination-ip=10.111.48.230, destination-port=50051, "
         "time=2023/5/15 15:09:12, source-zone=untrust, "
         "destination-zone=trust, application-name=, "
         "line-name=HO202212080377705-1.%", ""),
        # test_huawei_detail (vm_unit.rs:348): digit with <,> scope, then
        # typed fields with per-field separators; full consumption.
        # fdc2_1("digit", scope <,>) = digit<<,>> ; fdc2(t, s) = single field
        ("test_huawei_detail",
         r"rule t { (digit<<,>>,auto\s,chars\s,chars\:,kv\;,auto\,,auto\,) }",
         HUAWEI, ""),
        # test_huawei_simple (vm_unit.rs:376)
        ("test_huawei_simple", r"rule t { (*auto\s,chars\:,auto\;,*auto\,) }",
         HUAWEI, ""),
        # test_huawei_simple2 (vm_unit.rs:393): symbol(<190>)[5] = symbol
        # content with the [n] length modifier
        ("test_huawei_simple2",
         r"rule t { (symbol(<190>)[5],time\s,symbol(KM)[2],chars\:,auto\;,*auto\,) }",
         HUAWEI, ""),
        # test_gen (vm_unit.rs:411): typed CSV then *auto tail
        ("test_gen", r"rule t { (digit\,,time\,,sn\,,chars\,,time\,,*auto\,) }",
         "2345,2021-7-15 7:50:32,9OPP-MU-JME2-YGUW,chars_740,"
         "2022-1-18 19:30:30,jki=BkRzBo0f,138.11.13.43,tEu=GRcCwKkR,"
         "chars_493,Mrc=EskxskU3,sYp=jfKkn7th,UBa=eKhcfd9h,nXa=ZQSta6Je", ""),
        # test_gen2 (vm_unit.rs:429): fully-typed 13-field CSV, two lines
        ("test_gen2",
         r"rule t { (digit\,,time\,,sn\,,chars\,,time\,,kv\,,ip\,,kv\,,chars\,,kv\,,kv\,,kv\,,kv\,) }",
         "7106,2020-6-10 2:54:9,U5BH-UC-UQVY-MMKU,chars_472,2020-9-22 "
         "13:4:6,Emm=LXJDV5DC,22.161.67.67,nsL=LvVRv5uf,chars_1534,"
         "DNw=0xCQKTaQ,UFh=dMPbabRG,q29=aMsZTj83,oUi=ywMsKT2G", ""),
        ("test_gen2_b",
         r"rule t { (digit\,,time\,,sn\,,chars\,,time\,,kv\,,ip\,,kv\,,chars\,,kv\,,kv\,,kv\,,kv\,) }",
         "1857,2021-4-10 0:46:8,R2IP-IF-06UT-7KUU,chars_1914,2021-4-15 "
         "2:19:43,u6s=TNSAlucV,228.211.38.109,k02=doYanSlf,chars_276,"
         "SIw=nu8atSqT,84e=e6qUb2k7,aVs=pk8M8rQU,5An=9upLU8aa", ""),
        # test_ignore (vm_unit.rs:489): four ignore fields, full consumption
        ("test_ignore", r"rule t { (_\,,_\,,_\,,_\,) }",
         "2345,2021-7-15 7:50:32,9OPP-MU-JME2-YGUW,chars_740", ""),
        # test_ignore_cnt (vm_unit.rs:505) cnt=4: counted repeat 4*_ over
        # exactly 4 fields -> data == ""
        ("test_ignore_cnt_4", r"rule t { (4*_\,) }",
         "2345,2021-7-15 7:50:32,9OPP-MU-JME2-YGUW,chars_740", ""),
    ],
)
def test_vm_unit_parse_cases(spark, name, wpl, line, want_residue):
    row = _one(spark, wpl, line)
    assert row["_disposition"] == "success", (name, row["_disposition"])
    if want_residue is not None:
        assert (row["_residue"] or "") == want_residue, (name, row["_residue"])


def test_vm_unit_ignore_cnt_3_leaves_residue(spark):
    """vm_unit.rs test_ignore_cnt cnt=3: 3*_ consumes exactly three
    comma-separated fields AND the trailing separator (mechanism.rs
    try_consume_sep after read_until_sep_repeat), leaving 'chars_740' —
    NOT ',chars_740'. Parse succeeds; the processor layer labels the
    18.75% residue 'partial' under the <=20% routing rule."""
    row = _one(spark, r"rule t { (3*_\,) }",
               "2345,2021-7-15 7:50:32,9OPP-MU-JME2-YGUW,chars_740")
    assert row["_disposition"] in ("success", "partial")
    assert row["_residue"] == "chars_740"


def test_plg_pipe_registry_uppercase_lookup():
    """vm_unit.rs test_pipe_unit_direct_lookup /
    test_simplified_assemble_ins_logic: names normalize to uppercase on
    register AND lookup; a step registered under 'plg_pipe/x' is NOT
    findable as bare 'x' (registration stores the full name)."""
    from wp_motor_spark.wpl.registry import get_plg_pipe, register_plg_pipe

    register_plg_pipe("vmunit-direct-test", lambda c: F.concat(c, F.lit("-mock")))
    # lookup is case-insensitive (uppercase-normalized both ways)
    assert get_plg_pipe("VMUNIT-DIRECT-TEST") is not None
    assert get_plg_pipe("vmunit-direct-test") is not None
    with pytest.raises(KeyError):
        get_plg_pipe("vmunit-never-registered")


# ---------------------------------------------------------------- bom.rs

_U8 = b"\xef\xbb\xbf"
_U16LE = b"\xff\xfe"
_U16BE = b"\xfe\xff"
_U32LE = b"\xff\xfe\x00\x00"
_U32BE = b"\x00\x00\xfe\xff"


@pytest.mark.parametrize(
    "name,data,want",
    [
        # detection cases (bom.rs:141-181) exercised through removal
        ("utf8", _U8 + b"hello", b"hello"),
        ("utf16_le", _U16LE + b"hello", b"hello"),
        ("utf16_be", _U16BE + b"world", b"world"),
        ("utf32_le", _U32LE + b"test", b"test"),
        ("utf32_be", _U32BE + b"data", b"data"),
        ("no_bom", b"hello world", b"hello world"),
        # too short for a complete BOM -> unchanged (bom.rs:177)
        ("too_short", b"\xef\xbb", b"\xef\xbb"),
        ("no_bom_bytes", b"no bom here", b"no bom here"),
        ("empty", b"", b""),
        ("only_bom", _U8, b""),
        ("chinese_utf8", _U8 + "你好世界".encode(), "你好世界".encode()),
        # BOM in the middle (bom.rs:326)
        ("middle", b"hello" + _U8 + b"world", b"helloworld"),
        # multiple BOMs (bom.rs:342)
        ("multiple", _U8 + b"start" + _U8 + b"middle" + _U8 + b"end",
         b"startmiddleend"),
        # mixed BOM types (bom.rs:361)
        ("mixed", _U8 + b"utf8" + _U16LE + b"utf16" + _U16BE + b"data",
         b"utf8utf16data"),
        # BOM at end (bom.rs:380)
        ("at_end", b"data" + _U8, b"data"),
        # consecutive BOMs (bom.rs:392)
        ("consecutive", _U8 * 3 + b"text", b"text"),
        # Chinese around mid-line BOMs (bom.rs:406)
        ("chinese_mid", b"start" + _U8 + "中文".encode() + _U8 + "内容".encode(),
         b"start" + "中文内容".encode()),
        # UTF-32 LE must win over UTF-16 LE at the same offset (bom.rs:35)
        ("u32le_before_u16le", _U32LE + b"x" + _U16LE + b"y", b"xy"),
        ("u32be_before_u16be", _U32BE + b"x" + _U16BE + b"y", b"xy"),
    ],
)
def test_bom_binary_strip(spark, name, data, want):
    df = spark.createDataFrame([(data,)], "b binary")
    got = df.select(strip_bom_binary(F.col("b")).alias("o")).first()["o"]
    assert bytes(got) == want, name


def test_bom_string_strip_all_positions(spark):
    """strip/bom on the STRING pipeline (bom.rs String arm): the UTF-8 BOM
    survives a utf-8 decode as U+FEFF and is removed at ALL positions;
    UTF-16/32 BOM bytes cannot occur in valid UTF-8, so the FEFF strip is
    full parity for string columns (preserves container type trivially)."""
    bom = "﻿"
    cases = [
        (bom + "hello", "hello"),
        (bom * 3 + "text", "text"),
        ("hello" + bom + "world", "helloworld"),
        ("data" + bom, "data"),
        (bom, ""),
        ("", ""),
        (bom + "你好世界", "你好世界"),
        ("no bom here", "no bom here"),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], ["value"])
    out = df.select(
        "value", apply_preprocs(F.col("value"), ["strip/bom"]).alias("o")
    ).collect()
    want = dict(cases)
    for r in out:
        assert r["o"] == want[r["value"]]


# ---------------------------------------------------------------- wpl_sep.rs

def test_sep_whitespace_field_and_consume(spark):
    """wpl_sep.rs test_whitespace_sep_read_until + consume: \\S reads
    until space OR tab and consumes the separating run; a later \\0 field
    takes the rest."""
    # space-separated then tab-separated under the same \S rule
    r = _one(spark, r"rule t { (chars:a\S,chars:b\0) }", "hello world")
    assert r["_disposition"] == "success"
    assert r["a"] == "hello" and r["b"] == "world"
    r = _one(spark, r"rule t { (chars:a\S,chars:b\0) }", "hello\tworld")
    assert r["_disposition"] == "success"
    assert r["a"] == "hello" and r["b"] == "world"


def test_sep_tab_field_contains_spaces(spark):
    """wpl_sep.rs test_tab_sep_read_until: a \\t-separated field may
    contain spaces (read_until_sep takes to the tab)."""
    r = _one(spark, r"rule t { (chars:a\t,chars:b\t,chars:c\0) }",
             "field1\tfield2\tfield3")
    assert r["_disposition"] == "success"
    assert (r["a"], r["b"], r["c"]) == ("field1", "field2", "field3")
    r = _one(spark, r"rule t { (chars:u\t,chars:age\t,chars:city\0) }",
             "user one\t2 5\tBei jing")
    assert (r["u"], r["age"], r["city"]) == ("user one", "2 5", "Bei jing")


def test_sep_pattern_field_literal_and_glob(spark):
    """wpl_sep.rs pattern integration: a literal pattern sep {abc} splits
    field content at the pattern (test_pattern_read_until_sep_literal +
    test_pattern_read_then_consume); a glob pattern {*=}'s star belongs
    to the FIELD content ('key'), '=' is the consumed separator
    (test_pattern_read_until_sep_glob)."""
    r = _one(spark, r"rule t { (chars:a{abc},chars:b\0) }", "xyzabcdef")
    assert r["_disposition"] == "success"
    assert r["a"] == "xyz" and r["b"] == "def"
    # read-then-consume round trip with a literal ',' pattern
    r = _one(spark, r"rule t { (chars:a{,},chars:b\0) }", "aaa,bbb")
    assert r["a"] == "aaa" and r["b"] == "bbb"
    # whitespace-glob pattern {\s=}: 'key  =value'
    r = _one(spark, r"rule t { (chars:k{\s=},chars:v\0) }", "key  =value")
    assert r["k"] == "key" and r["v"] == "value"


def test_sep_pattern_no_match_takes_rest(spark):
    """wpl_sep.rs test_pattern_read_until_sep_no_match: when the pattern
    never occurs, the field takes the whole rest."""
    r = _one(spark, r"rule t { (chars:a{xyz}) }", "abcdef")
    assert r["a"] == "abcdef"
    assert (r["_residue"] or "") == ""


def test_sep_enum_shortcut_equivalence(spark):
    """wpl_sep.rs test_sep_enum_from_str engine surface: \\s==space sep,
    \\t==tab, \\0==to-end; exercised as field separators."""
    r = _one(spark, r"rule t { (chars:a\s,chars:b\0) }", "one two three")
    assert r["a"] == "one" and r["b"] == "two three"
    r = _one(spark, r"rule t { (chars:a\t,chars:b\0) }", "one two\tthree")
    assert r["a"] == "one two" and r["b"] == "three"
    r = _one(spark, r"rule t { (chars:a\0) }", "every thing 0 here")
    assert r["a"] == "every thing 0 here"


# ------------------------------------------------------- tcp framing modes


def test_framing_modes_line_len_auto():
    """src/sources/tcp framing modes (config.rs auto|line|len + the live
    dispatch in conn/connection.rs extract_message): auto prefers the
    length prefix and falls back to newline (framing.rs
    auto_prefers_len_then_line); len-only waits on an incomplete payload
    (framing.rs octet_extracts_once_complete); 'length' aliases 'len'."""
    import pytest as _pytest

    from wp_motor_spark.sources.syslog import frame_buffer

    # auto: "5 hello\n" -> len frame wins, newline not treated as data
    msgs, tail = frame_buffer(b"5 hello\n", "auto")
    assert msgs == [b"hello"]
    # the newline after the frame is an empty line -> dropped, no tail
    assert tail == b""
    # auto fallback to newline when no length prefix
    msgs, tail = frame_buffer(b"abc\n", "auto")
    assert msgs == [b"abc"] and tail == b""

    # line mode: a length-prefixed payload is NOT recognized
    msgs, tail = frame_buffer(b"5 hello\nrest", "line")
    assert msgs == [b"5 hello"] and tail == b"rest"

    # len mode: two complete frames, then an incomplete one waits
    msgs, tail = frame_buffer(b"5 hello5 world7 incom", "len")
    assert msgs == [b"hello", b"world"] and tail == b"7 incom"
    # len mode never falls back to newline
    msgs, tail = frame_buffer(b"abc\ndef\n", "len")
    assert msgs == [] and tail == b"abc\ndef\n"

    # 'length' alias (config.rs:44)
    msgs, _ = frame_buffer(b"5 hello", "length")
    assert msgs == [b"hello"]

    with _pytest.raises(ValueError):
        frame_buffer(b"", "bogus")
