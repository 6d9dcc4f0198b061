"""Reference-unit-test sweep: crates/wp-lang/src/parser/parse_code.rs
(11 tests) — the WPL document grammar: packages, slash rule names,
preproc chains, group-level length/separator, multi-char scope
delimiters, and package-level annotations. The reference asserts Display
round-trips; the engine equivalents assert the parsed STRUCTURE."""

import pytest

from wp_motor_spark.wpl import parse_wpl
from wp_motor_spark.wpl.parser import WplSyntaxError


def test_package_and_slash_rule_names():
    """parse_code.rs test_package: package blocks with plain and
    slash-path rule names; rule key = package/name."""
    rules = parse_wpl(
        "    package test {\n"
        "                rule test { (digit<<,>>,digit,time_3339:recv_time,5*_) }\n"
        "        }\n"
    )
    assert [r.key for r in rules] == ["test/test"]
    rules = parse_wpl(
        "package test {\n"
        "        rule /service/for_test/wplab_1 {\n"
        "            (digit<<,>>,digit,time_3339:recv_time,5*_),\n"
        "            (digit:id,digit:len,time,sn,chars:dev_name,time,kv,sn,"
        "chars:dev_name,time,time,ip,kv,chars,kv,kv,chars,kv,kv,chars,chars,"
        'ip,chars,http/request<[,]>,http/agent")\n'
        "        }\n}\n"
    )
    assert rules[0].key == "test//service/for_test/wplab_1"
    assert len(rules[0].groups) == 2


def test_rules_preproc_chain_and_aliases():
    """parse_code.rs test_rules / test_pip_proc: the |a|b|c| preproc chain
    parses in order (including unregistered names like 'zip' — assembly,
    not parsing, rejects those), and two rules in one body both carry
    their own chains; 'base64' aliases 'decode/base64'."""
    r = parse_wpl(
        r" rule wparse_1 { |decode/base64|zip|unquote/unescape|(digit,time) }"
    )[0]
    assert r.preprocs == ["decode/base64", "zip", "unquote/unescape"]
    rules = parse_wpl(
        "rule wparse_1 { |base64|zip|(digit,time) }\n\n"
        "rule wparse_2 { |base64|zip|(digit,time) }"
    )
    assert len(rules) == 2
    assert all(r.preprocs == ["decode/base64", "zip"] for r in rules)


def test_package_annotation_propagates_and_copy_raw_key():
    """parse_code.rs test_package_annotation1 + ann_func.rs:104-110: a
    package-level #[tag(...),copy_raw(...)] propagates to the rules;
    copy_raw accepts ANY key but only 'name' activates the raw copy —
    copy_raw(hello:"ll") parses as a no-op."""
    rules = parse_wpl(
        '#[tag(t1:"id",t2:"sn"),copy_raw(hello:"ll")]\n'
        "package test {\n"
        "        rule /service/for_test/wplab_1 {\n"
        "            (digit<<,>>,digit,time_3339:recv_time2,5*_)\n"
        "        }\n}\n"
    )
    r = rules[0]
    assert r.tags == {"t1": "id", "t2": "sn"}
    assert r.copy_raw is None  # key != 'name' -> no-op
    r2 = parse_wpl('#[copy_raw(name:"raw_line")]\nrule a { (digit,chars) }')[0]
    assert r2.copy_raw == "raw_line"


def test_conf_map_subfield_structure():
    """parse_code.rs test_conf_map: json(base64@a:x,@b:y) — the 'a'
    subfield is base64-typed and renamed to x."""
    r = parse_wpl("rule t { (json(base64@a:x,@b:y)) }")[0]
    fld = r.groups[0].items[0]
    subs = {s.ref: s for s in fld.subfields}
    assert subs["a"].dtype == "base64" and subs["a"].name == "x"
    assert subs["b"].name == "y"


def test_conf_vec_group_forms():
    """parse_code.rs test_conf_vec: star fields, a group-level [100]
    length + \\, separator (fields keep NO own separator), multi-char
    scope delimiters ('-[' / ']*', 'http://' / '/'), and newlines inside
    the group body."""
    parse_wpl("rule t { (ip,ip) }")
    parse_wpl("rule t { (http/method,ip) }")
    parse_wpl("rule t { (*ip,ip:src) }")
    r = parse_wpl("rule t { (*ip,ip:src)[100]\\, }")[0]
    g = r.groups[0]
    assert g.sep == ","
    assert all(getattr(f, "sep", None) is None for f in g.items)
    r = parse_wpl("rule t { (chars<-[,]*>) }")[0]
    assert r.groups[0].items[0].fmt == ("-[", "]*")
    parse_wpl("rule t { (chars<http://,/>) }")
    parse_wpl("rule t { \n(\nip,\nip\n) }")


def test_parse_block_scope_with_space_and_brace():
    """parse_code.rs test_parse_block / test_parse_block2: kv subfield
    runs with \\!\\| separators, and scope delimiters containing a space
    and braces ('skyeye_abnormal {' ... '|')."""
    parse_wpl(r"rule t { (kv(digit@message_type),kv(chars@serial_num))\!\| }")
    r = parse_wpl(
        "rule t { (kv(digit@message_type),chars<skyeye_abnormal {,|>,"
        "kv(chars@serial_num),chars<},|>) }"
    )[0]
    assert len(r.groups[0].items) == 4
