"""Reference-unit-test sweep: src/core/parser/wpl_engine/processor.rs
(8 tests) — the batch-parse dispatcher that groups parsed records per
rule sink, routes partial tails to the residue channel, tracks missed
packets with deepest-failure diagnostics, and enriches records with
source tags only when the key is absent.

Engine surfaces driven: Pipeline.transform (sink grouping + residue +
miss + tag enrichment) and MultiParser.diagnose (deepest-rule miss)."""

from pyspark.sql import functions as F

from wp_motor_spark.pipeline import Pipeline
from wp_motor_spark.wpl.compiler import MultiParser

# processor.rs:263-268 — verbatim samples ("来源于 crates/wp-lang 的
# bench/test 数据")
NGINX_RULE = """
rule nginx_access {
  (ip,2*_,time/clf<[,]>,http/request",http/status,digit,chars",http/agent",_")
}
"""
JSON_RULE = """
rule json_payload {
  (json(chars@data))
}
"""
NGINX_SAMPLE = (
    '222.133.52.20 - - [06/Aug/2019:12:12:19 +0800] "GET /nginx-logo.png '
    'HTTP/1.1" 200 368 "http://119.122.1.4/" "Mozilla/5.0 (Macintosh; '
    "Intel Mac OS X 10_14_5) AppleWebKit/537.36 (KHTML, like Gecko) "
    'Chrome/75.0.3770.142 Safari/537.36" "-"'
)
JSON_SAMPLE = '{ "data": "192.168.1.1" }'

BOTH_RULES = NGINX_RULE + JSON_RULE


def test_groups_sink_packages_and_residue(spark):
    """processor.rs batch_parse_package_groups_sink_packages_and_residue:
    a clean nginx line and a TAIL-suffixed one BOTH land in the
    nginx_access group (partial ≠ dropped); the json line lands in
    json_payload; the tail is recorded on the residue channel as
    (rule, 'TAIL'); nothing is missed."""
    pipe = Pipeline(wpl=BOTH_RULES, omls=[])
    df = spark.createDataFrame(
        [(NGINX_SAMPLE,), (JSON_SAMPLE,), (NGINX_SAMPLE + "TAIL",)], ["value"]
    )
    branches = pipe.transform(df)
    # model-less rules all flow to the default branch, keyed by _rule
    default = branches["default"]
    by_rule = {
        r["_rule"]: r["count"]
        for r in default.groupBy("_rule").count().collect()
    }
    assert by_rule == {"nginx_access": 2, "json_payload": 1}
    res = branches["residue"].collect()
    assert [(r["rule"], r["value"]) for r in res] == [("nginx_access", "TAIL")]
    assert branches["miss"].count() == 0


def test_tracks_missed_packets(spark):
    """processor.rs batch_parse_package_tracks_missed_packets: an
    unparseable event reaches ONLY the miss channel."""
    pipe = Pipeline(wpl=BOTH_RULES, omls=[])
    df = spark.createDataFrame([("NOTHING-VALID",)], ["value"])
    branches = pipe.transform(df)
    assert branches["miss"].count() == 1
    assert branches.get("residue") is None or branches["residue"].count() == 0
    assert "default" not in branches or branches["default"].count() == 0


def test_handles_real_multi_rules(spark):
    """processor.rs batch_parse_package_handles_real_multi_rules: both
    samples parse clean under the two-rule cascade, no residue, no miss."""
    pipe = Pipeline(wpl=BOTH_RULES, omls=[])
    df = spark.createDataFrame([(NGINX_SAMPLE,), (JSON_SAMPLE,)], ["value"])
    branches = pipe.transform(df)
    assert branches["default"].count() == 2
    assert branches.get("residue") is None or branches["residue"].count() == 0
    assert branches["miss"].count() == 0


def test_enriches_records_with_tags(spark):
    """processor.rs batch_parse_package_enriches_records_with_tags: source
    tags become record fields on parsed output."""
    pipe = Pipeline(
        wpl=NGINX_RULE,
        omls=[],
        tags={"env": "test", "dev_src_ip": "10.0.0.1", "access_source": "custom"},
    )
    df = spark.createDataFrame([(NGINX_SAMPLE,)], ["value"])
    row = pipe.transform(df)["default"].first()
    assert row["env"] == "test"
    assert row["dev_src_ip"] == "10.0.0.1"
    assert row["access_source"] == "custom"


def test_enrich_tags_skips_when_present(spark):
    """processor.rs enrich_record_with_tags_skips_when_all_present: a tag
    whose key already exists as a PARSED field does not overwrite it
    (only-if-absent, processor.rs:70-100)."""
    wpl = "rule t { (chars:env,digit:code\\0) }"
    pipe = Pipeline(wpl=wpl, omls=[], tags={"env": "tag-value", "extra": "x"})
    df = spark.createDataFrame([("prod 42",)], ["value"])
    row = pipe.transform(df)["default"].first()
    assert row["env"] == "prod"  # parsed field wins
    assert row["extra"] == "x"  # missing key appended


# processor.rs:350-366 — verbatim controlled-failure rules
MISS_RULES = """
rule short_fail {
  (symbol(CONTROL),digit)
}
rule mid_fail {
  (symbol(CONTROL)), alt(symbol(-ALPHA),symbol(-BETA)),(digit,digit,chars)
}
rule deep_fail {
    (symbol(CONTROL)), alt(symbol(-ALPHA),symbol(-BETA)),(digit,chars,bool)
}
"""


def test_prefers_deepest_rule_on_miss(spark):
    """processor.rs batch_parse_package_prefers_deepest_rule_on_miss:
    'CONTROL-ALPHA 1024 warpparse 64' misses all three rules; the miss
    diagnostic picks deep_fail (it consumed digit+chars before bool
    failed — the deepest prefix) with depth > 0."""
    mp = MultiParser(MISS_RULES)
    df = spark.createDataFrame([("CONTROL-ALPHA 1024 warpparse 64",)], ["value"])
    row = mp.diagnose(df).first()
    assert row["_disposition"] == "miss"
    assert row["_best_rule"] == "deep_fail"
    assert row["_parse_depth"] > 0


def test_skips_whitespace_miss(spark):
    """processor.rs batch_parse_package_skips_whitespace_miss: a
    whitespace-only event is neither sunk nor counted as missed."""
    pipe = Pipeline(wpl=NGINX_RULE, omls=[])
    df = spark.createDataFrame([("   \n\t",)], ["value"])
    branches = pipe.transform(df)
    assert "default" not in branches or branches["default"].count() == 0
    # blank events are filtered from the miss channel (processor.rs
    # whitespace skip; our disposition labels them 'blank')
    miss = branches["miss"]
    assert miss.where(F.col("_disposition") == "miss").count() == 0


def test_intercept_is_business_group(spark):
    """orchestrator/constants/tests.rs test_group_name_constants
    ('intercept removed'): the infra set is exactly {monitor, default,
    miss, residue, error} (constants.rs INFRA_GROUPS) — a sink named
    'intercept' participates in the business fan-out like any other
    name instead of staying a dead infra channel."""
    from wp_motor_spark.config import _INFRA
    from wp_motor_spark.sinks import SinkSpec

    assert _INFRA == {"monitor", "default", "miss", "residue", "error"}
    oml = """
name : nginx_model
rule :
    nginx_access
---
status = take(option:[http_status]) ;
* = take() ;
"""
    pipe = Pipeline(
        wpl=NGINX_RULE,
        omls=[oml],
        sinks=[SinkSpec(name="intercept", format="raw")],
    )
    df = spark.createDataFrame([(NGINX_SAMPLE,)], ["value"])
    res = pipe.run_batch(df)
    assert res.sink_lines["intercept"].count() == 1


# ------------------------------------------- recovery/mod.rs (5 tests)


def test_rescue_recovery_disk_contract(tmp_path):
    """src/runtime/collector/recovery/mod.rs: sink name = basename up to
    the first '-' (test_get_sink_name + _nested); the picker selects the
    LATEST file by embedded timestamp, scanning nested subdirectories
    (test_tack_lasts_file + _nested); CheckPoint persists per-file
    success counts and reloads them (test_check_point)."""
    from wp_motor_spark.sinks.rescue import (
        CheckPoint,
        get_sink_name,
        latest_rescue_file,
    )

    assert get_sink_name(
        "./rescue/http_accs_file_sink-2023-11-30_10:52:45.dat"
    ) == "http_accs_file_sink"
    assert get_sink_name(
        "./rescue/groupA/bench_sink-2025-10-14_03:10:12.dat"
    ) == "bench_sink"

    root = tmp_path / "rescue1"
    root.mkdir()
    (root / "benchmark_file_sink-2023-12-06_12:07:02.dat").write_text("1222")
    (root / "http_accs_file_sink-2023-12-06_12:07:02.dat").write_text("5666")
    (root / "http_accs_file_sink-2023-12-06_12:07:03.dat").write_text("2333")
    assert latest_rescue_file(str(root)) == str(
        root / "http_accs_file_sink-2023-12-06_12:07:03.dat"
    )

    nested = tmp_path / "rescue_nested" / "group1"
    nested.mkdir(parents=True)
    (nested / "bench_sink-2025-10-14_03:10:11.dat").write_text("a")
    (nested / "bench_sink-2025-10-14_03:10:12.dat").write_text("b")
    assert latest_rescue_file(str(tmp_path / "rescue_nested")) == str(
        nested / "bench_sink-2025-10-14_03:10:12.dat"
    )
    assert latest_rescue_file(str(tmp_path / "rescue_nested"), "xyz") is None

    pp = str(tmp_path / "ckpt.json")
    point = CheckPoint(point_path=pp)
    point.rec_suc(".text.txt")
    point.rec_suc(".text.txt")
    point.rec_suc(".text1.txt")
    point.save_point()
    again = CheckPoint.load_point(pp)
    assert again.counts.pop(".text.txt") == 2
    assert again.counts.pop(".text1.txt") == 1
    assert CheckPoint.load_point(str(tmp_path / "missing.json")).counts == {}
