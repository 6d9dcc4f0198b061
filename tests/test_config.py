"""Workspace config loader tests against the reference's own
tests/instance/ project tree (the same workspace its integration tests
load via WpApp::try_from)."""

import os

from pyspark.sql import functions as F

from wp_motor_spark.config import build_pipeline, load_workspace

INSTANCE = "/root/reference/tests/instance"


def test_load_workspace(tmp_path):
    ws = load_workspace(INSTANCE, out_root=str(tmp_path))
    assert ws.parallel == 2
    assert ws.speed_limit == 10000
    assert ws.stat_window_sec == 60
    # models
    assert any("rule nginx" in t for t in ws.wpl_texts)
    assert len(ws.oml_texts) >= 2  # example_adm + benchmark (+ ignore)
    # sources: one enabled file source with its tag, disabled ones skipped
    files = [s for s in ws.sources if s.kind == "file" and s.enable]
    assert len(files) == 1
    assert files[0].tags == {"dev_src_ip": "10.0.0.1"}
    kafka = [s for s in ws.sources if s.kind == "kafka"]
    assert kafka and not kafka[0].enable
    # sinks: the data group + every infra channel
    names = {s.name for s in ws.sinks}
    assert {"other", "default", "miss", "residue", "error", "monitor"} <= names
    other = next(s for s in ws.sinks if s.name == "other")
    assert other.format == "kv" and other.path.startswith(str(tmp_path))


def test_workspace_end_to_end(spark, tmp_path):
    """Assemble from config and run the instance sample through it."""
    ws = load_workspace(INSTANCE, out_root=str(tmp_path))
    pipe, _inputs = build_pipeline(ws)
    raw = spark.read.text(f"{INSTANCE}/wpl/example/simple/sample.dat")
    res = pipe.run_batch(raw)
    assert res.branches["/example/simple/nginx"].count() == 1
    kv = res.sink_lines["other"].collect()[0]["line"]
    assert "src_ip=222.133.52.20" in kv
    assert "dev_src_ip=10.0.0.1" in kv  # source tag from wpsrc.toml


def test_instance_workspace_full_e2e(spark, tmp_path):
    """The whole workspace driven like the reference's own integration run
    (tests/instance, WpApp::try_from): wpgen rule mode fills the configured
    file source path, one batch carries good/junk/partial lines, and every
    infra channel lands in its configured out/*.dat file."""
    import shutil

    from wp_motor_spark.wpl.generator import generate_lines

    root = tmp_path / "instance"
    shutil.copytree(INSTANCE, root)
    gen_rule = (root / "wpl" / "example" / "simple" / "gen_rule.wpl").read_text()
    lines = [r[0] for r in generate_lines(spark, gen_rule, 20, seed=7).collect()]
    assert len(lines) == 20
    junk = "unparseable junk ###"
    partial = lines[0] + " tail=42"  # short tail -> partial match + residue
    (root / "src_dat").mkdir()
    (root / "src_dat" / "gen.dat").write_text("\n".join(lines + [junk, partial]) + "\n")

    ws = load_workspace(str(root), out_root=str(tmp_path / "out"))
    pipe, inputs = build_pipeline(ws)
    assert [os.path.normpath(p) for p in inputs] == [str(root / "src_dat" / "gen.dat")]
    counts = pipe.write_batch(spark.read.text(inputs))

    assert counts["other"] == 21  # 20 generated + the partial line
    assert counts["miss"] == 1
    assert counts["residue"] == 1
    miss_path = next(s.path for s in ws.sinks if s.name == "miss")
    assert spark.read.text(miss_path).collect()[0]["value"] == junk
    residue_path = next(s.path for s in ws.sinks if s.name == "residue")
    res_lines = [r["value"] for r in spark.read.text(residue_path).collect()]
    assert len(res_lines) == 1 and "tail=42" in res_lines[0]
    other_path = next(s.path for s in ws.sinks if s.name == "other")
    kv = [r["value"] for r in spark.read.text(other_path).collect()]
    assert len(kv) == 21
    assert all("src_ip=" in ln for ln in kv)
    assert all("dev_src_ip=10.0.0.1" in ln for ln in kv)  # wpsrc.toml tag


def test_write_batch_to_configured_paths(spark, tmp_path):
    ws = load_workspace(INSTANCE, out_root=str(tmp_path))
    pipe, _ = build_pipeline(ws)
    raw = spark.createDataFrame(
        [(open(f"{INSTANCE}/wpl/example/simple/sample.dat").read().strip(),),
         ("unparseable junk ###",)],
        ["value"],
    )
    counts = pipe.write_batch(raw)
    assert counts["other"] == 1
    assert counts["miss"] == 1
    miss_dir = next(s.path for s in ws.sinks if s.name == "miss")
    assert spark.read.text(miss_dir).collect()[0]["value"] == "unparseable junk ###"
