"""wproj project lifecycle CLI: init scaffolds a workspace the loader and
checker accept; check validates the REFERENCE instance and catches broken
rules; rule list inventories compiled rules."""

from __future__ import annotations

import json

from wp_motor_spark.wproj import main

INSTANCE = "/root/reference/tests/instance"


def test_init_check_round_trip(tmp_path, capsys):
    root = str(tmp_path / "proj")
    assert main(["init", "-w", root, "--mode", "full"]) == 0
    assert main(["check", "-w", root]) == 0
    out = capsys.readouterr().out
    assert "5/5 ok" in out
    # idempotent: re-init never clobbers, check still green
    assert main(["init", "-w", root, "--mode", "full"]) == 0
    assert "wrote 0 files" in capsys.readouterr().out


def test_check_validates_reference_instance(capsys):
    assert main(["check", "-w", INSTANCE]) == 0
    out = capsys.readouterr().out
    assert "FAIL" not in out


def test_check_catches_broken_wpl_and_json_mode(tmp_path, capsys):
    root = str(tmp_path / "proj")
    main(["init", "-w", root, "--mode", "full"])
    capsys.readouterr()
    (tmp_path / "proj" / "wpl" / "broken.wpl").write_text(
        "package /x {\n  rule bad {\n    (nosuchtype:f)\n  }\n}\n"
    )
    rc = main(["check", "-w", root, "--json", "--only-fail"])
    assert rc == 1
    rows = json.loads(capsys.readouterr().out)
    assert len(rows) == 1
    assert rows[0]["ok"] is False and "broken.wpl" in rows[0]["path"]
    # --what selection skips the broken rule entirely
    assert main(["check", "-w", root, "--what", "conf,oml"]) == 0


def test_rule_list_reference_instance(capsys):
    assert main(["rule", "list", "-w", INSTANCE]) == 0
    out = capsys.readouterr().out
    assert "/example/simple/nginx" in out
    assert "sip:ip" in out


def test_rule_parse_offline_on_reference_sample(spark, capsys):
    rc = main([
        "rule", "parse", "-w", INSTANCE,
        "--sample", f"{INSTANCE}/wpl/example/simple/sample.dat",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "/example/simple/nginx" in out and "success" in out


def test_data_stat_and_clean(tmp_path, capsys):
    import os

    root = str(tmp_path / "proj")
    main(["init", "-w", root, "--mode", "full"])
    with open(os.path.join(root, "data", "demo.dat"), "w") as f:
        f.write("a\nb\nc\n")
    capsys.readouterr()
    assert main(["data", "stat", "-w", root]) == 0
    out = capsys.readouterr().out
    assert "demo_file: 3 lines" in out

    # clean removes only sink dirs INSIDE the workspace
    sink_dir = os.path.join(root, "out", "data")
    os.makedirs(sink_dir, exist_ok=True)
    with open(os.path.join(sink_dir, "part-0"), "w") as f:
        f.write("x\n")
    assert main(["data", "clean", "-w", root]) == 0
    assert not os.path.exists(sink_dir)
    assert os.path.exists(os.path.join(root, "data", "demo.dat"))  # inputs kept
