"""As-of join: inclusive backward match, tolerance, per-key isolation."""

from __future__ import annotations

from datetime import datetime

from wp_motor_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_inclusive_match(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2026-01-01T00:00:10")),
            (2, 100, _ts("2026-01-01T00:00:20")),
            (3, 100, _ts("2026-01-01T00:00:05")),  # before any right row
            (4, 200, _ts("2026-01-01T00:00:15")),
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (100, _ts("2026-01-01T00:00:08"), 1.0),
            (100, _ts("2026-01-01T00:00:10"), 2.0),  # equal ts -> eligible
            (100, _ts("2026-01-01T00:00:18"), 3.0),
            (200, _ts("2026-01-01T00:00:01"), 9.0),
        ],
        ["user_id", "ts", "val"],
    )
    out = {r["event_id"]: r for r in asof_join(left, right, on="user_id").collect()}
    assert out[1]["val_right"] == 2.0  # inclusive: the equal-ts row wins
    assert out[2]["val_right"] == 3.0
    assert out[3]["val_right"] is None and out[3]["ts_right"] is None
    assert out[4]["val_right"] == 9.0  # keys don't leak across users


def test_asof_tolerance_cuts_stale_matches(spark):
    left = spark.createDataFrame(
        [(1, 5, _ts("2026-01-01T00:01:00"))], ["event_id", "user_id", "ts"]
    )
    right = spark.createDataFrame(
        [(5, _ts("2026-01-01T00:00:00"), 7.0)], ["user_id", "ts", "val"]
    )
    ok = asof_join(left, right, on="user_id", tolerance_us=60_000_000).collect()
    assert ok[0]["val_right"] == 7.0
    cut = asof_join(left, right, on="user_id", tolerance_us=59_999_999).collect()
    assert cut[0]["val_right"] is None


def test_asof_single_shuffle_plan(spark):
    left = spark.createDataFrame([(1, 1, 10)], ["event_id", "user_id", "ts"])
    right = spark.createDataFrame([(1, 5, 2.0)], ["user_id", "ts", "val"])
    plan = (
        asof_join(left, right, on="user_id", tolerance_us=100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # union + ONE window shuffle; never a join operator, never a cartesian
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_asof_forward_direction(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2026-01-01T00:00:10")),
            (2, 100, _ts("2026-01-01T00:00:30")),  # after every right row
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (100, _ts("2026-01-01T00:00:10"), 1.0),  # equal ts -> eligible
            (100, _ts("2026-01-01T00:00:15"), 2.0),
        ],
        ["user_id", "ts", "val"],
    )
    out = {r["event_id"]: r for r in
           asof_join(left, right, on="user_id", direction="forward").collect()}
    assert out[1]["val_right"] == 1.0  # inclusive: equal-ts right wins
    assert out[2]["val_right"] is None  # nothing follows

    # forward tolerance: match must be within tol AFTER the left ts
    cut = {r["event_id"]: r for r in asof_join(
        left, right, on="user_id", direction="forward", tolerance_us=1
    ).collect()}
    assert cut[1]["val_right"] == 1.0  # gap 0 within tol


def test_asof_randomized_matches_bruteforce_both_directions(spark):
    """Fixed-seed random (key, ts) data: every asof match equals the
    brute-force scan answer — inclusive boundaries, per-key isolation,
    both directions."""
    import random

    rng = random.Random(99)
    left = [(i, rng.randrange(4), rng.randrange(0, 1000))
            for i in range(120)]
    right = [(rng.randrange(4), rng.randrange(0, 1000), float(j))
             for j in range(80)]
    # unique (key, ts) on the right, as the operator contract requires
    seen = set()
    right = [r for r in right if not (r[:2] in seen or seen.add(r[:2]))]

    ldf = spark.createDataFrame(left, ["event_id", "k", "ts"])
    rdf = spark.createDataFrame(right, ["k", "ts", "val"])

    for direction in ("backward", "forward"):
        got = {
            r["event_id"]: (r["ts_right"], r["val_right"])
            for r in asof_join(ldf, rdf, on="k", direction=direction).collect()
        }
        for eid, k, t in left:
            if direction == "backward":
                cands = [r for r in right if r[0] == k and r[1] <= t]
                want = max(cands, key=lambda r: r[1]) if cands else None
            else:
                cands = [r for r in right if r[0] == k and r[1] >= t]
                want = min(cands, key=lambda r: r[1]) if cands else None
            if want is None:
                assert got[eid] == (None, None), (direction, eid)
            else:
                assert got[eid] == (want[1], want[2]), (direction, eid)
