"""Stateful streaming extensions: gap sessionization via
applyInPandasWithState and watermark-bounded streaming dedup.

Drives multi-microbatch runs (maxFilesPerTrigger=1 + availableNow) so
state genuinely carries across batches and event-time timeouts fire as
the watermark advances.
"""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from wp_motor_spark.streaming import dedup_stream, sessionize_stream

T0 = "2026-01-01T10:00:00"


def _write(path: str, rows: list[dict], order: int = 0) -> None:
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    # the file source orders batches by mtime — make the order explicit
    # (same-second writes would otherwise be picked up nondeterministically)
    t = 1_000_000_000 + order * 100
    os.utime(path, (t, t))


def _run_stream(spark, src, schema, transform, name, tmpdir):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_sessionize_stream_multibatch(spark, tmp_path):
    """Three microbatches: a gap inside batch 2 closes u1's first session;
    the batch-3 watermark (19:00) times out u1's and u2's open sessions;
    u9's 23:00 session stays open (not emitted)."""
    src = tmp_path / "events"
    src.mkdir()
    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
        ]
    )
    _write(
        str(src / "b1.json"),
        [
            {"user_id": 1, "ts": "2026-01-01T10:00:00"},
            {"user_id": 1, "ts": "2026-01-01T10:05:00"},
            {"user_id": 2, "ts": "2026-01-01T10:00:00"},
        ],
        order=1,
    )
    _write(
        str(src / "b2.json"),
        [
            {"user_id": 1, "ts": "2026-01-01T13:00:00"},
            {"user_id": 9, "ts": "2026-01-01T20:00:00"},
        ],
        order=2,
    )
    # batch-3 watermark = 20:00 - 1h = 19:00 > every pending timeout;
    # u9's 23:00 event also gap-closes its own 20:00 session
    _write(str(src / "b3.json"), [{"user_id": 9, "ts": "2026-01-01T23:00:00"}], order=3)

    out = _run_stream(
        spark,
        str(src),
        schema,
        lambda s: sessionize_stream(s, gap_sec=1800, watermark_sec=3600),
        "sessions_test",
        str(tmp_path),
    )
    rows = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in out.collect()
    }
    assert rows == {
        (1, "2026-01-01 10:00:00", "2026-01-01 10:05:00", 2),
        (1, "2026-01-01 13:00:00", "2026-01-01 13:00:00", 1),
        (2, "2026-01-01 10:00:00", "2026-01-01 10:00:00", 1),
        (9, "2026-01-01 20:00:00", "2026-01-01 20:00:00", 1),
    }


def test_sessionize_stream_late_event_merge(spark, tmp_path):
    """A late-but-inside-watermark event from an earlier wall-clock time
    (t < state's last) must merge without moving the session end backwards
    or losing the earlier start: u1 gets ONE session 09:50→10:20 with 3
    events, not a session whose start ignores the late 09:50 arrival."""
    src = tmp_path / "late"
    src.mkdir()
    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
        ]
    )
    _write(str(src / "b1.json"), [{"user_id": 1, "ts": "2026-01-01T10:00:00"}], order=1)
    # batch 2: one late event (09:50 < state.last 10:00) + one on-time event
    _write(
        str(src / "b2.json"),
        [
            {"user_id": 1, "ts": "2026-01-01T09:50:00"},
            {"user_id": 1, "ts": "2026-01-01T10:20:00"},
        ],
        order=2,
    )
    # batch 3: u9 at 13:00 pushes the watermark to 12:00 > u1's timeout
    _write(str(src / "b3.json"), [{"user_id": 9, "ts": "2026-01-01T13:00:00"}], order=3)

    out = _run_stream(
        spark,
        str(src),
        schema,
        lambda s: sessionize_stream(s, gap_sec=1800, watermark_sec=3600),
        "sessions_late_test",
        str(tmp_path),
    )
    rows = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in out.collect()
        if r["user_id"] == 1
    }
    assert rows == {(1, "2026-01-01 09:50:00", "2026-01-01 10:20:00", 3)}


def test_sessionize_matches_batch_query_shape(spark, tmp_path):
    """Within one batch the closed sessions match the batch query's
    boundaries (same 30-min gap rule)."""
    src = tmp_path / "ev2"
    src.mkdir()
    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
        ]
    )
    _write(
        str(src / "b1.json"),
        [
            {"user_id": 5, "ts": "2026-01-01T08:00:00"},
            {"user_id": 5, "ts": "2026-01-01T08:10:00"},
            {"user_id": 5, "ts": "2026-01-01T09:30:00"},  # closes 08:00 session
        ],
    )
    out = _run_stream(
        spark,
        str(src),
        schema,
        lambda s: sessionize_stream(s, gap_sec=1800, watermark_sec=3600),
        "sessions_shape_test",
        str(tmp_path),
    )
    rows = [
        (str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in out.collect()
    ]
    assert rows == [("2026-01-01 08:00:00", "2026-01-01 08:10:00", 2)]


def test_dedup_stream_across_batches(spark, tmp_path):
    """A duplicate text arriving in a later microbatch (inside the
    watermark horizon) is dropped; state carries across batches."""
    src = tmp_path / "docs"
    src.mkdir()
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("text", StringType()),
        ]
    )
    _write(
        str(src / "b1.json"),
        [
            {"doc_id": 1, "ts": T0, "text": "alpha beta"},
            {"doc_id": 2, "ts": T0, "text": "gamma delta"},
        ],
        order=1,
    )
    _write(
        str(src / "b2.json"),
        [
            {"doc_id": 3, "ts": "2026-01-01T10:10:00", "text": "Alpha   BETA"},  # dup of 1
            {"doc_id": 4, "ts": "2026-01-01T10:10:00", "text": "epsilon"},
        ],
        order=2,
    )
    out = _run_stream(
        spark,
        str(src),
        schema,
        lambda s: dedup_stream(s, watermark="2 hours"),
        "dedup_test",
        str(tmp_path),
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2, 4]
    assert "__digest" not in out.columns


def test_streaming_windowed_counts_still_batch_compatible(spark, sf001_dir):
    """The windowed-stats shape used by streams runs identically on a
    batch frame (foreachBatch reuse contract)."""
    from wp_motor_spark.operators.stats import windowed_counts
    from wp_motor_spark.sources.tables import load_table

    ev = load_table(spark, sf001_dir, "events")
    out = windowed_counts(ev, "ts", ["event_type"], window_sec=3600, top_n=5)
    assert out.count() > 0
    assert {"window_start", "window_end", "event_type", "total", "suc_rate"} <= set(
        out.columns
    )


def test_bloom_dedup_state_across_batches(spark):
    from wp_motor_spark.streaming.state import BloomDedupState

    state = BloomDedupState(n_expected=10_000, fpp=0.001)
    b1 = spark.createDataFrame(
        [(1, "alpha doc"), (2, "beta doc"), (3, "alpha  DOC")],  # 3 dups 1
        ["doc_id", "text"],
    )
    kept1 = {r["doc_id"] for r in state.process_batch(b1).collect()}
    assert kept1 == {1, 2}  # within-batch dup dropped, lowest id wins

    b2 = spark.createDataFrame(
        [(4, "beta doc"), (5, "gamma doc"), (6, "gamma doc")],
        ["doc_id", "text"],
    )
    kept2 = {r["doc_id"] for r in state.process_batch(b2).collect()}
    # 4 duplicates batch-1 content (cross-batch memory), 6 duplicates 5
    assert kept2 == {5}

    b3 = spark.createDataFrame([(7, "alpha doc")], ["doc_id", "text"])
    assert state.process_batch(b3).count() == 0  # history is unbounded


def test_sessionize_stream_equals_batch_on_randomized_events(spark, tmp_path):
    """Randomized (fixed-seed) equivalence: every session the stream
    closes must match a batch-sessionization session exactly, and every
    batch session fully past the final watermark must have been closed
    by the stream."""
    import random
    from datetime import datetime, timedelta

    rng = random.Random(42)
    base = datetime(2026, 1, 1, 8, 0, 0)
    events = []
    t = {u: base for u in range(3)}
    for _ in range(60):
        u = rng.randrange(3)
        # gaps straddle the 1800 s boundary in both directions
        t[u] += timedelta(seconds=rng.choice([60, 300, 900, 2000, 4000]))
        events.append({"user_id": u, "ts": t[u].isoformat()})
    events.sort(key=lambda e: e["ts"])
    src = tmp_path / "rand_ev"
    src.mkdir()
    third = len(events) // 3
    for i in range(3):
        _write(str(src / f"b{i}.json"),
               events[i * third : None if i == 2 else (i + 1) * third], order=i)

    schema = StructType(
        [StructField("user_id", LongType()), StructField("ts", TimestampType())]
    )
    out = _run_stream(
        spark, str(src), schema,
        lambda s: sessionize_stream(s, gap_sec=1800, watermark_sec=1800),
        "sessions_rand_eq", str(tmp_path),
    )
    streamed = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in out.collect()
    }

    # batch reference: lag-gap sessionization over the same rows
    df = spark.createDataFrame(
        [(e["user_id"], e["ts"].replace("T", " ")) for e in events],
        ["user_id", "ts_s"],
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sess = (
        df.withColumn("new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .withColumn("sid", F.sum("new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"),
             F.count(F.lit(1)).alias("n"))
    )
    batch = {
        (r["user_id"], str(r["s"]), str(r["e"]), r["n"]) for r in sess.collect()
    }
    # 1) no invented sessions
    assert streamed <= batch
    # 2) every batch session provably closed by the final watermark was
    #    emitted (watermark = max_ts - 1800; closes when last + gap < wm)
    max_ts = max(e["ts"] for e in events).replace("T", " ")
    from datetime import datetime as _dt

    wm = _dt.fromisoformat(max_ts) - timedelta(seconds=1800)
    must_close = {
        s for s in batch
        if _dt.fromisoformat(s[2]) + timedelta(seconds=1800) < wm
    }
    assert must_close <= streamed
    assert len(streamed) >= len(must_close) > 0


def test_heavy_hitters_stream_spacesaving_guarantees(spark, tmp_path):
    """SpaceSaving invariants over 3 micro-batches (Metwally et al. 2005):
    (a) est >= true count and est - err <= true count for every reported
    token; (b) every token whose true count exceeds n_seen/m appears in
    its shard's final snapshot; (c) per-shard counter sets stay <= m."""
    import collections

    from pyspark.sql.types import StringType as _S, StructField as _F, StructType as _T

    from wp_motor_spark.streaming import heavy_hitters_stream

    m, n_shards = 4, 2
    # skewed stream: 'alpha' dominates, mid/rare tokens churn the counters
    batches = [
        ["alpha"] * 10 + ["beta"] * 4 + ["gamma", "delta", "eps"],
        ["alpha"] * 8 + ["beta"] * 3 + ["zeta", "eta", "theta", "gamma"],
        ["alpha"] * 6 + ["iota", "kappa"] + ["beta"] * 2 + ["gamma"] * 3,
    ]
    src = tmp_path / "tokens"
    src.mkdir()
    for i, b in enumerate(batches, 1):
        _write(str(src / f"b{i}.json"), [{"token": t} for t in b], order=i)

    out = _run_stream(
        spark,
        str(src),
        _T([_F("token", _S())]),
        lambda s: heavy_hitters_stream(s, m=m, n_shards=n_shards),
        "hh_test",
        str(tmp_path),
    )
    rows = out.collect()
    # final snapshot per shard = the max-n_seen emission
    final_n = {}
    for r in rows:
        final_n[r["shard"]] = max(final_n.get(r["shard"], 0), r["n_seen"])
    final = [r for r in rows if r["n_seen"] == final_n[r["shard"]]]

    true = collections.Counter(t for b in batches for t in b)
    # shard of each token must match the operator's xxhash64 sharding
    shard_of = {
        r["token"]: r["s"]
        for r in spark.createDataFrame([(t,) for t in true], ["token"])
        .select("token", F.pmod(F.xxhash64("token"), F.lit(n_shards)).alias("s"))
        .collect()
    }

    per_shard = collections.defaultdict(list)
    for r in final:
        per_shard[r["shard"]].append(r)
        assert r["est"] >= true[r["token"]], r
        assert r["est"] - r["err"] <= true[r["token"]], r
    for shard, rs in per_shard.items():
        assert len(rs) <= m, (shard, len(rs))
        reported = {r["token"] for r in rs}
        threshold = final_n[shard] / m
        for tok, cnt in true.items():
            if shard_of[tok] == shard and cnt > threshold:
                assert tok in reported, (tok, cnt, threshold)
    # the dominant token is reported with an exact count (never evicted)
    alpha = [r for r in final if r["token"] == "alpha"]
    assert alpha and alpha[0]["est"] == true["alpha"] and alpha[0]["err"] == 0


def test_ewma_anomaly_stream_matches_driver_recurrence(spark, tmp_path):
    """EWMA anomaly gate: the streamed per-key anomalies EXACTLY match a
    driver-side pure-python recompute of the same recurrence (check
    before update; warm-up min_n; alpha=0.2, z>3), across TWO
    micro-batches so mean/var state genuinely carries over."""
    import math

    from wp_motor_spark.streaming import ewma_anomaly_stream

    rng_vals = [10.0, 10.4, 9.6, 10.2, 9.8, 10.1, 9.9, 10.3, 9.7, 10.0,
                10.2, 9.9, 50.0, 10.1, 9.8, 10.0, -30.0, 10.2]
    rows = [
        {"ts": f"2026-01-01T10:00:{i:02d}", "k": "a", "v": v}
        for i, v in enumerate(rng_vals)
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write(os.path.join(src, "b0.json"), rows[:9], order=0)
    _write(os.path.join(src, "b1.json"), rows[9:], order=1)

    schema = StructType(
        [
            StructField("ts", StringType()),
            StructField("k", StringType()),
            StructField("v", StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .select(
            F.col("ts").cast("timestamp").alias("ts"),
            "k",
            F.col("v").cast("double").alias("v"),
        )
    )
    out = ewma_anomaly_stream(
        stream, key_col="k", ts_col="ts", val_col="v",
        alpha=0.2, z_thresh=3.0, min_n=5,
    )
    q = (
        out.writeStream.format("memory").queryName("ewma_out")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = {
            (str(r["ts"]), r["v"], r["z"])
            for r in spark.sql("select * from ewma_out").collect()
        }
    finally:
        q.stop()

    # driver-side recompute of the identical recurrence
    n, mean, var = 0, 0.0, 0.0
    want = set()
    for i, v in enumerate(rng_vals):
        if n >= 5 and var > 0:
            z = (v - mean) / math.sqrt(var)
            if abs(z) > 3.0:
                want.add((f"2026-01-01 10:00:{i:02d}", v, round(z, 4)))
        if n == 0:
            mean, var = v, 0.0
        else:
            d = v - mean
            mean += 0.2 * d
            var = 0.8 * (var + 0.2 * d * d)
        n += 1

    assert want, "fixture must contain anomalies"
    assert any(v == 50.0 for (_, v, _) in want)  # the planted spike fires
    assert got == want, (got, want)


def test_cusum_stream_matches_driver_recurrence(spark, tmp_path):
    """CUSUM changepoint gate: the streamed per-key alarms EXACTLY match
    a driver-side pure-python recompute of the same recurrence (Welford
    calibration frozen at min_n, k=0.5 sigma slack, h=4 sigma decision,
    side reset after alarm), across TWO micro-batches so the
    (n, mean, m2, s_pos, s_neg) state genuinely carries over. The
    values drift upward by ~0.5 sigma per step after calibration — a
    sustained shift NO single z-score would flag (the regime EWMA
    misses and CUSUM exists for)."""
    import math

    from wp_motor_spark.streaming import cusum_stream

    base = [10.0, 10.4, 9.6, 10.2, 9.8, 10.1, 9.9, 10.3, 9.7, 10.0]
    drift = [10.2 + 0.15 * i for i in range(14)]
    vals = base + drift
    rows = [
        {"ts": f"2026-01-01T10:00:{i:02d}", "k": "a", "v": v}
        for i, v in enumerate(vals)
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write(os.path.join(src, "b0.json"), rows[:13], order=0)
    _write(os.path.join(src, "b1.json"), rows[13:], order=1)

    schema = StructType(
        [
            StructField("ts", StringType()),
            StructField("k", StringType()),
            StructField("v", StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .select(
            F.col("ts").cast("timestamp").alias("ts"),
            "k",
            F.col("v").cast("double").alias("v"),
        )
    )
    out = cusum_stream(
        stream, key_col="k", ts_col="ts", val_col="v",
        k_slack=0.5, h_sigma=4.0, min_n=10,
    )
    q = (
        out.writeStream.format("memory").queryName("cusum_out")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = {
            (str(r["ts"]), r["v"], r["s_pos"], r["s_neg"], r["direction"])
            for r in spark.sql("select * from cusum_out").collect()
        }
    finally:
        q.stop()

    # driver-side recompute of the identical recurrence
    n, mean, m2, sp, sn = 0, 0.0, 0.0, 0.0, 0.0
    want = set()
    for i, v in enumerate(vals):
        ts = f"2026-01-01 10:00:{i:02d}"
        if n < 10:
            n += 1
            d = v - mean
            mean += d / n
            m2 += d * (v - mean)
            if n == 10:
                m2 = m2 / n
            continue
        sig = math.sqrt(m2) if m2 > 0 else 1.0
        sp = max(0.0, sp + (v - mean - 0.5 * sig))
        sn = max(0.0, sn + (mean - 0.5 * sig - v))
        if sp > 4.0 * sig or sn > 4.0 * sig:
            want.add(
                (ts, v, round(sp, 6), round(sn, 6),
                 "up" if sp > 4.0 * sig else "down")
            )
            if sp > 4.0 * sig:
                sp = 0.0
            if sn > 4.0 * sig:
                sn = 0.0
        n += 1
    assert want, "fixture must produce at least one changepoint alarm"
    assert got == want


def test_page_hinkley_stream_matches_driver_recurrence(spark, tmp_path):
    """Page-Hinkley drift gate: the streamed per-key alarms EXACTLY
    match a driver-side pure-python recompute of the same recurrence
    (running mean INCLUDING the current value, U accumulation, min-U
    tracking, restart after alarm), across TWO micro-batches so the
    (n, sum, u, min_u) state genuinely carries over. The fixture
    shifts the level from ~10 to ~13 mid-stream — gradual drift that
    point-outlier detectors never flag."""
    base = [10.0, 10.4, 9.6, 10.2, 9.8, 10.1, 9.9, 10.3, 9.7, 10.0]
    shifted = [13.1, 12.9, 13.2, 12.8, 13.0, 13.3, 12.7, 13.1, 12.9, 13.0]
    vals = base + shifted
    rows = [
        {"ts": f"2026-01-01T10:00:{i:02d}", "k": "a", "v": v}
        for i, v in enumerate(vals)
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write(os.path.join(src, "b0.json"), rows[:13], order=0)
    _write(os.path.join(src, "b1.json"), rows[13:], order=1)

    schema = StructType(
        [
            StructField("ts", StringType()),
            StructField("k", StringType()),
            StructField("v", StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .select(
            F.col("ts").cast("timestamp").alias("ts"),
            "k",
            F.col("v").cast("double").alias("v"),
        )
    )
    from wp_motor_spark.streaming import page_hinkley_stream

    out = page_hinkley_stream(
        stream, key_col="k", ts_col="ts", val_col="v",
        delta=0.0, lam=5.0, min_n=10,
    )
    q = (
        out.writeStream.format("memory").queryName("ph_out")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = {
            (str(r["ts"]), r["v"], r["ph"], r["mean_at_alarm"])
            for r in spark.sql("select * from ph_out").collect()
        }
    finally:
        q.stop()

    n, s, u, mu = 0, 0.0, 0.0, 0.0
    want = set()
    for i, v in enumerate(vals):
        n += 1
        s += v
        mean = s / n
        u += v - mean - 0.0
        mu = min(mu, u)
        ph = u - mu
        if n >= 10 and ph > 5.0:
            want.add((f"2026-01-01 10:00:{i:02d}", v, round(ph, 6),
                      round(mean, 6)))
            n, s, u, mu = 0, 0.0, 0.0, 0.0

    assert want, "fixture must contain a drift alarm"
    assert got == want, (got, want)


def test_ewma_chart_stream_matches_driver_recurrence(spark, tmp_path):
    """EWMA control-chart gate: streamed alarms EXACTLY match a
    driver-side recompute of the Roberts/Lucas-Saccucci recurrence
    (frozen 20-obs calibration, z = lam x + (1-lam) z, time-varying
    limit with the (1-(1-lam)^(2i)) factor, no restart), across TWO
    micro-batches so the 7-scalar state carries over. The fixture
    shifts the level from ~10.0 to ~10.6 — a ~1.9 sigma sustained
    shift that a 3-sigma point test never flags but the EWMA chart
    must."""
    calib = [10.0, 10.3, 9.7, 10.2, 9.8, 10.1, 9.9, 10.4, 9.6, 10.0,
             10.2, 9.8, 10.1, 9.9, 10.3, 9.7, 10.0, 10.2, 9.8, 10.0]
    shifted = [10.6, 10.7, 10.5, 10.6, 10.8, 10.6, 10.5, 10.7, 10.6, 10.6]
    vals = calib + shifted
    rows = [
        {"ts": f"2026-01-01T10:00:{i:02d}", "k": "a", "v": v}
        for i, v in enumerate(vals)
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write(os.path.join(src, "b0.json"), rows[:23], order=0)
    _write(os.path.join(src, "b1.json"), rows[23:], order=1)

    schema = StructType(
        [
            StructField("ts", StringType()),
            StructField("k", StringType()),
            StructField("v", StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .select(
            F.col("ts").cast("timestamp").alias("ts"),
            "k",
            F.col("v").cast("double").alias("v"),
        )
    )
    from wp_motor_spark.streaming import ewma_chart_stream

    out = ewma_chart_stream(
        stream, key_col="k", ts_col="ts", val_col="v",
        lam=0.2, l_mult=3.0, calib_n=20,
    )
    q = (
        out.writeStream.format("memory").queryName("ewch_out")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = {
            (str(r["ts"]), r["v"], r["ewma"], r["limit"], r["side"])
            for r in spark.sql("select * from ewch_out").collect()
        }
    finally:
        q.stop()

    import math

    n, s, s2, mu, sig, z, i = 0, 0.0, 0.0, 0.0, 0.0, 0.0, 0
    want = set()
    for idx, v in enumerate(vals):
        if n < 20:
            n += 1
            s += v
            s2 += v * v
            if n == 20:
                mu = s / n
                sig = math.sqrt(max(s2 / n - mu * mu, 0.0))
                z = mu
            continue
        i += 1
        z = 0.2 * v + 0.8 * z
        width = 3.0 * sig * math.sqrt(0.2 / 1.8 * (1.0 - 0.8 ** (2 * i)))
        if abs(z - mu) > width:
            want.add(
                (f"2026-01-01 10:00:{idx:02d}", v, round(z, 6),
                 round(width, 6), "high" if z > mu else "low")
            )

    assert want, "fixture must contain a sustained-shift alarm"
    assert got == want, (got, want)
