"""Scale-utility tests: salted joins produce identical results to plain
joins, and bucketed tables join without an exchange."""

from pyspark.sql import functions as F

from wp_motor_spark.operators import scale


def test_salted_join_matches_plain(spark):
    # heavily skewed big side: 90% of rows share key 1
    big = spark.range(2000).select(
        F.when(F.col("id") % 10 != 0, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame([(1, "hot"), (10, "ten"), (20, "twenty")], ["k", "name"])
    plain = big.join(small, "k").groupBy("name").count()
    salted = scale.salted_join(big, small, "k", salt_n=8).groupBy("name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_two_phase_agg(spark):
    df = spark.createDataFrame(
        [("a", i % 7) for i in range(500)] + [("b", 99)], ["k", "v"]
    )
    out = {r["k"]: sorted(r["v_set"]) for r in scale.two_phase_agg(df, ["k"], "v").collect()}
    assert out["a"] == [0, 1, 2, 3, 4, 5, 6]
    assert out["b"] == [99]


def test_bucketed_join_no_exchange(spark, tmp_path):
    orders = spark.range(1000).select(
        F.col("id").alias("okey"), (F.col("id") % 5).alias("status")
    )
    items = spark.range(3000).select(
        (F.col("id") % 1000).alias("okey"), F.col("id").alias("item")
    )
    scale.write_bucketed(orders, "b_orders", "okey", 8, path=str(tmp_path / "bo"))
    scale.write_bucketed(items, "b_items", "okey", 8, path=str(tmp_path / "bi"))
    # force the merge-join path (tiny test tables would broadcast and the
    # planner would skip bucketing entirely)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = scale.bucketed_table(spark, "b_orders").join(
            scale.bucketed_table(spark, "b_items"), "okey"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "ShuffleExchange" not in plan and "hashpartitioning" not in plan
        assert j.count() == 3000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_items")


def test_partitioned_layout_prunes_partitions(spark, tmp_path):
    from wp_motor_spark.operators import scale

    df = spark.createDataFrame(
        [(i, ["en", "de", "fr"][i % 3], f"doc {i}") for i in range(300)],
        ["doc_id", "lang", "text"],
    )
    path = str(tmp_path / "layout")
    scale.write_partitioned_layout(df, path, ["lang"], sort_cols=["doc_id"])

    import os

    dirs = sorted(d for d in os.listdir(path) if d.startswith("lang="))
    assert dirs == ["lang=de", "lang=en", "lang=fr"]
    # one file per partition dir (plus _SUCCESS markers at top level)
    for d in dirs:
        files = [f for f in os.listdir(f"{path}/{d}") if f.endswith(".parquet")]
        assert len(files) == 1

    back = spark.read.parquet(path).where(F.col("lang") == "en")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the filter must be a partition filter, pruning at listing time —
    # not a data filter evaluated per row
    assert "PartitionFilters: [isnotnull(lang" in plan
    assert back.count() == 100


def test_bucketed_range_join_matches_predicate_join(spark):
    from wp_motor_spark.operators import scale

    facts = spark.createDataFrame(
        [(i, i * 7 % 100) for i in range(200)], ["fid", "v"]
    )
    ivs = spark.createDataFrame(
        [(0, 10, "a"), (10, 25, "b"), (20, 40, "c"), (90, 100, "d"), (99, 105, "e")],
        ["lo", "hi", "tag"],
    )
    got = {
        (r["fid"], r["tag"])
        for r in scale.bucketed_range_join(
            facts, ivs, "v", bucket_width=8
        ).collect()
    }
    want = {
        (r["fid"], r["tag"])
        for r in facts.join(
            ivs, (F.col("lo") <= F.col("v")) & (F.col("v") < F.col("hi"))
        ).collect()
    }
    assert got == want and len(got) > 0

    plan = (
        scale.bucketed_range_join(facts, ivs, "v", bucket_width=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the join must be an equi-join on the bucket, never a nested loop
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_zorder_key_interleaves_and_clusters(spark):
    from wp_motor_spark.operators import scale

    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], ["x", "y"]
    )
    rows = df.select(
        "x", "y", scale.zorder_key(F.col("x"), F.col("y"), bits=4).alias("z")
    ).collect()

    def morton(x, y):
        v = 0
        for i in range(4):
            v |= ((x >> i) & 1) << (2 * i)
            v |= ((y >> i) & 1) << (2 * i + 1)
        return v

    for r in rows:
        assert r["z"] == morton(r["x"], r["y"])
    # locality: sorting by z, any 16-row window spans a small bounding box
    # in BOTH dims (the whole point vs sorting by x alone, where y spans
    # the full 0..15 range in every window)
    srt = sorted(rows, key=lambda r: r["z"])
    for i in range(0, 256, 16):
        win = srt[i : i + 16]
        assert max(r["x"] for r in win) - min(r["x"] for r in win) <= 4
        assert max(r["y"] for r in win) - min(r["y"] for r in win) <= 4


def test_layout_audit_detects_sortedness(spark, tmp_path):
    """The auditor's point-skip fraction separates sorted from shuffled
    layouts on the same data."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.layout_audit import audit

    df = spark.range(0, 40_000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 1000).alias("v")
    )
    sorted_path = str(tmp_path / "sorted")
    random_path = str(tmp_path / "random")
    (df.repartitionByRange(8, "k").sortWithinPartitions("k")
       .write.mode("overwrite").parquet(sorted_path))
    df.repartition(8).write.mode("overwrite").parquet(random_path)

    a_sorted = audit(sorted_path, probe_col="k")
    a_random = audit(random_path, probe_col="k")
    assert a_sorted["files"] == a_random["files"] == 8
    assert a_sorted["groups_with_stats"] >= 8
    # a point predicate skips most sorted row groups, none of the random
    assert a_sorted["point_skip_fraction"] >= 0.8
    assert a_random["point_skip_fraction"] <= 0.2


def test_zorder_three_columns(spark):
    from wp_motor_spark.operators import scale

    df = spark.createDataFrame(
        [(x, y, z) for x in range(4) for y in range(4) for z in range(4)],
        ["x", "y", "z"],
    )
    rows = df.select(
        "x", "y", "z",
        scale.zorder_key(F.col("x"), F.col("y"), F.col("z"), bits=2).alias("k"),
    ).collect()

    def morton3(x, y, z):
        v = 0
        for i in range(2):
            v |= ((x >> i) & 1) << (3 * i)
            v |= ((y >> i) & 1) << (3 * i + 1)
            v |= ((z >> i) & 1) << (3 * i + 2)
        return v

    assert all(r["k"] == morton3(r["x"], r["y"], r["z"]) for r in rows)
    assert len({r["k"] for r in rows}) == 64  # bijective on the cube

    import pytest as _p

    with _p.raises(ValueError):
        scale.zorder_key(F.col("x"), bits=4)
    with _p.raises(ValueError):
        scale.zorder_key(F.col("x"), F.col("y"), bits=32)
