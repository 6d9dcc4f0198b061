"""Multimodal column plumbing tests: binary payload + metadata struct
through mapInPandas (decode stubbed — no PIL/ffmpeg in the container;
schemas, batch shapes, and the numpy math are real)."""

import pytest
from pyspark.sql import functions as F

from wp_motor_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [(i, bytes([i % 251]) * (64 * (1 + i % 3))) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    return mm.attach_meta(df, kind="image", mime="image/png")


def test_attach_meta_schema(media_df):
    f = {x.name: x.dataType.simpleString() for x in media_df.schema["media_meta"].dataType.fields}
    assert f == {
        "kind": "string", "mime": "string", "width": "int",
        "height": "int", "duration_ms": "bigint", "sample_rate": "int",
    }


def test_probe_images(media_df):
    out = mm.probe_images(media_df)
    assert out.schema == media_df.schema  # schema-preserving pass
    rows = out.collect()
    assert len(rows) == 20
    assert all(r["media_meta"]["width"] == 8 for r in rows)  # stub decoder 8x8
    assert all(r["media_meta"]["kind"] == "image" for r in rows)


def test_image_features(media_df):
    out = mm.image_features(media_df)
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        v = r["features"]
        assert len(v) == 16
        assert abs(sum(v) - 1.0) < 1e-5  # normalized histogram
    # determinism: same payload -> same features
    a = {r["doc_id"]: r["features"] for r in rows}
    b = {r["doc_id"]: r["features"] for r in mm.image_features(media_df).collect()}
    assert a == b


def test_resize_images(media_df):
    out = mm.resize_images(media_df, width=4, height=2)
    rows = out.collect()
    assert out.schema == media_df.schema
    for r in rows:
        assert len(r["media"]) == 4 * 2 * 3  # raw RGB bytes
        assert r["media_meta"]["width"] == 4 and r["media_meta"]["height"] == 2


def test_sample_frames(spark):
    df = mm.attach_meta(
        spark.createDataFrame([(1, bytes(640))], "doc_id long, media binary"),
        kind="video",
    )
    # 10 pseudo-frames; duration 400ms => 40ms/frame; sample every 80ms -> 5
    df = df.withColumn(
        "media_meta",
        F.col("media_meta").withField("duration_ms", F.lit(400).cast("long")),
    )
    out = mm.sample_frames(df, every_ms=80).collect()
    assert [r["frame_idx"] for r in out] == [0, 2, 4, 6, 8]
    assert [r["frame_ms"] for r in out] == [0, 80, 160, 240, 320]
    assert all(len(r["frame"]) == 64 for r in out)


def test_features_distribute(spark, media_df):
    """The mapInPandas plan stays map-only (no shuffle before features)."""
    plan = mm.image_features(media_df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
