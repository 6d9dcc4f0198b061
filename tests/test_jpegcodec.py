"""Baseline JPEG decoder: IDCT checked against the textbook double-sum,
encoder round-trip with PSNR gate, real-world fixture interop, and loud
rejection of progressive scans."""

from __future__ import annotations

import os

import numpy as np
import pytest

from wp_motor_spark.operators import jpegcodec as jc

_FIXTURE = (
    "/usr/lib/google-cloud-sdk/platform/gsutil/third_party/requests/ext/"
    "flower-of-life.jpg"
)
_PROGRESSIVE = "/usr/share/doc/nodejs/thin-white-stripe.jpg"


def test_idct_matches_textbook_double_sum():
    rng = np.random.RandomState(4)
    F = rng.randn(8, 8) * 50
    want = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * F[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            want[x, y] = s / 4
    np.testing.assert_allclose(jc.idct2(F), want, atol=1e-9)
    # dct2 is its inverse
    np.testing.assert_allclose(jc.dct2(jc.idct2(F)), F, atol=1e-9)


def test_round_trip_psnr():
    rng = np.random.RandomState(11)
    # smooth-ish image (random low-freq) + noise, non-multiple-of-8 dims
    base = rng.randint(0, 256, size=(3, 4, 3)).repeat(7, axis=0).repeat(9, axis=1)
    img = np.clip(base + rng.randint(-10, 10, size=base.shape), 0, 255).astype(
        np.uint8
    )
    data = jc.encode_jpeg(img, quant=1)
    assert jc.sniff_jpeg(data)
    got = jc.decode_jpeg(data)
    assert got.shape == img.shape
    mse = float(np.mean((got.astype(np.float64) - img) ** 2))
    psnr = 10 * np.log10(255**2 / max(mse, 1e-12))
    assert psnr > 35, f"psnr={psnr:.1f} dB"


def test_round_trip_coarse_quantization_still_close():
    rng = np.random.RandomState(5)
    img = rng.randint(100, 156, size=(24, 16, 3)).astype(np.uint8)
    got = jc.decode_jpeg(jc.encode_jpeg(img, quant=8))
    mse = float(np.mean((got.astype(np.float64) - img) ** 2))
    assert 10 * np.log10(255**2 / max(mse, 1e-12)) > 25


@pytest.mark.skipif(not os.path.exists(_FIXTURE), reason="fixture absent")
def test_real_world_baseline_jpeg_decodes():
    data = open(_FIXTURE, "rb").read()
    arr = jc.decode_jpeg(data)
    assert arr.shape == (161, 161, 3)
    # a real photo-like image: full-ish dynamic range, non-constant
    assert arr.std() > 10
    assert 5 < arr.mean() < 250


_PROGRESSIVE2 = "/usr/share/doc/nodejs/full-white-stripe.jpg"


@pytest.mark.skipif(not os.path.exists(_PROGRESSIVE), reason="fixture absent")
def test_progressive_spectral_selection_decodes():
    arr = jc.decode_jpeg(open(_PROGRESSIVE, "rb").read())
    assert arr.shape == (58, 493, 3)
    # the fixture is a mostly-white stripe graphic: bright overall, with
    # a large fraction of pure-white pixels
    assert arr.mean() > 200
    assert (arr >= 250).mean() > 0.4


@pytest.mark.skipif(not os.path.exists(_PROGRESSIVE2), reason="fixture absent")
def test_progressive_with_ac_refinement_decodes():
    arr = jc.decode_jpeg(open(_PROGRESSIVE2, "rb").read())
    assert arr.shape == (312, 493, 3)
    assert arr.mean() > 240  # "full white stripe"
    assert (arr >= 250).mean() > 0.6


@pytest.mark.skipif(not os.path.exists(_FIXTURE), reason="fixture absent")
def test_multimodal_probe_real_jpeg(spark):
    from wp_motor_spark.operators import multimodal as mm

    data = open(_FIXTURE, "rb").read()
    df = mm.attach_meta(
        spark.createDataFrame([(1, data)], "doc_id long, media binary")
    )
    meta = mm.probe_images(df).collect()[0]["media_meta"]
    assert (meta["width"], meta["height"]) == (161, 161)
