"""Real PNG/BMP decode: round-trip against our own spec-valid encoders,
every PNG filter type exercised, and the multimodal operators producing
true dimensions/features for real image bytes."""

from __future__ import annotations

import numpy as np
import pytest

from wp_motor_spark.operators import imagecodec as ic
from wp_motor_spark.operators import multimodal as mm


def _img(h=5, w=7, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_round_trip_every_filter(ftype):
    arr = _img()
    data = ic.encode_png(arr, filter_type=ftype)
    assert ic.sniff(data) == "png"
    got = ic.decode_png(data)
    np.testing.assert_array_equal(got, arr)


def test_bmp_round_trip_with_row_padding():
    arr = _img(h=4, w=5)  # 15 bytes/row -> 1 pad byte
    data = ic.encode_bmp(arr)
    assert ic.sniff(data) == "bmp"
    np.testing.assert_array_equal(ic.decode_bmp(data), arr)


def test_png_gray_and_rgba_normalize_to_rgb():
    import struct
    import zlib

    # hand-build a 2x2 grayscale PNG (color type 0)
    gray = np.array([[0, 64], [128, 255]], dtype=np.uint8)
    lines = b"".join(b"\x00" + gray[y].tobytes() for y in range(2))

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    png = (
        ic.PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(lines))
        + chunk(b"IEND", b"")
    )
    got = ic.decode_png(png)
    assert got.shape == (2, 2, 3)
    np.testing.assert_array_equal(got[:, :, 0], gray)
    np.testing.assert_array_equal(got[:, :, 1], gray)


def test_png_rejects_interlace_and_16bit():
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    bad = (
        ic.PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="interlaced"):
        ic.decode_png(bad)


def test_multimodal_probe_and_resize_on_real_images(spark):
    arr_a = _img(h=6, w=9, seed=1)
    arr_b = _img(h=3, w=4, seed=2)
    rows = [(1, ic.encode_png(arr_a, 4)), (2, ic.encode_bmp(arr_b))]
    df = mm.attach_meta(spark.createDataFrame(rows, "doc_id long, media binary"))

    probed = {r["doc_id"]: r["media_meta"] for r in mm.probe_images(df).collect()}
    assert (probed[1]["width"], probed[1]["height"]) == (9, 6)
    assert (probed[2]["width"], probed[2]["height"]) == (4, 3)

    # features must equal a driver-side numpy recompute on the TRUE pixels
    feats = {r["doc_id"]: r["features"] for r in mm.image_features(df).collect()}
    for did, arr in ((1, arr_a), (2, arr_b)):
        gray = arr.astype(np.float32).mean(axis=2)
        hist, _ = np.histogram(gray, bins=16, range=(0, 255))
        want = (hist / max(hist.sum(), 1)).astype(np.float32)
        np.testing.assert_allclose(feats[did], want, atol=1e-6)

    resized = mm.resize_images(df, width=4, height=2).collect()
    for r in resized:
        m = r["media_meta"]
        assert (m["width"], m["height"]) == (4, 2)
        assert len(bytes(r["media"])) == 4 * 2 * 3  # raw RGB out


def test_wav_round_trip_and_audio_features(spark):
    rate = 8000
    t = np.arange(rate) / rate  # 1 second
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    data = ic.encode_wav(sine, rate)
    assert ic.sniff_audio(data) == "wav"
    x, got_rate = ic.decode_wav(data)
    assert got_rate == rate and x.shape == (rate, 1)
    np.testing.assert_allclose(x[:, 0], sine, atol=1.0 / 32767)

    df = spark.createDataFrame(
        [(1, data), (2, b"not audio at all")], "doc_id long, media binary"
    )
    out = {r["doc_id"]: r for r in mm.audio_features(df).collect()}
    a = out[1]
    assert a["sample_rate"] == rate and a["n_channels"] == 1
    assert a["duration_ms"] == 1000
    # RMS of a 0.5-amplitude sine = 0.5/sqrt(2); 440 Hz -> 880 crossings/s
    assert abs(a["rms"] - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(a["peak"] - 0.5) < 1e-3
    assert abs(a["zcr"] - 880 / rate) < 1e-3
    # non-WAV payload: present with null features, honestly undecodable
    assert out[2]["sample_rate"] is None and out[2]["rms"] is None


def test_avi_demux_and_real_frame_sampling(spark):
    # 10 frames at 100 ms intervals, frame i = its index byte repeated
    frames = [bytes([i]) * (10 + i) for i in range(10)]
    avi = ic.encode_avi(frames, frame_ms=100.0)
    assert ic.sniff_video(avi) == "avi"
    got, frame_ms = ic.demux_avi(avi)
    assert got == frames and frame_ms == 100.0

    df = mm.attach_meta(
        spark.createDataFrame([(1, avi)], "doc_id long, media binary"),
        kind="video",
    )
    out = sorted(
        (r["frame_idx"], r["frame_ms"], bytes(r["frame"]))
        for r in mm.sample_frames(df, every_ms=300).collect()
    )
    # every 300 ms at 100 ms/frame -> frames 0, 3, 6, 9 with true timestamps
    assert [(i, t) for i, t, _ in out] == [(0, 0), (3, 300), (6, 600), (9, 900)]
    assert [f for _, _, f in out] == [frames[0], frames[3], frames[6], frames[9]]


def test_gif_round_trip_and_interlace():
    rng = np.random.RandomState(9)
    palette = rng.randint(0, 256, size=(7, 3), dtype=np.uint8)
    idx = rng.randint(0, 7, size=(9, 5), dtype=np.uint8)
    gif = ic.encode_gif(idx, palette)
    assert ic.sniff(gif) == "gif"
    got = ic.decode_gif(gif)
    np.testing.assert_array_equal(got, palette[idx])

    # interlaced variant: store rows in Adam-style pass order and set the
    # interlace flag — the decoder must put them back
    order = (list(range(0, 9, 8)) + list(range(4, 9, 8))
             + list(range(2, 9, 4)) + list(range(1, 9, 2)))
    gif_i = bytearray(ic.encode_gif(idx[order], palette))
    # image descriptor starts after 13-byte header + 3*2^depth palette
    depth = 3
    desc = 13 + 3 * (1 << depth)
    assert gif_i[desc] == 0x2C
    gif_i[desc + 9] |= 0x40
    np.testing.assert_array_equal(ic.decode_gif(bytes(gif_i)), palette[idx])


def test_gif_probe_through_multimodal(spark):
    palette = np.array([[255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    idx = np.array([[0, 1, 0], [1, 0, 1]], dtype=np.uint8)
    gif = ic.encode_gif(idx, palette)
    df = mm.attach_meta(spark.createDataFrame([(5, gif)], "doc_id long, media binary"))
    meta = mm.probe_images(df).collect()[0]["media_meta"]
    assert (meta["width"], meta["height"]) == (3, 2)


def test_corrupt_magic_falls_back_to_stub(spark):
    # payloads that LOOK like images but are garbage must not fail the
    # batch — they get the deterministic stub like any undecodable format
    rows = [(1, b"BM this is text that merely starts with BM"),
            (2, ic.PNG_MAGIC + b"truncated"),
            (3, b"\xff\xd8 not really a jpeg")]
    df = mm.attach_meta(spark.createDataFrame(rows, "doc_id long, media binary"))
    feats = {r["doc_id"]: r["features"] for r in mm.image_features(df).collect()}
    assert set(feats) == {1, 2, 3}
    assert all(abs(sum(v) - 1.0) < 1e-6 for v in feats.values())


def test_image_phash_invariance_and_neardup_pairs(spark):
    rng = np.random.RandomState(21)
    base = rng.randint(0, 256, size=(8, 8, 3)).repeat(6, axis=0).repeat(6, axis=1)
    base = base.astype(np.int32)
    brighter = np.clip(base + 12, 0, 255)       # brightness shift
    noisy = np.clip(base + rng.randint(-6, 6, size=base.shape), 0, 255)
    other = rng.randint(0, 256, size=(10, 7, 3)).repeat(5, axis=0).repeat(7, axis=1)

    imgs = {1: base, 2: brighter, 3: noisy, 4: other}
    rows = [(k, ic.encode_bmp(v.astype(np.uint8))) for k, v in imgs.items()]
    df = spark.createDataFrame(rows, "doc_id long, media binary")

    hashes = {r["doc_id"]: r["phash"] for r in mm.image_phash(df).collect()}
    # parity with a driver-side recompute on the true pixels
    for k, v in imgs.items():
        assert hashes[k] == mm.phash_array(v.astype(np.uint8))

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert ham(hashes[1], hashes[2]) <= 7   # perceptually same
    assert ham(hashes[1], hashes[3]) <= 7
    assert ham(hashes[1], hashes[4]) > 7    # different image stays apart

    pairs = {
        (r["id_a"], r["id_b"])
        for r in mm.image_neardup_pairs(df, max_hamming=7).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs
    assert all(4 not in p for p in pairs)


def test_audio_fingerprint_volume_invariant_and_discriminative(spark):
    rate = 4000
    t = np.arange(rate * 2) / rate
    rng = np.random.RandomState(3)
    clip = 0.4 * np.sin(2 * np.pi * 330 * t) * (1 + 0.5 * np.sin(2 * np.pi * 2 * t))
    quiet = clip * 0.25                     # volume change only
    other = 0.4 * rng.randn(len(t))         # different audio
    rows = [(1, ic.encode_wav(clip, rate)), (2, ic.encode_wav(quiet, rate)),
            (3, ic.encode_wav(other, rate)), (4, b"not a wav")]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    fps = {r["doc_id"]: r["afp"] for r in mm.audio_fingerprint(df).collect()}

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    # log-energy deltas: volume scaling leaves every bit identical except
    # quantization at the 16-bit PCM boundary — allow a couple of flips
    assert ham(fps[1], fps[2]) <= 2
    assert ham(fps[1], fps[3]) > 10
    assert fps[4] is None
    # driver parity on true samples
    x, _ = ic.decode_wav(ic.encode_wav(clip, rate))
    assert fps[1] == mm.audio_fingerprint_array(x.mean(axis=1))


def test_mfcc_discriminates_and_matches_independent_recompute(spark):
    rate = 8000
    t = np.arange(rate) / rate
    low = 0.5 * np.sin(2 * np.pi * 200 * t)
    high = 0.5 * np.sin(2 * np.pi * 2500 * t)
    df = spark.createDataFrame(
        [(1, ic.encode_wav(low, rate)), (2, ic.encode_wav(high, rate)),
         (3, b"not audio")],
        "doc_id long, media binary",
    )
    out = {r["doc_id"]: r["mfcc"] for r in mm.audio_mfcc(df).collect()}
    assert out[3] is None
    a, b = np.array(out[1]), np.array(out[2])
    assert len(a) == 13
    # different spectral content -> clearly different cepstra
    assert np.linalg.norm(a - b) > 1.0

    # independent recompute: textbook loop formulas, no shared helpers
    x, _ = ic.decode_wav(ic.encode_wav(low, rate))
    mono = x.mean(axis=1)
    frame, hop, n_mels, n_mfcc = 512, 256, 26, 13
    win = np.hanning(frame)
    ref_frames = []
    i = 0
    while i + frame <= len(mono):
        spec = np.abs(np.fft.rfft(mono[i:i + frame] * win)) ** 2 / frame
        ref_frames.append(spec)
        i += hop
    fb = mm._mel_filterbank(n_mels, frame, rate)
    logmel = np.log(np.array(ref_frames) @ fb.T + 1e-10)
    want = np.zeros(n_mfcc)
    for k in range(n_mfcc):
        c = np.sqrt(1 / n_mels) if k == 0 else np.sqrt(2 / n_mels)
        basis = c * np.cos(np.pi * k * (2 * np.arange(n_mels) + 1) / (2 * n_mels))
        want[k] = (logmel * basis).sum(axis=1).mean()
    np.testing.assert_allclose(a, want, rtol=1e-8)
