"""Multimodal column operators: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

Training-pipeline shape for a 100TB corpus: media bytes ride in a
`binary` column next to a metadata struct; every transform is a
mapInPandas pass (Arrow transfer, no per-row Python overhead), map-only
unless the caller groups/joins. Decode status: PNG, GIF, 24-bit BMP and
WAV/PCM decode for REAL via the pure-Python codecs in imagecodec.py,
and JPEG (baseline + progressive) via jpegcodec.py (zlib + struct + numpy — no
PIL/ffmpeg needed); PIL is preferred automatically when importable;
only exotic JPEG modes and compressed audio fall back to a clearly-marked
deterministic fake with the same schema and batch shape, so the
Spark-side plumbing is identical either way.

Schema conventions:
    media:     binary            -- raw payload
    media_meta struct<kind:string, mime:string, width:int, height:int,
                      duration_ms:long, sample_rate:int>
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

META_SCHEMA = (
    "kind string, mime string, width int, height int, duration_ms long, sample_rate int"
)

_FEATURE_DIM = 16


def attach_meta(
    df: DataFrame,
    media_col: str = "media",
    kind: str = "image",
    mime: str = "application/octet-stream",
) -> DataFrame:
    """Wrap a binary column with the standard metadata struct (unknown
    dimensions until probed)."""
    return df.withColumn(
        f"{media_col}_meta",
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ),
    )


def _decode_image_real(payload: bytes):  # pragma: no cover - env lacks PIL
    from io import BytesIO

    from PIL import Image

    img = Image.open(BytesIO(payload))
    return np.asarray(img.convert("RGB")), img.width, img.height


def _decode_image_fake(payload: bytes):
    """STUB decoder (no PIL in this container): deterministic 8x8 RGB
    derived from the payload bytes — same shapes/types as the real path.
    Uses a stable digest (NOT builtin hash(), which is salted per-process
    and would differ across executors)."""
    import hashlib

    seed = hashlib.sha256(payload).digest()  # 32 bytes
    h = np.frombuffer(seed * 6, dtype=np.uint8)[: 8 * 8 * 3]
    return h.reshape(8, 8, 3).copy(), 8, 8


def _decode_image_builtin(payload: bytes):
    """REAL decode for PNG, GIF, baseline JPEG, and 24-bit BMP via the
    pure-Python codecs in jpegcodec.py and
    operators/imagecodec.py (zlib + numpy — no PIL needed). Other formats
    (JPEG etc.) fall through to the deterministic stub, which remains the
    documented env-gated fake."""
    from wp_motor_spark.operators import imagecodec as ic
    from wp_motor_spark.operators import jpegcodec as jc

    decoder = {
        "png": ic.decode_png,
        "bmp": ic.decode_bmp,
        "gif": ic.decode_gif,
    }.get(ic.sniff(payload))
    if decoder is None and jc.sniff_jpeg(payload):
        decoder = jc.decode_jpeg
    if decoder is not None:
        try:
            arr = decoder(payload)
            return arr, arr.shape[1], arr.shape[0]
        except Exception:
            # a sniffed magic on a non-image payload (text starting with
            # "BM"...) or an unsupported sub-format: fall through to the
            # deterministic stub rather than failing the batch
            pass
    return _decode_image_fake(payload)


try:  # gate: prefer the full library when it exists
    from PIL import Image  # noqa: F401

    _decode_image = _decode_image_real
    DECODER = "pil"
except ImportError:
    _decode_image = _decode_image_builtin
    DECODER = "builtin-png-gif-jpeg-bmp+stub"


def probe_images(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Decode headers and fill width/height in the metadata struct.
    mapInPandas: one Arrow batch in, one out; schema preserved + probed."""

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for payload, meta in zip(pdf[media_col], pdf[f"{media_col}_meta"]):
                m = dict(meta) if meta is not None else {}
                if payload is not None:
                    try:
                        _, w, h = _decode_image(bytes(payload))
                        m["width"], m["height"] = w, h
                    except Exception:
                        pass
                metas.append(m)
            pdf = pdf.copy()
            pdf[f"{media_col}_meta"] = metas
            yield pdf

    return df.mapInPandas(probe, schema=df.schema)


def image_features(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """Decode -> fixed-dim feature vector (channel-pooled intensity
    histogram). Real numpy math over the decoded array; only the decode
    itself is stubbed without PIL. Output: (id, features array<float>)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for rid, payload in zip(pdf[id_col], pdf[media_col]):
                if payload is None:
                    continue
                arr, _w, _h = _decode_image(bytes(payload))
                gray = arr.astype(np.float32).mean(axis=2)
                hist, _ = np.histogram(gray, bins=_FEATURE_DIM, range=(0, 255))
                total = max(hist.sum(), 1)
                ids.append(rid)
                vecs.append((hist / total).astype(np.float32).tolist())
            yield pd.DataFrame({id_col: ids, "features": vecs})

    return df.mapInPandas(feats, schema=f"{id_col} long, features array<float>")


def resize_images(
    df: DataFrame, width: int, height: int, media_col: str = "media"
) -> DataFrame:
    """Decode -> nearest-neighbor resize -> re-emit raw RGB bytes + updated
    meta. The resize math is real (numpy index sampling); encode-back is
    raw RGB since no codec is present."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for payload, meta in zip(pdf[media_col], pdf[f"{media_col}_meta"]):
                m = dict(meta) if meta is not None else {}
                if payload is None:
                    payloads.append(None)
                else:
                    arr, w, h = _decode_image(bytes(payload))
                    yi = (np.arange(height) * arr.shape[0] // height).clip(0, arr.shape[0] - 1)
                    xi = (np.arange(width) * arr.shape[1] // width).clip(0, arr.shape[1] - 1)
                    out = arr[yi][:, xi]
                    payloads.append(out.astype(np.uint8).tobytes())
                    m.update({"width": width, "height": height, "mime": "image/raw-rgb"})
                metas.append(m)
            pdf = pdf.copy()
            pdf[media_col] = payloads
            pdf[f"{media_col}_meta"] = metas
            yield pdf

    return df.mapInPandas(resize, schema=df.schema)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    media_col: str = "media",
    id_col: str = "doc_id",
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame.

    AVI containers demux for REAL (RIFF walk in imagecodec.py — frame
    boundaries and timestamps are container metadata, no codec needed;
    the frame payloads stay opaque bytes for a downstream decoder). For
    any other payload the pseudo-frame STUB applies (fixed-size slices,
    deterministic); the Spark plumbing — row explosion, frame indices,
    timestamps — is identical either way.
    """
    frame_bytes = 64
    from wp_motor_spark.operators import imagecodec as ic

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ts, frames = [], [], [], []
            for rid, payload, meta in zip(
                pdf[id_col], pdf[media_col], pdf[f"{media_col}_meta"]
            ):
                if payload is None:
                    continue
                buf = bytes(payload)
                if ic.sniff_video(buf) == "avi":
                    all_frames, frame_ms = ic.demux_avi(buf)
                    step = max(int(round(every_ms / frame_ms)), 1)
                    for i in range(0, len(all_frames), step):
                        ids.append(rid)
                        idxs.append(i)
                        ts.append(int(i * frame_ms))
                        frames.append(all_frames[i])
                    continue
                dur = (dict(meta) if meta is not None else {}).get("duration_ms")
                n_frames = max(len(buf) // frame_bytes, 1)
                frame_ms = (dur or n_frames * 40) / n_frames  # 25fps default
                step = max(int(round(every_ms / frame_ms)), 1)
                for i in range(0, n_frames, step):
                    ids.append(rid)
                    idxs.append(i)
                    ts.append(int(i * frame_ms))
                    frames.append(buf[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame_ms": ts, "frame": frames}
            )

    return df.mapInPandas(
        sample, schema=f"{id_col} long, frame_idx int, frame_ms long, frame binary"
    )


def audio_features(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """REAL audio feature extraction for WAV/PCM payloads (pure stdlib
    decode — no torchaudio needed): sample_rate, n_channels, duration_ms,
    rms, peak, zero-crossing rate. Non-WAV payloads yield a null-feature
    row (codec absent in this env) rather than disappearing.

    Arrow-batched mapInPandas, map-only; the numpy feature math runs on
    the true samples."""
    from wp_motor_spark.operators import imagecodec as ic

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[media_col]):
                if payload is None:
                    continue
                buf = bytes(payload)
                if ic.sniff_audio(buf) != "wav":
                    rows.append((rid, None, None, None, None, None, None))
                    continue
                try:
                    x, rate = ic.decode_wav(buf)
                except ValueError:
                    rows.append((rid, None, None, None, None, None, None))
                    continue
                mono = x.mean(axis=1)
                n = len(mono)
                rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
                peak = float(np.max(np.abs(mono))) if n else 0.0
                zc = (
                    float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                    if n > 1
                    else 0.0
                )
                rows.append(
                    (
                        rid,
                        rate,
                        x.shape[1],
                        int(round(n / rate * 1000)) if rate else None,
                        round(rms, 6),
                        round(peak, 6),
                        round(zc, 6),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "sample_rate", "n_channels", "duration_ms",
                    "rms", "peak", "zcr",
                ],
            )

    return df.mapInPandas(
        feats,
        schema=(
            f"{id_col} long, sample_rate int, n_channels int, "
            "duration_ms long, rms double, peak double, zcr double"
        ),
    )


# 32-point orthonormal DCT-II basis for pHash
_T32 = np.zeros((32, 32))
for _u in range(32):
    _c32 = np.sqrt(1 / 32) if _u == 0 else np.sqrt(2 / 32)
    for _x in range(32):
        _T32[_u, _x] = _c32 * np.cos((2 * _x + 1) * _u * np.pi / 64)


def phash_array(arr: np.ndarray) -> int:
    """64-bit perceptual hash of an RGB array (classic pHash): grayscale
    -> nearest-resize to 32x32 -> 2-D DCT -> keep the 8x8 low-frequency
    corner -> threshold against the median (DC excluded from the median
    so flat images don't flip half their bits). Pure numpy; brightness/
    contrast shifts and small crops move few bits."""
    gray = arr.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    yi = (np.arange(32) * h // 32).clip(0, h - 1)
    xi = (np.arange(32) * w // 32).clip(0, w - 1)
    small = gray[yi][:, xi]
    freq = _T32 @ small @ _T32.T
    low = freq[:8, :8].copy()
    med = np.median(np.concatenate([low.reshape(64)[1:]]))
    bits = (low.reshape(64) > med).astype(np.uint64)
    v = np.uint64(0)
    for i, b in enumerate(bits):
        v |= np.uint64(b) << np.uint64(i)
    return int(np.int64(v))  # as signed long for Spark


def image_phash(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """(id, phash) over decodable payloads — the image analogue of
    simhash: fingerprints computed map-side (real decode for
    PNG/GIF/JPEG/BMP, stub otherwise), pairing left to
    dedup.fingerprint_pairs. Arrow-batched, map-only."""

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs = [], []
            for rid, payload in zip(pdf[id_col], pdf[media_col]):
                if payload is None:
                    continue
                arr, _w, _h = _decode_image(bytes(payload))
                ids.append(rid)
                hs.append(phash_array(arr))
            yield pd.DataFrame({id_col: ids, "phash": hs})

    return df.mapInPandas(hashes, schema=f"{id_col} long, phash long")


def image_neardup_pairs(
    df: DataFrame,
    max_hamming: int = 7,
    media_col: str = "media",
    id_col: str = "doc_id",
) -> DataFrame:
    """Image near-duplicate pairs by pHash Hamming distance — resized,
    re-encoded, brightness-shifted copies land within a few bits. Reuses
    the pigeonhole block join (n_blocks=8 covers distance <= 7; 8-bit
    keys are fine to ~10^7 images, then add a secondary block key)."""
    from wp_motor_spark.operators.dedup import fingerprint_pairs

    f = image_phash(df, media_col=media_col, id_col=id_col)
    return fingerprint_pairs(
        f, max_hamming=max_hamming, n_blocks=8, id_col=id_col, fp_col="phash"
    )


def audio_fingerprint_array(x: np.ndarray) -> int:
    """64-bit spectral fingerprint of a mono sample array: 32 equal time
    windows x 2 frequency bands -> log band energies -> sign of the
    successive deltas along time (31 x 2 = 62 bits). Deltas of LOG
    energies make the fingerprint exactly invariant to volume scaling —
    the property a loudness-normalized re-encode needs."""
    n = len(x)
    if n < 64:
        return 0
    win = n // 32
    x = x[: win * 32].reshape(32, win)
    spec = np.abs(np.fft.rfft(x, axis=1))
    half = spec.shape[1] // 2
    lo = np.log(spec[:, :half].sum(axis=1) + 1e-12)
    hi = np.log(spec[:, half:].sum(axis=1) + 1e-12)
    bits = np.concatenate([(np.diff(lo) > 0), (np.diff(hi) > 0)])
    v = np.uint64(0)
    for i, b in enumerate(bits):
        v |= np.uint64(bool(b)) << np.uint64(i)
    return int(np.int64(v))


def audio_fingerprint(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """(id, afp) for WAV payloads (real decode); non-WAV rows get a null
    fingerprint. Pair with dedup.fingerprint_pairs(fp_col='afp')."""
    from wp_motor_spark.operators import imagecodec as ic

    def fps(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs = [], []
            for rid, payload in zip(pdf[id_col], pdf[media_col]):
                if payload is None:
                    continue
                buf = bytes(payload)
                ids.append(rid)
                if ic.sniff_audio(buf) != "wav":
                    hs.append(None)
                    continue
                try:
                    x, _rate = ic.decode_wav(buf)
                    hs.append(audio_fingerprint_array(x.mean(axis=1)))
                except ValueError:
                    hs.append(None)
            yield pd.DataFrame({id_col: ids, "afp": hs})

    return df.mapInPandas(fps, schema=f"{id_col} long, afp long")


def _mel_filterbank(n_mels: int, n_fft: int, rate: int) -> np.ndarray:
    """Triangular mel filterbank (HTK mel scale), (n_mels, n_fft//2+1)."""
    def mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def imel(m):
        return 700.0 * (10 ** (m / 2595.0) - 1.0)

    pts = imel(np.linspace(mel(0.0), mel(rate / 2.0), n_mels + 2))
    bins = np.floor((n_fft + 1) * pts / rate).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for i in range(n_mels):
        lo, mid, hi = bins[i], bins[i + 1], bins[i + 2]
        for b in range(lo, mid):
            if mid > lo:
                fb[i, b] = (b - lo) / (mid - lo)
        for b in range(mid, hi):
            if hi > mid:
                fb[i, b] = (hi - b) / (hi - mid)
    return fb


def mfcc_array(
    x: np.ndarray, rate: int, n_mfcc: int = 13, n_mels: int = 26,
    frame: int = 512, hop: int = 256,
) -> np.ndarray:
    """Mean MFCC vector of a mono sample array: Hann-windowed power
    spectra -> mel filterbank -> log -> orthonormal DCT-II -> first
    n_mfcc coefficients, averaged over frames. Textbook pipeline in
    numpy; deterministic."""
    if len(x) < frame:
        x = np.pad(x, (0, frame - len(x)))
    n_frames = 1 + (len(x) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx] * np.hanning(frame)
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2 / frame
    fb = _mel_filterbank(n_mels, frame, rate)
    logmel = np.log(power @ fb.T + 1e-10)
    # orthonormal DCT-II over the mel axis
    M = np.zeros((n_mfcc, n_mels))
    for k in range(n_mfcc):
        c = np.sqrt(1 / n_mels) if k == 0 else np.sqrt(2 / n_mels)
        M[k] = c * np.cos(np.pi * k * (2 * np.arange(n_mels) + 1) / (2 * n_mels))
    return (logmel @ M.T).mean(axis=0)


def audio_mfcc(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id",
    n_mfcc: int = 13,
) -> DataFrame:
    """(id, mfcc array<double>) for WAV payloads — the standard audio
    representation for clustering/dedup/quality over an audio corpus.
    Real decode + numpy DSP per Arrow batch, map-only; non-WAV rows get
    null."""
    from wp_motor_spark.operators import imagecodec as ic

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for rid, payload in zip(pdf[id_col], pdf[media_col]):
                if payload is None:
                    continue
                buf = bytes(payload)
                ids.append(rid)
                if ic.sniff_audio(buf) != "wav":
                    vecs.append(None)
                    continue
                try:
                    x, rate = ic.decode_wav(buf)
                    vecs.append(
                        [float(v) for v in mfcc_array(x.mean(axis=1), rate, n_mfcc)]
                    )
                except ValueError:
                    vecs.append(None)
            yield pd.DataFrame({id_col: ids, "mfcc": vecs})

    return df.mapInPandas(feats, schema=f"{id_col} long, mfcc array<double>")
