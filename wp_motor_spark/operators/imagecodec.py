"""Pure-Python image codecs: real PNG and BMP decode without PIL.

The container has no PIL/ffmpeg, but PNG (zlib + per-scanline filters)
and uncompressed 24-bit BMP are fully decodable with the stdlib + numpy —
so those formats get REAL decoding in the multimodal operators; only
JPEG-class formats remain behind the deterministic stub.

Coverage (rejects loudly otherwise):
- PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette), 4
  (gray+alpha), 6 (RGBA); filters 0-4 (None/Sub/Up/Average/Paeth) per
  the PNG spec §9; no interlace. Alpha is dropped (RGB out).
- BMP: BITMAPINFOHEADER, 24 bpp, BI_RGB (uncompressed), bottom-up or
  top-down rows, 4-byte row padding.

Both return (height, width, 3) uint8 RGB arrays — the same contract the
PIL path produces.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def sniff(payload: bytes) -> str | None:
    if payload[:8] == PNG_MAGIC:
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return None


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters. raw is (height, 1+stride) uint8 rows
    (filter byte + filtered data); returns (height, stride) uint8."""
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"png: unknown filter type {ftype}")
        out[y] = cur.astype(np.uint8)
    return out


def decode_png(payload: bytes) -> np.ndarray:
    if payload[:8] != PNG_MAGIC:
        raise ValueError("png: bad magic")
    pos = 8
    ihdr = None
    idat = b""
    plte = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("png: no IHDR")
    width, height, depth, ctype_n, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0:
        raise ValueError(f"png: unsupported depth/compression ({depth},{comp})")
    if interlace != 0:
        raise ValueError("png: interlaced not supported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype_n)
    if channels is None:
        raise ValueError(f"png: unsupported color type {ctype_n}")
    stride = width * channels
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    if len(raw) != height * (stride + 1):
        raise ValueError("png: bad IDAT length")
    px = _unfilter(raw.reshape(height, stride + 1), height, stride, channels)
    px = px.reshape(height, width, channels)
    if ctype_n == 0:
        return np.repeat(px, 3, axis=2)
    if ctype_n == 2:
        return px
    if ctype_n == 3:
        if plte is None:
            raise ValueError("png: palette image without PLTE")
        return plte[px[:, :, 0]]
    if ctype_n == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # RGBA -> drop alpha


def decode_bmp(payload: bytes) -> np.ndarray:
    if payload[:2] != b"BM":
        raise ValueError("bmp: bad magic")
    (data_offset,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        raise ValueError("bmp: pre-BITMAPINFOHEADER not supported")
    width, height = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if bpp != 24 or compression != 0:
        raise ValueError(f"bmp: only 24bpp BI_RGB supported (got {bpp},{compression})")
    top_down = height < 0
    height = abs(height)
    row_bytes = (width * 3 + 3) // 4 * 4
    need = data_offset + row_bytes * height
    if len(payload) < need:
        raise ValueError("bmp: truncated pixel data")
    rows = np.frombuffer(
        payload[data_offset : data_offset + row_bytes * height], dtype=np.uint8
    ).reshape(height, row_bytes)
    px = rows[:, : width * 3].reshape(height, width, 3)
    if not top_down:
        px = px[::-1]
    return px[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """Minimal 24-bit BMP writer (tests + raw re-encode path)."""
    h, w = arr.shape[:2]
    row_bytes = (w * 3 + 3) // 4 * 4
    pad = row_bytes - w * 3
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += arr[y, :, ::-1].astype(np.uint8).tobytes()  # RGB -> BGR
        body += b"\x00" * pad
    data_offset = 14 + 40
    size = data_offset + len(body)
    hdr = b"BM" + struct.pack("<IHHI", size, 0, 0, data_offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return hdr + info + bytes(body)


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal PNG writer (RGB, 8-bit, one filter for all rows) — used by
    tests to produce spec-valid files with a chosen filter so every
    unfilter branch is exercised against ground-truth pixels."""
    h, w = arr.shape[:2]
    arr = arr.astype(np.uint8)
    lines = bytearray()
    prev = np.zeros((w, 3), dtype=np.int32)
    for y in range(h):
        row = arr[y].astype(np.int32)
        if filter_type == 0:
            filtered = row
        elif filter_type == 1:  # Sub
            left = np.vstack([np.zeros((1, 3), np.int32), row[:-1]])
            filtered = (row - left) & 0xFF
        elif filter_type == 2:  # Up
            filtered = (row - prev) & 0xFF
        elif filter_type == 3:  # Average
            left = np.vstack([np.zeros((1, 3), np.int32), row[:-1]])
            filtered = (row - ((left + prev) >> 1)) & 0xFF
        elif filter_type == 4:  # Paeth
            filtered = np.zeros_like(row)
            for x in range(w):
                for c in range(3):
                    a = int(row[x - 1, c]) if x > 0 else 0
                    b = int(prev[x, c])
                    cc = int(prev[x - 1, c]) if x > 0 else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    filtered[x, c] = (row[x, c] - pred) & 0xFF
        else:
            raise ValueError("bad filter")
        lines += bytes([filter_type]) + filtered.astype(np.uint8).tobytes()
        prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def sniff_audio(payload: bytes) -> str | None:
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Real WAV/PCM decode (stdlib struct + numpy): returns
    (samples float64 in [-1, 1] shaped (n, channels), sample_rate).
    Supports PCM 8/16/32-bit and IEEE float32 — the overwhelming bulk of
    real WAV files; compressed codecs inside WAV are rejected loudly."""
    if sniff_audio(payload) != "wav":
        raise ValueError("wav: bad magic")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("wav: missing fmt/data chunk")
    audio_fmt, channels, rate, _byte_rate, _block, bits = fmt
    if audio_fmt == 1:  # PCM
        if bits == 8:
            x = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
        else:
            raise ValueError(f"wav: unsupported PCM bit depth {bits}")
    elif audio_fmt == 3 and bits == 32:  # IEEE float
        x = np.frombuffer(data, dtype="<f4").astype(np.float64)
    else:
        raise ValueError(f"wav: unsupported format code {audio_fmt}/{bits}")
    n = len(x) // channels * channels
    return x[:n].reshape(-1, channels), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Minimal PCM-16 WAV writer (tests). samples: (n, channels) in [-1,1]."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    body = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    out = b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(out) - 4 + 0) + out


def sniff_video(payload: bytes) -> str | None:
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    return None


def demux_avi(payload: bytes) -> tuple[list[bytes], float]:
    """Real AVI demux (RIFF walk, no codec needed): returns the video
    frame payloads ('00dc'/'00db' chunks inside LIST movi, in stream
    order) and the frame interval in milliseconds from the avih
    MainAVIHeader's dwMicroSecPerFrame. The frames stay opaque bytes —
    decoding them is the (absent) codec's job; sampling/timestamps are
    container metadata and therefore exact."""
    if sniff_video(payload) != "avi":
        raise ValueError("avi: bad magic")
    frame_ms = 40.0  # 25 fps fallback if avih is missing
    frames: list[bytes] = []

    def walk(buf: bytes, start: int, end: int) -> None:
        nonlocal frame_ms
        pos = start
        while pos + 8 <= end:
            cid = buf[pos : pos + 4]
            (length,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body_start = pos + 8
            body_end = min(body_start + length, end)
            if cid == b"LIST":
                walk(buf, body_start + 4, body_end)  # skip list type tag
            elif cid == b"avih" and length >= 4:
                (us_per_frame,) = struct.unpack(
                    "<I", buf[body_start : body_start + 4]
                )
                if us_per_frame:
                    frame_ms = us_per_frame / 1000.0
            elif cid[2:4] in (b"dc", b"db"):
                frames.append(buf[body_start:body_end])
            pos = body_start + length + (length & 1)  # word-aligned

    walk(payload, 12, len(payload))
    return frames, frame_ms


def encode_avi(frames: list[bytes], frame_ms: float = 40.0) -> bytes:
    """Minimal AVI writer (tests): avih with the frame interval + one
    video stream of '00dc' chunks."""
    avih = struct.pack("<I", int(frame_ms * 1000)) + b"\x00" * 52
    hdrl_body = b"avih" + struct.pack("<I", len(avih)) + avih
    hdrl = b"LIST" + struct.pack("<I", 4 + len(hdrl_body)) + b"hdrl" + hdrl_body
    movi_body = b""
    for f in frames:
        movi_body += b"00dc" + struct.pack("<I", len(f)) + f
        if len(f) & 1:
            movi_body += b"\x00"
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_body)) + b"movi" + movi_body
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """GIF-variant LZW: variable code width starting at min_code_size+1,
    clear/EOI codes, dictionary grows to 12 bits."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader, LSB-first
    bitpos = 0
    total_bits = len(data) * 8

    def read(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return eoi
        v = 0
        for i in range(width):
            byte = data[(bitpos + i) >> 3]
            v |= ((byte >> ((bitpos + i) & 7)) & 1) << i
        bitpos += width
        return v

    def reset():
        table = {i: bytes([i]) for i in range(clear)}
        return table, min_code_size + 1

    table, width = reset()
    prev: bytes | None = None
    while len(out) < expected:
        code = read(width)
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif prev is not None and code == len(table) + 2:
            entry = prev + prev[:1]
        else:
            raise ValueError("gif: bad LZW code")
        out += entry
        if prev is not None:
            table[len(table) + 2] = prev + entry[:1]
            if len(table) + 2 >= (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out[:expected])


def decode_gif(payload: bytes) -> np.ndarray:
    """Real GIF decode (87a/89a), first image frame: LZW decompression,
    global/local color tables, optional interlace. Returns RGB uint8."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad magic")
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload[pos : pos + n * 3], dtype=np.uint8).reshape(-1, 3)
        pos += n * 3
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            w, h = struct.unpack("<HH", payload[pos + 5 : pos + 9])
            iflags = payload[pos + 9]
            pos += 10
            table = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                table = np.frombuffer(
                    payload[pos : pos + n * 3], dtype=np.uint8
                ).reshape(-1, 3)
                pos += n * 3
            if table is None:
                raise ValueError("gif: no color table")
            min_code = payload[pos]
            pos += 1
            lzw = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                lzw += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                _lzw_decode(bytes(lzw), min_code, w * h), dtype=np.uint8
            ).reshape(h, w)
            if iflags & 0x40:  # interlaced: rows in 4 passes
                order = (
                    list(range(0, h, 8))
                    + list(range(4, h, 8))
                    + list(range(2, h, 4))
                    + list(range(1, h, 2))
                )
                de = np.zeros_like(idx)
                de[order] = idx
                idx = de
            return table[np.minimum(idx, len(table) - 1)]
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"gif: unexpected block 0x{b0:02x}")
    raise ValueError("gif: no image data")


def encode_gif(arr_idx: np.ndarray, palette: np.ndarray) -> bytes:
    """Minimal GIF89a writer over an index array + palette (tests). Emits
    uncompressed-style LZW (clear code before every symbol — spec-valid,
    never grows the table past the initial width)."""
    h, w = arr_idx.shape
    n = len(palette)
    depth = max(2, int(np.ceil(np.log2(max(n, 2)))))
    pal = np.zeros((1 << depth, 3), dtype=np.uint8)
    pal[:n] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (depth - 1), 0, 0])
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    min_code = depth
    clear = 1 << min_code
    width = min_code + 1
    bits = bytearray()
    acc = 0
    nbits = 0

    def put(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    for v in arr_idx.flatten():
        put(int(v))
        put(clear)  # keep the table empty so codes never widen
    put(clear + 1)  # EOI
    if nbits:
        bits.append(acc & 0xFF)
    out += bytes([min_code])
    data = bytes(bits)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
