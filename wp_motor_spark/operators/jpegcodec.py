"""JPEG decoder (baseline SOF0 + progressive SOF2) — pure Python +
numpy, no libjpeg/PIL.

Scope: 8-bit precision, any sampling factors (4:4:4 / 4:2:2 / 4:2:0 via
nearest upsampling), restart intervals; progressive covers DC
first/refinement scans and AC spectral-selection bands with EOBRUN plus
successive-approximation correction-bit passes (spec G.1.2). Arithmetic
coding, hierarchical, and lossless modes are rejected loudly so callers
fall back to the documented stub.

The companion encoder writes spec-valid baseline 4:4:4 JPEGs with
image-derived canonical Huffman tables (the decoder reads whatever DHT
declares, so no Annex K constants are needed) — used by tests for a
round-trip PSNR gate, alongside a real-world fixture decode.

Decode path: marker parse -> per-MCU Huffman + RLE/zigzag -> dequantize
-> 8x8 IDCT (orthonormal DCT basis matrix, one numpy matmul pair per
block) -> plane assembly -> chroma upsample -> JFIF YCbCr->RGB.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# orthonormal 8-point DCT-II basis: T[u, x] = c(u)/2 * cos((2x+1)u*pi/16)
_T = np.zeros((8, 8))
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _T[_u, _x] = _c / 2.0 * np.cos((2 * _x + 1) * _u * np.pi / 16)


def idct2(block: np.ndarray) -> np.ndarray:
    return _T.T @ block @ _T


def dct2(block: np.ndarray) -> np.ndarray:
    return _T @ block @ _T.T


def sniff_jpeg(payload: bytes) -> bool:
    return payload[:2] == b"\xff\xd8"


class _BitReader:
    """MSB-first reader over entropy-coded segments with FF00 unstuffing;
    stops at any marker (FFxx, xx != 00)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d = self.data
        p = self.pos
        if p >= len(d):
            return False
        b = d[p]
        if b == 0xFF:
            if p + 1 < len(d) and d[p + 1] == 0x00:
                self.pos = p + 2  # stuffed FF
            else:
                return False  # a real marker: stop
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            return 0  # past-end padding bits, per spec
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0

    def at_marker(self) -> int | None:
        d, p = self.data, self.pos
        if p + 1 < len(d) and d[p] == 0xFF and d[p + 1] != 0x00:
            return d[p + 1]
        return None


def _build_huffman(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_sym(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("jpeg: invalid huffman code")


def _extend(v: int, n: int) -> int:
    # signed magnitude category decode (spec F.2.2.1)
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    if not sniff_jpeg(payload):
        raise ValueError("jpeg: bad magic")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    frame = None
    restart = 0
    coefs: dict[int, np.ndarray] = {}
    preds_grid: dict[int, tuple[int, int]] = {}
    eobrun = 0
    pos = 2
    d = payload
    while pos + 2 <= len(d):
        if d[pos] != 0xFF:
            pos += 1
            continue
        marker = d[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", d[pos + 2 : pos + 4])
        body = d[pos + 4 : pos + 2 + seg_len]
        nxt = pos + 2 + seg_len
        if marker == 0xC4:  # DHT (may hold several tables)
            b = 0
            while b < len(body):
                tc_th = body[b]
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = list(body[b + 17 : b + 17 + n])
                huff[(tc_th >> 4, tc_th & 15)] = _build_huffman(bits, vals)
                b += 17 + n
        elif marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq_tq = body[b]
                if pq_tq >> 4:  # 16-bit table
                    vals16 = struct.unpack(">64H", body[b + 1 : b + 129])
                    qt[pq_tq & 15] = np.array(vals16, dtype=np.int32)
                    b += 129
                else:
                    qt[pq_tq & 15] = np.frombuffer(
                        body[b + 1 : b + 65], dtype=np.uint8
                    ).astype(np.int32)
                    b += 65
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, samp, tq = body[6 + i * 3 : 9 + i * 3]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 15, "tq": tq})
            frame = {
                "w": w,
                "h": h,
                "comps": comps,
                "progressive": marker == 0xC2,
            }
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            frame["hmax"], frame["vmax"] = hmax, vmax
            frame["mcux"] = (w + 8 * hmax - 1) // (8 * hmax)
            frame["mcuy"] = (h + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                # padded (interleaved) grid; noninterleaved scans use the
                # tighter per-component grid inside it
                coefs[c["id"]] = np.zeros(
                    (frame["mcuy"] * c["v"], frame["mcux"] * c["h"], 64),
                    dtype=np.int32,
                )
                cw = (w * c["h"] + hmax - 1) // hmax
                ch = (h * c["v"] + vmax - 1) // vmax
                preds_grid[c["id"]] = ((ch + 7) // 8, (cw + 7) // 8)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"jpeg: SOF{marker - 0xC0} not supported")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tables = body[1 + i * 2 : 3 + i * 2]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tables >> 4, tables & 15))
            ss, se, ah_al = body[1 + ns * 2 : 4 + ns * 2]
            ah, al = ah_al >> 4, ah_al & 15
            pos = _decode_scan(
                d, nxt, frame, scan, huff, restart, coefs, preds_grid,
                ss, se, ah, al,
            )
            continue
        pos = nxt
    if frame is None or not coefs:
        raise ValueError("jpeg: no scan data")
    return _render(frame, coefs, qt)


def _decode_scan(
    d, pos, frame, scan, huff, restart, coefs, preds_grid, ss, se, ah, al
):
    """Decode one entropy-coded scan into the coefficient arrays; returns
    the stream position after the scan. Handles baseline full scans,
    progressive DC-first/DC-refine, and progressive AC spectral bands
    (EOBRUN); AC successive-approximation refinement (Ah>0, Ss>0) is
    rejected loudly."""
    r = _BitReader(d, pos)
    preds = {c["id"]: 0 for c, _, _ in scan}
    eobrun = 0

    def restart_check(n_units: int) -> None:
        nonlocal eobrun
        if restart and n_units and n_units % restart == 0:
            r.align()
            m = r.at_marker()
            if m is not None and 0xD0 <= m <= 0xD7:
                r.pos += 2
            for k in preds:
                preds[k] = 0
            eobrun = 0

    def decode_dc(c, dc_id, blk):
        if ah == 0:
            s = _decode_sym(r, huff[(0, dc_id)])
            diff = _extend(r.bits(s), s)
            preds[c["id"]] += diff
            blk[0] = preds[c["id"]] << al
        else:  # DC refinement: one correction bit
            if r.bit():
                blk[0] |= 1 << al

    def decode_ac_band(ac_id, blk):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = _decode_sym(r, huff[(1, ac_id)])
            rr, sz = rs >> 4, rs & 15
            if sz == 0:
                if rr == 15:
                    k += 16
                    continue
                eobrun = (1 << rr) - 1 + (r.bits(rr) if rr else 0)
                return
            k += rr
            if k > se:
                raise ValueError("jpeg: AC index past band end")
            blk[ZIGZAG[k]] = _extend(r.bits(sz), sz) << al
            k += 1

    def refine_ac_band(ac_id, blk):
        # successive-approximation AC refinement (spec G.1.2.3): correction
        # bits for nonzero-history coefficients, new +-1<<al insertions
        nonlocal eobrun
        bit_val = 1 << al

        def correct(pos):
            v = blk[ZIGZAG[pos]]
            if v != 0 and r.bit():
                if (abs(v) & bit_val) == 0:
                    blk[ZIGZAG[pos]] = v + bit_val if v > 0 else v - bit_val

        if eobrun > 0:
            eobrun -= 1
            for k in range(ss, se + 1):
                correct(k)
            return
        k = ss
        while k <= se:
            rs = _decode_sym(r, huff[(1, ac_id)])
            rr, sz = rs >> 4, rs & 15
            if sz == 0:
                if rr < 15:  # EOB run: correct the rest of the band
                    eobrun = (1 << rr) - 1 + (r.bits(rr) if rr else 0)
                    for kk in range(k, se + 1):
                        correct(kk)
                    return
                newval = 0  # ZRL: skip 16 zero-history positions
            else:
                if sz != 1:
                    raise ValueError("jpeg: bad refinement size")
                newval = bit_val if r.bit() else -bit_val
            # advance past rr zero-history coefficients, correcting
            # nonzero-history ones along the way
            while k <= se:
                if blk[ZIGZAG[k]] != 0:
                    correct(k)
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if newval and k <= se:
                blk[ZIGZAG[k]] = newval
            k += 1

    progressive = frame["progressive"]
    if progressive and ss > 0 and len(scan) != 1:
        raise ValueError("jpeg: interleaved AC progressive scan")

    if len(scan) == 1 and (progressive or scan[0][0]["h"] == frame["hmax"]):
        # noninterleaved: iterate the component's own block grid
        c, dc_id, ac_id = scan[0]
        bh, bw = preds_grid[c["id"]]
        n = 0
        for by in range(bh):
            for bx in range(bw):
                restart_check(n)
                blk = coefs[c["id"]][by, bx]
                if ss == 0:
                    decode_dc(c, dc_id, blk)
                    if not progressive:  # baseline single-component scan
                        _baseline_ac(r, huff[(1, ac_id)], blk)
                elif ah == 0:
                    decode_ac_band(ac_id, blk)
                else:
                    refine_ac_band(ac_id, blk)
                n += 1
    else:
        n_mcu = 0
        for my in range(frame["mcuy"]):
            for mx in range(frame["mcux"]):
                restart_check(n_mcu)
                for c, dc_id, ac_id in scan:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = coefs[c["id"]][my * c["v"] + by, mx * c["h"] + bx]
                            decode_dc(c, dc_id, blk)
                            if not progressive:
                                _baseline_ac(r, huff[(1, ac_id)], blk)
                n_mcu += 1
    r.align()
    return r.pos


def _baseline_ac(r, act, blk):
    k = 1
    while k < 64:
        rs = _decode_sym(r, act)
        rr, sz = rs >> 4, rs & 15
        if sz == 0:
            if rr == 15:
                k += 16
                continue
            return  # EOB
        k += rr
        if k > 63:
            raise ValueError("jpeg: AC index overflow")
        blk[ZIGZAG[k]] = _extend(r.bits(sz), sz)
        k += 1


def _render(frame, coefs, qt):
    w, h = frame["w"], frame["h"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    out = []
    for c in frame["comps"]:
        q = qt[c["tq"]]
        qnat = np.empty(64, dtype=np.int32)
        qnat[ZIGZAG] = q  # DQT is in zigzag order; coefs are natural
        grid = coefs[c["id"]]
        bh, bw = grid.shape[:2]
        plane = np.zeros((bh * 8, bw * 8), dtype=np.float64)
        for by in range(bh):
            for bx in range(bw):
                deq = (grid[by, bx] * qnat).astype(np.float64)
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    idct2(deq.reshape(8, 8)) + 128.0
                )
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out.append(plane[:h, :w])
    if len(out) == 1:
        y = np.clip(out[0], 0, 255)
        return np.repeat(y[:, :, None], 3, axis=2).astype(np.uint8)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------------------------ encoder


def _canonical_huffman(freqs: dict[int, int]) -> tuple[list[int], list[int]]:
    """Length-limited (<=16) canonical Huffman from symbol frequencies.
    Returns (bits[16], vals) in DHT order."""
    import heapq

    syms = [s for s, f in freqs.items() if f > 0]
    if not syms:
        return [0] * 16, []
    if len(syms) == 1:
        return [1] + [0] * 15, syms
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(freqs.items()) if f > 0]
    heapq.heapify(heap)
    depth: dict[int, int] = {s: 0 for s in syms}
    i = len(heap)
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, i, g1 + g2))
        i += 1
    # cap at 16 (extremely unlikely for our inputs; clamp + re-sort)
    for s in depth:
        depth[s] = min(depth[s], 16)
    order = sorted(syms, key=lambda s: (depth[s], s))
    bits = [0] * 16
    for s in order:
        bits[depth[s] - 1] += 1
    # fix any non-prefix overflow by pushing symbols deeper (Kraft repair)
    while True:
        kraft = sum(b / (1 << (i + 1)) for i, b in enumerate(bits))
        if kraft <= 1.0:
            break
        for i in range(15, -1, -1):
            if bits[i] > 0 and i < 15:
                bits[i] -= 1
                bits[i + 1] += 1
                break
    return bits, order


def _encode_block(coef_q, pred, dc_freq, ac_freq, emit):
    """One quantized 8x8 block -> (runlength, size) symbol stream.
    With emit=None only counts frequencies; else writes via emit."""
    zz = coef_q.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred

    def cat(v: int) -> int:
        return int(v).bit_length() if v != 0 else 0

    s = cat(abs(diff))
    if emit is None:
        dc_freq[s] = dc_freq.get(s, 0) + 1
    else:
        emit("dc", s, diff)
    k = 1
    run = 0
    while k < 64:
        v = int(zz[k])
        if v == 0:
            run += 1
        else:
            while run > 15:
                if emit is None:
                    ac_freq[0xF0] = ac_freq.get(0xF0, 0) + 1
                else:
                    emit("ac", 0xF0, 0)
                run -= 16
            ss = cat(abs(v))
            rs = (run << 4) | ss
            if emit is None:
                ac_freq[rs] = ac_freq.get(rs, 0) + 1
            else:
                emit("ac", rs, v)
            run = 0
        k += 1
    if run > 0:
        if emit is None:
            ac_freq[0x00] = ac_freq.get(0x00, 0) + 1
        else:
            emit("ac", 0x00, 0)
    return int(zz[0])


def encode_jpeg(arr: np.ndarray, quant: int = 1) -> bytes:
    """Spec-valid baseline 4:4:4 JPEG writer with image-derived canonical
    Huffman tables; `quant` is a flat quantization value (1 = near
    lossless up to DCT rounding). Test harness for the decoder — not a
    production encoder."""
    h, w = arr.shape[:2]
    q = np.full(64, quant, dtype=np.int32)
    ycc = arr.astype(np.float64)
    y = 0.299 * ycc[:, :, 0] + 0.587 * ycc[:, :, 1] + 0.114 * ycc[:, :, 2]
    cb = -0.168736 * ycc[:, :, 0] - 0.331264 * ycc[:, :, 1] + 0.5 * ycc[:, :, 2] + 128
    cr = 0.5 * ycc[:, :, 0] - 0.418688 * ycc[:, :, 1] - 0.081312 * ycc[:, :, 2] + 128
    planes = [y, cb, cr]
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = []
    for p in planes:
        pp = np.zeros((ph, pw))
        pp[:h, :w] = p
        pp[h:, :w] = p[-1:, :]
        pp[:, w:] = pp[:, w - 1 : w]
        padded.append(pp)

    # pass 1: quantized coefficients + symbol frequencies
    blocks: list[list[np.ndarray]] = [[], [], []]
    dc_freq: dict[int, int] = {}
    ac_freq: dict[int, int] = {}
    for ci, p in enumerate(padded):
        pred = 0
        for by in range(ph // 8):
            for bx in range(pw // 8):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                cq = np.round(dct2(blk) / q.reshape(8, 8)).astype(np.int64)
                blocks[ci].append(cq)
                pred = _encode_block(cq, pred, dc_freq, ac_freq, None)

    dc_bits, dc_vals = _canonical_huffman(dc_freq)
    ac_bits, ac_vals = _canonical_huffman(ac_freq)
    dc_table = _build_huffman(dc_bits, dc_vals)
    ac_table = _build_huffman(ac_bits, ac_vals)
    dc_codes = {v: k for k, v in dc_table.items()}
    ac_codes = {v: k for k, v in ac_table.items()}

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
    # flat table: zigzag order is the identity on a constant table
    out += bytes(int(v) for v in q)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid in (1, 2, 3):
        out += bytes([cid, 0x11, 0])
    for tc, bits_vals in ((0, (dc_bits, dc_vals)), (1, (ac_bits, ac_vals))):
        bits, vals = bits_vals
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tc << 4])
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid in (1, 2, 3):
        out += bytes([cid, 0x00])
    out += b"\x00\x3f\x00"

    acc = 0
    nbits = 0
    body = bytearray()

    def put(code_len: tuple[int, int]):
        nonlocal acc, nbits
        length, code = code_len
        acc = (acc << length) | code
        nbits += length
        while nbits >= 8:
            b = (acc >> (nbits - 8)) & 0xFF
            body.append(b)
            if b == 0xFF:
                body.append(0x00)
            nbits -= 8

    def put_val(v: int, size: int):
        if size == 0:
            return
        if v < 0:
            v = v + (1 << size) - 1
        put((size, v & ((1 << size) - 1)))

    def emit(kind: str, sym: int, v: int):
        if kind == "dc":
            put(dc_codes[sym])
            put_val(v, sym)
        else:
            put(ac_codes[sym])
            put_val(v, sym & 15)

    # interleaved 4:4:4: one block per component per MCU, raster order
    n_blocks = (ph // 8) * (pw // 8)
    preds = [0, 0, 0]
    for bi in range(n_blocks):
        for ci in range(3):
            cq = blocks[ci][bi]
            zz0 = int(cq.reshape(64)[ZIGZAG][0])
            diff = zz0 - preds[ci]
            s = abs(diff).bit_length()
            put(dc_codes[s])
            put_val(diff, s)
            zz = cq.reshape(64)[ZIGZAG]
            k, run = 1, 0
            while k < 64:
                v = int(zz[k])
                if v == 0:
                    run += 1
                else:
                    while run > 15:
                        put(ac_codes[0xF0])
                        run -= 16
                    ss = abs(v).bit_length()
                    put(ac_codes[(run << 4) | ss])
                    put_val(v, ss)
                    run = 0
                k += 1
            if run > 0:
                put(ac_codes[0x00])
            preds[ci] = zz0
    if nbits:
        pad = 8 - nbits
        acc = (acc << pad) | ((1 << pad) - 1)
        b = acc & 0xFF
        body.append(b)
        if b == 0xFF:
            body.append(0x00)
    out += body
    out += b"\xff\xd9"
    return bytes(out)
