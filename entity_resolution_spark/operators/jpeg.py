"""Baseline JPEG codec, dependency-free (numpy + struct only).

Covers the sequential-DCT baseline that dominates crawl imagery: SOF0,
8-bit, grayscale or YCbCr with any of the common subsampling layouts
(4:4:4, 4:2:2, 4:2:0), restart markers, multiple DQT/DHT segments.
Progressive (SOF2), arithmetic coding, and 12-bit precision raise
``NotImplementedError`` — plug Pillow via ``multimodal.register_decoder``
for those.

This is a correctness-first decoder for metadata/feature extraction
(dimensions, luma stats, resize inputs), not a throughput codec: the
entropy decode is a Python bit loop (~ms per small image), while dequant,
IDCT (separable 8×8 basis matmul) and upsampling are vectorized numpy.

The encoder exists for round-trip tests: with an all-ones quantization
table the pipeline is exact up to DCT float rounding, so decode(encode(x))
must match x within ±2 — a much stronger check than "doesn't crash".
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# Orthonormal 8-point DCT basis: M[u, x] = a(u) cos((2x+1)uπ/16);
# inverse 2-D transform is M.T @ F @ M, forward is M @ f @ M.T.
_M = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(1.0 / 8.0) if _u == 0 else np.sqrt(2.0 / 8.0)
    for _x in range(8):
        _M[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

# Annex K.3 example Huffman tables (the de-facto standard baseline set):
# (bits[1..16], values) per (class, id).
_STD_DC_LUMA = (
    [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUMA = (
    [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _build_huffman(bits, values):
    """Canonical Huffman: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _encode_huffman_spec(bits, values):
    """Canonical Huffman the encoding direction: {symbol: (code, length)}."""
    enc = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            enc[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return enc


class _BitReader:
    """Entropy-coded segment reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self):
        if self.pos >= len(self.data) - 1:
            raise NotImplementedError("truncated JPEG entropy data")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller via sync()
                raise _RestartMarker(nxt)
            else:
                raise EOFError("marker inside entropy data")
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_to_restart(self):
        """Skip to just past the next RSTn marker, drop partial bits."""
        self.bitbuf = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise NotImplementedError("truncated JPEG entropy data (missing RSTn)")


class _RestartMarker(Exception):
    def __init__(self, marker):
        self.marker = marker


def _decode_symbol(br: _BitReader, table) -> int:
    code, length = 0, 0
    while True:
        code = (code << 1) | br.read_bit()
        length += 1
        if (length, code) in table:
            return table[(length, code)]
        if length > 16:
            raise NotImplementedError("corrupt JPEG: bad Huffman code")


def _extend(v: int, n: int) -> int:
    """JPEG signed-magnitude extension (F.2.2.1)."""
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a baseline JPEG to (width, height, uint8 luma array).

    Module contract: any corrupt/truncated/unsupported input raises
    ``NotImplementedError`` — internal signals (``EOFError`` from a marker
    mid-scan, ``_RestartMarker`` escaping a non-interleaved scan, index or
    key errors from mangled segment tables) must not leak out.
    """
    try:
        return _decode_jpeg_impl(data)
    except NotImplementedError:
        raise
    except (EOFError, IndexError, KeyError, ValueError, struct.error,
            _RestartMarker) as e:
        raise NotImplementedError(
            f"corrupt JPEG ({type(e).__name__}: {e})"
        ) from e


def _decode_jpeg_impl(data: bytes) -> tuple[int, int, np.ndarray]:
    if data[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker — 0xFF here is padding, not a marker byte.
        while data[pos + 1] == 0xFF:
            pos += 1
            if pos + 1 >= len(data):
                raise NotImplementedError("truncated JPEG (fill bytes at EOF)")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(data):
            raise NotImplementedError("truncated JPEG (segment header cut)")
        seg_len = struct.unpack(">H", data[pos : pos + 2])[0]
        if pos + seg_len > len(data):
            raise NotImplementedError("truncated JPEG (segment body cut)")
        body = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                prec, tid = body[p] >> 4, body[p] & 0xF
                if prec != 0:
                    raise NotImplementedError("16-bit quant tables")
                qt[tid] = np.frombuffer(body, np.uint8, 64, p + 1).astype(np.int32)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                cls, tid = body[p] >> 4, body[p] & 0xF
                bits = [0] + list(body[p + 1 : p + 17])
                n = sum(bits)
                values = list(body[p + 17 : p + 17 + n])
                huff[(cls, tid)] = _build_huffman(bits, values)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise NotImplementedError("12-bit JPEG")
            comps = []
            for i in range(nc):
                cid, samp, qid = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "q": qid})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                f"only baseline JPEG (SOF0) supported, got SOF marker {marker:#x}"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = {}
            for i in range(ns):
                cid, tids = body[1 + 2 * i], body[2 + 2 * i]
                scan[cid] = (tids >> 4, tids & 0xF)
            pos += seg_len
            return _decode_scan(
                data, pos, frame, qt, huff, scan, restart_interval
            )
        pos += seg_len
    raise NotImplementedError("JPEG without SOS scan")


def _decode_scan(data, pos, frame, qt, huff, scan, restart_interval):
    if frame is None:
        raise NotImplementedError("JPEG scan before SOF0")
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    br = _BitReader(data, pos)

    if len(scan) == 1:
        # Non-interleaved scan (T.81 A.2.2): MCU = ONE data unit of the
        # scanned component, raster order over the component's own block
        # grid, sampling factors ignored.  This is how real grayscale
        # files that declare 2x2 sampling arrive, and how each scan of a
        # three-scan baseline color file is laid out.  We return after the
        # first scan, which is the Y plane — exactly the luma output.
        (cid,) = scan
        c = next(cc for cc in comps if cc["id"] == cid)
        cw = (w * c["h"] + hmax - 1) // hmax
        chh = (h * c["v"] + vmax - 1) // vmax
        bxn, byn = (cw + 7) // 8, (chh + 7) // 8
        plane = np.zeros((byn * 8, bxn * 8), dtype=np.float64)
        dc_t = huff[(0, scan[cid][0])]
        ac_t = huff[(1, scan[cid][1])]
        q = qt[c["q"]]
        pred = [0]
        mcu_count = 0
        for by in range(byn):
            for bx in range(bxn):
                if (restart_interval and mcu_count
                        and mcu_count % restart_interval == 0):
                    br.sync_to_restart()
                    pred = [0]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _decode_block(br, dc_t, ac_t, q, pred, 0)
                )
                mcu_count += 1
        y = plane[:chh, :cw]
        if (cw, chh) != (w, h):  # subsampled component → replicate up
            y = np.repeat(np.repeat(y, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)[:h, :w]
        return w, h, np.clip(np.round(y), 0, 255).astype(np.uint8)

    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.sync_to_restart()
                pred = [0] * len(comps)
            try:
                for ci, c in enumerate(comps):
                    dc_t = huff[(0, scan[c["id"]][0])]
                    ac_t = huff[(1, scan[c["id"]][1])]
                    q = qt[c["q"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            block = _decode_block(br, dc_t, ac_t, q, pred, ci)
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            except _RestartMarker:
                # encoder emitted RSTn exactly here; resync handled above
                raise NotImplementedError("unexpected restart marker")
            mcu_count += 1
    # we only need luma downstream; Y of YCbCr IS the luma plane
    y = planes[0]
    fy, fx = vmax // comps[0]["v"], hmax // comps[0]["h"]
    if fy > 1 or fx > 1:
        y = np.repeat(np.repeat(y, fy, axis=0), fx, axis=1)
    y = y[:h, :w]
    return w, h, np.clip(np.round(y), 0, 255).astype(np.uint8)


def _decode_block(br, dc_t, ac_t, q, pred, ci):
    zz = np.zeros(64, dtype=np.int32)
    t = _decode_symbol(br, dc_t)
    diff = _extend(br.read_bits(t), t) if t else 0
    pred[ci] += diff
    zz[0] = pred[ci]
    k = 1
    while k < 64:
        rs = _decode_symbol(br, ac_t)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += r
        if k > 63:
            raise NotImplementedError("corrupt JPEG: AC index overflow")
        zz[k] = _extend(br.read_bits(s), s)
        k += 1
    coef = np.zeros(64, dtype=np.float64)
    coef[ZIGZAG] = zz * q[np.arange(64)].astype(np.float64)
    F_blk = coef.reshape(8, 8)
    return _M.T @ F_blk @ _M + 128.0


# ---------------------------------------------------------------------------
# Encoder (round-trip fixtures)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.buf = 0
                self.n = 0

    def flush(self):
        if self.n:
            self.buf = (self.buf << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.buf)
            if self.buf == 0xFF:
                self.out.append(0x00)
            self.buf = 0
            self.n = 0


def _magnitude(v: int) -> tuple[int, int]:
    """(size, raw bits) for JPEG signed-magnitude coding."""
    if v == 0:
        return 0, 0
    a = abs(v)
    n = a.bit_length()
    return n, v if v > 0 else v + (1 << n) - 1


def encode_jpeg_gray(pixels: np.ndarray, quant: int = 1,
                     restart_interval: int = 0) -> bytes:
    """Minimal baseline grayscale JPEG (SOF0, standard Huffman tables,
    uniform quantization = ``quant``).  quant=1 is near-lossless (DCT float
    rounding only) — the round-trip fixture for :func:`decode_jpeg`.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (byte-aligned, DC predictor reset) — exercises the
    decoder's restart resync path."""
    h, w = pixels.shape
    q = np.full(64, quant, dtype=np.uint8)
    dc_enc = _encode_huffman_spec(*_STD_DC_LUMA)
    ac_enc = _encode_huffman_spec(*_STD_AC_LUMA)
    H = (h + 7) // 8 * 8
    W = (w + 7) // 8 * 8
    img = _pad_to(pixels, H, W)
    bw = _BitWriter()
    pred = [0]
    mcu_i = 0
    rst_n = 0
    for y0 in range(0, H, 8):
        for x0 in range(0, W, 8):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.flush()  # byte-align before the marker
                bw.out += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) % 8
                pred = [0]
            mcu_i += 1
            pred[0] = _encode_block(
                bw, img[y0 : y0 + 8, x0 : x0 + 8], q, pred[0], dc_enc, ac_enc
            )
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0x00]) + q.tobytes())  # uniform ⇒ zigzag moot
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = (
        seg(0xC4, bytes([0x00]) + bytes(_STD_DC_LUMA[0][1:])
            + bytes(_STD_DC_LUMA[1]))
        + seg(0xC4, bytes([0x10]) + bytes(_STD_AC_LUMA[0][1:])
              + bytes(_STD_AC_LUMA[1]))
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval else b""
    )
    return (
        b"\xff\xd8" + dqt + dri + sof + dht + sos + bytes(bw.out)
        + b"\xff\xd9"
    )


def _encode_block(bw, blk, q, pred, dc_enc, ac_enc):
    """DCT + quantize + entropy-code one 8×8 block; returns new DC pred."""
    F_blk = _M @ (blk - 128.0) @ _M.T
    zz = np.round(F_blk.reshape(64)[ZIGZAG] / q).astype(int)
    diff = int(zz[0]) - pred
    sz, bits = _magnitude(diff)
    code, ln = dc_enc[sz]
    bw.write(code, ln)
    if sz:
        bw.write(bits, sz)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c0, l0 = ac_enc[0xF0]
            bw.write(c0, l0)
            run -= 16
        sz, bits = _magnitude(v)
        code, ln = ac_enc[(run << 4) | sz]
        bw.write(code, ln)
        bw.write(bits, sz)
        run = 0
    if run:
        c0, l0 = ac_enc[0x00]
        bw.write(c0, l0)
    return int(zz[0])


def _pad_to(img: np.ndarray, H: int, W: int) -> np.ndarray:
    out = np.empty((H, W), dtype=np.float64)
    h, w = img.shape
    out[:h, :w] = img.astype(np.float64)
    out[h:, :w] = out[h - 1 : h, :w]
    out[:, w:] = out[:, w - 1 : w]
    return out


def encode_jpeg_ycbcr(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray, quant: int = 1,
    hs: int = 2, vs: int = 2,
) -> bytes:
    """Baseline color JPEG at sampling ``hs``×``vs`` (Y at full res, Cb/Cr
    at 1/hs × 1/vs): (2,2) = 4:2:0, (2,1) = 4:2:2, (1,1) = 4:4:4.
    ``cb``/``cr`` must be ``ceil(h/vs) × ceil(w/hs)``.  Exercises every
    interleaved-MCU + upsampling decode layout; same near-lossless quant=1
    default as the grayscale encoder."""
    h, w = y.shape
    ch, cw = (h + vs - 1) // vs, (w + hs - 1) // hs
    if cb.shape != (ch, cw) or cr.shape != (ch, cw):
        raise ValueError(f"chroma planes must be {(ch, cw)}")
    q = np.full(64, quant, dtype=np.uint8)
    dc_enc = _encode_huffman_spec(*_STD_DC_LUMA)
    ac_enc = _encode_huffman_spec(*_STD_AC_LUMA)
    mw, mh = 8 * hs, 8 * vs  # MCU pixel size
    mcux, mcuy = (w + mw - 1) // mw, (h + mh - 1) // mh
    Y = _pad_to(y, mcuy * mh, mcux * mw)
    CB = _pad_to(cb, mcuy * 8, mcux * 8)
    CR = _pad_to(cr, mcuy * 8, mcux * 8)
    bw = _BitWriter()
    pred = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(vs):
                for bx in range(hs):
                    y0, x0 = (my * vs + by) * 8, (mx * hs + bx) * 8
                    pred[0] = _encode_block(
                        bw, Y[y0 : y0 + 8, x0 : x0 + 8], q, pred[0],
                        dc_enc, ac_enc,
                    )
            pred[1] = _encode_block(
                bw, CB[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], q, pred[1],
                dc_enc, ac_enc,
            )
            pred[2] = _encode_block(
                bw, CR[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], q, pred[2],
                dc_enc, ac_enc,
            )
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0x00]) + q.tobytes())
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, (hs << 4) | vs, 0])   # Y sampling factors
        + bytes([2, 0x11, 0])   # Cb
        + bytes([3, 0x11, 0]),  # Cr
    )
    dht = (
        seg(0xC4, bytes([0x00]) + bytes(_STD_DC_LUMA[0][1:])
            + bytes(_STD_DC_LUMA[1]))
        + seg(0xC4, bytes([0x10]) + bytes(_STD_AC_LUMA[0][1:])
              + bytes(_STD_AC_LUMA[1]))
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + bytes(bw.out) + b"\xff\xd9"


def encode_jpeg_ycbcr420(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray, quant: int = 1
) -> bytes:
    """Back-compat alias: 4:2:0 via :func:`encode_jpeg_ycbcr`."""
    return encode_jpeg_ycbcr(y, cb, cr, quant=quant, hs=2, vs=2)
