"""Baseline + progressive JPEG codec, dependency-free (numpy + struct only).

Covers the DCT modes that dominate crawl imagery: sequential (SOF0
baseline and SOF1 extended-sequential, which decodes identically at
8-bit) and progressive (SOF2) — 8-bit, grayscale or YCbCr with any of
the common subsampling layouts (4:4:4, 4:2:2, 4:2:0), restart markers,
multiple DQT/DHT segments. Progressive support implements the full
Annex G successive-approximation algebra: DC first + refinement scans
(interleaved or single-component), AC first scans with EOBn run-length
coding and ZRL, and AC refinement scans with correction bits
(G.1.2.3 — the libjpeg-compatible zero-history run semantics).
Hierarchical/lossless modes, arithmetic coding, and 12-bit precision
raise ``NotImplementedError`` — plug Pillow via
``multimodal.register_decoder`` for those.

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
    prog_state = None  # per-component coefficient accumulators (SOF2)
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
        if marker == 0xD9:  # EOI: all progressive scans accumulated
            if prog_state is not None:
                return _reconstruct_progressive(frame, prog_state, qt)
            raise NotImplementedError("JPEG EOI before any decodable scan")
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
        elif marker in (0xC0, 0xC1, 0xC2):
            # SOF0 baseline / SOF1 extended-sequential (identical decode at
            # 8-bit) / SOF2 progressive
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise NotImplementedError("12-bit JPEG")
            comps = []
            for i in range(nc):
                cid, samp, qid = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "q": qid})
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                f"unsupported JPEG mode (SOF marker {marker:#x}): only "
                "sequential (SOF0/SOF1) and progressive (SOF2) Huffman DCT"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = {}
            for i in range(ns):
                cid, tids = body[1 + 2 * i], body[2 + 2 * i]
                scan[cid] = (tids >> 4, tids & 0xF)
            if frame is None:
                raise NotImplementedError("JPEG scan before SOF")
            if not frame["progressive"]:
                pos += seg_len
                return _decode_scan(
                    data, pos, frame, qt, huff, scan, restart_interval
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            if prog_state is None:
                prog_state = _init_progressive_state(frame)
            pos = _decode_progressive_scan(
                data, pos + seg_len, frame, prog_state, huff, scan,
                ss, se, ahal >> 4, ahal & 0xF, restart_interval,
            )
            continue
        pos += seg_len
    raise NotImplementedError(
        "JPEG without SOS scan" if prog_state is None
        else "truncated progressive JPEG (missing EOI)"
    )


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
# Progressive (SOF2) scan accumulation — T.81 Annex G
# ---------------------------------------------------------------------------

def _comp_extent(frame, c):
    """(cw, ch) pixel extent of component c's own samples (A.2.2)."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(cc["h"] for cc in comps)
    vmax = max(cc["v"] for cc in comps)
    return (
        (w * c["h"] + hmax - 1) // hmax,
        (h * c["v"] + vmax - 1) // vmax,
    )


def _comp_geometry(frame, c):
    """((ni_bxn, ni_byn), (mcu_bxn, mcu_byn)) block-grid sizes for comp c:
    the non-interleaved grid covers just the component's own samples
    (A.2.2); the MCU grid is padded to whole MCUs (A.2.3)."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(cc["h"] for cc in comps)
    vmax = max(cc["v"] for cc in comps)
    cw, ch = _comp_extent(frame, c)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    return ((cw + 7) // 8, (ch + 7) // 8), (mcux * c["h"], mcuy * c["v"])


def _init_progressive_state(frame):
    """Zigzag-ordered int32 coefficient accumulator per component, sized to
    the MCU-padded grid (interleaved DC scans touch the padding blocks;
    non-interleaved AC scans only the real sub-grid)."""
    state = []
    for c in frame["comps"]:
        _, (bxn, byn) = _comp_geometry(frame, c)
        state.append(np.zeros((byn, bxn, 64), dtype=np.int32))
    return state


def _next_marker_pos(data, pos):
    """First position at/after ``pos`` holding a real marker (skips stuffed
    0xFF00 pairs, stray RSTn, and 0xFF fill runs)."""
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        nxt = data[pos + 1]
        if nxt == 0x00:
            pos += 2
        elif 0xD0 <= nxt <= 0xD7:
            pos += 2
        elif nxt == 0xFF:
            pos += 1
        else:
            return pos
    raise NotImplementedError("truncated progressive JPEG (no marker after scan)")


def _decode_progressive_scan(
    data, pos, frame, state, huff, scan, ss, se, ah, al, restart_interval
):
    """Apply one progressive scan to the coefficient accumulators; returns
    the position of the marker following the scan's entropy data."""
    comps = frame["comps"]
    in_scan = [
        (ci, c) for ci, c in enumerate(comps) if c["id"] in scan
    ]
    if len(in_scan) != len(scan):
        raise NotImplementedError("corrupt JPEG: scan names unknown component")
    br = _BitReader(data, pos)
    if ss == 0:
        if se != 0:
            raise NotImplementedError(
                "corrupt progressive JPEG: DC scan with Se != 0"
            )
        _prog_dc_scan(br, frame, state, huff, scan, in_scan, ah, al,
                      restart_interval)
    else:
        if len(in_scan) != 1:
            raise NotImplementedError(
                "corrupt progressive JPEG: interleaved AC scan"
            )
        ci, c = in_scan[0]
        ac_t = huff.get((1, scan[c["id"]][1]))
        if ac_t is None:
            raise NotImplementedError("corrupt JPEG: missing AC Huffman table")
        _prog_ac_scan(br, frame, state[ci], c, ac_t, ss, se, ah, al,
                      restart_interval)
    return _next_marker_pos(data, br.pos)


def _prog_dc_scan(br, frame, state, huff, scan, in_scan, ah, al,
                  restart_interval):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(cc["h"] for cc in comps)
    vmax = max(cc["v"] for cc in comps)
    if len(in_scan) > 1:  # interleaved: MCU = one h×v block set per comp
        mcux = (w + 8 * hmax - 1) // (8 * hmax)
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        mcus = [
            [
                (ci, c, my * c["v"] + by, mx * c["h"] + bx)
                for ci, c in in_scan
                for by in range(c["v"])
                for bx in range(c["h"])
            ]
            for my in range(mcuy)
            for mx in range(mcux)
        ]
    else:  # single component: MCU = one block, raster over its own grid
        ci, c = in_scan[0]
        (bxn, byn), _ = _comp_geometry(frame, c)
        mcus = [[(ci, c, by, bx)] for by in range(byn) for bx in range(bxn)]
    pred = {ci: 0 for ci, _ in in_scan}
    for i, blocks in enumerate(mcus):
        if restart_interval and i and i % restart_interval == 0:
            br.sync_to_restart()
            pred = {k: 0 for k in pred}
        for ci, c, by, bx in blocks:
            coef = state[ci]
            if ah == 0:
                dc_t = huff.get((0, scan[c["id"]][0]))
                if dc_t is None:
                    raise NotImplementedError("corrupt JPEG: missing DC table")
                t = _decode_symbol(br, dc_t)
                diff = _extend(br.read_bits(t), t) if t else 0
                pred[ci] += diff
                coef[by, bx, 0] = pred[ci] << al
            else:
                if br.read_bit():
                    coef[by, bx, 0] |= 1 << al


def _prog_ac_scan(br, frame, coef, c, ac_t, ss, se, ah, al,
                  restart_interval):
    (bxn, byn), _ = _comp_geometry(frame, c)
    eobrun = 0
    mcu_count = 0
    for by in range(byn):
        for bx in range(bxn):
            if (restart_interval and mcu_count
                    and mcu_count % restart_interval == 0):
                br.sync_to_restart()
                eobrun = 0
            mcu_count += 1
            blk = coef[by, bx]
            if ah == 0:
                eobrun = _ac_first_block(br, blk, ac_t, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(br, blk, ac_t, ss, se, al, eobrun)


def _ac_first_block(br, blk, ac_t, ss, se, al, eobrun):
    """G.1.2.2: first scan for an AC band — run/size symbols plus EOBn."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_symbol(br, ac_t)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += br.read_bits(r)
                return eobrun - 1  # EOB covers the rest of THIS block too
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise NotImplementedError("corrupt JPEG: AC band overflow")
        blk[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(br, blk, ac_t, ss, se, al, eobrun):
    """G.1.2.3: refinement scan for an AC band — one correction bit per
    already-nonzero coefficient, run/size symbols position newly-nonzero
    ones among the zero-history coefficients (libjpeg-compatible)."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_symbol(br, ac_t)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                sval = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise NotImplementedError(
                        "corrupt JPEG: refinement size != 1"
                    )
                sval = p1 if br.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if br.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if sval and k <= se:
                blk[k] = sval
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                if br.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct_progressive(frame, state, qt):
    """Dequantize + vectorized IDCT of the accumulated luma coefficients."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    c = comps[0]  # luma is all we surface downstream
    q = qt[c["q"]].astype(np.float64)
    zz = state[0].astype(np.float64) * q  # (byn, bxn, 64) zigzag order
    nat = np.zeros_like(zz)
    nat[..., ZIGZAG] = zz
    byn, bxn = nat.shape[:2]
    blocks = nat.reshape(byn, bxn, 8, 8)
    idct = np.einsum("ux,yzuv,vw->yzxw", _M, blocks, _M) + 128.0
    plane = idct.transpose(0, 2, 1, 3).reshape(byn * 8, bxn * 8)
    cw, ch = _comp_extent(frame, c)
    y = plane[:ch, :cw]
    fy, fx = vmax // c["v"], hmax // c["h"]
    if fy > 1 or fx > 1:
        y = np.repeat(np.repeat(y, fy, axis=0), fx, axis=1)
    y = y[:h, :w]
    return w, h, np.clip(np.round(y), 0, 255).astype(np.uint8)


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


# ---------------------------------------------------------------------------
# Progressive encoder (round-trip fixtures for the SOF2 decode path)
# ---------------------------------------------------------------------------

# The sequential Annex K AC table lacks the EOBn symbols (0x10..0xE0) that
# progressive EOB-run coding needs, so fixtures carry a flat 9-bit canonical
# table holding every (run, size) symbol progressive scans can emit:
# EOB0..EOB14, ZRL, and run 0-15 × size 1-10. 176 codes at 9 bits satisfies
# Kraft (176/512) and never assigns the reserved all-ones code.
_PROG_AC_SYMBOLS = (
    [r << 4 for r in range(15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_PROG_AC_SPEC = (
    [0] * 9 + [len(_PROG_AC_SYMBOLS)] + [0] * 7,
    _PROG_AC_SYMBOLS,
)


def _quantized_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(byn, bxn, 64) zigzag-ordered quantized DCT coefficients of a
    replication-padded plane — the shared front half of every encoder."""
    h, w = plane.shape
    byn, bxn = (h + 7) // 8, (w + 7) // 8
    img = _pad_to(plane, byn * 8, bxn * 8)
    out = np.zeros((byn, bxn, 64), dtype=np.int64)
    qf = q.astype(np.float64)
    for by in range(byn):
        for bx in range(bxn):
            blk = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            F_blk = _M @ (blk - 128.0) @ _M.T
            out[by, bx] = np.round(F_blk.reshape(64)[ZIGZAG] / qf).astype(
                np.int64
            )
    return out


def _emit_restart(bw: _BitWriter, rst_n: int) -> int:
    bw.flush()
    bw.out += bytes([0xFF, 0xD0 + rst_n])
    return (rst_n + 1) % 8


def _enc_dc_scan(bw, mcus, dc_enc, ah, al, restart_interval):
    """DC scan over MCUs (each a list of (comp_idx, zigzag block)): first
    pass (ah=0) codes diffs of the point-transformed DC; refinement emits
    one bit per block."""
    pred: dict[int, int] = {}
    rst = 0
    for i, blocks in enumerate(mcus):
        if restart_interval and i and i % restart_interval == 0:
            rst = _emit_restart(bw, rst)
            pred = {}
        for ci, blk in blocks:
            if ah == 0:
                v = int(blk[0]) >> al  # G.1.2.1: arithmetic shift
                diff = v - pred.get(ci, 0)
                pred[ci] = v
                sz, bits = _magnitude(diff)
                code, ln = dc_enc[sz]
                bw.write(code, ln)
                if sz:
                    bw.write(bits, sz)
            else:
                bw.write((int(blk[0]) >> al) & 1, 1)


def _enc_ac_first_scan(bw, blocks, ac_enc, ss, se, al, restart_interval):
    """First AC scan for a band: run/size + magnitude with EOBn run
    accumulation across blocks (exercises the decoder's EOBn>1 path)."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = ac_enc[r << 4]
            bw.write(code, ln)
            if r:
                bw.write(eobrun - (1 << r), r)
            eobrun = 0

    rst = 0
    for i, blk in enumerate(blocks):
        if restart_interval and i and i % restart_interval == 0:
            flush_eob()
            rst = _emit_restart(bw, rst)
        vals = []
        for k in range(ss, se + 1):
            c = int(blk[k])
            a = abs(c) >> al  # G.1.2.2: magnitude shift, sign preserved
            vals.append(a if c >= 0 else -a)
        last = -1
        for j, v in enumerate(vals):
            if v:
                last = j
        if last < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        for j in range(last + 1):
            v = vals[j]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_enc[0xF0]
                bw.write(code, ln)
                run -= 16
            sz, bits = _magnitude(v)
            code, ln = ac_enc[(run << 4) | sz]
            bw.write(code, ln)
            bw.write(bits, sz)
            run = 0
        if last < len(vals) - 1:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _enc_ac_refine_scan(bw, blocks, ac_enc, ss, se, al, restart_interval):
    """AC refinement scan (G.1.2.3, libjpeg-compatible): newly-nonzero
    coefficients get (zero-history-run, 1) symbols + a sign bit; already-
    nonzero ones get correction bits buffered and flushed with the next
    symbol. Per-block EOB0 flush keeps the correction-bit bookkeeping
    local (no cross-block EOB buffering — the decoder accepts both)."""
    rst = 0
    for i, blk in enumerate(blocks):
        if restart_interval and i and i % restart_interval == 0:
            rst = _emit_restart(bw, rst)
        absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
        sign = [int(blk[k]) >= 0 for k in range(ss, se + 1)]
        eobpos = -1
        for j, t in enumerate(absv):
            if t == 1:
                eobpos = j
        r = 0
        br_bits: list[int] = []
        for j, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            # ZRL only when a newly-nonzero coefficient still follows;
            # emitting it BEFORE buffering this position's bit preserves
            # the invariant that every buffered correction bit sits within
            # 15 pending zeros (the decoder's ZRL zero budget is 16).
            while r > 15 and j <= eobpos:
                code, ln = ac_enc[0xF0]
                bw.write(code, ln)
                r -= 16
                for b in br_bits:
                    bw.write(b, 1)
                br_bits = []
            if t > 1:
                br_bits.append(t & 1)
                continue
            code, ln = ac_enc[(r << 4) | 1]
            bw.write(code, ln)
            bw.write(1 if sign[j] else 0, 1)
            for b in br_bits:
                bw.write(b, 1)
            br_bits = []
            r = 0
        if r > 0 or br_bits:
            code, ln = ac_enc[0x00]  # EOB0: rest of this block's band
            bw.write(code, ln)
            for b in br_bits:
                bw.write(b, 1)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _prog_headers(q: np.ndarray, sof_comps: bytes, h: int, w: int,
                  nc: int, restart_interval: int) -> bytes:
    dqt = _seg(0xDB, bytes([0x00]) + q.tobytes())
    sof = _seg(0xC2, struct.pack(">BHHB", 8, h, w, nc) + sof_comps)
    dht = (
        _seg(0xC4, bytes([0x00]) + bytes(_STD_DC_LUMA[0][1:])
             + bytes(_STD_DC_LUMA[1]))
        + _seg(0xC4, bytes([0x10]) + bytes(_PROG_AC_SPEC[0][1:])
               + bytes(_PROG_AC_SPEC[1]))
    )
    dri = (
        _seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval else b""
    )
    return b"\xff\xd8" + dqt + dri + sof + dht


def _prog_sos(comp_specs: list[tuple[int, int, int]], ss: int, se: int,
              ah: int, al: int) -> bytes:
    body = bytes([len(comp_specs)])
    for cid, dc_tid, ac_tid in comp_specs:
        body += bytes([cid, (dc_tid << 4) | ac_tid])
    body += bytes([ss, se, (ah << 4) | al])
    return _seg(0xDA, body)


def encode_jpeg_progressive_gray(
    pixels: np.ndarray, quant: int = 1, restart_interval: int = 0
) -> bytes:
    """Progressive (SOF2) grayscale fixture with a six-scan script that
    exercises every Annex G decode path: DC first at Al=1, two spectral
    AC bands at Al=2 (EOBn runs + ZRL), a two-step AC successive
    approximation (Ah=2→1 then 1→0), and a DC refinement — identical
    reconstructed coefficients to :func:`encode_jpeg_gray` at the same
    ``quant``, so decode(progressive) must equal decode(baseline) exactly.
    """
    q = np.full(64, quant, dtype=np.uint8)
    coefs = _quantized_blocks(pixels, q)
    byn, bxn = coefs.shape[:2]
    raster = [coefs[by, bx] for by in range(byn) for bx in range(bxn)]
    mcus = [[(0, blk)] for blk in raster]
    dc_enc = _encode_huffman_spec(*_STD_DC_LUMA)
    ac_enc = _encode_huffman_spec(*_PROG_AC_SPEC)
    h, w = pixels.shape
    out = bytearray(_prog_headers(q, bytes([1, 0x11, 0]), h, w, 1,
                                  restart_interval))
    script = [
        ("dc", None, 0, 1),
        ("ac", (1, 5), 0, 2),
        ("ac", (6, 63), 0, 2),
        ("ac_ref", (1, 63), 2, 1),
        ("dc", None, 1, 0),
        ("ac_ref", (1, 63), 1, 0),
    ]
    for kind, band, ah, al in script:
        bw = _BitWriter()
        if kind == "dc":
            _enc_dc_scan(bw, mcus, dc_enc, ah, al, restart_interval)
            out += _prog_sos([(1, 0, 0)], 0, 0, ah, al)
        elif kind == "ac":
            _enc_ac_first_scan(bw, raster, ac_enc, band[0], band[1], al,
                               restart_interval)
            out += _prog_sos([(1, 0, 0)], band[0], band[1], ah, al)
        else:
            _enc_ac_refine_scan(bw, raster, ac_enc, band[0], band[1], al,
                                restart_interval)
            out += _prog_sos([(1, 0, 0)], band[0], band[1], ah, al)
        bw.flush()
        out += bytes(bw.out)
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_progressive_ycbcr(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray, quant: int = 1,
    hs: int = 2, vs: int = 2,
) -> bytes:
    """Progressive color fixture: interleaved DC first + refinement scans
    over the MCU grid, then one non-interleaved AC scan per component over
    its own block grid (which is SMALLER than the MCU-padded grid whenever
    the image isn't a whole number of MCUs — the exact layout divergence
    the decoder must honor per A.2.2/A.2.3)."""
    h, w = y.shape
    ch, cw = (h + vs - 1) // vs, (w + hs - 1) // hs
    if cb.shape != (ch, cw) or cr.shape != (ch, cw):
        raise ValueError(f"chroma planes must be {(ch, cw)}")
    q = np.full(64, quant, dtype=np.uint8)
    mcux, mcuy = (w + 8 * hs - 1) // (8 * hs), (h + 8 * vs - 1) // (8 * vs)
    ycoef = _quantized_blocks(
        _pad_to(y, mcuy * vs * 8, mcux * hs * 8), q
    )
    cbcoef = _quantized_blocks(_pad_to(cb, mcuy * 8, mcux * 8), q)
    crcoef = _quantized_blocks(_pad_to(cr, mcuy * 8, mcux * 8), q)
    mcus = []
    for my in range(mcuy):
        for mx in range(mcux):
            blocks = [
                (0, ycoef[my * vs + by, mx * hs + bx])
                for by in range(vs)
                for bx in range(hs)
            ]
            blocks.append((1, cbcoef[my, mx]))
            blocks.append((2, crcoef[my, mx]))
            mcus.append(blocks)

    def ni_raster(coef, nih, niw):
        byn, bxn = (nih + 7) // 8, (niw + 7) // 8
        return [coef[by, bx] for by in range(byn) for bx in range(bxn)]

    y_raster = ni_raster(ycoef, h, w)
    cb_raster = ni_raster(cbcoef, ch, cw)
    cr_raster = ni_raster(crcoef, ch, cw)
    dc_enc = _encode_huffman_spec(*_STD_DC_LUMA)
    ac_enc = _encode_huffman_spec(*_PROG_AC_SPEC)
    sof_comps = (
        bytes([1, (hs << 4) | vs, 0]) + bytes([2, 0x11, 0])
        + bytes([3, 0x11, 0])
    )
    out = bytearray(_prog_headers(q, sof_comps, h, w, 3, 0))
    all3 = [(1, 0, 0), (2, 0, 0), (3, 0, 0)]
    for kind, args in [
        ("dc", (mcus, 0, 1)),
        ("dc", (mcus, 1, 0)),
        ("ac", (y_raster, (1,), 0, 0)),
        ("ac", (cb_raster, (2,), 0, 0)),
        ("ac", (cr_raster, (3,), 0, 0)),
    ]:
        bw = _BitWriter()
        if kind == "dc":
            blocks, ah, al = args
            _enc_dc_scan(bw, blocks, dc_enc, ah, al, 0)
            out += _prog_sos(all3, 0, 0, ah, al)
        else:
            raster, (cid,), ah, al = args
            _enc_ac_first_scan(bw, raster, ac_enc, 1, 63, al, 0)
            out += _prog_sos([(cid, 0, 0)], 1, 63, ah, al)
        bw.flush()
        out += bytes(bw.out)
    out += b"\xff\xd9"
    return bytes(out)
