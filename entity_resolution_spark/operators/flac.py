"""FLAC codec, dependency-free (numpy + stdlib only) — RFC 9639.

Decoder covers the subset that lossless crawl audio actually uses:
STREAMINFO metadata, fixed-blocksize frames, CONSTANT / VERBATIM /
FIXED(0-4) / LPC subframes, Rice and Rice2 residual coding with
partition orders and escape (raw) partitions, wasted-bits shifting, all
four stereo decorrelation modes (independent, left/side, right/side,
mid/side), and CRC-8 (header) + CRC-16 (frame) verification. Because
FLAC is lossless, the round-trip contract is EXACT sample equality with
the planted PCM — no tolerance.

Like operators/jpeg.py this is a correctness-first codec for the
multimodal feature stage (duration, RMS, spectral descriptors), not a
throughput decoder: the entropy decode is a Python bit loop, fine for
the per-row sizes a ``mapInPandas`` batch sees. The encoder exists to
make fixtures: CONSTANT for silent blocks, FIXED order-2 + Rice
otherwise, with knobs to force verbatim subframes, escape partitions,
deeper partition orders, and mid/side stereo so every decoder path is
exercised by tests.

Module contract (same as the JPEG codec): corrupt or truncated input
raises ``NotImplementedError``; no internal exception types escape.
"""

from __future__ import annotations

import struct

import numpy as np

_SYNC = 0b11111111111110

_BLOCK_SIZE_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_SAMPLE_RATE_TABLE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZE_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_SS_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}

# FIXED predictor coefficients by order (s[i] = res[i] + sum c_j s[i-j])
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes | bytearray) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes | bytearray) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _Bits:
    """MSB-first bit reader; raises the module contract error at EOF."""

    def __init__(self, data: bytes, byte_pos: int = 0):
        self.data = data
        self.bitpos = byte_pos * 8

    @property
    def byte_pos(self) -> int:
        return self.bitpos // 8

    def read(self, n: int) -> int:
        if self.bitpos + n > len(self.data) * 8:
            raise NotImplementedError("truncated FLAC (bitstream cut)")
        v = 0
        while n:
            byte_i, bit_off = divmod(self.bitpos, 8)
            take = min(8 - bit_off, n)
            chunk = (self.data[byte_i] >> (8 - bit_off - take)) & ((1 << take) - 1)
            v = (v << take) | chunk
            self.bitpos += take
            n -= take
        return v

    def sread(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) // 8 * 8


def _read_utf8_number(bits: _Bits) -> int:
    first = bits.read(8)
    if first < 0x80:
        return first
    n_cont = 0
    mask = 0x40
    while first & mask:
        n_cont += 1
        mask >>= 1
    if n_cont < 1 or n_cont > 6:
        raise NotImplementedError("corrupt FLAC: bad UTF-8 frame number")
    v = first & (mask - 1)
    for _ in range(n_cont):
        b = bits.read(8)
        if b & 0xC0 != 0x80:
            raise NotImplementedError("corrupt FLAC: bad UTF-8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _encode_utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    # payload bits available with k continuation bytes: 6k + (6 - k)
    for k in range(1, 7):
        if n.bit_length() <= 6 * k + (6 - k):
            head_bits = 6 - k
            head = (0xFF << (head_bits + 1)) & 0xFF
            out = [head | (n >> (6 * k)) & ((1 << head_bits) - 1)]
            for i in range(k - 1, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number too large for UTF-8 coding")


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def decode_flac(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a FLAC stream → (sample_rate, bits_per_sample, samples)
    where ``samples`` is int32 of shape (n_samples, n_channels)."""
    try:
        return _decode_flac_impl(data)
    except NotImplementedError:
        raise
    except (IndexError, KeyError, ValueError, ZeroDivisionError,
            struct.error, OverflowError, MemoryError) as e:
        # Overflow/MemoryError: CRC-valid but adversarial LPC coefficients
        # (or huge wasted-bits counts) can grow pure-python ints past int64
        # before the numpy cast — still "corrupt input" per the contract
        raise NotImplementedError(
            f"corrupt FLAC ({type(e).__name__}: {e})"
        ) from e


def _decode_flac_impl(data: bytes) -> tuple[int, int, np.ndarray]:
    if data[:4] != b"fLaC":
        raise NotImplementedError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    info = None
    last = False
    while not last:
        if pos + 4 > len(data):
            raise NotImplementedError("truncated FLAC (metadata cut)")
        hdr = data[pos]
        last = bool(hdr >> 7)
        btype = hdr & 0x7F
        blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
        if pos + 4 + blen > len(data):
            raise NotImplementedError("truncated FLAC (metadata body cut)")
        if btype == 0:  # STREAMINFO
            b = _Bits(data, pos + 4)
            b.read(16)  # min block size
            b.read(16)  # max block size
            b.read(24)  # min frame size
            b.read(24)  # max frame size
            sr = b.read(20)
            n_ch = b.read(3) + 1
            bps = b.read(5) + 1
            total = b.read(36)
            info = {"sr": sr, "n_ch": n_ch, "bps": bps, "total": total}
        pos += 4 + blen
    if info is None:
        raise NotImplementedError("FLAC without STREAMINFO")

    chunks: list[np.ndarray] = []
    n_done = 0
    while pos < len(data) and (info["total"] == 0 or n_done < info["total"]):
        frame, pos = _decode_frame(data, pos, info)
        chunks.append(frame)
        n_done += frame.shape[0]
    if not chunks:
        raise NotImplementedError("FLAC without any audio frame")
    out = np.concatenate(chunks, axis=0)
    if info["total"]:
        if out.shape[0] < info["total"]:
            raise NotImplementedError(
                "truncated FLAC (fewer samples than STREAMINFO declares)"
            )
        out = out[: info["total"]]
    return info["sr"], info["bps"], out.astype(np.int32)


def _decode_frame(data: bytes, pos: int, info) -> tuple[np.ndarray, int]:
    bits = _Bits(data, pos)
    if bits.read(14) != _SYNC:
        raise NotImplementedError("corrupt FLAC: bad frame sync")
    bits.read(1)  # reserved
    bits.read(1)  # blocking strategy (frame- vs sample-numbered)
    bs_code = bits.read(4)
    sr_code = bits.read(4)
    ch_code = bits.read(4)
    ss_code = bits.read(3)
    bits.read(1)  # reserved
    _read_utf8_number(bits)
    if bs_code == 0:
        raise NotImplementedError("corrupt FLAC: reserved block size code")
    elif bs_code == 6:
        block_size = bits.read(8) + 1
    elif bs_code == 7:
        block_size = bits.read(16) + 1
    else:
        block_size = _BLOCK_SIZE_TABLE[bs_code]
    if sr_code == 0:
        pass  # STREAMINFO rate
    elif sr_code in _SAMPLE_RATE_TABLE:
        pass  # table rate; STREAMINFO stays authoritative for output
    elif sr_code == 12:
        bits.read(8)
    elif sr_code in (13, 14):
        bits.read(16)
    else:
        raise NotImplementedError("corrupt FLAC: invalid sample rate code")
    bps = info["bps"] if ss_code == 0 else _SAMPLE_SIZE_TABLE.get(ss_code)
    if bps is None:
        raise NotImplementedError("corrupt FLAC: reserved sample size code")
    header_end = bits.byte_pos
    crc8 = bits.read(8)
    if _crc8(data[pos:header_end]) != crc8:
        raise NotImplementedError("corrupt FLAC: frame header CRC-8 mismatch")

    if ch_code <= 7:
        n_ch = ch_code + 1
        ch_bps = [bps] * n_ch
    elif ch_code == 8:  # left/side
        n_ch, ch_bps = 2, [bps, bps + 1]
    elif ch_code == 9:  # right/side
        n_ch, ch_bps = 2, [bps + 1, bps]
    elif ch_code == 10:  # mid/side
        n_ch, ch_bps = 2, [bps, bps + 1]
    else:
        raise NotImplementedError("corrupt FLAC: reserved channel assignment")

    subs = [_decode_subframe(bits, block_size, ch_bps[i]) for i in range(n_ch)]
    bits.align()
    frame_end = bits.byte_pos
    crc16 = bits.read(16)
    if _crc16(data[pos:frame_end]) != crc16:
        raise NotImplementedError("corrupt FLAC: frame CRC-16 mismatch")

    if ch_code == 8:  # left/side: right = left - side
        left = subs[0]
        right = [left[i] - subs[1][i] for i in range(block_size)]
        cols = [left, right]
    elif ch_code == 9:  # right/side: left = side + right
        right = subs[1]
        left = [subs[0][i] + right[i] for i in range(block_size)]
        cols = [left, right]
    elif ch_code == 10:  # mid/side
        left, right = [], []
        for i in range(block_size):
            mid2 = (subs[0][i] << 1) | (subs[1][i] & 1)
            left.append((mid2 + subs[1][i]) >> 1)
            right.append((mid2 - subs[1][i]) >> 1)
        cols = [left, right]
    else:
        cols = subs
    frame = np.array(cols, dtype=np.int64).T
    return frame, bits.byte_pos


def _decode_subframe(bits: _Bits, n: int, bps: int) -> list[int]:
    if bits.read(1):
        raise NotImplementedError("corrupt FLAC: subframe padding bit set")
    t = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
        bps -= wasted
    if t == 0:  # CONSTANT
        v = bits.sread(bps)
        samples = [v] * n
    elif t == 1:  # VERBATIM
        samples = [bits.sread(bps) for _ in range(n)]
    elif 8 <= t <= 12:  # FIXED
        order = t - 8
        warm = [bits.sread(bps) for _ in range(order)]
        res = _decode_residual(bits, n, order)
        samples = list(warm)
        coefs = _FIXED_COEFS[order]
        for i in range(order, n):
            samples.append(
                res[i - order]
                + sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            )
    elif t >= 32:  # LPC
        order = (t & 31) + 1
        warm = [bits.sread(bps) for _ in range(order)]
        precision = bits.read(4) + 1
        if precision == 16:
            raise NotImplementedError("corrupt FLAC: invalid LPC precision")
        shift = bits.sread(5)
        if shift < 0:
            raise NotImplementedError("corrupt FLAC: negative LPC shift")
        coefs = [bits.sread(precision) for _ in range(order)]
        res = _decode_residual(bits, n, order)
        samples = list(warm)
        for i in range(order, n):
            acc = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            samples.append(res[i - order] + (acc >> shift))
    else:
        raise NotImplementedError("corrupt FLAC: reserved subframe type")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def _decode_residual(bits: _Bits, n: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise NotImplementedError("corrupt FLAC: reserved residual method")
    plen = 4 + method
    escape = (1 << plen) - 1
    porder = bits.read(4)
    nparts = 1 << porder
    res: list[int] = []
    for p in range(nparts):
        cnt = (n >> porder) - (order if p == 0 else 0)
        if cnt < 0:
            raise NotImplementedError("corrupt FLAC: partition underflow")
        param = bits.read(plen)
        if param == escape:
            rawbits = bits.read(5)
            res.extend(
                bits.sread(rawbits) if rawbits else 0 for _ in range(cnt)
            )
        else:
            for _ in range(cnt):
                q = bits.unary()
                m = (q << param) | bits.read(param)
                res.append((m >> 1) ^ -(m & 1))
    return res


# ---------------------------------------------------------------------------
# Encoder (round-trip fixtures)
# ---------------------------------------------------------------------------

class _BitW:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, nbits: int) -> None:
        v &= (1 << nbits) - 1 if nbits else 0
        self.acc = (self.acc << nbits) | v
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def write_bytes(self, b: bytes) -> None:
        for byte in b:
            self.write(byte, 8)

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


def _rice_param_for(ms: list[int], plen: int) -> int:
    """Smallest-ish Rice parameter: bit length of the mean zigzag value."""
    if not ms:
        return 0
    mean = sum(ms) // len(ms)
    p = max(mean, 1).bit_length() - 1
    return min(p, (1 << plen) - 2)


def _write_residual(bw: _BitW, res: list[int], order: int,
                    partition_order: int = 0, force_escape: bool = False,
                    rice2: bool = False) -> None:
    bw.write(1 if rice2 else 0, 2)
    plen = 5 if rice2 else 4
    escape = (1 << plen) - 1
    bw.write(partition_order, 4)
    nparts = 1 << partition_order
    n = len(res) + order
    idx = 0
    for p in range(nparts):
        cnt = (n >> partition_order) - (order if p == 0 else 0)
        part = res[idx : idx + cnt]
        idx += cnt
        ms = [(r << 1) if r >= 0 else ((-r) << 1) - 1 for r in part]
        if force_escape:
            # two's-complement width covering every residual in the part
            rawbits = (
                max((r if r >= 0 else ~r).bit_length() + 1 for r in part)
                if part else 1
            )
            rawbits = min(rawbits, 31)
            bw.write(escape, plen)
            bw.write(rawbits, 5)
            for r in part:
                bw.write(r & ((1 << rawbits) - 1), rawbits)
            continue
        param = _rice_param_for(ms, plen)
        bw.write(param, plen)
        for m in ms:
            q = m >> param
            for _ in range(q):
                bw.write(0, 1)
            bw.write(1, 1)
            bw.write(m & ((1 << param) - 1), param)


def _write_subframe(bw: _BitW, s: list[int], bps: int, mode: str,
                    partition_order: int, force_escape: bool,
                    rice2: bool, wasted_bits: int = 0) -> None:
    if mode == "verbatim":
        bw.write(0, 1)
        bw.write(1, 6)
        if wasted_bits:  # samples must all be divisible by 2^wasted_bits
            if any(v & ((1 << wasted_bits) - 1) for v in s):
                raise ValueError("wasted_bits requires shifted samples")
            bw.write(1, 1)
            for _ in range(wasted_bits - 1):
                bw.write(0, 1)
            bw.write(1, 1)
            s = [v >> wasted_bits for v in s]
            bps -= wasted_bits
        else:
            bw.write(0, 1)
        for v in s:
            bw.write(v & ((1 << bps) - 1), bps)
        return
    if all(v == s[0] for v in s):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write(s[0] & ((1 << bps) - 1), bps)
        return
    order = 2 if len(s) > 2 else 0
    bw.write(0, 1)
    bw.write(8 + order, 6)  # FIXED
    bw.write(0, 1)
    for v in s[:order]:
        bw.write(v & ((1 << bps) - 1), bps)
    coefs = _FIXED_COEFS[order]
    res = [
        s[i] - sum(c * s[i - 1 - j] for j, c in enumerate(coefs))
        for i in range(order, len(s))
    ]
    po = partition_order
    while po and (len(s) % (1 << po) or (len(s) >> po) <= order):
        po -= 1  # partition math must stay integral
    _write_residual(bw, res, order, po, force_escape, rice2)


def encode_flac(
    sample_rate: int,
    samples: np.ndarray,
    bits_per_sample: int = 16,
    block_size: int = 1024,
    stereo_mode: str = "independent",
    subframe_mode: str = "auto",
    partition_order: int = 0,
    force_escape: bool = False,
    rice2: bool = False,
    wasted_bits: int = 0,
) -> bytes:
    """FLAC fixture writer. ``samples``: int array, shape (n,) mono or
    (n, 2) stereo. Knobs force specific decoder paths: ``subframe_mode=
    'verbatim'``, ``stereo_mode`` in {'independent','mid_side','left_side',
    'right_side'}, ``partition_order`` > 0, ``force_escape`` (raw
    partitions), ``rice2`` (5-bit parameters), ``wasted_bits`` (verbatim
    mode only; samples must be multiples of 2^wasted_bits)."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, n_ch = arr.shape
    if n_ch not in (1, 2):
        raise ValueError("fixture encoder supports 1 or 2 channels")
    out = bytearray(b"fLaC")
    # STREAMINFO (type 0, last metadata block)
    si = _BitW()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(n_ch - 1, 3)
    si.write(bits_per_sample - 1, 5)
    si.write(n, 36)
    si.write_bytes(b"\x00" * 16)  # md5 unset (decoder does not verify)
    out += bytes([0x80]) + len(si.buf).to_bytes(3, "big") + bytes(si.buf)

    for frame_i, start in enumerate(range(0, n, block_size)):
        blk = arr[start : start + block_size]
        bs = blk.shape[0]
        if n_ch == 1 or stereo_mode == "independent":
            ch_code = n_ch - 1
            chans = [blk[:, c].tolist() for c in range(n_ch)]
            ch_bps = [bits_per_sample] * n_ch
        else:
            left = blk[:, 0].astype(np.int64)
            right = blk[:, 1].astype(np.int64)
            side = (left - right).tolist()
            if stereo_mode == "mid_side":
                ch_code = 10
                mid = ((left + right) >> 1).tolist()
                chans = [mid, side]
            elif stereo_mode == "left_side":
                ch_code = 8
                chans = [left.tolist(), side]
            elif stereo_mode == "right_side":
                ch_code = 9
                chans = [side, right.tolist()]
            else:
                raise ValueError(f"unknown stereo_mode {stereo_mode!r}")
            ch_bps = (
                [bits_per_sample, bits_per_sample + 1]
                if ch_code in (8, 10)
                else [bits_per_sample + 1, bits_per_sample]
            )
        hdr = _BitW()
        hdr.write(_SYNC, 14)
        hdr.write(0, 1)  # mandatory-0
        hdr.write(0, 1)  # fixed block size (frame-numbered)
        hdr.write(7, 4)  # block size: 16-bit field at header end
        hdr.write(0, 4)  # sample rate: from STREAMINFO
        hdr.write(ch_code, 4)
        hdr.write(_SS_CODE[bits_per_sample], 3)
        hdr.write(0, 1)
        hdr.write_bytes(_encode_utf8_number(frame_i))
        hdr.write(bs - 1, 16)
        hdr.align()
        header = bytes(hdr.buf)
        frame = _BitW()
        frame.write_bytes(header)
        frame.write(_crc8(header), 8)
        for ci, ch in enumerate(chans):
            _write_subframe(frame, ch, ch_bps[ci], subframe_mode,
                            partition_order, force_escape, rice2,
                            wasted_bits)
        frame.align()
        body = bytes(frame.buf)
        out += body + struct.pack(">H", _crc16(body))
    return bytes(out)
