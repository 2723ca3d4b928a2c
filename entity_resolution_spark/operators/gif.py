"""GIF decoder (GIF87a/89a), dependency-free — completes the common-crawl
image formats next to PNG (zlib) and baseline JPEG (numpy): PNG + JPEG +
GIF cover essentially all crawl imagery that isn't webp/avif.

Decodes the FIRST image frame (crawl feature-extraction semantics — GIF
animations are sampled like video elsewhere): palette (global or local),
LZW decompression, optional interlace de-scrambling, luma collapse via the
shared Rec.601 helper.  The encoder writes a spec-minimal GIF87a (global
palette, no interlace) for round-trip tests.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF-variant LZW: variable code width, clear/eoi codes, MSB-in-LSB
    bit packing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()

    def reset():
        return (
            {i: bytes([i]) for i in range(clear)},
            min_code_size + 1,
            eoi + 1,
        )

    table, width, next_code = reset()
    buf = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        buf |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = buf & ((1 << width) - 1)
            buf >>= width
            nbits -= width
            if code == clear:
                table, width, next_code = reset()
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                if code not in table:
                    raise NotImplementedError("corrupt GIF LZW stream")
                entry = table[code]
            elif code in table:
                entry = table[code]
                table[next_code] = prev + entry[:1]
                next_code += 1
            elif code == next_code:  # the KwKwK case
                entry = prev + prev[:1]
                table[next_code] = entry
                next_code += 1
            else:
                raise NotImplementedError("corrupt GIF LZW stream")
            out += entry
            if len(out) >= n_pixels:
                return bytes(out[:n_pixels])
            prev = entry
            if next_code == (1 << width) and width < 12:
                width += 1
    return bytes(out[:n_pixels])


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    """GIF 4-pass interlace: rows arrive 0,8,16…, 4,12…, 2,6…, 1,3,5…"""
    h = idx.shape[0]
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    out = np.empty_like(idx)
    out[order] = idx
    return out


def decode_gif(data: bytes) -> tuple[int, int, np.ndarray]:
    """First frame of a GIF as (width, height, uint8 luma)."""
    from .multimodal import _luma

    if data[:6] not in GIF_MAGICS:
        raise NotImplementedError("not a GIF")
    if len(data) < 14:
        raise NotImplementedError("truncated GIF header")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gpal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gpal = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            _x, _y, w, h, iflags = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
            pos += 10
            pal = gpal
            if iflags & 0x80:  # local palette
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if pal is None:
                raise NotImplementedError("GIF frame without a palette")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                _lzw_decode(bytes(lzw), min_code, w * h), np.uint8
            )
            if len(idx) < w * h:
                raise NotImplementedError("truncated GIF image data")
            idx = idx.reshape(h, w)
            if iflags & 0x40:
                idx = _deinterlace(idx)
            rgb = pal[np.minimum(idx, len(pal) - 1)]
            return w, h, _luma(rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2])
        elif b == 0x3B:  # trailer
            break
        else:
            raise NotImplementedError(f"unknown GIF block {b:#x}")
    raise NotImplementedError("GIF contains no image frame")


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    buf = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    width = min_code_size + 1
    next_code = eoi + 1
    emit(clear, width)
    run = b""
    for byte in indices:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code < (1 << 12):
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:  # table full: emit clear, reset (keeps decoder in sync)
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            width = min_code_size + 1
            next_code = eoi + 1
        run = bytes([byte])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


def encode_gif(pixels: np.ndarray) -> bytes:
    """Grayscale GIF87a (identity 256-gray global palette, no interlace) —
    the round-trip fixture for :func:`decode_gif`."""
    h, w = pixels.shape
    head = b"GIF87a" + struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)
    pal = bytes(v for i in range(256) for v in (i, i, i))
    desc = b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    lzw = _lzw_encode(pixels.astype(np.uint8).tobytes(), 8)
    blocks = bytearray([8])  # min code size
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"
    return head + pal + desc + bytes(blocks) + b"\x3B"
