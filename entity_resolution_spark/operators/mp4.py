"""MP4 / ISO-BMFF container codec (ISO/IEC 14496-12), dependency-free.

Parses the box structure a crawl video stage actually needs: ``moov`` →
``trak`` → ``mdia``/``minf``/``stbl`` with the full sample-table walk
(``stsd`` sample descriptions, ``stsz`` sizes, ``stsc`` sample-to-chunk
runs, ``stco``/``co64`` chunk offsets, 64-bit ``largesize`` boxes), maps
every video sample to its byte extent, and decodes the samples when the
codec is one we own: ``jpeg``/``mjpa``/``mjpb``/``MJPG`` (QuickTime
Motion-JPEG — each sample is a baseline/progressive JPEG handled by
``operators/jpeg.py``). Compressed codecs (``avc1``/H.264, ``hev1``,
``vp09``, ``av01``) raise ``NotImplementedError`` naming the fourcc —
the documented ``multimodal.register_decoder('video', ...)`` plug point;
the container walk itself is codec-agnostic, so a plugged decoder can
reuse :func:`mp4_video_samples` for frame extraction.

The encoder writes a spec-shaped Motion-JPEG MP4 (``ftyp`` + ``mdat`` +
``moov`` with one video track) for round-trip fixtures, mirroring the
AVI-MJPEG fixture pattern.

Module contract: corrupt/truncated input raises ``NotImplementedError``.
"""

from __future__ import annotations

import struct

import numpy as np

_MJPEG_FOURCC = {b"jpeg", b"mjpa", b"mjpb", b"MJPG", b"mjpg"}


def _boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for boxes in [start, end)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", data[pos : pos + 4])[0]
        btype = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise NotImplementedError("truncated MP4 (largesize cut)")
            size = struct.unpack(">Q", data[pos + 8 : pos + 16])[0]
            hdr = 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < hdr or pos + size > end:
            raise NotImplementedError("truncated MP4 (box overruns container)")
        yield btype, pos + hdr, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, btype: bytes):
    for t, s, e in _boxes(data, start, end):
        if t == btype:
            return s, e
    return None


def _path(data: bytes, start: int, end: int, *types: bytes):
    for t in types:
        found = _find(data, start, end, t)
        if found is None:
            return None
        start, end = found
    return start, end


def mp4_video_samples(data: bytes) -> tuple[bytes, int, int, list[tuple[int, int]]]:
    """Codec-agnostic sample extraction for the FIRST video track:
    (codec_fourcc, width, height, [(offset, size), ...] in decode order).
    """
    try:
        return _mp4_video_samples_impl(data)
    except NotImplementedError:
        raise
    except (IndexError, ValueError, struct.error, OverflowError,
            MemoryError) as e:
        raise NotImplementedError(f"corrupt MP4 ({type(e).__name__}: {e})") from e


def _mp4_video_samples_impl(data):
    if data[4:8] != b"ftyp":
        raise NotImplementedError("not an MP4 (missing ftyp)")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise NotImplementedError("MP4 without moov box")
    for t, s, e in _boxes(data, *moov):
        if t != b"trak":
            continue
        mdia = _find(data, s, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, *mdia, b"hdlr")
        if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        stbl = _path(data, *mdia, b"minf", b"stbl")
        if stbl is None:
            raise NotImplementedError("video trak without stbl")
        return _parse_stbl(data, *stbl)
    raise NotImplementedError("MP4 without a video track")


def _parse_stbl(data, s, e):
    stsd = _find(data, s, e, b"stsd")
    stsz = _find(data, s, e, b"stsz")
    stsc = _find(data, s, e, b"stsc")
    stco = _find(data, s, e, b"stco")
    co64 = _find(data, s, e, b"co64")
    if stsd is None or stsz is None or stsc is None or (
            stco is None and co64 is None):
        raise NotImplementedError("MP4 stbl missing stsd/stsz/stsc/stco")

    # stsd: first sample entry carries fourcc + visual width/height
    ds, de = stsd
    n_desc = struct.unpack(">I", data[ds + 4 : ds + 8])[0]
    if n_desc < 1:
        raise NotImplementedError("MP4 stsd without sample entries")
    entry = ds + 8
    fourcc = data[entry + 4 : entry + 8]
    width, height = struct.unpack(">HH", data[entry + 32 : entry + 36])

    # stsz: per-sample sizes (or one uniform size).  Counts are untrusted
    # 32-bit fields: bound every allocation by what the file could hold,
    # or a 12-byte corrupt box would fabricate a multi-GB list (MemoryError
    # escaping the NotImplementedError contract).
    zs, ze = stsz
    uniform, n_samples = struct.unpack(">II", data[zs + 4 : zs + 12])
    if n_samples > len(data) or (uniform and uniform * n_samples > len(data)):
        raise NotImplementedError("corrupt MP4: stsz sample count/size "
                                  "exceeds file size")
    if uniform:
        sizes = [uniform] * n_samples
    else:
        if zs + 12 + 4 * n_samples > ze:
            raise NotImplementedError("corrupt MP4: stsz table overruns box")
        sizes = list(
            struct.unpack(f">{n_samples}I",
                          data[zs + 12 : zs + 12 + 4 * n_samples])
        )

    # stco/co64: chunk offsets (bounded by the box end like stsz — a
    # corrupt count must not silently read the next box's bytes as offsets)
    if stco is not None:
        cs, ce = stco
        n_chunks = struct.unpack(">I", data[cs + 4 : cs + 8])[0]
        if cs + 8 + 4 * n_chunks > ce:
            raise NotImplementedError("corrupt MP4: stco table overruns box")
        offsets = list(
            struct.unpack(f">{n_chunks}I",
                          data[cs + 8 : cs + 8 + 4 * n_chunks])
        )
    else:
        cs, ce = co64
        n_chunks = struct.unpack(">I", data[cs + 4 : cs + 8])[0]
        if cs + 8 + 8 * n_chunks > ce:
            raise NotImplementedError("corrupt MP4: co64 table overruns box")
        offsets = list(
            struct.unpack(f">{n_chunks}Q",
                          data[cs + 8 : cs + 8 + 8 * n_chunks])
        )

    # stsc: (first_chunk, samples_per_chunk) runs -> samples per chunk
    ss, se = stsc
    n_runs = struct.unpack(">I", data[ss + 4 : ss + 8])[0]
    if ss + 8 + 12 * n_runs > se:
        raise NotImplementedError("corrupt MP4: stsc table overruns box")
    runs = [
        struct.unpack(">III", data[ss + 8 + 12 * i : ss + 20 + 12 * i])[:2]
        for i in range(n_runs)
    ]
    spc = []
    prev_first = 0
    for i, (first, per) in enumerate(runs):
        # validate BEFORE expanding: corrupt first_chunk values would
        # otherwise size the replication list from untrusted input
        if first <= prev_first or first > n_chunks:
            raise NotImplementedError("corrupt MP4: stsc chunk run out of range")
        prev_first = first
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
        if last < first or last > n_chunks:
            raise NotImplementedError("corrupt MP4: stsc chunk run out of range")
        spc.extend([per] * (last - first + 1))
    if len(spc) != n_chunks:
        raise NotImplementedError("MP4 stsc/stco chunk count mismatch")

    extents = []
    si = 0
    for ci, chunk_off in enumerate(offsets):
        off = chunk_off
        for _ in range(spc[ci]):
            if si >= n_samples:
                break
            extents.append((off, sizes[si]))
            off += sizes[si]
            si += 1
    if si != n_samples:
        raise NotImplementedError("MP4 sample table shorter than stsz count")
    return fourcc, width, height, extents


def decode_mp4_mjpeg(data: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Decode a Motion-JPEG MP4 to (width, height, [luma frames])."""
    from .jpeg import decode_jpeg

    fourcc, width, height, extents = mp4_video_samples(data)
    if fourcc not in _MJPEG_FOURCC:
        raise NotImplementedError(
            f"MP4 video codec {fourcc.decode('ascii', 'replace')!r} needs a "
            "registered decoder (multimodal.register_decoder('video', fn)); "
            "built-in decode covers Motion-JPEG samples only"
        )
    frames = []
    for off, size in extents:
        if off + size > len(data):
            raise NotImplementedError("truncated MP4 (sample beyond EOF)")
        w, h, px = decode_jpeg(data[off : off + size])
        frames.append(px)
    if frames:
        height, width = frames[0].shape
    return width, height, frames


# ---------------------------------------------------------------------------
# Encoder (round-trip fixtures)
# ---------------------------------------------------------------------------

def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">I", (version << 24) | flags) + payload)


def encode_mp4_mjpeg(frames_jpeg: list[bytes], width: int, height: int,
                     fps: int = 25, samples_per_chunk: int = 0,
                     use_co64: bool = False) -> bytes:
    """Minimal Motion-JPEG MP4: ftyp + mdat (concatenated JPEG samples)
    + moov with a single 'vide' track whose stbl indexes every sample.
    Fixture counterpart of :func:`decode_mp4_mjpeg`.

    ``samples_per_chunk`` > 0 splits the samples into chunks of that many
    (a ragged final chunk produces a second stsc run — exercises the
    run-expansion walk); ``use_co64`` writes 64-bit chunk offsets."""
    n = len(frames_jpeg)
    timescale = fps * 1000
    delta = 1000
    duration = n * delta

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat_payload = b"".join(frames_jpeg)
    mdat = _box(b"mdat", mdat_payload)
    mdat_data_start = len(ftyp) + 8  # offset of first sample in the file

    entry = (
        struct.pack(">I", 86) + b"jpeg"
        + b"\x00" * 6 + struct.pack(">H", 1)       # reserved + dref index
        + b"\x00" * 16                               # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x480000, 0x480000)     # 72 dpi
        + b"\x00" * 4 + struct.pack(">H", 1)         # frame_count
        + b"\x00" * 32                               # compressorname
        + struct.pack(">Hh", 24, -1)                 # depth, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    spc = samples_per_chunk if samples_per_chunk > 0 else max(n, 1)
    chunk_sizes = [min(spc, n - i) for i in range(0, n, spc)] or [0]
    chunk_offsets = []
    off = mdat_data_start
    si = 0
    for c in chunk_sizes:
        chunk_offsets.append(off)
        for _ in range(c):
            off += len(frames_jpeg[si])
            si += 1
    stsc_runs = [(1, chunk_sizes[0])]
    for i, c in enumerate(chunk_sizes[1:], start=2):
        if c != stsc_runs[-1][1]:
            stsc_runs.append((i, c))
    stsc = _full(
        b"stsc", 0, 0,
        struct.pack(">I", len(stsc_runs))
        + b"".join(struct.pack(">III", fc, c, 1) for fc, c in stsc_runs),
    )
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(f)) for f in frames_jpeg),
    )
    if use_co64:
        stco = _full(
            b"co64", 0, 0,
            struct.pack(">I", len(chunk_offsets))
            + b"".join(struct.pack(">Q", o) for o in chunk_offsets),
        )
    else:
        stco = _full(
            b"stco", 0, 0,
            struct.pack(">I", len(chunk_offsets))
            + b"".join(struct.pack(">I", o) for o in chunk_offsets),
        )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    url = _full(b"url ", 0, 1, b"")  # flag 1: media in this file
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)

    hdlr = _full(b"hdlr", 0, 0,
                 b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"MJPEG\x00")
    mdhd = _full(b"mdhd", 0, 0,
                 struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)

    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIII", 0, 0, 1, 0) + struct.pack(">I", duration)
        + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0) + matrix
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IHH", 0x10000, 0x100, 0) + b"\x00" * 8 + matrix
        + b"\x00" * 24 + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
