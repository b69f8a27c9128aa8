"""Pure-stdlib PNG codec for the multimodal decode path.

The container ships no media libraries (PIL/libpng), so the real
image-decode leg of `llm.multimodal` is implemented here from the PNG
specification directly: zlib (stdlib) inflates IDAT, and this module
does chunk parsing, CRC verification, and per-row unfiltering (all
five filter types: None/Sub/Up/Average/Paeth).

Supported subset — bit depth 8, color types greyscale (0), RGB (2),
grey+alpha (4), RGBA (6), non-interlaced. Anything else raises
`PngError`, which the feature extractor treats as "not decodable →
fall back to the byte-histogram feature". That makes the capability
gate explicit: real pixels when the bytes are a PNG we understand, an
honest fallback otherwise.

The encoder exists so fixtures and tests can fabricate *real* PNG
bytes (arbitrary per-row filter types, so decode of every filter path
is exercised end-to-end) without any third-party dependency.

Scale note: this is a per-row Python decode running inside Arrow
`mapInPandas` batches — the right shape for Spark (decode parallelism
= partition parallelism, no driver involvement). On a real cluster
you would swap the body for a C-backed decoder (PIL) with zero
changes to the Spark plumbing; pure Python is fine for the small
fixture images exercised here.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: PNG color type → samples per pixel (bit depth 8 only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngError(ValueError):
    """Raised when bytes are not a PNG this codec can decode."""


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _iter_chunks(data: bytes):
    """Validated chunk walk shared by the still and animated decoders:
    checks magic, per-chunk truncation, and CRCs, yields
    ``(ctype, body)`` pairs, and stops after IEND. Sharing ONE walk
    keeps the two parsers structurally consistent — the r5 review
    found the duplicated copies had already diverged on IHDR length
    validation."""
    if len(data) < 8 or data[:8] != PNG_MAGIC:
        raise PngError("not a PNG (bad magic)")
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise PngError("truncated chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise PngError(f"bad CRC in {ctype!r}")
        yield ctype, body
        if ctype == b"IEND":
            return
        pos += 12 + length


def _parse_ihdr(body: bytes) -> tuple[int, int, int]:
    """Validate IHDR against the supported subset → (w, h, channels)."""
    if len(body) != 13:
        raise PngError("bad IHDR length")
    width, height, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", body
    )
    if width < 1 or height < 1:
        # the PNG spec requires nonzero dimensions; accepting 0 would
        # put a divide-by-zero inside the feature extractor, outside
        # the PngError fallback gate
        raise PngError("zero-dimension image")
    if depth != 8:
        raise PngError(f"unsupported bit depth {depth}")
    if color not in _CHANNELS:
        raise PngError(f"unsupported color type {color}")
    if comp != 0 or filt != 0:
        raise PngError("unsupported compression/filter method")
    if interlace != 0:
        raise PngError("interlaced PNG unsupported")
    return width, height, _CHANNELS[color]


def decode_png(data: bytes) -> tuple[int, int, int, bytearray]:
    """Decode PNG bytes → ``(width, height, channels, pixels)``.

    ``pixels`` is row-major interleaved sample bytes (length
    ``width*height*channels``), fully unfiltered.
    """
    width = height = channels = -1
    idat = bytearray()
    seen_iend = False
    for ctype, body in _iter_chunks(data):
        if ctype == b"IHDR":
            width, height, channels = _parse_ihdr(body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            seen_iend = True
    if width < 0:
        raise PngError("missing IHDR")
    if not seen_iend:
        raise PngError("missing IEND")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise PngError(f"IDAT inflate failed: {e}") from None
    return width, height, channels, _unfilter(raw, width, height, channels)


def _unfilter(raw: bytes, width: int, height: int, channels: int) -> bytearray:
    """Reverse per-row PNG filtering over an inflated pixel stream."""
    stride = width * channels
    if len(raw) != height * (1 + stride):
        raise PngError("decompressed size mismatch")

    bpp = channels  # bytes per pixel at depth 8
    out = bytearray(height * stride)
    prev = bytearray(stride)
    for y in range(height):
        f = raw[y * (1 + stride)]
        line = bytearray(raw[y * (1 + stride) + 1 : (y + 1) * (1 + stride)])
        if f == 0:
            pass
        elif f == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        else:
            raise PngError(f"unknown filter type {f} in row {y}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return out


def decode_apng(
    data: bytes,
) -> tuple[int, int, int, list[tuple[int, bytearray]]]:
    """Decode APNG (animated PNG) bytes → ``(width, height, channels,
    frames)`` with ``frames`` a list of ``(delay_ms, pixels)``.

    Supported subset: every frame full-canvas (offset 0, canvas size),
    ``blend_op`` 0 (source replace) — each frame stands alone, which is
    what a frame-sampling pipeline consumes. Sequence numbers are
    validated strictly increasing and the frame count must match acTL.
    Non-animated PNGs (no acTL) raise; use :func:`decode_png`.
    """
    width = height = channels = -1
    num_frames = -1
    seq_expect = 0
    frames: list[tuple[int, bytearray]] = []
    cur: bytearray | None = None
    cur_delay = 0

    def _close_frame():
        nonlocal cur
        if cur is not None:
            if not cur:
                raise PngError("frame with no image data")
            try:
                raw = zlib.decompress(bytes(cur))
            except zlib.error as e:
                raise PngError(f"frame inflate failed: {e}") from None
            frames.append((cur_delay, _unfilter(raw, width, height, channels)))
            cur = None

    for ctype, body in _iter_chunks(data):
        if ctype == b"IHDR":
            width, height, channels = _parse_ihdr(body)
        elif ctype == b"acTL":
            if len(body) != 8:
                raise PngError("bad acTL length")
            num_frames, _plays = struct.unpack(">II", body)
        elif ctype == b"fcTL":
            if len(body) != 26:
                raise PngError("bad fcTL length")
            _close_frame()
            (seq, fw, fh, fx, fy, dnum, dden, _disp, blend) = struct.unpack(
                ">IIIIIHHBB", body
            )
            if seq != seq_expect:
                raise PngError(f"fcTL sequence {seq}, expected {seq_expect}")
            seq_expect += 1
            if (fw, fh, fx, fy) != (width, height, 0, 0) or blend != 0:
                raise PngError(
                    "APNG subset requires full-canvas source-blend frames"
                )
            cur = bytearray()
            cur_delay = dnum * 1000 // (dden if dden else 100)
        elif ctype == b"IDAT":
            if cur is None:
                raise PngError(
                    "IDAT outside an fcTL frame (plain PNG without acTL, "
                    "or default-image APNG — both unsupported here; use "
                    "decode_png for stills)"
                )
            cur.extend(body)
        elif ctype == b"fdAT":
            if cur is None:
                raise PngError("fdAT outside an fcTL frame")
            if len(body) < 4:
                raise PngError("bad fdAT length")
            (seq,) = struct.unpack(">I", body[:4])
            if seq != seq_expect:
                raise PngError(f"fdAT sequence {seq}, expected {seq_expect}")
            seq_expect += 1
            cur.extend(body[4:])
        elif ctype == b"IEND":
            _close_frame()
    if num_frames < 0:
        raise PngError("missing acTL (not an animated PNG)")
    if len(frames) != num_frames:
        raise PngError(
            f"acTL declares {num_frames} frames, found {len(frames)}"
        )
    return width, height, channels, frames


def encode_apng(
    width: int,
    height: int,
    channels: int,
    frames: list[tuple[int, bytes | bytearray]],
    row_filters: list[int] | None = None,
) -> bytes:
    """Encode ``(delay_ms, pixels)`` frames as a real APNG (full-canvas
    source-blend frames; ``row_filters`` applies to every frame)."""
    if not frames:
        raise PngError("need at least one frame")
    color = {1: 0, 3: 2, 2: 4, 4: 6}.get(channels)
    if color is None:
        raise PngError(f"unsupported channel count {channels}")
    if row_filters is None:
        row_filters = [0] * height
    out = bytearray(PNG_MAGIC)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    out += _chunk(b"IHDR", ihdr)
    out += _chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0
    for i, (delay_ms, pixels) in enumerate(frames):
        fctl = struct.pack(
            ">IIIIIHHBB", seq, width, height, 0, 0, delay_ms, 1000, 0, 0
        )
        seq += 1
        out += _chunk(b"fcTL", fctl)
        comp = _filtered_deflate(width, height, channels, pixels, row_filters)
        if i == 0:
            out += _chunk(b"IDAT", comp)
        else:
            out += _chunk(b"fdAT", struct.pack(">I", seq) + comp)
            seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)


def _filter_row(
    ftype: int, line: bytes, prev: bytes, bpp: int
) -> bytes:
    """Apply PNG filter ``ftype`` to a raw row (encoder side)."""
    n = len(line)
    out = bytearray(n)
    for i in range(n):
        x = line[i]
        left = line[i - bpp] if i >= bpp else 0
        up = prev[i]
        ul = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x - left) & 0xFF
        elif ftype == 2:
            out[i] = (x - up) & 0xFF
        elif ftype == 3:
            out[i] = (x - ((left + up) >> 1)) & 0xFF
        elif ftype == 4:
            out[i] = (x - _paeth(left, up, ul)) & 0xFF
        else:
            raise PngError(f"unknown filter type {ftype}")
    return bytes(out)


def _filtered_deflate(
    width: int,
    height: int,
    channels: int,
    pixels: bytes | bytearray,
    row_filters: list[int],
) -> bytes:
    """Validate + filter + deflate one image's rows — the shared body
    of both encoders (a compression/filter fix must hit stills and
    animation frames identically)."""
    stride = width * channels
    if len(pixels) != height * stride:
        raise PngError("pixel buffer size mismatch")
    if len(row_filters) != height:
        raise PngError("need one filter type per row")
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = bytes(pixels[y * stride : (y + 1) * stride])
        raw.append(row_filters[y])
        raw.extend(_filter_row(row_filters[y], line, prev, channels))
        prev = line
    return zlib.compress(bytes(raw), 6)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(
    width: int,
    height: int,
    channels: int,
    pixels: bytes | bytearray,
    row_filters: list[int] | None = None,
) -> bytes:
    """Encode interleaved 8-bit samples as a real PNG.

    ``row_filters`` (default all-0) picks the filter type per row —
    passing a mix of 0..4 produces fixtures that exercise every
    unfilter path in :func:`decode_png` with bytes any external PNG
    reader also accepts.
    """
    color = {1: 0, 3: 2, 2: 4, 4: 6}.get(channels)
    if color is None:
        raise PngError(f"unsupported channel count {channels}")
    if row_filters is None:
        row_filters = [0] * height
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(
            b"IDAT",
            _filtered_deflate(width, height, channels, pixels, row_filters),
        )
        + _chunk(b"IEND", b"")
    )
