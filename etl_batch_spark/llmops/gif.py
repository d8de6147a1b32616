"""Pure-stdlib+numpy GIF decoder/encoder (LZW, palettes, interlacing).

Completes the stdlib image-codec set (png.py, jpeg.py): GIF87a/GIF89a
files with global/local color tables, the four-pass interlace layout,
Graphic Control transparency, and the variable-width LZW scheme GIF
uses (clear/end codes, dictionary growth to 4096 entries).  Everything
here is from the public GIF89a specification (CompuServe 1990) and the
Welch LZW paper.

Scope (deliberate): the FIRST image frame decodes to pixels — at
training-data scale a GIF contributes one keyframe to an image corpus;
animation belongs to the video path (``frame_sample_plan``), and a
real cluster swaps this module for libvips/ffmpeg behind the same
interface.  The frame count is still parsed (cheaply, by walking the
block structure) so callers can route animations.  Transparency
returns RGBA (alpha 0 at the transparent index); otherwise RGB.

Same hostile-input discipline as png/jpeg/wav: declared dimensions are
bounded BEFORE allocation, every malformed path raises ``GifError``
(never a raw struct/index error), LZW codes outside the live
dictionary are a loud error, and the decoder never trusts a
sub-block chain to terminate.

``encode_gif`` exists so tests can generate real GIFs without PIL and
round-trip them: GIF is lossless over palette indices, so a round-trip
through a known palette must reproduce pixels EXACTLY, interlaced or
not.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_PIXELS = 1 << 26

SIGNATURES = (b"GIF87a", b"GIF89a")


class GifError(ValueError):
    """Malformed, corrupt, or out-of-scope GIF payload."""


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a length-prefixed sub-block chain; returns
    (payload, position after the 0 terminator)."""
    out = bytearray()
    n = len(data)
    while True:
        if pos >= n:
            raise GifError("sub-block chain ran off the end")
        ln = data[pos]
        pos += 1
        if ln == 0:
            return bytes(out), pos
        if pos + ln > n:
            raise GifError("truncated sub-block")
        out += data[pos : pos + ln]
        pos += ln


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """GIF variable-width LZW: codes start at min_code_size+1 bits,
    grow after the dictionary fills the current width, reset on CLEAR.
    Decodes exactly ``expected`` indices (trailing junk tolerated, a
    shortfall is loud)."""
    if not 2 <= min_code_size <= 8:
        raise GifError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()

    # bit reader: GIF packs codes LSB-first
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)

    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    prev: bytes | None = None

    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                raise GifError("LZW stream exhausted before image complete")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise GifError(f"LZW code {code} before any literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]  # the KwKwK case
            table.append(entry)
        else:
            raise GifError(f"LZW code {code} outside live dictionary")
        out += entry
        prev = entry
        # widen when the NEXT code could address past the current width
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < expected:
        raise GifError(
            f"LZW produced {len(out)} of {expected} expected indices"
        )
    return bytes(out[:expected])


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    out = np.empty_like(idx)
    out[rows] = idx
    return out


def decode_gif(
    data: bytes, *, max_pixels: int = MAX_PIXELS
) -> tuple[int, int, int, bytes, int]:
    """Decode the first frame of a GIF to ``(width, height, channels,
    pixels, n_frames)`` — ``pixels`` row-major interleaved uint8, RGB
    (channels=3) or RGBA (channels=4 when the frame declares a
    transparent index).  Dimensions are those of the first frame;
    ``n_frames`` counts image descriptors in the whole stream."""
    try:
        return _decode_impl(data, max_pixels=max_pixels)
    except (struct.error, IndexError) as exc:
        raise GifError(f"malformed GIF structure: {exc}") from exc


def _decode_impl(
    data: bytes, *, max_pixels: int
) -> tuple[int, int, int, bytes, int]:
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise GifError("payload is not bytes")
    data = bytes(data)
    if len(data) < 13 or data[:6] not in SIGNATURES:
        raise GifError("not a GIF (bad signature)")
    _sw, _sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        if pos + 3 * size > len(data):
            raise GifError("truncated global color table")
        gct = np.frombuffer(data[pos : pos + 3 * size], np.uint8).reshape(size, 3)
        pos += 3 * size

    transparent = -1
    first: tuple | None = None
    n_frames = 0
    n = len(data)
    while True:
        if pos >= n:
            raise GifError("GIF stream ran off the end (missing trailer)")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= n:
                raise GifError("truncated extension block")
            label = data[pos]
            pos += 1
            body, pos = _read_subblocks(data, pos)
            if label == 0xF9 and first is None:  # Graphic Control
                if len(body) < 4:
                    raise GifError("truncated graphic control extension")
                if body[0] & 0x01:
                    transparent = body[3]
            continue
        if block != 0x2C:
            raise GifError(f"unknown GIF block 0x{block:02X}")
        # image descriptor
        _left, _top, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        lct = None
        if ipacked & 0x80:
            size = 2 << (ipacked & 0x07)
            if pos + 3 * size > n:
                raise GifError("truncated local color table")
            lct = np.frombuffer(data[pos : pos + 3 * size], np.uint8).reshape(
                size, 3
            )
            pos += 3 * size
        if pos >= n:
            raise GifError("truncated image data")
        min_code = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        n_frames += 1
        if first is None:
            if w == 0 or h == 0:
                raise GifError("zero dimension")
            if w * h > max_pixels:
                raise GifError(
                    f"declared dimensions {w}x{h} exceed max_pixels={max_pixels}"
                )
            palette = lct if lct is not None else gct
            if palette is None:
                raise GifError("frame has no color table")
            idx = np.frombuffer(
                _lzw_decode(lzw, min_code, w * h), np.uint8
            ).reshape(h, w)
            if idx.max() >= palette.shape[0]:
                raise GifError("pixel index outside color table")
            if ipacked & 0x40:
                idx = _deinterlace(idx)
            first = (w, h, idx, palette, transparent)
        # later frames: block structure already validated, data skipped

    if first is None:
        raise GifError("no image frame before trailer")
    w, h, idx, palette, transparent = first
    rgb = palette[idx]  # (h, w, 3)
    if transparent >= 0:
        alpha = np.where(idx == transparent, 0, 255).astype(np.uint8)
        out = np.dstack([rgb, alpha])
        return w, h, 4, out.tobytes(), n_frames
    return w, h, 3, rgb.tobytes(), n_frames


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF LZW with a fresh CLEAR whenever the dictionary hits 4096."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:  # dictionary full: reset
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    width: int,
    height: int,
    indices: bytes,
    palette: np.ndarray,
    *,
    interlace: bool = False,
    transparent: int = -1,
) -> bytes:
    """Minimal GIF89a writer (tests + fixture generation): one frame,
    a global color table (padded to a power of two), optional interlace
    and transparency."""
    palette = np.asarray(palette, dtype=np.uint8)
    if palette.ndim != 2 or palette.shape[1] != 3 or not 1 <= palette.shape[0] <= 256:
        raise GifError("palette must be (n<=256, 3) uint8")
    if len(indices) != width * height:
        raise GifError(f"index buffer {len(indices)} != {width}*{height}")
    idx = np.frombuffer(bytes(indices), np.uint8)
    if idx.size and idx.max() >= palette.shape[0]:
        raise GifError("pixel index outside palette")

    bits = max(1, int(palette.shape[0] - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), np.uint8)
    pal[: palette.shape[0]] = palette

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    if transparent >= 0:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    ipacked = 0x40 if interlace else 0x00
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, ipacked)
    if interlace:
        grid = idx.reshape(height, width)
        rows = []
        for start, step in _INTERLACE_PASSES:
            rows.extend(range(start, height, step))
        idx = grid[rows].reshape(-1)
    min_code = max(2, bits)
    out += bytes([min_code])
    lzw = _lzw_encode(idx.tobytes(), min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
