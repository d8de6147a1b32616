"""Pure-stdlib+numpy PNM (PPM/PGM) decoder/encoder.

Netpbm files are the interchange lingua franca of imaging pipelines
and test fixtures: a whitespace-delimited ASCII header (magic, width,
height, maxval, ``#`` comments anywhere between tokens) followed by
samples.  Supported: P5/P6 (binary PGM/PPM) and P2/P3 (ASCII), maxval
<= 255.  16-bit (maxval > 255) and the 1-bit P1/P4 bitmap forms raise
``PnmError`` — out-of-scope depths must fail loud rather than silently
rescale.  From the public Netpbm format specifications.
"""

from __future__ import annotations

import numpy as np

MAX_PIXELS = 1 << 26

SIGNATURES = (b"P2", b"P3", b"P5", b"P6")


class PnmError(ValueError):
    """Malformed, corrupt, or out-of-scope PNM payload."""


def _tokens(data: bytes, pos: int, n: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-delimited integer header tokens starting
    at ``pos``, skipping ``#`` comments; returns (values, next_pos)."""
    out: list[int] = []
    ln = len(data)
    while len(out) < n:
        while pos < ln and data[pos : pos + 1].isspace():
            pos += 1
        if pos < ln and data[pos] == 0x23:  # '#' comment to end of line
            while pos < ln and data[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < ln and not data[pos : pos + 1].isspace():
            pos += 1
        tok = data[start:pos]
        if not tok.isdigit():
            raise PnmError(f"bad header token {tok!r}")
        out.append(int(tok))
    return out, pos


def decode_pnm(
    data: bytes, *, max_pixels: int = MAX_PIXELS
) -> tuple[int, int, int, bytes]:
    """Decode a PGM/PPM to ``(width, height, channels, pixels)`` —
    row-major interleaved uint8, same contract as the sibling codecs
    (channels 1 for PGM, 3 for PPM)."""
    try:
        return _decode_impl(data, max_pixels=max_pixels)
    except (ValueError, IndexError) as exc:
        if isinstance(exc, PnmError):
            raise
        raise PnmError(f"malformed PNM structure: {exc}") from exc


def _decode_impl(data: bytes, *, max_pixels: int) -> tuple[int, int, int, bytes]:
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise PnmError("payload is not bytes")
    data = bytes(data)
    magic = data[:2]
    if magic not in SIGNATURES:
        if magic in (b"P1", b"P4"):
            raise PnmError("1-bit PBM out of scope (P2/P3/P5/P6 only)")
        raise PnmError("not a PNM (bad magic)")
    channels = 3 if magic in (b"P3", b"P6") else 1
    binary = magic in (b"P5", b"P6")
    (width, height, maxval), pos = _tokens(data, 2, 3)
    if width == 0 or height == 0:
        raise PnmError("zero dimension")
    if width * height > max_pixels:
        raise PnmError(
            f"declared dimensions {width}x{height} exceed max_pixels={max_pixels}"
        )
    if not 0 < maxval <= 255:
        raise PnmError(f"unsupported maxval {maxval} (8-bit only)")
    n = width * height * channels
    if binary:
        pos += 1  # exactly ONE whitespace byte separates header and raster
        raster = data[pos : pos + n]
        if len(raster) != n:
            raise PnmError(f"raster has {len(raster)} of {n} expected samples")
        arr = np.frombuffer(raster, np.uint8)
    else:
        vals, _ = _tokens(data, pos, n)
        arr = np.array(vals, np.int64)
    if int(arr.max(initial=0)) > maxval:
        raise PnmError("sample exceeds declared maxval")
    if maxval != 255:  # Netpbm semantics: samples scale to the maxval
        arr = (arr.astype(np.float64) * 255.0 / maxval).round()
    return width, height, channels, arr.astype(np.uint8).tobytes()


def encode_pnm(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    *,
    binary: bool = True,
    comment: str | None = None,
) -> bytes:
    """Minimal PGM/PPM writer (tests + fixture generation)."""
    if channels not in (1, 3):
        raise PnmError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise PnmError(
            f"pixel buffer {len(pixels)} != {width}*{height}*{channels}"
        )
    magic = (b"P5" if channels == 1 else b"P6") if binary else (
        b"P2" if channels == 1 else b"P3"
    )
    hdr = magic + b"\n"
    if comment:
        hdr += b"# " + comment.encode() + b"\n"
    hdr += f"{width} {height}\n255\n".encode()
    if binary:
        return hdr + pixels
    vals = " ".join(str(b) for b in pixels)
    return hdr + vals.encode() + b"\n"
