"""Pure-stdlib+numpy BMP decoder/encoder (uncompressed DIBs).

The screenshot/scanner long tail of an image corpus: Windows bitmaps
with BITMAPINFOHEADER-family headers (40/52/56/108/124-byte versions),
uncompressed BI_RGB at 8-bit (paletted), 24-bit and 32-bit depths,
bottom-up or top-down row order, 4-byte row stride padding.  From the
public Windows GDI file-format documentation.

RLE4/RLE8/bitfield compressions and 1/4-bit depths raise ``BmpError``
(quarantine-and-route, same policy as the sibling codecs).  Same
hostile-input discipline: dimensions bounded before allocation, every
malformed path raises ``BmpError``.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_PIXELS = 1 << 26

SIGNATURE = b"BM"


class BmpError(ValueError):
    """Malformed, corrupt, or out-of-scope BMP payload."""


def decode_bmp(
    data: bytes, *, max_pixels: int = MAX_PIXELS
) -> tuple[int, int, int, bytes]:
    """Decode a BMP to ``(width, height, channels, pixels)`` —
    row-major top-down interleaved uint8, matching the png/jpeg/gif
    contract.  8-bit paletted and 24-bit files yield RGB (channels=3);
    32-bit files yield RGBA."""
    try:
        return _decode_impl(data, max_pixels=max_pixels)
    except (struct.error, IndexError) as exc:
        raise BmpError(f"malformed BMP structure: {exc}") from exc


def _decode_impl(data: bytes, *, max_pixels: int) -> tuple[int, int, int, bytes]:
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise BmpError("payload is not bytes")
    data = bytes(data)
    if len(data) < 54 or data[:2] != b"BM":
        raise BmpError("not a BMP (bad signature or truncated header)")
    _fsize, _r1, _r2, pixel_off = struct.unpack_from("<IHHI", data, 2)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size not in (40, 52, 56, 108, 124):
        raise BmpError(f"unsupported DIB header size {hdr_size}")
    width, height, planes, bits, compression, _img_size = struct.unpack_from(
        "<iiHHII", data, 18
    )
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise BmpError("bad dimensions")
    if width * height > max_pixels:
        raise BmpError(
            f"declared dimensions {width}x{height} exceed max_pixels={max_pixels}"
        )
    if planes != 1:
        raise BmpError(f"bad plane count {planes}")
    if compression != 0:  # BI_RGB only
        raise BmpError(
            f"unsupported compression {compression} (RLE/bitfields out of scope)"
        )
    if bits not in (8, 24, 32):
        raise BmpError(f"unsupported bit depth {bits} (8/24/32 only)")

    palette = None
    if bits == 8:
        (colors_used,) = struct.unpack_from("<I", data, 46)
        n_colors = colors_used or 256
        pal_off = 14 + hdr_size
        if pal_off + 4 * n_colors > len(data):
            raise BmpError("truncated color palette")
        pal = np.frombuffer(
            data[pal_off : pal_off + 4 * n_colors], np.uint8
        ).reshape(n_colors, 4)
        palette = pal[:, [2, 1, 0]]  # BGRA entries -> RGB

    stride = (width * bits // 8 + 3) & ~3
    need = stride * height
    if pixel_off + need > len(data):
        raise BmpError(
            f"pixel array needs {need} bytes at offset {pixel_off}, "
            f"payload has {len(data)}"
        )
    raw = np.frombuffer(
        data[pixel_off : pixel_off + need], np.uint8
    ).reshape(height, stride)
    if not top_down:
        raw = raw[::-1]
    if bits == 8:
        idx = raw[:, :width]
        if int(idx.max(initial=0)) >= palette.shape[0]:
            raise BmpError("pixel index outside palette")
        return width, height, 3, palette[idx].tobytes()
    if bits == 24:
        bgr = raw[:, : width * 3].reshape(height, width, 3)
        return width, height, 3, bgr[:, :, ::-1].tobytes()
    bgra = raw[:, : width * 4].reshape(height, width, 4)
    return width, height, 4, bgra[:, :, [2, 1, 0, 3]].tobytes()


def encode_bmp(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    *,
    top_down: bool = False,
) -> bytes:
    """Minimal BMP writer (tests + fixture generation): 24-bit for RGB
    input, 32-bit for RGBA."""
    if channels not in (3, 4):
        raise BmpError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise BmpError(
            f"pixel buffer {len(pixels)} != {width}*{height}*{channels}"
        )
    arr = np.frombuffer(pixels, np.uint8).reshape(height, width, channels)
    if channels == 3:
        out_px = arr[:, :, ::-1]
        bits = 24
    else:
        out_px = arr[:, :, [2, 1, 0, 3]]
        bits = 32
    stride = (width * bits // 8 + 3) & ~3
    rows = np.zeros((height, stride), np.uint8)
    rows[:, : width * channels] = out_px.reshape(height, width * channels)
    if not top_down:
        rows = rows[::-1]
    body = rows.tobytes()
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, -height if top_down else height,
        1, bits, 0, len(body), 2835, 2835, 0, 0,
    )
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    return header + info + body
