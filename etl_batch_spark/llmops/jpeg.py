"""Pure-stdlib+numpy baseline JPEG codec (huffman + DCT).

The PNG codec (:mod:`etl_batch_spark.llmops.png`) made one real image
format work end-to-end without external libraries; this module does the
same for baseline JPEG, the other format that dominates web-scale
training corpora.  Everything here is from the public JPEG standard
(ITU-T T.81): marker segments, canonical Huffman entropy coding,
zigzag + dequantization, the 8x8 type-II DCT, YCbCr (BT.601) color, and
2:1 chroma subsampling.

Scope (deliberate): baseline and extended-sequential Huffman DCT
(SOF0/SOF1), 8-bit precision, 1-component (grayscale) or 3-component
(YCbCr) images, sampling factors 1 or 2 per axis, restart intervals.
Progressive (SOF2), arithmetic coding, hierarchical, 12-bit, CMYK and
multi-scan non-interleaved files raise ``JpegError`` — at
training-pipeline scale those long-tail variants route to a quarantine
sink (``multimodal.decode_image(errors="quarantine")``) rather than a
slower universal decoder.

``encode_jpeg`` exists so tests can GENERATE real JPEGs without PIL and
round-trip them: at quality 100 the quantization tables are all ones
and the only loss is DCT rounding (a couple of gray levels), so a
round-trip asserts the whole pipeline — FDCT -> zigzag -> huffman ->
parse -> huffman -> dequant -> IDCT — within a tight tolerance.  The
encoder's Huffman tables are valid canonical tables chosen for
simplicity, not the Annex K defaults; the decoder is table-driven off
DHT, so it reads both these and standard-table files identically.

Per-block work runs as numpy matrix products inside Arrow-batched
``mapInPandas`` workers — fine for the sandbox and tests; a real
cluster swaps this module for libjpeg-turbo/libvips behind the same
interface.
"""

from __future__ import annotations

import struct

import numpy as np

# Same ceiling as the PNG decoder: dimensions are declared in the SOF
# header, so a crafted 60000x60000 header would otherwise set a
# multi-GB plane allocation before any pixel is decoded.
MAX_PIXELS = 1 << 26

SIGNATURE = b"\xff\xd8\xff"


class JpegError(ValueError):
    """Malformed, corrupt, or out-of-scope JPEG payload."""


# zigzag index -> raster index within an 8x8 block (T.81 Figure 5)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K example quantization tables (raster order), scaled by quality
# with the conventional libjpeg curve in _quant_tables.
_K1_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_K2_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Orthonormal 8-point DCT-II basis: _DCT[k, n] = a(k) cos((2n+1)k pi/16).
# FDCT of a block B is _DCT @ B @ _DCT.T; IDCT is the transpose sandwich.
_DCT = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT[_k, _n] = (np.sqrt(0.125) if _k == 0 else 0.5) * np.cos(
            (2 * _n + 1) * _k * np.pi / 16
        )


def _build_decode_table(bits: list[int], values: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman (T.81 Annex C): {(code_length, code): symbol}."""
    if len(bits) != 16 or sum(bits) != len(values):
        raise JpegError("inconsistent DHT counts")
    table: dict[tuple[int, int], int] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[idx]
            code += 1
            idx += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], values: bytes) -> dict[int, tuple[int, int]]:
    """{symbol: (code, code_length)} — inverse of _build_decode_table."""
    return {v: (c, l) for (l, c), v in _build_decode_table(bits, values).items()}


# Encoder Huffman tables: every DC category at 4 bits; AC symbols at
# 8/9 bits (a DHT count field is one byte, so 256 codes must span two
# lengths).  Kraft sums 12/16 and 2/256+254/512 make them valid
# canonical tables whose all-ones code is unused (the T.81
# requirement); they trade ~30% compression for being trivially,
# auditably correct.  The decoder never assumes them — it builds
# whatever DHT declares.
_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_VALS = bytes(range(12))
_ENC_AC_BITS = [0] * 7 + [2, 254] + [0] * 7
_ENC_AC_VALS = bytes(range(256))


class _BitReader:
    """MSB-first bit reader over de-stuffed entropy bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, nbits: int) -> int:
        while self.n < nbits:
            if self.pos >= len(self.data):
                raise JpegError("truncated entropy-coded data")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= nbits
        out = (self.acc >> self.n) & ((1 << nbits) - 1)
        self.acc &= (1 << self.n) - 1
        return out

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid huffman code in entropy stream")

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        v = self.read(s)
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _split_entropy(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """De-stuff the post-SOS entropy stream, splitting at RSTn markers.
    Returns (segments, position of the terminating marker's 0xFF)."""
    segments: list[bytes] = []
    cur = bytearray()
    n = len(data)
    while pos < n:
        b = data[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        if pos + 1 >= n:
            raise JpegError("truncated entropy-coded data")
        m = data[pos + 1]
        if m == 0x00:  # stuffed 0xFF data byte
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:  # restart marker
            segments.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # real marker (EOI or next segment) ends the scan
            segments.append(bytes(cur))
            return segments, pos
    raise JpegError("entropy-coded data ran off the end (missing EOI)")


def decode_jpeg(
    data: bytes, *, max_pixels: int = MAX_PIXELS
) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG to ``(width, height, channels, pixels)``
    with ``pixels`` row-major interleaved uint8 — the same contract as
    :func:`etl_batch_spark.llmops.png.decode_png`.  Channels is 1
    (grayscale) or 3 (RGB).  Dimensions are checked against
    ``max_pixels`` at SOF parse, before any plane allocation.  Every
    malformed-input path raises ``JpegError`` — short header fields
    must not leak raw struct/index errors to quarantine handlers."""
    try:
        return _decode_impl(data, max_pixels=max_pixels)
    except (struct.error, IndexError) as exc:
        raise JpegError(f"malformed JPEG structure: {exc}") from exc


def _decode_impl(data: bytes, *, max_pixels: int) -> tuple[int, int, int, bytes]:
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise JpegError("payload is not bytes")
    data = bytes(data)
    if not data.startswith(b"\xff\xd8"):
        raise JpegError("not a JPEG (bad SOI)")

    qtables: dict[int, np.ndarray] = {}  # id -> 64 ints, ZIGZAG order
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    restart_interval = 0
    sof = None
    pos = 2
    n = len(data)
    while True:
        if pos + 4 > n:
            raise JpegError("truncated marker segment")
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at offset {pos}")
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1  # legal fill bytes before a marker (T.81 B.1.1.2)
        marker = data[pos + 1]
        if marker == 0xD8:  # stray SOI
            raise JpegError("unexpected SOI inside stream")
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise JpegError("truncated marker segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq == 0:
                    vals, step = seg[p + 1 : p + 65], 65
                elif pq == 1:
                    vals = struct.unpack(">64H", seg[p + 1 : p + 129])
                    step = 129
                else:
                    raise JpegError(f"bad DQT precision {pq}")
                if len(vals) != 64:
                    raise JpegError("truncated DQT table")
                qtables[tq] = np.array(list(vals), dtype=np.int32)
                p += step
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                values = seg[p + 17 : p + 17 + nv]
                huff[(tc, th)] = _build_decode_table(bits, values)
                p += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1: sequential Huffman DCT
            precision, height, width, ncomp = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise JpegError(f"unsupported precision {precision} (only 8)")
            if width == 0 or height == 0:
                raise JpegError("zero dimension")
            if width * height > max_pixels:
                raise JpegError(
                    f"declared dimensions {width}x{height} exceed "
                    f"max_pixels={max_pixels}"
                )
            if ncomp not in (1, 3):
                raise JpegError(f"unsupported component count {ncomp}")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                h, v = hv >> 4, hv & 0x0F
                if ncomp == 1:
                    h = v = 1  # single-component scans are one block/MCU
                if h not in (1, 2) or v not in (1, 2):
                    raise JpegError(f"unsupported sampling factor {h}x{v}")
                comps.append({"id": cid, "h": h, "v": v, "tq": tq})
            sof = (width, height, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegError(
                f"unsupported SOF marker 0xFF{marker:02X} (progressive/"
                "arithmetic/hierarchical); baseline SOF0/SOF1 only"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            width, height, comps = sof
            if ns != len(comps):
                raise JpegError(
                    "non-interleaved multi-scan files not supported "
                    f"(scan has {ns} of {len(comps)} components)"
                )
            sel = {}
            for i in range(ns):
                cs, t = seg[1 + 2 * i : 3 + 2 * i]
                sel[cs] = (t >> 4, t & 0x0F)
            for c in comps:
                if c["id"] not in sel:
                    raise JpegError(f"scan missing component {c['id']}")
                c["td"], c["ta"] = sel[c["id"]]
            pos = pos + 2 + seglen
            break
        # APPn / COM / anything else: skip
        pos = pos + 2 + seglen

    segments, end = _split_entropy(data, pos)
    if not (end + 1 < n and data[end + 1] == 0xD9):
        # decoders conventionally tolerate a missing EOI only when the
        # scan itself is complete; we require it for loud failure
        raise JpegError("scan not terminated by EOI")

    width, height, comps = sof
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    for c in comps:
        if c["tq"] not in qtables:
            raise JpegError(f"missing quantization table {c['tq']}")
        if (0, c["td"]) not in huff or (1, c["ta"]) not in huff:
            raise JpegError("missing huffman table referenced by scan")
        c["plane"] = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)

    n_mcu = mcux * mcuy
    per_seg = restart_interval if restart_interval else n_mcu
    expected_segments = -(-n_mcu // per_seg)
    if len(segments) < expected_segments:
        raise JpegError(
            f"expected {expected_segments} restart segments, got {len(segments)}"
        )

    mcu = 0
    for seg_bytes in segments[:expected_segments]:
        reader = _BitReader(seg_bytes)
        pred = {c["id"]: 0 for c in comps}
        for _ in range(min(per_seg, n_mcu - mcu)):
            my, mx = divmod(mcu, mcux)
            for c in comps:
                dct = huff[(0, c["td"])]
                act = huff[(1, c["ta"])]
                qt = qtables[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.float64)
                        s = reader.decode_symbol(dct)
                        if s > 11:
                            raise JpegError(f"bad DC category {s}")
                        pred[c["id"]] += reader.receive_extend(s)
                        coef[0] = pred[c["id"]] * qt[0]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL: sixteen zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise JpegError("AC coefficient index overflow")
                            # qt is stored in DQT (zigzag) order, so it
                            # indexes by k while the coefficient lands at
                            # its raster position — dequant at placement
                            coef[ZIGZAG[k]] = reader.receive_extend(s) * qt[k]
                            k += 1
                        block = _DCT.T @ coef.reshape(8, 8) @ _DCT
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        c["plane"][y0 : y0 + 8, x0 : x0 + 8] = block + 128.0
            mcu += 1

    planes = []
    for c in comps:
        cw = -(-width * c["h"] // hmax)
        ch = -(-height * c["v"] // vmax)
        p = c["plane"][:ch, :cw]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes.append(p[:height, :width])

    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return width, height, 1, out.tobytes()
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return width, height, 3, out.tobytes()


class _BitWriter:
    """MSB-first bit writer with 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (code & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.out)


def _quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Annex K tables scaled by the conventional libjpeg quality curve
    (raster order).  quality=100 yields all-ones tables: near-lossless."""
    if not 1 <= quality <= 100:
        raise JpegError(f"quality {quality} outside 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    luma = np.clip((_K1_LUMA * scale + 50) // 100, 1, 255)
    chroma = np.clip((_K2_CHROMA * scale + 50) // 100, 1, 255)
    return luma.astype(np.int32), chroma.astype(np.int32)


def _encode_block(
    writer: _BitWriter,
    block: np.ndarray,
    qt_zz: np.ndarray,
    pred: int,
    dc_tab: dict[int, tuple[int, int]],
    ac_tab: dict[int, tuple[int, int]],
) -> int:
    """FDCT + quantize + entropy-encode one 8x8 block; returns new DC."""
    coef = _DCT @ (block - 128.0) @ _DCT.T
    zz = np.array([coef.flat[ZIGZAG[k]] for k in range(64)])
    q = np.round(zz / qt_zz).astype(np.int64)

    def magnitude(v: int) -> int:
        return int(v).bit_length() if v >= 0 else int(-v).bit_length()

    def extend_bits(v: int, s: int) -> int:
        return v if v >= 0 else v + (1 << s) - 1

    dc = int(q[0])
    diff = dc - pred
    s = magnitude(diff)
    code, ln = dc_tab[s]
    writer.write(code, ln)
    writer.write(extend_bits(diff, s), s)

    run = 0
    for k in range(1, 64):
        v = int(q[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        s = magnitude(v)
        code, ln = ac_tab[(run << 4) | s]
        writer.write(code, ln)
        writer.write(extend_bits(v, s), s)
        run = 0
    if run:
        code, ln = ac_tab[0x00]  # EOB
        writer.write(code, ln)
    return dc


def encode_jpeg(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    *,
    quality: int = 90,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Minimal baseline JPEG writer (tests + fixture generation).

    ``subsample``: '444' (no chroma subsampling) or '420' (2x2 luma
    sampling — exercises the decoder's upsampling path).  Grayscale
    input (channels=1) ignores ``subsample``.  ``restart_interval`` > 0
    emits DRI + RSTn markers every that many MCUs (exercises the
    decoder's restart path)."""
    if channels not in (1, 3):
        raise JpegError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise JpegError(
            f"pixel buffer {len(pixels)} != {width}*{height}*{channels}"
        )
    if subsample not in ("444", "420"):
        raise JpegError(f"unsupported subsampling {subsample!r}")

    arr = np.frombuffer(pixels, np.uint8).reshape(height, width, channels)
    arr = arr.astype(np.float64)
    luma_q, chroma_q = _quant_tables(quality)
    if channels == 1:
        planes = [arr[:, :, 0]]
        samp = [(1, 1)]
        qsel = [0]
    else:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample == "420":
            # box-average 2x2 for chroma; pad odd edges by replication
            def half(p: np.ndarray) -> np.ndarray:
                ph = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)),
                            mode="edge")
                return (ph[0::2, 0::2] + ph[1::2, 0::2]
                        + ph[0::2, 1::2] + ph[1::2, 1::2]) / 4.0

            planes = [y, half(cb), half(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qsel = [0, 1, 1]

    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    padded = []
    for p, (h, v) in zip(planes, samp):
        th, tw = mcuy * v * 8, mcux * h * 8
        padded.append(
            np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        )

    qts = [luma_q, chroma_q] if channels == 3 else [luma_q]
    qts_zz = [np.array([qt[ZIGZAG[k]] for k in range(64)]) for qt in qts]
    dc_tab = _build_encode_table(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_tab = _build_encode_table(_ENC_AC_BITS, _ENC_AC_VALS)

    out = bytearray(b"\xff\xd8")  # SOI

    def segment(marker: int, payload: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    # JFIF APP0 so sniffers classify the payload
    segment(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for i, qt in enumerate(qts):
        zz = bytes(int(qt[ZIGZAG[k]]) for k in range(64))
        segment(0xDB, bytes([i]) + zz)
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for i, (h, v) in enumerate(samp):
        sof += bytes([i + 1, (h << 4) | v, qsel[i]])
    segment(0xC0, sof)
    # one DC + one AC table, shared by every component
    segment(
        0xC4,
        bytes([0x00]) + bytes(_ENC_DC_BITS) + _ENC_DC_VALS
        + bytes([0x10]) + bytes(_ENC_AC_BITS) + _ENC_AC_VALS,
    )
    if restart_interval:
        segment(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([channels])
    for i in range(channels):
        sos += bytes([i + 1, 0x00])
    sos += b"\x00\x3f\x00"
    segment(0xDA, sos)

    writer = _BitWriter()
    pred = [0] * channels
    n_mcu = mcux * mcuy
    rst = 0
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            out.extend(writer.flush())
            out.extend(bytes([0xFF, 0xD0 + (rst % 8)]))
            rst += 1
            writer = _BitWriter()
            pred = [0] * channels
        my, mx = divmod(mcu, mcux)
        for ci, (p, (h, v)) in enumerate(zip(padded, samp)):
            for by in range(v):
                for bx in range(h):
                    y0 = (my * v + by) * 8
                    x0 = (mx * h + bx) * 8
                    pred[ci] = _encode_block(
                        writer,
                        p[y0 : y0 + 8, x0 : x0 + 8],
                        qts_zz[qsel[ci]],
                        pred[ci],
                        dc_tab,
                        ac_tab,
                    )
    out.extend(writer.flush())
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
