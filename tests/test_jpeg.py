"""Baseline JPEG codec: round-trips within quantization error, an
independently hand-assembled bitstream, subsampling/restart paths, loud
failure on corrupt/out-of-scope payloads, and the real decode_image
dispatch."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from etl_batch_spark.llmops.jpeg import (
    _ENC_AC_BITS,
    _ENC_AC_VALS,
    _ENC_DC_BITS,
    _ENC_DC_VALS,
    JpegError,
    decode_jpeg,
    encode_jpeg,
)


def _rand_pixels(w, h, ch, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, ch), dtype=np.uint8)


def _decode_arr(data):
    w, h, ch, px = decode_jpeg(data)
    return np.frombuffer(px, np.uint8).reshape(h, w, ch).astype(np.int64)


def _max_err(data, want):
    got = _decode_arr(data)
    assert got.shape == want.shape
    return int(np.abs(got - want.astype(np.int64)).max())


class TestCodec:
    def test_decodes_independently_built_jpeg(self):
        """An 8x8 grayscale DC-only JPEG assembled byte-by-byte from the
        T.81 spec (canonical huffman codes and the orthonormal DCT DC
        gain computed BY HAND, not via encode_jpeg), so a shared
        encoder/decoder bug cannot cancel out.  Quant table all ones;
        quantized DC = 16 -> every pixel = 16/8 + 128 = 130 exactly.

        Entropy bits: DC category 5 is canonical 4-bit code 0101 (12
        categories at 4 bits); value 16 appends its 5 magnitude bits
        10000; EOB is AC symbol 0x00 = the first 8-bit code 00000000.
        0101 10000 00000000 + 1-padding = bytes 58 00 7F."""

        def seg(marker, payload):
            return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

        data = (
            b"\xff\xd8"
            + seg(0xDB, bytes([0]) + bytes([1] * 64))
            + seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
            + seg(
                0xC4,
                bytes([0x00]) + bytes(_ENC_DC_BITS) + _ENC_DC_VALS
                + bytes([0x10]) + bytes(_ENC_AC_BITS) + _ENC_AC_VALS,
            )
            + seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
            + bytes([0x58, 0x00, 0x7F])
            + b"\xff\xd9"
        )
        w, h, ch, px = decode_jpeg(data)
        assert (w, h, ch) == (8, 8, 1)
        assert px == bytes([130] * 64)

    @pytest.mark.parametrize("channels", [1, 3])
    def test_roundtrip_q100_within_dct_rounding(self, channels):
        """quality=100 makes every quantization step 1, so the ONLY loss
        is DCT arithmetic rounding — a couple of gray levels.  Any
        zigzag, huffman, dequant or IDCT defect explodes this bound."""
        want = _rand_pixels(17, 24, channels, seed=channels)
        data = encode_jpeg(17, 24, channels, want.tobytes(), quality=100)
        assert _max_err(data, want) <= 3

    def test_roundtrip_420_subsampled(self):
        """2x2 chroma subsampling: luma survives nearly exactly; chroma
        is box-averaged + nearest-upsampled, so assert on a smooth
        gradient where the subsampling error is a few levels."""
        yy, xx = np.mgrid[0:32, 0:33]
        want = np.stack(
            [(yy * 3) % 256, (xx * 5) % 256, ((yy + xx) * 2) % 256], axis=-1
        ).astype(np.uint8)
        data = encode_jpeg(33, 32, 3, want.tobytes(), quality=90, subsample="420")
        assert _max_err(data, want) <= 16

    def test_roundtrip_restart_intervals(self):
        want = _rand_pixels(33, 18, 3, seed=5)
        data = encode_jpeg(33, 18, 3, want.tobytes(), quality=100,
                           restart_interval=2)
        assert b"\xff\xd0" in data or b"\xff\xd1" in data  # RSTn present
        assert _max_err(data, want) <= 3

    def test_roundtrip_degenerate_shapes(self):
        # exercises right/bottom edge padding and single-MCU images
        for w, h in [(1, 1), (5, 1), (1, 5), (8, 8), (9, 9)]:
            want = _rand_pixels(w, h, 1, seed=w * 31 + h)
            data = encode_jpeg(w, h, 1, want.tobytes(), quality=100)
            assert _max_err(data, want) <= 3, (w, h)

    def test_flat_color_is_near_exact_at_any_quality(self):
        want = np.full((16, 16, 3), [200, 64, 30], dtype=np.uint8)
        for q in (50, 90, 100):
            data = encode_jpeg(16, 16, 3, want.tobytes(), quality=q)
            # DC-only content: error is one color-convert rounding step
            assert _max_err(data, want) <= 2, q

    def test_fill_bytes_before_marker_tolerated(self):
        want = _rand_pixels(8, 8, 1, seed=3)
        data = encode_jpeg(8, 8, 1, want.tobytes(), quality=100)
        # splice legal 0xFF fill bytes before the SOF marker
        sof = data.index(b"\xff\xc0")
        padded = data[:sof] + b"\xff\xff\xff" + data[sof:]
        assert _max_err(padded, want) <= 3

    def test_rejects_out_of_scope_variants(self):
        want = _rand_pixels(8, 8, 1, seed=1)
        data = encode_jpeg(8, 8, 1, want.tobytes())
        arithmetic = data.replace(b"\xff\xc0", b"\xff\xc9", 1)
        with pytest.raises(JpegError, match="arithmetic"):
            decode_jpeg(arithmetic)
        with pytest.raises(JpegError, match="SOI"):
            decode_jpeg(b"GIF89a" + data)
        # SOF2 with a full-band sequential scan header violates the
        # Annex G scan protocol (a progressive DC scan must have Se=0)
        mislabeled = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
        with pytest.raises(JpegError, match="Se=0"):
            decode_jpeg(mislabeled)

    def test_rejects_corruption_loudly(self):
        want = _rand_pixels(16, 16, 3, seed=2)
        data = encode_jpeg(16, 16, 3, want.tobytes())
        with pytest.raises(JpegError):
            decode_jpeg(data[:40])  # truncated in the headers
        with pytest.raises(JpegError):
            decode_jpeg(data[:-20])  # truncated entropy data / no EOI
        with pytest.raises(JpegError, match="EOI"):
            decode_jpeg(data[:-2])  # EOI stripped

    def test_hostile_sof_dimensions_rejected_before_allocation(self):
        want = _rand_pixels(8, 8, 1, seed=4)
        data = bytearray(encode_jpeg(8, 8, 1, want.tobytes()))
        sof = data.index(b"\xff\xc0")
        # SOF payload: len(2) precision(1) H(2) W(2) — claim 60000x60000
        struct.pack_into(">HH", data, sof + 5, 60000, 60000)
        with pytest.raises(JpegError, match="exceed max_pixels"):
            decode_jpeg(bytes(data))

    def test_rejects_scan_missing_tables(self):
        want = _rand_pixels(8, 8, 1, seed=6)
        data = encode_jpeg(8, 8, 1, want.tobytes())
        dqt = data.index(b"\xff\xdb")
        (dqt_len,) = struct.unpack(">H", data[dqt + 2 : dqt + 4])
        stripped = data[:dqt] + data[dqt + 2 + dqt_len :]
        with pytest.raises(JpegError, match="quantization table"):
            decode_jpeg(stripped)


class TestProgressive:
    """SOF2 spectral-selection + successive-approximation decoding.

    The strongest property available without an external codec: the
    progressive scan script reconstructs every quantized coefficient
    EXACTLY (point-transformed first scans + one-bit refinement scans),
    so a progressive encoding must decode to pixels BIT-IDENTICAL to
    the sequential encoding of the same input at the same quality."""

    @pytest.mark.parametrize(
        "w,h,ch,sub,ri",
        [
            (17, 24, 1, "444", 0),   # grayscale, partial edge blocks
            (17, 24, 3, "444", 0),   # color, no subsampling
            (33, 32, 3, "420", 0),   # 2x2 subsampling: luma sb-grid != padded grid
            (9, 9, 3, "444", 2),     # restart markers inside every scan
            (33, 18, 3, "420", 3),   # subsampling + restarts
            (1, 1, 1, "444", 0),     # single pixel
            (8, 16, 1, "444", 1),    # restart interval of one block
        ],
    )
    def test_progressive_matches_sequential_bitwise(self, w, h, ch, sub, ri):
        want = _rand_pixels(w, h, ch, seed=w * 131 + h * 7 + ch)
        kw = dict(quality=90, subsample=sub, restart_interval=ri)
        seq = _decode_arr(encode_jpeg(w, h, ch, want.tobytes(), **kw))
        pro = _decode_arr(
            encode_jpeg(w, h, ch, want.tobytes(), progressive=True, **kw)
        )
        assert np.array_equal(seq, pro)

    @pytest.mark.parametrize("channels", [1, 3])
    def test_progressive_roundtrip_q100(self, channels):
        want = _rand_pixels(19, 13, channels, seed=channels + 40)
        data = encode_jpeg(
            19, 13, channels, want.tobytes(), quality=100, progressive=True
        )
        assert _max_err(data, want) <= 3

    def test_truncated_scan_script_decodes_coarsely(self):
        """A progressive stream cut after the DC scans (EOI re-appended)
        is a legal coarse image: the DC average survives, the AC detail
        is zero.  This is the progressive format's core affordance and
        exercises the scans-complete-at-EOI path."""
        want = np.full((16, 16, 3), [90, 160, 40], np.uint8)
        data = encode_jpeg(16, 16, 3, want.tobytes(), quality=100,
                           progressive=True)
        # SOS offsets: scan 3 starts the per-component AC scans
        sos = [i for i in range(len(data) - 1)
               if data[i] == 0xFF and data[i + 1] == 0xDA]
        assert len(sos) == 8  # 2 DC scans + 3 AC first + 3 AC refine
        coarse = _decode_arr(data[: sos[2]] + b"\xff\xd9")
        # flat color is pure DC: even the DC-only prefix is near-exact
        assert int(np.abs(coarse.astype(int) - want.astype(int)).max()) <= 2

    def test_ac_scan_before_dc_rejected(self):
        data = encode_jpeg(8, 8, 1, _rand_pixels(8, 8, 1).tobytes(),
                           progressive=True)
        sos = [i for i in range(len(data) - 1)
               if data[i] == 0xFF and data[i + 1] == 0xDA]
        # drop both DC scans so the AC-first scan arrives first
        headless = data[: sos[0]] + data[sos[2] :]
        with pytest.raises(JpegError, match="before its DC scan"):
            decode_jpeg(headless)

    def test_sequential_multi_scan_non_interleaved(self):
        """SOF0 files may also split components across scans (T.81
        allows any partition); hand-assembled like the baseline
        known-answer test: three one-component full-band scans, DC-only
        blocks, quant all ones.  Y DC=16 -> 130; Cb/Cr DC=0 -> 128 ->
        every output pixel exactly (130, 130, 130)."""

        def seg(marker, payload):
            return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

        dht = seg(
            0xC4,
            bytes([0x00]) + bytes(_ENC_DC_BITS) + _ENC_DC_VALS
            + bytes([0x10]) + bytes(_ENC_AC_BITS) + _ENC_AC_VALS,
        )
        sof = seg(
            0xC0,
            struct.pack(">BHHB", 8, 8, 8, 3)
            + bytes([1, 0x11, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0]),
        )
        # Y: DC cat5 (0101) + 10000, EOB (00000000), 1-padded
        y_scan = seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00") + bytes(
            [0x58, 0x00, 0x7F]
        )
        # Cb/Cr: DC cat0 (0000), EOB (00000000), 1-padded -> 00 0F
        c_scan = lambda cid: seg(  # noqa: E731
            0xDA, bytes([1, cid, 0x00]) + b"\x00\x3f\x00"
        ) + bytes([0x00, 0x0F])
        data = (
            b"\xff\xd8"
            + seg(0xDB, bytes([0]) + bytes([1] * 64))
            + sof + dht
            + y_scan + c_scan(2) + c_scan(3)
            + b"\xff\xd9"
        )
        w, h, ch, px = decode_jpeg(data)
        assert (w, h, ch) == (8, 8, 3)
        assert px == bytes([130, 130, 130] * 64)

    def test_scanless_stream_rejected(self):
        want = _rand_pixels(8, 8, 3, seed=7)
        data = encode_jpeg(8, 8, 3, want.tobytes(), progressive=True)
        sos = data.index(b"\xff\xda")
        with pytest.raises(JpegError, match="no scan before EOI"):
            decode_jpeg(data[:sos] + b"\xff\xd9")


class TestEncoderValidation:
    def test_rejects_bad_inputs(self):
        with pytest.raises(JpegError, match="channel count"):
            encode_jpeg(2, 2, 2, bytes(8))
        with pytest.raises(JpegError, match="pixel buffer"):
            encode_jpeg(2, 2, 1, bytes(3))
        with pytest.raises(JpegError, match="quality"):
            encode_jpeg(2, 2, 1, bytes(4), quality=0)
        with pytest.raises(JpegError, match="subsampling"):
            encode_jpeg(2, 2, 3, bytes(12), subsample="422")


class TestDecodeImageReal:
    def test_real_jpeg_payloads_decode(self, spark):
        """decode_image(fake=False) dispatches JPEG payloads by
        signature: exact dims/n_pixels, and the feature recomputed from
        an independent local decode of the same payload."""
        from etl_batch_spark.llmops.multimodal import decode_image

        payloads = {}
        rows = []
        for doc_id, (w, h, ch, sub, prog) in enumerate(
            [(16, 9, 3, "444", False), (7, 7, 1, "444", False),
             (12, 10, 3, "420", False), (11, 6, 3, "444", True)]
        ):
            px = _rand_pixels(w, h, ch, seed=doc_id).tobytes()
            data = encode_jpeg(w, h, ch, px, quality=95,
                               subsample=sub if ch == 3 else "444",
                               progressive=prog)
            rows.append((doc_id, bytearray(data)))
            payloads[doc_id] = (w, h, ch, data)
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {r["doc_id"]: r for r in decode_image(df, fake=False).collect()}
        assert len(got) == 4
        for doc_id, (w, h, ch, data) in payloads.items():
            r = got[doc_id]
            assert (r["width"], r["height"]) == (w, h)
            assert r["n_pixels"] == w * h
            _, _, dch, dpx = decode_jpeg(data)
            arr = np.frombuffer(dpx, np.uint8).reshape(h * w, dch).astype(np.float64) / 255.0
            want = list(arr.mean(axis=0)) + list(arr.std(axis=0))
            want = [round(float(v), 6) for v in (want + [0.0] * 8)[:8]]
            assert [round(float(v), 6) for v in r["feature"]] == want

    def test_mixed_png_and_jpeg_batch(self, spark):
        """One decode pass handles both formats side by side — the
        dispatch is per payload, not per job."""
        from etl_batch_spark.llmops.multimodal import decode_image
        from etl_batch_spark.llmops.png import encode_png

        px = _rand_pixels(6, 4, 3, seed=9).tobytes()
        rows = [
            (1, bytearray(encode_png(6, 4, 3, px))),
            (2, bytearray(encode_jpeg(6, 4, 3, px, quality=100))),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {r["doc_id"]: r for r in decode_image(df, fake=False).collect()}
        assert (got[1]["width"], got[1]["height"]) == (6, 4)
        assert (got[2]["width"], got[2]["height"]) == (6, 4)


class TestCodecProperty:
    """Round-trip and loud-failure hold for arbitrary content (no
    Spark; pure codec)."""

    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(1, 20),             # width
        st.integers(1, 20),             # height
        st.sampled_from([1, 3]),        # channels
        st.integers(0, 2**32 - 1),      # pixel seed
    )
    def test_roundtrip_arbitrary_q100(self, w, h, ch, seed):
        want = _rand_pixels(w, h, ch, seed=seed)
        data = encode_jpeg(w, h, ch, want.tobytes(), quality=100)
        assert _max_err(data, want) <= 3

    @settings(max_examples=20, deadline=None)
    @given(st.binary(min_size=0, max_size=200))
    def test_garbage_never_decodes_silently(self, blob):
        """Arbitrary bytes raise JpegError specifically — never
        fabricated pixels, never a raw struct/numpy error leaking
        through."""
        with pytest.raises(JpegError):
            decode_jpeg(blob)
