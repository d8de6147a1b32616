"""WebP container probe (llmops/webp.py): round trips, the three
variants' header layouts, animation timing, and hostile-input paths.
All structure from the public Google WebP Container Specification and
RFC 6386 §9.1 (VP8 keyframe header)."""

from __future__ import annotations

import random
import struct

import pytest

from etl_batch_spark.llmops.webp import WebpError, encode_webp, parse_webp


class TestRoundTrip:
    @pytest.mark.parametrize("w,h", [(1, 1), (640, 480), (16383, 16383)])
    def test_simple_lossy(self, w, h):
        i = parse_webp(encode_webp(width=w, height=h))
        assert (i.variant, i.width, i.height) == ("lossy", w, h)
        assert (i.has_alpha, i.is_animated, i.n_frames, i.duration_ms) == (
            False, False, 1, 0,
        )

    @pytest.mark.parametrize("alpha", [False, True])
    def test_simple_lossless(self, alpha):
        i = parse_webp(encode_webp(width=33, height=16384, lossless=True,
                                   alpha=alpha))
        assert (i.variant, i.width, i.height, i.has_alpha) == (
            "lossless", 33, 16384, alpha,
        )

    def test_alpha_on_lossy_promotes_to_extended(self):
        i = parse_webp(encode_webp(width=100, height=50, alpha=True))
        assert (i.variant, i.width, i.height, i.has_alpha) == (
            "extended", 100, 50, True,
        )
        assert (i.n_frames, i.duration_ms) == (1, 0)

    def test_animation_counts_frames_and_sums_durations(self):
        i = parse_webp(
            encode_webp(width=8, height=8, frame_durations_ms=[40, 60, 100])
        )
        assert (i.variant, i.is_animated, i.n_frames, i.duration_ms) == (
            "extended", True, 3, 200,
        )

    def test_metadata_flags(self):
        i = parse_webp(
            encode_webp(width=5, height=7, exif=True, icc=True, xmp=True)
        )
        assert (i.has_exif, i.has_icc, i.has_xmp) == (True, True, True)
        # icc fixture chunk is odd-sized: the word-aligned walk must
        # still find the image chunk behind it
        assert (i.variant, i.width, i.height, i.n_frames) == (
            "extended", 5, 7, 1,
        )

    def test_encoder_rejects_oversize_dims(self):
        with pytest.raises(ValueError):
            encode_webp(width=16384, height=10)  # lossy max is 16383
        encode_webp(width=16384, height=10, lossless=True)  # ok
        with pytest.raises(ValueError):
            encode_webp(width=16385, height=10, lossless=True)
        with pytest.raises(ValueError):
            encode_webp(width=4, height=4, frame_durations_ms=[1 << 24])


class TestHostileInputs:
    def test_not_riff(self):
        with pytest.raises(WebpError, match="RIFF"):
            parse_webp(b"\x89PNG\r\n\x1a\n" + bytes(8))

    def test_wrong_form(self):
        wav = b"RIFF" + struct.pack("<I", 4) + b"WAVE"
        with pytest.raises(WebpError, match="WEBP"):
            parse_webp(wav)

    def test_riff_size_overrun(self):
        b = bytearray(encode_webp(width=4, height=4))
        struct.pack_into("<I", b, 4, len(b))  # claims 8 bytes too many
        with pytest.raises(WebpError, match="declares"):
            parse_webp(bytes(b))

    def test_chunk_size_overrun(self):
        b = bytearray(encode_webp(width=4, height=4))
        struct.pack_into("<I", b, 16, 1 << 20)  # VP8 chunk size
        with pytest.raises(WebpError, match="past payload end"):
            parse_webp(bytes(b))

    def test_vp8_start_code_missing(self):
        b = bytearray(encode_webp(width=4, height=4))
        b[23] ^= 0xFF  # corrupt 0x9d 01 2a
        with pytest.raises(WebpError, match="start code"):
            parse_webp(bytes(b))

    def test_vp8_interframe_rejected(self):
        b = bytearray(encode_webp(width=4, height=4))
        b[20] |= 0x01  # frame-type bit
        with pytest.raises(WebpError, match="interframe"):
            parse_webp(bytes(b))

    def test_vp8l_bad_signature(self):
        b = bytearray(encode_webp(width=4, height=4, lossless=True))
        b[20] = 0x30
        with pytest.raises(WebpError, match="signature"):
            parse_webp(bytes(b))

    def test_vp8l_reserved_version(self):
        b = bytearray(encode_webp(width=4, height=4, lossless=True))
        b[24] |= 0xE0  # version bits 29..31 live in the last byte
        with pytest.raises(WebpError, match="reserved"):
            parse_webp(bytes(b))

    def test_anim_flag_without_anim_chunk(self):
        b = bytearray(encode_webp(width=4, height=4,
                                  frame_durations_ms=[40]))
        # blank the ANIM fourcc so the chunk is unrecognized
        pos = bytes(b).find(b"ANIM")
        b[pos:pos + 4] = b"JUNK"
        with pytest.raises(WebpError, match="no ANIM chunk"):
            parse_webp(bytes(b))

    def test_anmf_without_anim_flag(self):
        b = bytearray(encode_webp(width=4, height=4,
                                  frame_durations_ms=[40]))
        b[20] &= ~0x02  # clear the animation flag in VP8X
        with pytest.raises(WebpError, match="without the animation flag"):
            parse_webp(bytes(b))

    def test_extended_still_without_image_chunk(self):
        b = bytearray(encode_webp(width=4, height=4, exif=True))
        pos = bytes(b).find(b"VP8 ")
        b[pos:pos + 4] = b"JUNK"
        with pytest.raises(WebpError, match="no VP8 /VP8L image chunk"):
            parse_webp(bytes(b))

    def test_truncations_never_leak_foreign_errors(self):
        base = encode_webp(width=12, height=9, alpha=True, exif=True,
                           frame_durations_ms=[10, 20])
        for cut in range(len(base)):
            try:
                parse_webp(base[:cut])
            except WebpError:
                pass  # typed error is the contract

    def test_fuzz_soak_typed_errors_only(self):
        rnd = random.Random(7)
        bases = [
            encode_webp(width=320, height=200),
            encode_webp(width=64, height=48, lossless=True, alpha=True),
            encode_webp(width=40, height=30, alpha=True, icc=True,
                        frame_durations_ms=[40, 60, 90]),
        ]
        for _ in range(3000):
            b = bytearray(rnd.choice(bases))
            for _ in range(rnd.randint(1, 6)):
                b[rnd.randrange(len(b))] = rnd.randrange(256)
            try:
                parse_webp(bytes(b[: rnd.randrange(2, len(b) + 1)]))
            except WebpError:
                pass
