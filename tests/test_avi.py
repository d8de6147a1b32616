"""MJPEG AVI container: bit-exact frame payload round-trips, loud
failure on corrupt/out-of-scope payloads, and the real
sample_video_frames transform (container parse -> fps sampling ->
selective JPEG decode)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from etl_batch_spark.llmops.avi import (
    AviError,
    decode_avi_mjpeg,
    encode_avi_mjpeg,
)
from etl_batch_spark.llmops.jpeg import decode_jpeg, encode_jpeg


def _jpeg_frames(n, w=16, h=12, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8).tobytes()
        out.append(encode_jpeg(w, h, 3, px, quality=92, progressive=(i % 2 == 0)))
    return out


class TestContainer:
    def test_roundtrip_frames_bit_exact(self):
        frames = _jpeg_frames(7, seed=1)
        data = encode_avi_mjpeg(16, 12, 25.0, frames)
        w, h, fps, got = decode_avi_mjpeg(data)
        assert (w, h, fps) == (16, 12, 25.0)
        assert got == frames
        # every recovered payload is a decodable JPEG
        fw, fh, ch, _ = decode_jpeg(got[3])
        assert (fw, fh, ch) == (16, 12, 3)

    def test_odd_sized_frames_stay_word_aligned(self):
        """JPEG payloads are routinely odd-length; RIFF pads chunks to
        even offsets and the pad byte must not leak into the payload.
        Container-level test: payload lengths alternate odd/even by
        construction (frame 0 carries a JPEG SOI for the codec sniff)."""
        odd = [
            b"\xff\xd8\xd9",            # 3 bytes
            b"abcd",                     # 4
            b"\x00" * 7,                 # 7
            b"x",                        # 1
            bytes(range(10)),            # 10
        ]
        data = encode_avi_mjpeg(16, 12, 10.0, odd)
        assert decode_avi_mjpeg(data)[3] == odd

    def test_rejects_out_of_scope_codec(self):
        frames = _jpeg_frames(2, seed=3)
        data = encode_avi_mjpeg(16, 12, 30.0, frames, handler=b"H264")
        with pytest.raises(AviError, match="unsupported video codec"):
            decode_avi_mjpeg(data)

    def test_blank_handler_accepts_jpeg_frames(self):
        frames = _jpeg_frames(2, seed=4)
        data = encode_avi_mjpeg(16, 12, 30.0, frames, handler=b"\x00" * 4)
        assert decode_avi_mjpeg(data)[3] == frames

    def test_rejects_corruption_loudly(self):
        frames = _jpeg_frames(3, seed=5)
        data = encode_avi_mjpeg(16, 12, 15.0, frames)
        with pytest.raises(AviError, match="RIFF"):
            decode_avi_mjpeg(b"MKV" + data)
        with pytest.raises(AviError):
            decode_avi_mjpeg(data[:40])
        # a movi chunk size pointing past the payload end
        t = bytearray(data)
        di = data.index(b"00dc") + 4
        struct.pack_into("<I", t, di, 1 << 30)
        with pytest.raises(AviError, match="past payload end"):
            decode_avi_mjpeg(bytes(t))

    def test_missing_headers_rejected(self):
        frames = _jpeg_frames(1, seed=6)
        data = encode_avi_mjpeg(8, 8, 30.0, frames)
        hi = data.index(b"avih")
        stripped = data[:hi] + b"JUNK" + data[hi + 4 :]
        with pytest.raises(AviError, match="avih"):
            decode_avi_mjpeg(stripped)

    def test_frame_cap_enforced(self):
        frames = _jpeg_frames(4, seed=7)
        data = encode_avi_mjpeg(16, 12, 30.0, frames)
        with pytest.raises(AviError, match="max_frames"):
            decode_avi_mjpeg(data, max_frames=2)


class TestSampleVideoFrames:
    def test_samples_and_decodes_selected_frames(self, spark):
        from etl_batch_spark.llmops.multimodal import sample_video_frames

        # 12 frames at 4 fps = 3 s of video; sampling at 1 fps -> 3 rows
        frames = _jpeg_frames(12, seed=8)
        data = encode_avi_mjpeg(16, 12, 4.0, frames)
        df = spark.createDataFrame(
            [(7, bytearray(data))], "doc_id long, payload binary"
        )
        rows = sorted(
            sample_video_frames(df, fps=1.0).collect(),
            key=lambda r: r["src_frame_idx"],
        )
        assert [r["src_frame_idx"] for r in rows] == [0, 4, 8]
        assert [r["frame_ts"] for r in rows] == [0.0, 1.0, 2.0]
        for r in rows:
            assert (r["width"], r["height"]) == (16, 12)
            # feature matches an independent local decode of that frame
            fw, fh, ch, px = decode_jpeg(frames[r["src_frame_idx"]])
            arr = np.frombuffer(px, np.uint8).reshape(fh * fw, ch).astype(np.float64) / 255.0
            want = list(arr.mean(axis=0)) + list(arr.std(axis=0))
            want = [round(float(v), 6) for v in (want + [0.0] * 8)[:8]]
            assert [round(float(v), 6) for v in r["feature"]] == want

    def test_short_clip_yields_one_frame(self, spark):
        from etl_batch_spark.llmops.multimodal import sample_video_frames

        data = encode_avi_mjpeg(16, 12, 30.0, _jpeg_frames(5, seed=9))
        df = spark.createDataFrame(
            [(1, bytearray(data))], "doc_id long, payload binary"
        )
        rows = sample_video_frames(df, fps=1.0).collect()
        assert len(rows) == 1 and rows[0]["src_frame_idx"] == 0


class TestContainerProperty:
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=15, deadline=None)
    @given(st.integers(1, 12), st.integers(0, 2**32 - 1))
    def test_roundtrip_arbitrary(self, n, seed):
        frames = _jpeg_frames(n, seed=seed % 10_000)
        data = encode_avi_mjpeg(16, 12, 24.0, frames)
        assert decode_avi_mjpeg(data)[3] == frames

    @settings(max_examples=20, deadline=None)
    @given(st.binary(min_size=0, max_size=200))
    def test_garbage_never_decodes_silently(self, blob):
        with pytest.raises(AviError):
            decode_avi_mjpeg(blob)


class TestSampleVideoFramesQuarantine:
    def test_bad_payloads_survive_as_error_rows(self, spark):
        from etl_batch_spark.llmops.multimodal import sample_video_frames

        frames = _jpeg_frames(8, seed=20)
        good = encode_avi_mjpeg(16, 12, 4.0, frames)
        h264 = encode_avi_mjpeg(16, 12, 4.0, frames, handler=b"H264")
        # valid container, one frame's JPEG payload corrupted: break the
        # EOI byte (APPn bytes are skipped by the codec, markers are not)
        broken = bytearray(good)
        fi = good.index(frames[0][:16])
        broken[fi + len(frames[0]) - 1] ^= 0xFF
        rows = [
            (1, bytearray(good)),
            (2, bytearray(h264)),
            (3, bytearray(broken)),
            (4, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = sample_video_frames(df, fps=1.0, errors="quarantine").collect()
        by_id = {}
        for r in got:
            by_id.setdefault(r["doc_id"], []).append(r)
        assert len(by_id[1]) == 2 and all(r["error"] is None for r in by_id[1])
        assert len(by_id[2]) == 1 and "AviError" in by_id[2][0]["error"]
        assert by_id[2][0]["src_frame_idx"] is None
        assert len(by_id[3]) == 1 and "JpegError" in by_id[3][0]["error"]
        assert len(by_id[4]) == 1 and "NullPayload" in by_id[4][0]["error"]

    def test_raise_mode_unchanged(self, spark):
        from etl_batch_spark.llmops.multimodal import sample_video_frames

        frames = _jpeg_frames(8, seed=21)
        df = spark.createDataFrame(
            [(1, bytearray(encode_avi_mjpeg(16, 12, 4.0, frames)))],
            "doc_id long, payload binary",
        )
        rows = sample_video_frames(df, fps=1.0).collect()
        assert len(rows) == 2 and "error" not in rows[0].asDict()
