"""GIF codec: lossless palette-index round-trips (plain + interlaced +
transparent), an independently hand-assembled bitstream, LZW
dictionary-reset coverage, loud failure on corrupt payloads, and the
real decode_image dispatch."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from etl_batch_spark.llmops.gif import (
    GifError,
    decode_gif,
    encode_gif,
)


def _palette(n, seed=0):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    # distinct rows so index->RGB->index is unambiguous in assertions
    pal[:, 0] = (np.arange(n) * 7 + 3) % 256
    return pal


def _rand_indices(w, h, n_colors, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, n_colors, (h, w), dtype=np.uint8)


def _decode_rgb(data):
    w, h, ch, px, n_frames = decode_gif(data)
    return np.frombuffer(px, np.uint8).reshape(h, w, ch), n_frames


class TestCodec:
    def test_decodes_independently_built_gif(self):
        """A 2x2 GIF assembled byte-by-byte with LZW codes computed BY
        HAND: palette (red, green), indices [0,1,1,0].  min_code=2 ->
        clear=4, end=5, width starts at 3.  Codes: CLEAR(3b) 0(3b)
        1(3b) 1(3b) — the third data code's table append fills slot 7,
        so the width bumps to 4 — then 0(4b) END(4b).  Packed LSB-first
        that is bytes 0x44 0x02 0x05 (final partial byte zero-padded)."""
        data = (
            b"GIF89a"
            + struct.pack("<HHBBB", 2, 2, 0x80, 0, 0)  # GCT, 2 entries
            + bytes([255, 0, 0, 0, 255, 0])
            + b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
            + bytes([2])  # LZW min code size
            + bytes([3, 0x44, 0x02, 0x05])  # one 3-byte sub-block
            + b"\x00\x3b"
        )
        got, n_frames = _decode_rgb(data)
        assert n_frames == 1
        want = np.array(
            [[[255, 0, 0], [0, 255, 0]], [[0, 255, 0], [255, 0, 0]]], np.uint8
        )
        assert np.array_equal(got, want)

    @pytest.mark.parametrize("n_colors", [2, 5, 16, 200])
    def test_roundtrip_is_lossless(self, n_colors):
        pal = _palette(n_colors, seed=n_colors)
        idx = _rand_indices(31, 17, n_colors, seed=n_colors)
        data = encode_gif(31, 17, idx.tobytes(), pal)
        got, n_frames = _decode_rgb(data)
        assert n_frames == 1
        assert np.array_equal(got, pal[idx])

    def test_roundtrip_interlaced(self):
        pal = _palette(8, seed=3)
        idx = _rand_indices(23, 19, 8, seed=3)
        data = encode_gif(23, 19, idx.tobytes(), pal, interlace=True)
        plain = encode_gif(23, 19, idx.tobytes(), pal)
        assert np.array_equal(_decode_rgb(data)[0], _decode_rgb(plain)[0])

    def test_transparency_yields_rgba(self):
        pal = _palette(4, seed=5)
        idx = _rand_indices(9, 7, 4, seed=5)
        data = encode_gif(9, 7, idx.tobytes(), pal, transparent=2)
        w, h, ch, px, _ = decode_gif(data)
        assert ch == 4
        got = np.frombuffer(px, np.uint8).reshape(h, w, 4)
        assert np.array_equal(got[:, :, :3], pal[idx])
        assert np.array_equal(got[:, :, 3] == 0, idx == 2)

    def test_lzw_dictionary_reset_roundtrip(self):
        """Enough high-entropy indices to overflow the 4096-entry LZW
        dictionary, forcing the encoder's mid-stream CLEAR + reset and
        the decoder's table rebuild."""
        pal = _palette(256, seed=8)
        idx = _rand_indices(200, 150, 256, seed=8)
        data = encode_gif(200, 150, idx.tobytes(), pal)
        got, _ = _decode_rgb(data)
        assert np.array_equal(got, pal[idx])

    def test_multi_frame_counts_but_decodes_first(self):
        pal = _palette(4, seed=11)
        a = _rand_indices(6, 5, 4, seed=11)
        b = _rand_indices(6, 5, 4, seed=12)
        one = encode_gif(6, 5, a.tobytes(), pal)
        two = encode_gif(6, 5, b.tobytes(), pal)
        # splice frame 2's image descriptor block (header 13 + GCT 12
        # bytes in, through its sub-block terminator) before frame 1's
        # trailer
        desc = 13 + 3 * 4
        assert two[desc] == 0x2C
        spliced = one[:-1] + two[desc:-1] + b"\x3b"
        got, n_frames = _decode_rgb(spliced)
        assert n_frames == 2
        assert np.array_equal(got, pal[a])  # FIRST frame wins

    def test_rejects_corruption_loudly(self):
        pal = _palette(8, seed=2)
        data = encode_gif(16, 16, _rand_indices(16, 16, 8, seed=2).tobytes(), pal)
        with pytest.raises(GifError):
            decode_gif(data[:20])  # truncated in the color table
        with pytest.raises(GifError, match="trailer|sub-block"):
            decode_gif(data[:-2])  # trailer stripped
        with pytest.raises(GifError, match="signature"):
            decode_gif(b"PNG" + data)
        # LZW stream shortened below the pixel count
        t = bytearray(data)
        di = data.index(b"\x2c")
        sub = di + 11  # first sub-block length byte
        with pytest.raises(GifError):
            decode_gif(bytes(t[: sub + 3]) + b"\x00\x3b")

    def test_hostile_dimensions_rejected_before_allocation(self):
        pal = _palette(2, seed=4)
        data = bytearray(encode_gif(4, 4, _rand_indices(4, 4, 2, seed=4).tobytes(), pal))
        di = bytes(data).index(b"\x2c")
        struct.pack_into("<HH", data, di + 5, 60000, 60000)
        with pytest.raises(GifError, match="max_pixels"):
            decode_gif(bytes(data))

    def test_index_outside_palette_rejected(self):
        """A 4-color global table with an LZW stream whose indices reach
        into the padded region of the power-of-two table is fine; one
        referencing past the table is not."""
        pal = _palette(3, seed=6)  # pads to 4 entries
        idx = np.full((4, 4), 2, np.uint8)
        data = encode_gif(4, 4, idx.tobytes(), pal)
        assert np.array_equal(_decode_rgb(data)[0], pal[idx])
        with pytest.raises(GifError, match="outside palette"):
            encode_gif(4, 4, np.full(16, 3, np.uint8).tobytes(), pal)


class TestDecodeImageReal:
    def test_gif_payload_decodes_via_dispatch(self, spark):
        from etl_batch_spark.llmops.multimodal import decode_image

        pal = _palette(16, seed=21)
        idx = _rand_indices(12, 9, 16, seed=21)
        data = encode_gif(12, 9, idx.tobytes(), pal)
        df = spark.createDataFrame(
            [(1, bytearray(data))], "doc_id long, payload binary"
        )
        r = decode_image(df, fake=False).collect()[0]
        assert (r["width"], r["height"], r["n_pixels"]) == (12, 9, 108)
        want = pal[idx].reshape(-1, 3).astype(np.float64) / 255.0
        feat = list(want.mean(axis=0)) + list(want.std(axis=0))
        feat = [round(float(v), 6) for v in (feat + [0.0] * 8)[:8]]
        assert [round(float(v), 6) for v in r["feature"]] == feat


class TestCodecProperty:
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(1, 24),
        st.integers(1, 24),
        st.integers(2, 256),
        st.integers(0, 2**32 - 1),
        st.booleans(),
    )
    def test_roundtrip_arbitrary(self, w, h, n_colors, seed, interlace):
        pal = _palette(n_colors, seed=seed % 1000)
        idx = _rand_indices(w, h, n_colors, seed=seed)
        data = encode_gif(w, h, idx.tobytes(), pal, interlace=interlace)
        got, _ = _decode_rgb(data)
        assert np.array_equal(got, pal[idx])

    @settings(max_examples=20, deadline=None)
    @given(st.binary(min_size=0, max_size=200))
    def test_garbage_never_decodes_silently(self, blob):
        with pytest.raises(GifError):
            decode_gif(blob)
