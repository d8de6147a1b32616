"""Pure-stdlib MJPEG-in-AVI reader/writer (the video container path).

With RIFF parsing (wav.py's container family) and a real JPEG codec
(jpeg.py) in the repo, Motion-JPEG AVI — every frame an independent
baseline/progressive JPEG inside RIFF 'movi' chunks — is the one video
format that decodes end-to-end without external libraries, and it is
exactly the capture format webcams/dashcams/microscopy rigs emit at
corpus-ingest time.  Everything here is from the public AVI RIFF
specification (Microsoft Video for Windows, 1992).

Scope (deliberate): single-video-stream AVI with an MJPG/MJPEG/mjpg
handler (or frames that are self-evidently JPEG — some writers leave
the handler blank), frame timing from the main AVI header.  Audio
streams are skipped, not decoded (route them through decode_audio on
a demuxed payload).  Other codecs (H.264/VP9/AV1...) raise ``AviError``
— at training-pipeline scale those route to quarantine, and a real
cluster swaps this module for ffmpeg behind the same interface.

Same hostile-input discipline as the other codecs: declared counts and
sizes are bounded before allocation, every malformed path raises
``AviError``, chunk walks never trust a size field past the payload
end.  Frame PAYLOADS are returned un-decoded — the caller chooses
which frames to pay JPEG decode for (that is the whole point of
fps-based sampling: a 1 fps sample of a 30 fps clip decodes 1/30th of
the frames).

``encode_avi_mjpeg`` exists so tests can generate real AVIs from
encode_jpeg frames and round-trip them bit-exactly.
"""

from __future__ import annotations

import struct

import numpy as np  # noqa: F401  (parity with sibling codec modules)

SIGNATURE = b"RIFF"
MAX_FRAMES = 1 << 20

_MJPEG_HANDLERS = (b"MJPG", b"mjpg", b"MJPA", b"dmb1")


class AviError(ValueError):
    """Malformed, corrupt, or out-of-scope AVI payload."""


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) over a RIFF chunk run,
    validating every size field against ``end``."""
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + csize > end:
            raise AviError(f"chunk {cid!r} declares {csize} bytes past payload end")
        yield cid, body, csize
        pos = body + csize + (csize & 1)  # word-aligned


def decode_avi_mjpeg(
    data: bytes, *, max_frames: int = MAX_FRAMES
) -> tuple[int, int, float, list[bytes]]:
    """Parse an MJPEG AVI to ``(width, height, fps, frames)`` where
    ``frames`` are the raw per-frame JPEG payloads in stream order
    (decode any of them with :func:`etl_batch_spark.llmops.jpeg
    .decode_jpeg`)."""
    try:
        return _decode_impl(data, max_frames=max_frames)
    except (struct.error, IndexError) as exc:
        raise AviError(f"malformed AVI structure: {exc}") from exc


def _decode_impl(
    data: bytes, *, max_frames: int
) -> tuple[int, int, float, list[bytes]]:
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise AviError("payload is not bytes")
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviError("not an AVI (bad RIFF/AVI header)")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_size)

    avih = None
    video_handler = None
    saw_video_stream = False
    frames: list[bytes] = []

    def walk_list(pos: int, stop: int, depth: int = 0) -> None:
        nonlocal avih, video_handler, saw_video_stream
        if depth > 8:  # legal AVI nests 3 deep; a crafted LIST-of-LIST
            raise AviError("RIFF list nesting too deep")  # chain cannot recurse
        for cid, body, csize in _walk_chunks(data, pos, stop):
            if cid == b"LIST":
                ltype = data[body : body + 4]
                if ltype in (b"hdrl", b"strl", b"movi", b"rec "):
                    walk_list(body + 4, body + csize, depth + 1)
            elif cid == b"avih":
                if csize < 40:
                    raise AviError("truncated avih header")
                avih = struct.unpack_from("<10I", data, body)
            elif cid == b"strh":
                if csize < 8:
                    raise AviError("truncated strh header")
                fcc_type = data[body : body + 4]
                if fcc_type == b"vids":
                    if saw_video_stream:
                        raise AviError("multiple video streams not supported")
                    saw_video_stream = True
                    video_handler = data[body + 4 : body + 8]
            elif cid[2:] in (b"dc", b"db") and cid[:2].isdigit():
                if len(frames) >= max_frames:
                    raise AviError(f"more than max_frames={max_frames} frames")
                if csize:  # writers pad streams with empty chunks; skip
                    frames.append(data[body : body + csize])

    walk_list(12, end)

    if avih is None:
        raise AviError("missing avih main header")
    if not saw_video_stream:
        raise AviError("no video stream (strh fccType 'vids')")
    us_per_frame, _maxbps, _pad, _flags, _total, _init, _streams, _buf, width, height = avih
    if width == 0 or height == 0:
        raise AviError("zero dimension in avih")
    if us_per_frame == 0:
        raise AviError("zero frame interval in avih")
    if not frames:
        raise AviError("no video frame chunks in movi")
    handler_ok = video_handler in _MJPEG_HANDLERS
    jpeg_ok = frames[0].startswith(b"\xff\xd8")
    if not (handler_ok or (video_handler in (b"\x00" * 4, b"    ") and jpeg_ok)):
        raise AviError(
            f"unsupported video codec {video_handler!r} (H.264/VP9/... need "
            "ffmpeg); MJPEG only"
        )
    if not jpeg_ok:
        raise AviError("MJPEG frame does not start with a JPEG SOI")
    return width, height, 1e6 / us_per_frame, frames


def encode_avi_mjpeg(
    width: int,
    height: int,
    fps: float,
    frames: list[bytes],
    *,
    handler: bytes = b"MJPG",
) -> bytes:
    """Minimal MJPEG AVI writer (tests + fixture generation): one video
    stream, JPEG payloads as 00dc chunks."""
    if not frames:
        raise AviError("need at least one frame")
    if fps <= 0:
        raise AviError("fps must be positive")
    us_per_frame = int(round(1e6 / fps))

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<10I4I", us_per_frame, 0, 0, 0, len(frames), 0, 1, 0, width, height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + handler
        + struct.pack("<IHHIIIIIIII4H", 0, 0, 0, 0, 1, int(round(fps)), 0,
                      len(frames), 0, 0, 0, 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
