"""MJPEG-in-AVI video: a REAL container walk + frame-sampled decode.

Makes the ``kind='video'`` column of the media contract real with
zero dependencies: ``encode_avi`` writes a spec-true RIFF AVI
(``hdrl``/``avih``/``strl``/``strh``/``strf``/``movi``/``idx1``)
whose stream is Motion-JPEG — each ``00dc`` chunk is a complete
baseline JPEG produced by ``operators/jpeg.py`` — and ``decode_avi``
walks the chunks back, decodes every ``frame_stride``-th frame
through the full JPEG pipeline, and averages per-channel pixel means
over the sampled frames.

Frame sampling is the point: a 100 TB video-ingest stage never
decodes every frame — it samples k-th frames for features/dedup and
reads duration/dimensions from the header alone. Both tiers are here:
``decode_avi(content, frame_stride=n)`` is the sampled decode;
header fields (dimensions, frame count, duration) come from ``avih``
without touching any frame.

Exactness: a solid-color frame decodes to integer channel values
(operators/jpeg.py's closed-form chain), and the mean over sampled
frames is an exact integer-sum / count double — so the DuckDB twin
reproduces video rows bit-for-bit from the generating formulas.

Like the other codecs this is the imperative tier, running inside the
same Arrow ``mapInPandas`` kernel as BMP/PNG/GIF/JPEG/WAV
(``extract_media_stats``); malformed containers degrade to
``parse_error`` rows, never task failures.

Reference parity: the reference repo has no media pipeline — this
extends the engine along the training-data-pipeline axis the build
brief names (frame-sample as a first-class decode operation).
"""

from __future__ import annotations

import struct

from linkmerce_spark.operators.jpeg import decode_jpeg, encode_jpeg

__all__ = ["decode_avi", "encode_avi"]


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(listtype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", listtype + payload)


def encode_avi(
    frames: list,
    width: int,
    height: int,
    usec_per_frame: int = 100000,
) -> bytes:
    """Build a REAL AVI file whose video stream is Motion-JPEG.

    ``frames``: complete JPEG byte strings (one per frame). Writes the
    full header path a standards-conforming reader needs: ``avih``
    main header, one ``strl`` with ``strh`` (fccType ``vids``, handler
    ``MJPG``, rate/scale from ``usec_per_frame``) and ``strf``
    (BITMAPINFOHEADER, biCompression ``MJPG``), the ``movi`` payload
    as ``00dc`` chunks, and an ``idx1`` keyframe index."""
    n = len(frames)
    max_bytes = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec_per_frame,          # dwMicroSecPerFrame
        max_bytes * 1_000_000 // max(usec_per_frame, 1),  # dwMaxBytesPerSec
        0,                       # dwPaddingGranularity
        0x10,                    # dwFlags: AVIF_HASINDEX
        n,                       # dwTotalFrames
        0,                       # dwInitialFrames
        1,                       # dwStreams
        max_bytes,               # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,              # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIII",
            0,                   # dwFlags
            0, 0,                # priority, language
            0,                   # dwInitialFrames
            usec_per_frame,      # dwScale
            1_000_000,           # dwRate (rate/scale = fps)
            0,                   # dwStart
            n,                   # dwLength (frames)
            max_bytes,           # dwSuggestedBufferSize
            0xFFFFFFFF,          # dwQuality (default)
            0,                   # dwSampleSize (0: varies)
            0,                   # rcFrame (packed 4x16 = 8 bytes -> two I)
        )
        + struct.pack("<I", (height << 16) | width)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,                      # biSize
        width,
        height,
        1,                       # biPlanes
        24,                      # biBitCount
        b"MJPG",                 # biCompression
        width * height * 3,      # biSizeImage
        0, 0, 0, 0,              # resolutions, clrUsed, clrImportant
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"movi"
    offsets = []
    for f in frames:
        offsets.append(len(movi_payload))
        movi_payload += _chunk(b"00dc", f)
    movi = _chunk(b"LIST", movi_payload)
    idx = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, len(frames[i]))
        for i, off in enumerate(offsets)
    )
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(content: bytes, frame_stride: int = 1, want_pixels: bool = False) -> dict:
    """Walk a RIFF AVI, decode every ``frame_stride``-th MJPEG frame,
    average channel means over the sampled frames.

    Header fields (dimensions, duration, frame count) come from
    ``avih`` alone; only sampled ``00dc`` chunks enter the JPEG
    decoder — the k-th-frame sampling discipline of a real ingest.
    ``want_pixels`` adds ``pixels``: the FIRST sampled frame's flat
    [r,g,b,...] ints (the standard video-thumbnail source)."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    if frame_stride < 1:
        raise ValueError("frame_stride must be >= 1")
    avih = None
    frames = []

    def walk(data: bytes) -> None:
        nonlocal avih
        pos = 0
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            payload = data[pos + 8 : pos + 8 + size]
            if cid == b"LIST":
                walk(payload[4:])
            elif cid == b"avih":
                avih = struct.unpack("<IIIIIIIIII", payload[:40])
            elif cid == b"00dc":
                frames.append(payload)
            pos += 8 + size + (size % 2)

    walk(content[12:])
    if avih is None:
        raise ValueError("missing avih header")
    usec_per_frame, total_frames = avih[0], avih[4]
    width, height = avih[8], avih[9]
    if total_frames != len(frames):
        raise ValueError(
            f"header declares {total_frames} frames, movi has {len(frames)}"
        )
    sampled = frames[::frame_stride]
    sums = [0.0, 0.0, 0.0]
    pixels = None
    for i, f in enumerate(sampled):
        d = decode_jpeg(f, want_pixels=want_pixels and i == 0)
        if i == 0 and want_pixels:
            pixels = d["pixels"]
        sums[0] += d["mean_b"]
        sums[1] += d["mean_g"]
        sums[2] += d["mean_r"]
    k = len(sampled)
    out = {
        "format": "avi",
        "width": width,
        "height": height,
        "channels": 3,
        "duration_ms": total_frames * usec_per_frame // 1000,
        "mean_b": sums[0] / k if k else None,
        "mean_g": sums[1] / k if k else None,
        "mean_r": sums[2] / k if k else None,
    }
    if want_pixels:
        out["pixels"] = pixels
    return out


def encode_solid_mjpeg_avi(
    media_id: int, width: int, height: int, n_frames: int
) -> bytes:
    """The fixture generator: frame ``f`` is a solid-color JPEG with
    r=``(id*7+19f)%251``, g=``(id*11+23f)%251``, b=``(id*13+29f)%251``
    — per-frame closed-form means, so the container + sampling layer
    is hash-gated by the same oracle discipline as the still images."""
    frames = [
        encode_jpeg(
            [
                (media_id * 7 + 19 * f) % 251,
                (media_id * 11 + 23 * f) % 251,
                (media_id * 13 + 29 * f) % 251,
            ]
            * (width * height),
            width,
            height,
            3,
        )
        for f in range(n_frames)
    ]
    return encode_avi(frames, width, height, usec_per_frame=100000)
