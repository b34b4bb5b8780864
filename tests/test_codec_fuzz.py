"""Codec degrade-path fuzz: corrupt bytes must NEVER fail the stage.

A corpus-scale ingest meets truncated and bit-flipped files as a
certainty; the contract of ``extract_media_stats`` is that every input
row comes back — decoded, degraded to the metadata tier, or tagged
with ``parse_error`` — and the mapInPandas task never raises.

Hypothesis drives the corruption geometry (where to cut, which bits to
flip); each example ships one batch of corrupted variants of every
container family (BMP/PNG/GIF/JPEG/WAV/AVI) through ONE Spark job.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _valid_streams() -> dict:
    """One REAL file per container family, from the repo's encoders."""
    from linkmerce_spark.operators.jpeg import encode_jpeg
    from linkmerce_spark.operators.multimodal import (
        encode_bmp,
        encode_gif,
        encode_png,
        encode_wav,
    )
    from linkmerce_spark.operators.video import encode_avi

    w, h = 8, 6
    px = [(7 * j) % 251 for j in range(w * h * 3)]
    rgb = [(5 * j) % 251 for j in range(w * h * 3)]
    samples = [(31 * i * 17) % 2048 - 1024 for i in range(64)]
    jpeg_frames = [
        encode_jpeg([(13 * f + 3 * j) % 251 for j in range(16 * 16 * 3)], 16, 16)
        for f in range(2)
    ]
    return {
        "bmp": encode_bmp(px, w, h),
        "png": encode_png(rgb, w, h),
        "gif": encode_gif([v % 251 for v in range(w * h)], w, h),
        "jpeg": encode_jpeg(rgb, w, h),
        "wav": encode_wav(samples, 8000),
        "avi": encode_avi(jpeg_frames, 16, 16),
    }


def _corrupt(data: bytes, cut_frac: float, flips: list) -> bytes:
    """Truncate to ``cut_frac`` of the length, then flip bits."""
    n = max(1, int(len(data) * cut_frac))
    buf = bytearray(data[:n])
    for off_frac, bit in flips:
        off = min(len(buf) - 1, int(len(buf) * off_frac))
        buf[off] ^= 1 << bit
    return bytes(buf)


@pytest.fixture(scope="module")
def streams():
    return _valid_streams()


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    specs=st.lists(
        st.tuples(
            st.floats(min_value=0.01, max_value=1.0),
            st.lists(
                st.tuples(
                    st.floats(min_value=0.0, max_value=0.999),
                    st.integers(min_value=0, max_value=7),
                ),
                max_size=4,
            ),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_fuzzed_streams_never_fail_the_stage(spark, streams, specs):
    from linkmerce_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_media_stats,
    )

    rows = []
    mid = 0
    for kind_name, data in streams.items():
        kind = "audio" if kind_name == "wav" else (
            "video" if kind_name == "avi" else "image"
        )
        for cut, flips in specs:
            rows.append((mid, kind, _corrupt(data, cut, flips), None, None, None, None))
            mid += 1
    out = extract_media_stats(spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()
    # the stage survived; EVERY row came back exactly once
    assert sorted(r["media_id"] for r in out) == list(range(mid))
    for r in out:
        # each row either decoded (some stat set) or is tagged; never both
        # states missing — a silent None-everything row would hide a bug
        decoded = any(
            r[c] is not None
            for c in ("format", "width", "height", "sample_rate", "mean_r", "rms")
        )
        assert decoded or r["parse_error"] is not None, r


def test_jpeg_entropy_corruption_degrades_to_metadata_tier(spark):
    """Bit flips INSIDE the entropy-coded scan (headers intact) must
    land in the `identify` tier: dimensions from the SOF walk, pixel
    means absent — not parse_error, not a crash."""
    from linkmerce_spark.operators.jpeg import encode_jpeg
    from linkmerce_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_media_stats,
    )

    w, h = 8, 8
    data = bytearray(encode_jpeg([(5 * j) % 251 for j in range(w * h * 3)], w, h))
    sos = data.find(b"\xff\xda")
    assert sos > 0
    scan_start = sos + 2 + int.from_bytes(data[sos + 2 : sos + 4], "big")
    rows = []
    for i, off in enumerate(range(scan_start + 1, min(scan_start + 9, len(data) - 2))):
        buf = bytearray(data)
        buf[off] ^= 0x55
        rows.append((i, "image", bytes(buf), None, None, None, None))
    out = extract_media_stats(spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()
    assert len(out) == len(rows)
    for r in out:
        # header walk always recovers dimensions; a corrupted scan may
        # still decode (flip landed in dead bits) but must never crash
        assert r["width"] == w and r["height"] == h, r
        assert r["parse_error"] is None, r


def test_truncated_containers_all_tagged(spark):
    """Hard truncation below any plausible header must tag, not raise."""
    from linkmerce_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_media_stats,
    )

    rows = []
    for i, (name, data) in enumerate(_valid_streams().items()):
        rows.append((i, "image", data[:7], None, None, None, None))
    out = extract_media_stats(spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()
    assert len(out) == len(rows)
    assert all(r["parse_error"] is not None for r in out)
