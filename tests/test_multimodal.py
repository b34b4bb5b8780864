"""Multimodal column plumbing: schema, mapInPandas batching, stub decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linkmerce_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    attach_media_metadata,
    decode_media_features,
)


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", bytes([i % 251 for i in range(400)]), "image/png", 20, 20, None),
        (2, "audio", b"RIFF....fakewav", "audio/wav", None, None, 1500),
        (3, "image", None, "image/png", None, None, None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_metadata_stays_jvm_side(media):
    out = attach_media_metadata(media)
    got = {r["media_id"]: (r["n_bytes"], r["content_md5"]) for r in out.collect()}
    assert got[1][0] == 400 and got[2][0] == 15
    assert got[3] == (None, None)


def test_stub_decode_shape_and_determinism(media):
    out = decode_media_features(media, batch_hint=2)
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(out.columns) == {"media_id", "kind", "n_bytes", "features"}
    assert len(rows[1]["features"]) == 16
    assert all(0.0 <= v <= 1.0 for v in rows[1]["features"])
    assert rows[3]["features"] == [0.0] * 16  # null content -> zero vector
    # determinism: second run produces identical vectors
    again = {r["media_id"]: r["features"] for r in decode_media_features(media).collect()}
    assert again[1] == rows[1]["features"]


def test_real_decode_path_is_explicitly_stubbed(media):
    with pytest.raises(Exception, match="NotImplementedError|decode_stub"):
        decode_media_features(media, decode_stub=False).collect()


def test_features_feed_similarity_ops(media, spark):
    from linkmerce_spark.functions.vectors import vec_cosine

    feats = decode_media_features(media).select(
        "media_id", F.col("features").alias("embedding")
    )
    a = feats.select(F.col("media_id").alias("id_a"), F.col("embedding").alias("va"))
    b = feats.select(F.col("media_id").alias("id_b"), F.col("embedding").alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b")).select(
        "id_a", "id_b", vec_cosine("va", "vb").alias("cos")
    )
    got = pairs.collect()
    assert len(got) == 3
    for r in got:
        if 3 in (r["id_a"], r["id_b"]):
            assert r["cos"] is None  # zero vector -> null cosine
        else:
            assert -1.0 <= r["cos"] <= 1.0


# ---------------------------------------------------------------- real codecs
def test_bmp_roundtrip_exact():
    from linkmerce_spark.operators.multimodal import decode_bmp, encode_bmp

    w, h = 5, 3  # width*3 = 15 -> exercises the 4-byte row padding
    px = [(7 + j) % 251 for j in range(w * h * 3)]
    d = decode_bmp(encode_bmp(px, w, h))
    n = w * h
    assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
    assert d["mean_b"] == sum(px[3 * p] for p in range(n)) / n
    assert d["mean_g"] == sum(px[3 * p + 1] for p in range(n)) / n
    assert d["mean_r"] == sum(px[3 * p + 2] for p in range(n)) / n


def test_wav_roundtrip_matches_stdlib_wave():
    import io
    import math
    import wave

    from linkmerce_spark.operators.multimodal import decode_wav, encode_wav

    samples = [((31 + i * 17) % 2048) - 1024 for i in range(45)]
    wav = encode_wav(samples, 8000)
    # the produced file is REAL: python's stdlib wave module reads it
    wf = wave.open(io.BytesIO(wav))
    assert (wf.getnchannels(), wf.getframerate(), wf.getnframes()) == (1, 8000, 45)
    d = decode_wav(wav)
    assert d["sample_rate"] == 8000 and d["channels"] == 1
    assert d["duration_ms"] == 45 * 1000 // 8000
    assert d["rms"] == math.sqrt(sum(s * s for s in samples) / 45)


def test_malformed_media_degrades_to_parse_error(spark):
    from linkmerce_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_bmp,
        extract_media_stats,
    )

    good = encode_bmp([10, 20, 30], 1, 1)
    zero_width = bytearray(good)
    zero_width[18:22] = (0).to_bytes(4, "little")  # width=0 -> div by zero
    short_fmt = (  # 'fmt ' chunk declares 8 bytes -> struct.error
        b"RIFF" + (24).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (8).to_bytes(4, "little") + b"\x00" * 8
    )
    rows = [
        (1, "image", good, "image/bmp", 1, 1, None),
        (2, "image", good[:20], "image/bmp", None, None, None),  # truncated
        (3, "audio", b"RIFFxxxxJUNK", "audio/wav", None, None, None),
        (4, "image", None, "image/bmp", None, None, None),
        (5, "image", bytes(zero_width), "image/bmp", None, None, None),
        (6, "audio", short_fmt, "audio/wav", None, None, None),
    ]
    out = extract_media_stats(spark.createDataFrame(rows, MEDIA_SCHEMA))
    got = {r["media_id"]: r for r in out.collect()}
    assert got[1]["parse_error"] is None and got[1]["mean_b"] == 10.0
    assert got[2]["parse_error"] is not None
    assert got[3]["parse_error"] is not None
    assert "null content" in got[4]["parse_error"]
    # non-ValueError decoder failures (ZeroDivisionError, struct.error)
    # must degrade to parse_error too, never fail the stage
    assert got[5]["parse_error"] is not None
    assert got[6]["parse_error"] is not None
    # a bad file never fails the stage - all six rows came back
    assert len(got) == 6


def test_synthesize_media_emits_real_parseable_files(spark):
    from linkmerce_spark.operators.multimodal import (
        decode_bmp,
        decode_png,
        decode_wav,
        synthesize_media,
    )

    base = spark.createDataFrame(
        [(2, "image"), (3, "audio"), (8, "image")], "media_id long, kind string"
    )
    got = {r["media_id"]: bytes(r["content"]) for r in synthesize_media(base).collect()}
    d2 = decode_png(got[2])  # media_id % 8 == 2 -> PNG container
    assert (d2["width"], d2["height"]) == (4 + 2 % 5, 2 + 2 % 3)
    d3 = decode_wav(got[3])
    assert d3["duration_ms"] == (32 + 3 % 50) * 1000 // 8000
    d4 = decode_bmp(got[8])  # media_id % 8 == 0 -> BMP container
    assert (d4["width"], d4["height"]) == (4 + 8 % 5, 2 + 8 % 3)
    # the same pixel formula lands in different FILE channel orders:
    # byte position 0 is Blue in the BMP, Red in the PNG
    px2 = [(2 * 7 + j) % 251 for j in range((4 + 2 % 5) * (2 + 2 % 3) * 3)]
    n2 = (4 + 2 % 5) * (2 + 2 % 3)
    assert d2["mean_r"] == sum(px2[0::3]) / n2


def test_png_roundtrip_all_filter_types_exact():
    from linkmerce_spark.operators.multimodal import decode_png, encode_png

    # >= 5 rows so the cycling filter schedule hits every type 0-4,
    # including Average/Paeth carry across rows and pixels
    w, h = 6, 7
    px = [(j * 89 + 13) % 256 for j in range(w * h * 3)]
    blob = encode_png(px, w, h)
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    d = decode_png(blob)
    n = w * h
    assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
    assert d["mean_r"] == sum(px[0::3]) / n
    assert d["mean_g"] == sum(px[1::3]) / n
    assert d["mean_b"] == sum(px[2::3]) / n


def test_png_adam7_and_paletted_match_sequential_per_pixel():
    """Round-8 container variety: the Adam7-interlaced and paletted
    (color type 3) layouts must reproduce EXACTLY the pixels of the
    sequential RGB encode — sizes chosen so every Adam7 pass shape
    occurs (all-7-pass, degenerate single-row/column, sub-8 images
    where later passes are empty)."""
    from linkmerce_spark.operators.multimodal import (
        decode_png,
        encode_png,
        encode_png_paletted,
    )

    for w, h in [(1, 1), (4, 2), (8, 4), (5, 3), (13, 11), (16, 9), (7, 1), (1, 9), (23, 17)]:
        px = [((j * 97 + w * 31 + h * 7) % 64) * 4 for j in range(w * h * 3)]
        for enc, kw in [
            (encode_png, dict(interlace=True)),
            (encode_png_paletted, dict()),
            (encode_png_paletted, dict(interlace=True)),
        ]:
            d = decode_png(enc(px, w, h, **kw), want_pixels=True)
            assert d["pixels"] == px, (w, h, enc.__name__, kw)
            assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
            n = w * h
            assert d["mean_r"] == sum(px[0::3]) / n
            assert d["mean_b"] == sum(px[2::3]) / n


def test_png_paletted_wire_format_is_spec_true():
    """Paletted variant: IHDR says color type 3 / the PLTE chunk holds
    first-appearance distinct colors / the filtered stream is 1 byte
    per pixel; interlaced variant: IHDR interlace byte = 1. >256
    distinct colors must be rejected."""
    import struct

    import pytest

    from linkmerce_spark.operators.multimodal import (
        encode_png,
        encode_png_paletted,
    )

    px = [10, 20, 30, 40, 50, 60, 10, 20, 30, 70, 80, 90]  # 3 colors
    blob = encode_png_paletted(px, 2, 2)
    ihdr = blob[16:29]
    w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", ihdr)
    assert (w, h, depth, ctype, interlace) == (2, 2, 8, 3, 0)
    ppos = blob.find(b"PLTE")
    (psize,) = struct.unpack(">I", blob[ppos - 4 : ppos])
    assert blob[ppos + 4 : ppos + 4 + psize] == bytes(
        [10, 20, 30, 40, 50, 60, 70, 80, 90]
    )
    i_blob = encode_png(px, 2, 2, interlace=True)
    assert struct.unpack(">IIBBBBB", i_blob[16:29])[-1] == 1
    too_many: list = []
    for i in range(300):  # 300 provably-distinct colors
        too_many += [i % 256, (i // 256) % 256, i % 251]
    with pytest.raises(ValueError):
        encode_png_paletted(too_many, 30, 10)


def test_png_crc_and_zlib_are_real():
    """The emitted chunks must be spec-true: CRCs verify and the IDAT
    stream re-inflates with plain zlib."""
    import struct
    import zlib

    from linkmerce_spark.operators.multimodal import encode_png

    blob = encode_png([1, 2, 3], 1, 1)
    pos = 8
    seen = []
    while pos + 8 <= len(blob):
        (size,) = struct.unpack(">I", blob[pos : pos + 4])
        ctype = blob[pos + 4 : pos + 8]
        payload = blob[pos + 8 : pos + 8 + size]
        (crc,) = struct.unpack(">I", blob[pos + 8 + size : pos + 12 + size])
        assert crc == zlib.crc32(ctype + payload) & 0xFFFFFFFF, ctype
        seen.append(bytes(ctype))
        if ctype == b"IDAT":
            assert zlib.decompress(payload) == b"\x00\x01\x02\x03"
        pos += 12 + size
    assert seen == [b"IHDR", b"IDAT", b"IEND"]


def test_malformed_png_degrades_to_parse_error(spark):
    from linkmerce_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_png,
        extract_media_stats,
    )

    good = encode_png([10, 20, 30], 1, 1)
    bad_idat = bytearray(good)
    bad_idat[41] ^= 0xFF  # corrupt the deflate stream -> zlib.error
    rows = [
        (1, "image", good, "image/png", 1, 1, None),
        (2, "image", good[:20], "image/png", None, None, None),  # no IDAT
        (3, "image", bytes(bad_idat), "image/png", None, None, None),
    ]
    out = extract_media_stats(spark.createDataFrame(rows, MEDIA_SCHEMA))
    got = {r["media_id"]: r for r in out.collect()}
    assert got[1]["parse_error"] is None and got[1]["format"] == "png"
    assert (got[1]["mean_r"], got[1]["mean_g"], got[1]["mean_b"]) == (10.0, 20.0, 30.0)
    assert got[2]["parse_error"] is not None
    assert got[3]["parse_error"] is not None


def test_lzw_roundtrip_through_width_growth_and_reset():
    """The variable-width LZW coder must survive the 9->12-bit growth
    boundaries AND the 4096-entry table reset (a >30k random stream
    fills the dictionary), plus the KwKwK self-reference case."""
    import random

    from linkmerce_spark.operators.multimodal import _lzw_decode, _lzw_encode

    rng = random.Random(7)
    for n, alphabet in [(50, 4), (1500, 256), (30000, 256), (6000, 2)]:
        seq = [rng.randrange(alphabet) for _ in range(n)]
        assert _lzw_decode(_lzw_encode(seq), 8) == seq
    assert _lzw_decode(_lzw_encode([0] * 5000), 8) == [0] * 5000  # KwKwK runs
    assert _lzw_decode(_lzw_encode([]), 8) == []


def test_gif_roundtrip_exact_palette_means():
    from linkmerce_spark.operators.multimodal import (
        _gif_palette,
        decode_gif,
        encode_gif,
    )

    w, h = 6, 3
    idx = [(11 * 7 + j) % 251 for j in range(w * h)]
    d = decode_gif(encode_gif(idx, w, h))
    n = w * h
    assert (d["format"], d["width"], d["height"], d["channels"]) == ("gif", w, h, 3)
    for ch, name in enumerate(["mean_r", "mean_g", "mean_b"]):
        assert d[name] == sum(_gif_palette(i)[ch] for i in idx) / n


def test_jpeg_marker_walk_extracts_sof_dimensions():
    from linkmerce_spark.operators.multimodal import (
        decode_jpeg_meta,
        encode_jpeg_shell,
    )

    d = decode_jpeg_meta(encode_jpeg_shell(640, 480, 3))
    assert d == {"format": "jpeg", "width": 640, "height": 480, "channels": 3}
    assert decode_jpeg_meta(encode_jpeg_shell(5, 9, 1))["channels"] == 1


def test_malformed_gif_jpeg_degrade_to_parse_error(spark):
    from linkmerce_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_gif,
        encode_jpeg_shell,
        extract_media_stats,
    )

    good_gif = encode_gif([1, 2, 3, 4], 2, 2)
    truncated_gif = good_gif[:20]  # header only, no image descriptor
    corrupt_lzw = bytearray(good_gif)
    corrupt_lzw[-6] ^= 0xFF  # flip a byte inside the LZW sub-block
    headless_jpeg = b"\xff\xd8" + b"\xff\xd9"  # SOI+EOI, no SOF
    rows = [
        (1, "image", good_gif, "image/gif", 2, 2, None),
        (2, "image", truncated_gif, "image/gif", None, None, None),
        (3, "image", bytes(corrupt_lzw), "image/gif", None, None, None),
        (4, "image", headless_jpeg, "image/jpeg", None, None, None),
        (5, "image", encode_jpeg_shell(3, 4, 3), "image/jpeg", 3, 4, None),
    ]
    out = extract_media_stats(spark.createDataFrame(rows, MEDIA_SCHEMA))
    got = {r["media_id"]: r for r in out.collect()}
    assert got[1]["parse_error"] is None and got[1]["format"] == "gif"
    assert got[2]["parse_error"] is not None
    assert got[3]["parse_error"] is not None
    assert got[4]["parse_error"] is not None
    assert got[5]["parse_error"] is None and got[5]["format"] == "jpeg"
    assert got[5]["width"] == 3 and got[5]["height"] == 4
    assert got[5]["mean_r"] is None  # metadata tier: no pixel stats


def test_synthesize_media_routes_all_four_image_containers(spark):
    from linkmerce_spark.operators.multimodal import (
        extract_media_stats,
        synthesize_media,
    )

    rows = [(i, "image") for i in (0, 2, 4, 6, 8, 10, 12, 14)]
    media = synthesize_media(
        spark.createDataFrame(rows, "media_id long, kind string")
    )
    stats = {r["media_id"]: r for r in extract_media_stats(media).collect()}
    assert {m: stats[m]["format"] for m in (0, 2, 4, 6)} == {
        0: "bmp", 2: "png", 4: "gif", 6: "jpeg"
    }
    assert stats[8]["format"] == "bmp" and stats[12]["format"] == "gif"
    assert all(r["parse_error"] is None for r in stats.values())
    # GIF means go through the palette: for media_id=4, w=8, h=3.
    from linkmerce_spark.operators.multimodal import _gif_palette

    idx = [(4 * 7 + j) % 251 for j in range(8 * 3)]
    assert stats[4]["mean_g"] == sum(_gif_palette(i)[1] for i in idx) / 24


# --- real baseline JPEG codec (operators/jpeg.py) -------------------------


def _solid_jpeg_closed_form(r, g, b, q=16):
    """The integer-exact chain the oracle replicates in SQL."""
    import math

    fh = lambda x: math.floor(x + 0.5)  # noqa: E731
    clamp = lambda x: max(0, min(255, x))  # noqa: E731
    y = clamp(fh(0.299 * r + 0.587 * g + 0.114 * b))
    cb = clamp(fh(128 - 0.168736 * r - 0.331264 * g + 0.5 * b))
    cr = clamp(fh(128 + 0.5 * r - 0.418688 * g - 0.081312 * b))
    rec = lambda v: clamp(  # noqa: E731
        fh(math.floor((8 * (v - 128)) / q + 0.5) * q / 8 + 128)
    )
    y2, cb2, cr2 = rec(y), rec(cb), rec(cr)
    return (
        clamp(fh(y2 + 1.402 * (cr2 - 128))),
        clamp(fh(y2 - 0.344136 * (cb2 - 128) - 0.714136 * (cr2 - 128))),
        clamp(fh(y2 + 1.772 * (cb2 - 128))),
    )


def test_jpeg_zigzag_is_the_standard_table():
    from linkmerce_spark.operators.jpeg import ZIGZAG

    std = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
           12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
           35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
           58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]
    assert ZIGZAG == std


def test_jpeg_solid_color_roundtrip_matches_closed_form():
    import random

    from linkmerce_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = random.Random(42)
    for _ in range(60):
        r, g, b = rng.randrange(256), rng.randrange(256), rng.randrange(256)
        w, h = rng.randrange(1, 20), rng.randrange(1, 12)
        d = decode_jpeg(encode_jpeg([r, g, b] * (w * h), w, h, 3))
        er, eg, eb = _solid_jpeg_closed_form(r, g, b)
        assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
        assert (d["mean_r"], d["mean_g"], d["mean_b"]) == (
            float(er), float(eg), float(eb),
        ), (r, g, b, w, h)


def test_jpeg_grayscale_high_fidelity_roundtrip():
    import random

    from linkmerce_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = random.Random(7)
    for _ in range(20):
        w, h = rng.randrange(1, 30), rng.randrange(1, 30)
        px = [rng.randrange(256) for _ in range(w * h)]
        d = decode_jpeg(encode_jpeg(px, w, h, 1, q=1))
        assert d["channels"] == 1
        assert abs(d["mean_r"] - sum(px) / (w * h)) < 1.5


def test_jpeg_color_random_content_roundtrip_quality():
    import random

    from linkmerce_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = random.Random(3)
    for _ in range(10):
        w, h = rng.randrange(4, 24), rng.randrange(4, 24)
        px = [rng.randrange(256) for _ in range(w * h * 3)]
        d = decode_jpeg(encode_jpeg(px, w, h, 3, q=2))
        for ch, idx in (("mean_r", 0), ("mean_g", 1), ("mean_b", 2)):
            assert abs(d[ch] - sum(px[idx::3]) / (w * h)) < 4.0


def test_jpeg_optimized_huffman_tables_are_canonical_and_capped():
    import random

    from linkmerce_spark.operators.jpeg import _build_table, _codes_from_dht

    rng = random.Random(11)
    for _ in range(100):
        syms = rng.sample(range(256), rng.randrange(1, 40))
        freqs = {s: rng.randrange(1, 1000) for s in syms}
        bits, huffval, codes = _build_table(freqs)
        assert sum(bits) == len(syms)
        assert all(ln <= 16 for _, ln in codes.values())
        # Kraft inequality (strict: the reserved all-ones point is free)
        assert sum(2 ** (16 - ln) for _, ln in codes.values()) < 2 ** 16
        # decoder's DHT parse inverts the encoder's assignment exactly
        assert {v: k for k, v in codes.items()} == _codes_from_dht(bits, huffval)
        # prefix-free
        words = sorted(format(c, f"0{ln}b") for c, ln in codes.values())
        assert not any(
            words[i + 1].startswith(words[i]) for i in range(len(words) - 1)
        )


def test_jpeg_huffman_depth_limit_fold():
    """A strictly-increasing Fibonacci frequency ladder forces raw
    Huffman depths ~40; Adjust_BITS must fold them to <=16 while
    keeping the code canonical and decodable."""
    from linkmerce_spark.operators.jpeg import (
        _build_table,
        _codes_from_dht,
        _huffman_sizes,
    )

    a, b = 1, 2
    freqs = {}
    for s in range(40):
        freqs[s] = a
        a, b = b, a + b
    assert max(_huffman_sizes(freqs).values()) > 16  # the fold is exercised
    bits, huffval, codes = _build_table(freqs)
    assert max(ln for _, ln in codes.values()) == 16
    assert sum(bits) == 40
    assert {v: k for k, v in codes.items()} == _codes_from_dht(bits, huffval)


def test_jpeg_sparse_block_exercises_zrl():
    import numpy as np

    from linkmerce_spark.operators.jpeg import decode_jpeg, encode_jpeg

    px = np.zeros((16, 16))
    px[15, 15] = 255.0
    d = decode_jpeg(encode_jpeg(list(px.reshape(-1)), 16, 16, 1, q=1))
    assert abs(d["mean_r"] - px.sum() / 256) < 1.0


def test_jpeg_unsupported_modes_degrade_to_meta_tier(spark):
    """A MALFORMED progressive file (baseline scan relabeled SOF2 —
    its single SOS claims the full spectral band for a DC-style
    interleaved scan, which T.81 forbids) degrades to the metadata walk
    (dimensions, no pixel stats); real progressive decodes fully."""
    import struct

    from linkmerce_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from linkmerce_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_media_stats,
    )

    data = bytearray(encode_jpeg([100, 150, 200] * 6, 3, 2, 3))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # relabel SOF0 -> SOF2 without progressive scans
    try:
        decode_jpeg(bytes(data))
        raise AssertionError("malformed progressive must raise")
    except ValueError:
        pass
    rows = [(1, "image", bytes(data), "image/jpeg", None, None, None)]
    out = extract_media_stats(spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()
    assert out[0]["parse_error"] is None
    assert (out[0]["width"], out[0]["height"]) == (3, 2)
    assert out[0]["mean_r"] is None  # meta tier

    # NON-DIVISIBLE sampling (3x3 luma against 2x2 chroma — needs
    # fractional resampling, produced by no mainstream encoder) is the
    # residue that still raises; every divisible T.81 factor 1-4
    # decodes since the round-9 generalization (see the 411 tests)
    data2 = bytearray(encode_jpeg([100, 150, 200] * 6, 3, 2, 3))
    j = data2.find(b"\xff\xc0")
    data2[j + 11] = 0x33  # component 0 sampling 3x3
    data2[j + 14] = 0x22  # component 1 sampling 2x2: 3 % 2 != 0
    try:
        decode_jpeg(bytes(data2))
        raise AssertionError("non-divisible sampling must raise")
    except ValueError as e:
        assert "library tier" in str(e)
    assert struct.unpack(">H", data2[j + 5 : j + 7])[0] == 2  # height intact
    # out-of-range factors (0 or >4) are malformed, not library-tier
    data3 = bytearray(encode_jpeg([100, 150, 200] * 6, 3, 2, 3))
    k = data3.find(b"\xff\xc0")
    data3[k + 11] = 0x50  # 5x0 — outside T.81's 1..4
    try:
        decode_jpeg(bytes(data3))
        raise AssertionError("out-of-range sampling must raise")
    except ValueError as e:
        assert "T.81 range" in str(e)


def _fixture_jpeg_means(mid):
    """Expected decoded means for the JPEG fixture routes: id%16==6 is
    16x16 with a per-block color (f = block index), id%16==14 solid."""
    fs = range(4) if mid % 16 == 6 else (0,)
    recs = [
        _solid_jpeg_closed_form(
            (mid * 7 + 19 * f) % 251,
            (mid * 11 + 23 * f) % 251,
            (mid * 13 + 29 * f) % 251,
        )
        for f in fs
    ]
    n = len(recs)
    return tuple(sum(float(r[ch]) for r in recs) / n for ch in range(3))


def test_jpeg_fixture_route_is_fully_decoded(spark):
    """synthesize_media route 6 produces REAL JPEG bytes (16x16
    block-pattern 4:4:4 / solid 4:2:0) whose decoded means match the
    closed-form chain (the oracle's SQL)."""
    from linkmerce_spark.operators.multimodal import (
        extract_media_stats,
        synthesize_media,
    )

    rows = [(i, "image") for i in (6, 14, 22, 30)]
    media = synthesize_media(
        spark.createDataFrame(rows, "media_id long, kind string")
    )
    stats = {r["media_id"]: r for r in extract_media_stats(media).collect()}
    for mid, row in stats.items():
        er, eg, eb = _fixture_jpeg_means(mid)
        assert row["format"] == "jpeg" and row["parse_error"] is None
        assert (row["width"], row["height"]) == (
            (16, 16) if mid % 16 == 6 else (4 + mid % 5, 2 + mid % 3)
        )
        assert (row["mean_r"], row["mean_g"], row["mean_b"]) == (er, eg, eb)


# --- MJPEG-in-AVI video tier (operators/video.py) -------------------------


def test_avi_roundtrip_matches_per_frame_closed_form():
    from linkmerce_spark.operators.video import decode_avi, encode_solid_mjpeg_avi

    for mid in (3, 7, 11, 19, 23):
        w, h, n = 4 + mid % 5, 2 + mid % 3, 2 + mid % 3
        d = decode_avi(encode_solid_mjpeg_avi(mid, w, h, n))
        exp = [
            _solid_jpeg_closed_form(
                (mid * 7 + 19 * f) % 251,
                (mid * 11 + 23 * f) % 251,
                (mid * 13 + 29 * f) % 251,
            )
            for f in range(n)
        ]
        assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
        assert d["duration_ms"] == n * 100
        assert d["mean_r"] == sum(float(e[0]) for e in exp) / n
        assert d["mean_g"] == sum(float(e[1]) for e in exp) / n
        assert d["mean_b"] == sum(float(e[2]) for e in exp) / n


def test_avi_frame_stride_samples_kth_frames():
    """Frame sampling: stride k decodes only frames 0, k, 2k, ... while
    duration still comes from the header (no full decode needed)."""
    from linkmerce_spark.operators.video import decode_avi, encode_solid_mjpeg_avi

    mid, w, h, n = 23, 4 + 23 % 5, 2 + 23 % 3, 4
    data = encode_solid_mjpeg_avi(mid, w, h, n)
    exp = [
        _solid_jpeg_closed_form(
            (mid * 7 + 19 * f) % 251,
            (mid * 11 + 23 * f) % 251,
            (mid * 13 + 29 * f) % 251,
        )
        for f in range(n)
    ]
    for stride in (2, 3):
        d = decode_avi(data, frame_stride=stride)
        sampled = exp[::stride]
        assert d["mean_r"] == sum(float(e[0]) for e in sampled) / len(sampled)
        assert d["duration_ms"] == n * 100


def test_avi_container_is_internally_consistent():
    import struct

    from linkmerce_spark.operators.video import decode_avi, encode_solid_mjpeg_avi

    data = encode_solid_mjpeg_avi(3, 4, 2, 3)
    # RIFF size field covers the body exactly
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    assert data[8:12] == b"AVI "
    # header/movi frame-count mismatch is detected
    corrupt = bytearray(data)
    i = corrupt.find(b"avih") + 8 + 16  # dwTotalFrames offset in avih
    corrupt[i] = 9
    try:
        decode_avi(bytes(corrupt))
        raise AssertionError("frame-count mismatch must raise")
    except ValueError as e:
        assert "frames" in str(e)


def test_video_rows_flow_through_media_stats(spark):
    from linkmerce_spark.operators.multimodal import (
        extract_media_stats,
        synthesize_media,
    )

    rows = [(i, "video") for i in (3, 7, 11)] + [(4, "image"), (5, "audio")]
    media = synthesize_media(
        spark.createDataFrame(rows, "media_id long, kind string")
    )
    stats = {r["media_id"]: r for r in extract_media_stats(media).collect()}
    for mid in (3, 7, 11):
        row = stats[mid]
        n = 2 + mid % 3
        assert row["format"] == "avi" and row["parse_error"] is None
        assert row["channels"] == 3 and row["duration_ms"] == n * 100
        exp = [
            _solid_jpeg_closed_form(
                (mid * 7 + 19 * f) % 251,
                (mid * 11 + 23 * f) % 251,
                (mid * 13 + 29 * f) % 251,
            )
            for f in range(n)
        ]
        assert row["mean_r"] == sum(float(e[0]) for e in exp) / n
    assert stats[4]["format"] == "gif" and stats[5]["format"] == "wav"


def test_malformed_avi_degrades_to_parse_error(spark):
    from linkmerce_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_media_stats,
    )
    from linkmerce_spark.operators.video import encode_solid_mjpeg_avi

    good = encode_solid_mjpeg_avi(3, 4, 2, 2)
    rows = [
        (1, "video", good, "video/avi", 4, 2, 200),
        (2, "video", good[:60], "video/avi", None, None, None),
        (3, "video", b"RIFF\x04\x00\x00\x00AVI ", "video/avi", None, None, None),
    ]
    out = extract_media_stats(spark.createDataFrame(rows, MEDIA_SCHEMA))
    got = {r["media_id"]: r for r in out.collect()}
    assert got[1]["parse_error"] is None and got[1]["format"] == "avi"
    assert got[2]["parse_error"] is not None
    assert got[3]["parse_error"] is not None  # headerless: no avih


# --- audio feature extraction ----------------------------------------------


def test_audio_features_match_stdlib_reference(spark):
    from linkmerce_spark.operators.multimodal import (
        encode_wav,
        extract_audio_features,
    )

    import random

    rng = random.Random(9)
    rows = []
    expected = {}
    for mid in range(1, 6):
        samples = [rng.randrange(-1024, 1024) for _ in range(rng.randrange(2, 60))]
        rows.append((mid, "audio", encode_wav(samples, 8000)))
        zc = sum(
            1
            for a, b in zip(samples, samples[1:])
            if (a < 0 <= b) or (a >= 0 > b)
        )
        expected[mid] = (
            len(samples),
            max(abs(v) for v in samples),
            zc,
            sum(v * v for v in samples),
        )
    rows.append((9, "audio", b"not a wav"))
    df = spark.createDataFrame(rows, "media_id long, kind string, content binary")
    got = {r["media_id"]: r for r in extract_audio_features(df).collect()}
    for mid, (n, peak, zc, energy) in expected.items():
        r = got[mid]
        assert (
            r["n_samples"], r["peak"], r["zero_crossings"], r["energy"]
        ) == (n, peak, zc, energy)
        assert r["sample_rate"] == 8000 and r["parse_error"] is None
    assert got[9]["parse_error"] is not None and got[9]["peak"] is None


# --- decoder robustness: fuzzed bytes never escape the contract ------------


def test_decoders_never_crash_on_fuzzed_bytes():
    """The 100 TB contract is 'a bad file never fails a stage': every
    decoder must either return a dict or raise a catchable exception —
    never hang, never return garbage types — on random bytes, on
    truncations of VALID files, and on bit-flipped valid files."""
    import random

    from linkmerce_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from linkmerce_spark.operators.multimodal import (
        decode_bmp,
        decode_gif,
        decode_png,
        decode_wav,
        encode_bmp,
        encode_gif,
        encode_png,
        encode_png_paletted,
        encode_wav,
    )
    from linkmerce_spark.operators.video import decode_avi, encode_solid_mjpeg_avi

    rng = random.Random(99)
    decoders = [decode_bmp, decode_png, decode_gif, decode_jpeg, decode_wav, decode_avi]
    valid = [
        encode_bmp([rng.randrange(256) for _ in range(5 * 3 * 3)], 5, 3),
        encode_png([rng.randrange(256) for _ in range(5 * 3 * 3)], 5, 3),
        encode_png(
            [rng.randrange(256) for _ in range(9 * 9 * 3)], 9, 9, interlace=True
        ),
        encode_png_paletted(
            [rng.randrange(4) * 64 for _ in range(5 * 3 * 3)], 5, 3
        ),
        encode_gif([rng.randrange(251) for _ in range(15)], 5, 3),
        encode_jpeg([rng.randrange(256) for _ in range(5 * 3 * 3)], 5, 3),
        encode_wav([rng.randrange(-1024, 1024) for _ in range(40)]),
        encode_solid_mjpeg_avi(7, 4, 2, 3),
    ]

    def probe(data: bytes) -> None:
        for dec in decoders:
            try:
                out = dec(data)
                assert isinstance(out, dict)
            except Exception:
                pass  # any exception is fine — the kernel catches all

    for _ in range(150):  # pure random garbage
        probe(bytes(rng.randrange(256) for _ in range(rng.randrange(0, 300))))
    for v in valid:  # truncations of valid files
        for cut in range(0, len(v), max(1, len(v) // 17)):
            probe(v[:cut])
    for v in valid:  # single-bit corruptions of valid files
        for _ in range(40):
            b = bytearray(v)
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            probe(bytes(b))


def test_jpeg_gray_q1_roundtrip_per_pixel_bound():
    """q=1 grayscale roundtrip: EVERY pixel within 1 of the original
    (DCT float + two floor-roundings can move a sample at most 1) —
    a stronger pin than the mean-based checks."""
    import random

    from linkmerce_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = random.Random(23)
    for _ in range(10):
        w, h = rng.randrange(1, 25), rng.randrange(1, 25)
        px = [rng.randrange(256) for _ in range(w * h)]
        d = decode_jpeg(encode_jpeg(px, w, h, 1, q=1), want_pixels=True)
        got = d["pixels"][0::3]  # gray replicated into r,g,b
        assert len(got) == w * h
        worst = max(abs(a - b) for a, b in zip(px, got))
        assert worst <= 1, worst


def test_jpeg_420_solid_matches_444_closed_form():
    """4:2:0: a solid color reconstructs EXACTLY as in 4:4:4 (the
    chroma floor-mean of a constant is the constant), including
    non-multiple-of-16 dims spanning several MCUs."""
    import random

    from linkmerce_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = random.Random(31)
    for _ in range(30):
        r, g, b = rng.randrange(256), rng.randrange(256), rng.randrange(256)
        w, h = rng.randrange(1, 40), rng.randrange(1, 40)
        d420 = decode_jpeg(encode_jpeg([r, g, b] * (w * h), w, h, 3, subsampling="420"))
        er, eg, eb = _solid_jpeg_closed_form(r, g, b)
        assert (d420["width"], d420["height"]) == (w, h)
        assert (d420["mean_r"], d420["mean_g"], d420["mean_b"]) == (
            float(er), float(eg), float(eb),
        )


def test_jpeg_420_multi_mcu_luma_fidelity():
    """Gray-content 4:2:0 at q=1 across a 3x2 MCU grid: luma path is
    untouched by chroma subsampling — per-pixel error <= 1."""
    from linkmerce_spark.operators.jpeg import decode_jpeg, encode_jpeg

    w, h = 33, 19
    px = []
    for r0 in range(h):
        for c0 in range(w):
            v = (r0 * 8 + c0 * 5) % 256
            px += [v, v, v]
    d = decode_jpeg(
        encode_jpeg(px, w, h, 3, q=1, subsampling="420"), want_pixels=True
    )
    worst = max(abs(a - b) for a, b in zip(px[0::3], d["pixels"][0::3]))
    assert worst <= 1


def test_jpeg_fixture_route_covers_both_subsampling_layouts(spark):
    from linkmerce_spark.operators.multimodal import (
        extract_media_stats,
        synthesize_media,
    )

    # 6,22 -> 444; 14 -> 420; 30 -> 411 (the exotic-sampling container
    # since round 9 — solid color, so the decoded stats are identical)
    rows = [(i, "image") for i in (6, 14, 22, 30)]
    media = synthesize_media(
        spark.createDataFrame(rows, "media_id long, kind string")
    )
    # raw bytes differ by layout: check the SOF sampling byte (ids
    # %32 in {6,14} carry the progressive SOF2 frame since round 8;
    # their %32 in {22,30} siblings stay baseline SOF0)
    raw = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    for mid, sof, expect in (
        (6, b"\xff\xc2", 0x11),
        (22, b"\xff\xc0", 0x11),
        (14, b"\xff\xc2", 0x22),
        (30, b"\xff\xc0", 0x41),
    ):
        j = raw[mid].find(sof)
        assert j >= 0 and raw[mid][j + 11] == expect, mid
    stats = {r["media_id"]: r for r in extract_media_stats(media).collect()}
    for mid, row in stats.items():
        assert row["parse_error"] is None
        assert (
            row["mean_r"], row["mean_g"], row["mean_b"]
        ) == _fixture_jpeg_means(mid), mid


# --- EXIF orientation (APP1) ------------------------------------------------


def _ref_orient(arr, o):
    """Coordinate-mapping reference for the 8 EXIF orientations."""
    if o == 2:
        return arr[:, ::-1]
    if o == 3:
        return arr[::-1, ::-1]
    if o == 4:
        return arr[::-1]
    if o == 5:
        return arr.transpose(1, 0, 2)
    if o == 6:
        return arr.transpose(1, 0, 2)[:, ::-1]  # rotate 90 CW
    if o == 7:
        return arr.transpose(1, 0, 2)[::-1, ::-1]  # transverse
    if o == 8:
        return arr.transpose(1, 0, 2)[::-1, :]  # rotate 90 CCW
    return arr


def test_exif_orientation_transforms_match_reference():
    import numpy as np

    from linkmerce_spark.operators.jpeg import apply_exif_orientation

    arr = np.arange(2 * 3 * 3).reshape(2, 3, 3)
    inv = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}
    for o in range(1, 9):
        assert np.array_equal(apply_exif_orientation(arr, o), _ref_orient(arr, o))
        assert np.array_equal(
            apply_exif_orientation(apply_exif_orientation(arr, o), inv[o]), arr
        )


def test_exif_end_to_end_meta_walk_and_auto_rotate():
    import random

    import numpy as np

    from linkmerce_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        exif_app1,
        parse_exif_orientation,
    )
    from linkmerce_spark.operators.multimodal import decode_jpeg_meta

    for o in range(1, 9):
        assert parse_exif_orientation(exif_app1(o)[4:]) == o
    rng = random.Random(6)
    w, h = 5, 3
    px = [rng.randrange(256) for _ in range(w * h * 3)]
    plain = decode_jpeg(encode_jpeg(px, w, h, 3, q=1), want_pixels=True)
    for o in (3, 6, 8):
        data = encode_jpeg(px, w, h, 3, q=1, orientation=o)
        assert decode_jpeg_meta(data)["orientation"] == o
        d = decode_jpeg(data, want_pixels=True)
        # upright dims swap for the 90-degree orientations
        assert (d["width"], d["height"]) == ((h, w) if o in (6, 8) else (w, h))
        # channel means are permutation-invariant; pixels are not
        assert (d["mean_r"], d["mean_g"], d["mean_b"]) == (
            plain["mean_r"], plain["mean_g"], plain["mean_b"],
        )
        a = np.array(plain["pixels"]).reshape(h, w, 3)
        assert d["pixels"] == _ref_orient(a, o).reshape(-1).tolist()
    # malformed APP1 payloads are advisory: never raise, never rotate
    bad = bytearray(encode_jpeg(px, w, h, 3, orientation=6))
    i = bad.find(b"Exif\x00\x00")
    bad[i + 6 : i + 8] = b"XX"  # corrupt the TIFF byte-order mark
    d = decode_jpeg(bytes(bad))
    assert (d["width"], d["height"]) == (w, h)


# --- progressive JPEG (round 8: SOF2 encode + decode) ----------------------


def test_jpeg_progressive_roundtrip_equals_baseline():
    """The progressive encoder writes the SAME quantized coefficients
    as the baseline encoder under a different entropy layer, so the
    two decodes must agree pixel-for-pixel — across sizes, 4:4:4/4:2:0,
    grayscale, quality levels, EXIF orientations, and content shapes
    (flat exercises pure EOB runs; random exercises every refinement
    path: correction bits, ZRL-in-refinement, newly-significant runs)."""
    import random

    from linkmerce_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = random.Random(7)
    for _ in range(16):
        w, h = rng.randrange(1, 36), rng.randrange(1, 30)
        channels = rng.choice([1, 3, 3])
        sub = rng.choice(["444", "420"]) if channels == 3 else "444"
        q = rng.choice([1, 2, 8, 16])
        orient = rng.choice([None, 1, 3, 6, 8])
        n = w * h * channels
        kind = rng.choice(["random", "flat", "gradient"])
        if kind == "random":
            px = [rng.randrange(256) for _ in range(n)]
        elif kind == "flat":
            px = [rng.randrange(256) for _ in range(channels)] * (w * h)
        else:
            px = [(j * 7 + c * 13) % 256 for j in range(w * h) for c in range(channels)]
        b_base = encode_jpeg(px, w, h, channels, q=q, subsampling=sub, orientation=orient)
        b_prog = encode_jpeg_progressive(
            px, w, h, channels, q=q, subsampling=sub, orientation=orient
        )
        assert b"\xff\xc2" in b_prog and b"\xff\xc0" not in b_prog
        d_base = decode_jpeg(b_base, want_pixels=True)
        d_prog = decode_jpeg(b_prog, want_pixels=True)
        assert d_base == d_prog, (w, h, channels, sub, q, orient, kind)


def test_jpeg_progressive_has_multiple_scans():
    from linkmerce_spark.operators.jpeg import encode_jpeg_progressive

    b = encode_jpeg_progressive([10, 200, 30] * 256, 16, 16, 3)
    assert b.count(b"\xff\xda") == 12  # the full color scan script
    b1 = encode_jpeg_progressive(list(range(64)) * 4, 16, 16, 1)
    assert b1.count(b"\xff\xda") == 8  # grayscale drops the 4 chroma scans


def test_jpeg_progressive_fixture_route_is_fully_decoded(spark):
    """synthesize_media encodes the mid%32==6 (block-pattern 4:4:4)
    and mid%32==14 (solid 4:2:0) JPEGs progressively; the decoded
    means must STILL equal the closed-form chain — same oracle values
    as the baseline siblings, proving the SOF2 entropy decode."""
    from linkmerce_spark.operators.multimodal import (
        extract_media_stats,
        synthesize_media,
    )

    rows = [(i, "image") for i in (6, 14, 38, 46)]  # %32: 6, 14, 6+32? no:
    # 6 -> progressive 444, 14 -> progressive 420, 38 (%32=6) ->
    # progressive 444, 46 (%32=14) -> progressive 420 — and the
    # baseline siblings 22 (%32) / 30 (%32):
    rows += [(22, "image"), (30, "image")]
    media = synthesize_media(
        spark.createDataFrame(rows, "media_id long, kind string")
    )
    raw = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    for mid in (6, 14):
        assert b"\xff\xc2" in raw[mid]  # progressive container
    for mid in (22, 30):
        assert b"\xff\xc0" in raw[mid]  # baseline sibling
    stats = {r["media_id"]: r for r in extract_media_stats(media).collect()}
    for mid, row in stats.items():
        er, eg, eb = _fixture_jpeg_means(mid)
        assert row["format"] == "jpeg" and row["parse_error"] is None
        assert (row["mean_r"], row["mean_g"], row["mean_b"]) == (er, eg, eb), mid


def test_jpeg_411_solid_matches_444_closed_form():
    """4:1:1 (4x1 luma vs 1x1 chroma — the DV/camera exotic layout):
    solid color keeps the chroma floor-mean exact, so the decode must
    equal the 4:4:4 decode of the same pixels bit-for-bit."""
    from linkmerce_spark.operators.jpeg import decode_jpeg, encode_jpeg

    for mid in (30, 62, 94):
        w, h = 4 + mid % 5, 2 + mid % 3
        rgb = [(mid * 7) % 251, (mid * 11) % 251, (mid * 13) % 251] * (w * h)
        d411 = decode_jpeg(encode_jpeg(rgb, w, h, 3, subsampling="411"),
                           want_pixels=True)
        d444 = decode_jpeg(encode_jpeg(rgb, w, h, 3, subsampling="444"),
                           want_pixels=True)
        assert (d411["width"], d411["height"]) == (w, h)
        assert d411["pixels"] == d444["pixels"], mid
        for c in ("mean_r", "mean_g", "mean_b"):
            assert d411[c] == d444[c], (mid, c)


def test_jpeg_411_multi_mcu_gray_content_per_pixel():
    """4:1:1 with varying LUMA across multiple 32x8 MCUs: gray pixels
    keep chroma constant (Cb=Cr=128), so the only active plane is the
    full-resolution luma and q=1 decode must match the 4:4:4 decode of
    the same image per pixel — this drives the 4-blocks-per-MCU luma
    interleave and the 4x horizontal chroma replication for real."""
    import random

    from linkmerce_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = random.Random(41)
    w, h = 70, 19  # 3 MCU columns x 3 MCU rows, ragged edges
    px = []
    for _ in range(w * h):
        g = rng.randrange(256)
        px += [g, g, g]
    d411 = decode_jpeg(encode_jpeg(px, w, h, 3, q=1, subsampling="411"),
                       want_pixels=True)
    d444 = decode_jpeg(encode_jpeg(px, w, h, 3, q=1, subsampling="444"),
                       want_pixels=True)
    assert d411["pixels"] == d444["pixels"]
