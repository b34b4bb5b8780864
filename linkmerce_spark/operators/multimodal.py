"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Training-data pipelines carry media as ``binary`` columns with a typed
metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` (the only layer where Python is the right tool — the
codec itself is imperative).

Two decode tiers:

- ``extract_media_stats``: a REAL decoder for every image format in
  the fixture — uncompressed 24-bit BMP, 8-bit PNG (zlib inflate +
  the full five-filter per-row unfilter pass), GIF89a (variable-width
  LZW), baseline JPEG (full Huffman entropy decode + IDCT + color
  convert, operators/jpeg.py; progressive/subsampled streams degrade
  to the SOF metadata walk), and PCM WAV (RIFF chunk walk). Genuine
  byte-level parsing of genuine files; malformed bytes degrade to a
  ``parse_error`` row, never a task failure.
- ``decode_media_features``: the embedding-shaped contract for codec
  formats that still need a library tier (progressive/subsampled
  JPEG, MP4 video) in environments without PIL/ffmpeg;
  ``decode_stub=True`` produces a deterministic fake
  (byte-hash derived "pixels"), ``decode_stub=False`` raises
  ``NotImplementedError`` where PIL/ffmpeg would be called.

The Spark-side plumbing — schema, batch iteration, partition sizing —
is identical for both tiers and tested (tests/test_multimodal.py).

Scale notes
-----------
- Media rows are large: ``repartition_for_media`` targets a row-count
  per partition that keeps each Arrow batch under the executor memory
  budget (binary columns defeat the usual byte-based split sizing).
- ``mapInPandas`` streams batches; nothing materializes a partition.
- Feature extraction emits fixed-size vectors -> downstream ANN ops
  (operators/similarity: cosine top-k, LSH buckets) apply unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "AUDIO_FEATURES_SCHEMA",
    "MEDIA_SCHEMA",
    "MEDIA_STATS_SCHEMA",
    "attach_media_metadata",
    "extract_audio_features",
    "decode_media_features",
    "decode_bmp",
    "decode_gif",
    "decode_jpeg_meta",
    "decode_png",
    "decode_wav",
    "encode_bmp",
    "encode_gif",
    "encode_jpeg_shell",
    "encode_png",
    "encode_wav",
    "extract_media_stats",
    "repartition_for_media",
    "synthesize_media",
]

# The typed metadata contract for an opaque media column.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

_FEATURE_DIM = 16

_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        # double, not float: digest_byte/255.0 is IEEE-exact, so a SQL
        # oracle (DuckDB sha256 hex -> int / 255.0) matches bit-for-bit
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def attach_media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Derive cheap metadata JVM-side (no Python): byte length + md5.

    Anything computable without decoding stays out of the UDF path.
    """
    return df.withColumn("n_bytes", F.length(F.col(content_col)).cast("long")).withColumn(
        "content_md5", F.md5(F.col(content_col))
    )


def _stub_features(content: bytes | None, dim: int = _FEATURE_DIM) -> list[float]:
    """Deterministic fake 'decoded features': sha256-derived floats.

    Stands in for the real decode -> embed kernel; stable across runs
    and engines so tests can assert exact values.
    """
    if content is None:
        return [0.0] * dim
    digest = hashlib.sha256(bytes(content)).digest()
    return [digest[i] / 255.0 for i in range(dim)]


def decode_media_features(
    df: DataFrame,
    content_col: str = "content",
    decode_stub: bool = True,
    batch_hint: int | None = None,
) -> DataFrame:
    """Decode media and emit fixed-size feature vectors via mapInPandas.

    Real deployment plugs PIL/torchvision/ffmpeg into ``_kernel``; this
    environment stubs the codec (see module docstring). The plumbing —
    Arrow batch iteration, output schema, null passthrough — is the
    production shape.
    """

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg (unavailable here); "
                    "run with decode_stub=True"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf[content_col].map(
                        lambda b: len(b) if b is not None else None
                    ),
                    "features": pdf[content_col].map(_stub_features),
                }
            )

    from linkmerce_spark.shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    if batch_hint is not None:
        df = repartition_for_media(df, rows_per_partition=batch_hint)
    return df.mapInPandas(_kernel, schema=_FEATURE_SCHEMA)


# ----------------------------------------------------------------------
# Real stdlib codecs: uncompressed 24-bit BMP, 8-bit PNG, PCM WAV.
# ----------------------------------------------------------------------

import math
import struct


def encode_bmp(pixels_bgr: list, width: int, height: int) -> bytes:
    """Build a REAL uncompressed 24-bit BMP file (BITMAPINFOHEADER).

    ``pixels_bgr``: ``width*height*3`` byte values, row-major from the
    TOP row, channels in file order B,G,R. Rows are written bottom-up
    with 4-byte padding, per the format. Output opens in any image
    viewer."""
    row_raw = width * 3
    pad = (-row_raw) % 4
    data = bytearray()
    for r in range(height - 1, -1, -1):  # bottom-up
        start = r * row_raw
        data += bytes(pixels_bgr[start : start + row_raw])
        data += b"\x00" * pad
    pixel_offset = 14 + 40
    file_size = pixel_offset + len(data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_offset)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + dib + bytes(data)


def decode_bmp(content: bytes, want_pixels: bool = False) -> dict:
    """Parse an uncompressed 24-bit BMP: dimensions + per-channel means.

    Pure struct/byte parsing — no image library. Raises ValueError on
    anything that is not a plain BITMAPINFOHEADER 24bpp file.
    ``want_pixels`` adds ``pixels``: flat top-row-major [r,g,b,...]
    ints (file rows are bottom-up; the flip is undone here)."""
    if len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP file")
    _, _, _, pixel_offset = struct.unpack("<IHHI", content[2:14])
    dib_size, width, height, _, bpp, compression = struct.unpack(
        "<IiiHHI", content[14:34]
    )
    if dib_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    flipped = height < 0  # negative height = top-down rows
    height = abs(height)
    row_raw = width * 3
    stride = row_raw + ((-row_raw) % 4)
    if len(content) < pixel_offset + stride * height:
        raise ValueError("truncated BMP pixel data")
    sums = [0, 0, 0]
    rows = [None] * height if want_pixels else None
    for r in range(height):
        row = content[pixel_offset + r * stride : pixel_offset + r * stride + row_raw]
        for c in range(3):
            sums[c] += sum(row[c::3])
        if want_pixels:
            img_row = r if flipped else height - 1 - r
            rgb = []
            for c in range(width):
                rgb += [row[3 * c + 2], row[3 * c + 1], row[3 * c]]
            rows[img_row] = rgb
    n = width * height
    out = {
        "format": "bmp",
        "width": width,
        "height": height,
        "channels": 3,
        "mean_b": sums[0] / n,
        "mean_g": sums[1] / n,
        "mean_r": sums[2] / n,
        "flipped": flipped,
    }
    if want_pixels:
        out["pixels"] = [v for row in rows for v in row]
    return out


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# Adam7 pass grid: (x0, y0, dx, dy) per pass — PNG spec 4.5.2. Each
# pass is filtered as an independent sub-image (its own zero prev row),
# and passes whose sub-image is empty contribute NO bytes at all.
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def _filter_rows(rows: list, bpp: int) -> bytearray:
    """Apply the per-scanline PNG filter pass to equal-length byte
    rows, filter type cycling 0..4 (None/Sub/Up/Average/Paeth) so a
    decoder must implement the FULL unfilter pass to read the stream
    back. ``bpp`` = bytes per pixel (1 for palette indices)."""
    raw = bytearray()
    stride = len(rows[0]) if rows else 0
    prev = bytes(stride)
    for r, row in enumerate(rows):
        ft = r % 5
        raw.append(ft)
        if ft == 0:
            raw += row
        elif ft == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(stride)
            )
        elif ft == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif ft == 3:  # Average
            raw += bytes(
                (row[i] - ((row[i - bpp] if i >= bpp else 0) + prev[i]) // 2) & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            raw += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - bpp] if i >= bpp else 0,
                        prev[i],
                        prev[i - bpp] if i >= bpp else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        prev = bytes(row)
    return raw


def _unfilter_rows(raw: bytes, offset: int, nrows: int, stride: int, bpp: int):
    """Reverse ``_filter_rows`` for one (sub-)image: ``nrows``
    scanlines of ``stride`` bytes each starting at ``raw[offset]``.
    Returns ``(rows, next_offset)``."""
    need = offset + nrows * (stride + 1)
    if len(raw) < need:
        raise ValueError("truncated PNG pixel data")
    rows: list = []
    prev = bytes(stride)
    for r in range(nrows):
        base = offset + r * (stride + 1)
        ft = raw[base]
        line = raw[base + 1 : base + 1 + stride]
        if ft == 0:
            row = bytearray(line)
        elif ft == 1:  # Sub
            row = bytearray(stride)
            for i in range(stride):
                row[i] = (line[i] + (row[i - bpp] if i >= bpp else 0)) & 0xFF
        elif ft == 2:  # Up
            row = bytearray((line[i] + prev[i]) & 0xFF for i in range(stride))
        elif ft == 3:  # Average
            row = bytearray(stride)
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                row[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            row = bytearray(stride)
            for i in range(stride):
                row[i] = (
                    line[i]
                    + _paeth(
                        row[i - bpp] if i >= bpp else 0,
                        prev[i],
                        prev[i - bpp] if i >= bpp else 0,
                    )
                ) & 0xFF
        else:
            raise ValueError(f"bad filter type {ft}")
        rows.append(row)
        prev = bytes(row)
    return rows, need


def _adam7_split(sample_rows: list, width: int, height: int, bpp: int):
    """Yield each non-empty Adam7 pass as a list of byte rows drawn
    from the full-resolution ``sample_rows`` (one bytearray per image
    row, ``width*bpp`` bytes each)."""
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx if width > x0 else 0
        ph = (height - y0 + dy - 1) // dy if height > y0 else 0
        if pw == 0 or ph == 0:
            continue
        rows = []
        for py in range(ph):
            src = sample_rows[y0 + py * dy]
            row = bytearray()
            for px in range(pw):
                x = x0 + px * dx
                row += src[x * bpp : (x + 1) * bpp]
            rows.append(row)
        yield rows


def _png_encode_body(
    sample_rows: list,
    width: int,
    height: int,
    bpp: int,
    color_type: int,
    interlace: bool,
    plte: bytes = b"",
) -> bytes:
    import zlib

    if interlace:
        raw = bytearray()
        for pass_rows in _adam7_split(sample_rows, width, height, bpp):
            raw += _filter_rows(pass_rows, bpp)
    else:
        raw = _filter_rows(sample_rows, bpp)
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, color_type, 0, 0, 1 if interlace else 0
    )
    body = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if plte:
        body += _png_chunk(b"PLTE", plte)
    return body + _png_chunk(b"IDAT", zlib.compress(bytes(raw))) + _png_chunk(
        b"IEND", b""
    )


def encode_png(
    pixels_rgb: list, width: int, height: int, interlace: bool = False
) -> bytes:
    """Build a REAL 8-bit RGB PNG (zlib-deflated, CRC-correct).

    ``pixels_rgb``: ``width*height*3`` byte values, row-major from the
    top row, channels in R,G,B order. Each row's filter type cycles
    0..4 (None/Sub/Up/Average/Paeth), so a decoder must implement the
    FULL per-row unfilter pass to read these bytes back — the encode
    side is what makes the decode side's filter coverage testable on
    genuine files. ``interlace=True`` writes the Adam7 layout (PNG
    spec 4.5.2): seven independently-filtered sub-images, the
    progressive-rendering form a web-scraped corpus actually
    contains. Output opens in any image viewer."""
    stride = width * 3
    rows = [
        bytearray(pixels_rgb[r * stride : (r + 1) * stride])
        for r in range(height)
    ]
    return _png_encode_body(rows, width, height, 3, 2, interlace)


def encode_png_paletted(
    pixels_rgb: list, width: int, height: int, interlace: bool = False
) -> bytes:
    """Build a REAL paletted PNG (color type 3): the palette is the
    image's distinct colors in first-appearance order (<=256 required),
    pixel data is 8-bit palette indices through the same cycling
    filter schedule (bpp=1 for the Sub/Average/Paeth left-neighbor,
    per spec). Same RGB semantics as ``encode_png`` — a decoder that
    maps PLTE back reproduces identical pixels, which is what lets the
    paletted container slot under an unchanged closed-form oracle."""
    palette: dict = {}
    idx_rows: list = []
    stride = width * 3
    for r in range(height):
        row = bytearray()
        for c in range(width):
            base = r * stride + c * 3
            rgb = (
                pixels_rgb[base],
                pixels_rgb[base + 1],
                pixels_rgb[base + 2],
            )
            if rgb not in palette:
                if len(palette) == 256:
                    raise ValueError("paletted PNG needs <=256 distinct colors")
                palette[rgb] = len(palette)
            row.append(palette[rgb])
        idx_rows.append(row)
    plte = b"".join(bytes(rgb) for rgb in palette)
    return _png_encode_body(idx_rows, width, height, 1, 3, interlace, plte)


def decode_png(content: bytes, want_pixels: bool = False) -> dict:
    """Parse an 8-bit gray/RGB/RGBA/paletted PNG, sequential OR Adam7
    interlaced: chunk walk, zlib inflate, full per-(sub-)image
    unfilter (all five filter types), deinterlace scatter, PLTE
    index->RGB mapping, per-channel means.

    Pure stdlib (struct + zlib) — no image library. Raises ValueError
    on non-8-bit files. Paletted rows report ``channels=3`` (the
    palette-mapped view, matching the GIF decoder's convention).
    ``want_pixels`` adds ``pixels``: flat top-row-major [r,g,b,...]
    ints (gray replicated, alpha dropped)."""
    import zlib

    if len(content) < 8 or content[:8] != _PNG_SIG:
        raise ValueError("not a PNG file")
    pos, ihdr, idat, plte = 8, None, bytearray(), b""
    while pos + 8 <= len(content):
        (size,) = struct.unpack(">I", content[pos : pos + 4])
        ctype = content[pos + 4 : pos + 8]
        chunk = content[pos + 8 : pos + 8 + size]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk[:13])
        elif ctype == b"PLTE":
            plte = bytes(chunk)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        pos += 12 + size  # len + type + payload + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    width, height, depth, ctype_n, _, _, interlace = ihdr
    # bytes per pixel IN THE FILTERED STREAM: palette indices are 1
    bpp = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype_n)
    if depth != 8 or bpp is None or interlace not in (0, 1):
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={ctype_n}, interlace={interlace})"
        )
    if ctype_n == 3 and (not plte or len(plte) % 3):
        raise ValueError("paletted PNG missing/malformed PLTE")
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        rows, _ = _unfilter_rows(raw, 0, height, width * bpp, bpp)
    else:
        # Adam7: unfilter each non-empty pass independently, scatter
        # its pixels back to the full-resolution grid
        rows = [bytearray(width * bpp) for _ in range(height)]
        offset = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx if width > x0 else 0
            ph = (height - y0 + dy - 1) // dy if height > y0 else 0
            if pw == 0 or ph == 0:
                continue
            pass_rows, offset = _unfilter_rows(raw, offset, ph, pw * bpp, bpp)
            for py in range(ph):
                dst = rows[y0 + py * dy]
                src = pass_rows[py]
                for px in range(pw):
                    x = x0 + px * dx
                    dst[x * bpp : (x + 1) * bpp] = src[px * bpp : (px + 1) * bpp]
    if ctype_n == 3:
        # map indices through PLTE -> RGB rows, then treat as 3-channel
        nplte = len(plte) // 3
        mapped = []
        for row in rows:
            out_row = bytearray()
            for idx in row:
                if idx >= nplte:
                    raise ValueError(f"palette index {idx} out of range")
                out_row += plte[idx * 3 : idx * 3 + 3]
            mapped.append(out_row)
        rows, channels = mapped, 3
    else:
        channels = bpp
    sums = [0] * channels
    pixels: list = []
    for row in rows:
        for c in range(channels):
            sums[c] += sum(row[c::channels])
        if want_pixels:
            for c in range(width):
                base_c = c * channels
                if channels >= 3:
                    pixels += [row[base_c], row[base_c + 1], row[base_c + 2]]
                else:
                    pixels += [row[base_c]] * 3
    n = width * height
    out = {
        "format": "png",
        "width": width,
        "height": height,
        "channels": channels,
    }
    if want_pixels:
        out["pixels"] = pixels
    if channels >= 3:
        out["mean_r"], out["mean_g"], out["mean_b"] = (
            sums[0] / n,
            sums[1] / n,
            sums[2] / n,
        )
    else:
        out["mean_r"] = out["mean_g"] = out["mean_b"] = sums[0] / n
    return out


# GIF: the palette is part of the closed-form contract — synthesize_media
# writes index j = (media_id*7 + j) % 251 against THIS table, and the
# SQL oracle recomputes channel means through the same mapping.
def _gif_palette(i: int) -> tuple[int, int, int]:
    return (i % 256, (i * 2) % 256, (i * 5) % 256)


def _lzw_encode(indices: list, min_code_size: int = 8) -> bytes:
    """GIF-variant LZW compression (LSB-first variable-width codes).

    The spec's rules in full: emit CLEAR first, grow the code width
    when the next assignable code would not fit, reset the dictionary
    at 4096 entries, emit END-OF-INFORMATION last."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    table: dict[tuple, int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, code_size)
    seq: tuple = ()
    for raw in indices:
        idx = int(raw)
        cand = seq + (idx,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq], code_size)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # Width grows ONE ENTRY LATE relative to the table bound:
            # the decoder's additions lag the encoder's by exactly one
            # emission (its first read adds nothing), so its table hits
            # 2^w — and its read width bumps — only as it consumes the
            # code AFTER the encoder assigned entry 2^w - 1.
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:
            emit(clear, code_size)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        seq = (idx,)
    if seq:
        emit(table[seq], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int = 8) -> list:
    """GIF-variant LZW decompression (the decoder-side spec rules:
    width grows when the next ASSIGNABLE code would overflow, CLEAR
    resets, the KwKwK case appends the sequence's own first index)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    table: list[tuple] = [(i,) for i in range(clear)] + [(), ()]
    out: list[int] = []
    prev: tuple | None = None
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("LZW stream ended without EOI")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [(i,) for i in range(clear)] + [(), ()]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if code < len(table):
            seq = table[code]
        elif code == len(table) and prev is not None:
            seq = prev + (prev[0],)  # KwKwK
        else:
            raise ValueError(f"corrupt LZW code {code}")
        out.extend(seq)
        if prev is not None and len(table) < 4096:
            table.append(prev + (seq[0],))
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = seq


def encode_gif(indices: list, width: int, height: int) -> bytes:
    """Build a REAL GIF89a: logical screen descriptor, 256-entry global
    color table (``_gif_palette``), image descriptor, LZW-compressed
    8-bit index stream in length-prefixed sub-blocks. Output opens in
    any image viewer."""
    if len(indices) != width * height:
        raise ValueError("indices must be width*height long")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)  # GCT, 256 entries
    for i in range(256):
        out += bytes(_gif_palette(i))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    out.append(8)  # LZW minimum code size
    lzw = _lzw_encode(indices, 8)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(content: bytes, want_pixels: bool = False) -> dict:
    """Parse a GIF87a/89a: header + screen descriptor walk, global
    color table, extension-block skip, full LZW decompression of the
    first image, palette-mapped per-channel means. Pure stdlib.
    Raises ValueError on interlaced or local-color-table images."""
    if len(content) < 13 or content[:4] != b"GIF8" or content[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF file")
    width, height, flags, _, _ = struct.unpack("<HHBBB", content[6:13])
    pos = 13
    palette: list[tuple] = []
    if flags & 0x80:
        n_colors = 2 << (flags & 0x07)
        palette = [
            tuple(content[pos + 3 * i : pos + 3 * i + 3]) for i in range(n_colors)
        ]
        pos += 3 * n_colors
    while pos < len(content):
        block = content[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(content) and content[pos] != 0:
                pos += 1 + content[pos]
            pos += 1
        elif block == 0x2C:
            # left/top ignored: only full-frame first images supported
            _, _, iw, ih, iflags = struct.unpack("<HHHHB", content[pos + 1 : pos + 10])
            pos += 10
            if iflags & 0x40:
                raise ValueError("interlaced GIF unsupported")
            if iflags & 0x80:
                raise ValueError("local color table unsupported")
            if not palette:
                raise ValueError("missing global color table")
            min_code = content[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(content) and content[pos] != 0:
                size = content[pos]
                lzw += content[pos + 1 : pos + 1 + size]
                pos += 1 + size
            indices = _lzw_decode(bytes(lzw), min_code)
            if len(indices) < iw * ih:
                raise ValueError("truncated GIF index stream")
            sums = [0, 0, 0]
            pixels: list = [] if want_pixels else None
            for idx in indices[: iw * ih]:
                if idx >= len(palette):
                    raise ValueError(f"palette index {idx} out of range")
                r, g, b = palette[idx]
                sums[0] += r
                sums[1] += g
                sums[2] += b
                if want_pixels:
                    pixels += [r, g, b]
            n = iw * ih
            out = {
                "format": "gif",
                "width": iw,
                "height": ih,
                "channels": 3,
                "mean_r": sums[0] / n,
                "mean_g": sums[1] / n,
                "mean_b": sums[2] / n,
            }
            if want_pixels:
                out["pixels"] = pixels
            return out
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("no image descriptor in GIF")


# A structurally valid baseline-JPEG marker stream. Entropy decode
# needs a Huffman+IDCT library tier (documented stub); the METADATA
# walk below is the real 100 TB ingest operation — dimensions and
# channel count from the SOF header without decoding, the `identify`
# shape. The shell writes genuine markers (JFIF APP0, DQT, SOF0, a
# minimal legal DHT, SOS) so the walker parses real files.
def encode_jpeg_shell(width: int, height: int, channels: int = 3) -> bytes:
    out = bytearray(b"\xff\xd8")  # SOI
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    dqt = bytes([0]) + bytes([16] * 64)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    sof = bytearray(struct.pack(">BHHB", 8, height, width, channels))
    for c in range(channels):
        sof += bytes([c + 1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dht = bytes([0x00]) + bytes([1] + [0] * 15) + bytes([0])  # one 1-bit code
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    sos = bytearray([channels])
    for c in range(channels):
        sos += bytes([c + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += b"\x55" * 8  # entropy placeholder (no 0xFF bytes)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


_SOF_MARKERS = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def decode_jpeg_meta(content: bytes) -> dict:
    """JPEG metadata via a marker-segment walk: dimensions, channel
    count, and precision from the SOF header — NO entropy decode (the
    ``identify`` operation a 100 TB ingest runs; pixel statistics for
    JPEG need the library decode tier). Pure struct parsing; raises
    ValueError on a malformed marker stream."""
    if len(content) < 4 or content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file")
    pos = 2
    orientation = None
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        marker = content[pos + 1]
        if marker in (0xD9, 0xDA):  # EOI / start-of-scan: SOF must precede
            break
        (seglen,) = struct.unpack(">H", content[pos + 2 : pos + 4])
        if marker == 0xE1:  # APP1: EXIF orientation rides the identify tier
            from linkmerce_spark.operators.jpeg import parse_exif_orientation

            orientation = (
                parse_exif_orientation(content[pos + 4 : pos + 2 + seglen])
                or orientation
            )
        if marker in _SOF_MARKERS:
            precision, h, w, nc = struct.unpack(
                ">BHHB", content[pos + 4 : pos + 10]
            )
            if precision not in (8, 12, 16):
                raise ValueError(f"bad JPEG sample precision {precision}")
            out = {
                "format": "jpeg",
                "width": w,
                "height": h,
                "channels": nc,
            }
            if orientation is not None:
                out["orientation"] = orientation
            return out
        pos += 2 + seglen
    raise ValueError("no SOF marker before scan data")


def encode_wav(samples: list, sample_rate: int = 8000) -> bytes:
    """Build a REAL mono 16-bit PCM WAV file (RIFF/WAVE/fmt/data)."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(content: bytes, want_samples: bool = False) -> dict:
    """Parse a PCM WAV via a RIFF chunk walk: format fields, duration,
    RMS amplitude of the 16-bit samples. Pure struct parsing.
    ``want_samples`` adds ``samples``: the raw int16 sample tuple."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid, size = content[pos : pos + 4], struct.unpack("<I", content[pos + 4 : pos + 8])[0]
        chunk = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    n_samples = len(data) // 2
    samples = struct.unpack(f"<{n_samples}h", data[: n_samples * 2])
    n_frames = n_samples // channels
    out = {
        "format": "wav",
        "channels": channels,
        "sample_rate": sample_rate,
        "duration_ms": n_frames * 1000 // sample_rate,
        "rms": math.sqrt(sum(s * s for s in samples) / n_samples) if n_samples else 0.0,
    }
    if want_samples:
        out["samples"] = samples
    return out


MEDIA_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("format", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("mean_b", DoubleType(), True),
        StructField("mean_g", DoubleType(), True),
        StructField("mean_r", DoubleType(), True),
        StructField("rms", DoubleType(), True),
        StructField("parse_error", StringType(), True),
    ]
)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_samples", LongType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("peak", IntegerType(), True),
        StructField("zero_crossings", LongType(), True),
        StructField("energy", LongType(), True),
        StructField("parse_error", StringType(), True),
    ]
)


def extract_audio_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Audio feature extraction over real PCM WAV bytes: the integer-
    exact signal features a curation pipeline screens on (silence,
    clipping, tone-vs-noise) before any model-based processing.

    - ``peak``: max absolute sample (clipping / silence detector);
    - ``zero_crossings``: count of sign flips between consecutive
      samples (``s[i-1] < 0 <= s[i]`` or ``s[i-1] >= 0 > s[i]`` — the
      integer rule, no epsilon), the classic voiced/unvoiced proxy;
    - ``energy``: sum of squared samples (exact int64; samples are
      16-bit so 2^31 per sample x stream length stays far below 2^63).

    All-integer outputs, so the SQL twin reproduces them bit-for-bit
    from the fixture's generating formula. Same degrade contract as
    the stats kernel: malformed bytes -> ``parse_error`` row."""
    cols = [f.name for f in AUDIO_FEATURES_SCHEMA.fields]

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, content in zip(pdf["media_id"], pdf[content_col]):
                row = {c: None for c in cols}
                row["media_id"] = media_id
                try:
                    if content is None:
                        raise ValueError("null content")
                    d = decode_wav(bytes(content), want_samples=True)
                    s = d["samples"]
                    row["n_samples"] = len(s)
                    row["sample_rate"] = d["sample_rate"]
                    row["peak"] = max((abs(v) for v in s), default=0)
                    row["zero_crossings"] = sum(
                        1
                        for a, b in zip(s, s[1:])
                        if (a < 0 <= b) or (a >= 0 > b)
                    )
                    row["energy"] = sum(v * v for v in s)
                except Exception as e:  # noqa: BLE001 — never fail a stage
                    row["parse_error"] = f"{type(e).__name__}: {e}"
                out.append(row)
            yield pd.DataFrame(out, columns=cols)

    from linkmerce_spark.shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    return df.mapInPandas(_kernel, schema=AUDIO_FEATURES_SCHEMA)


def extract_media_stats(df: DataFrame, content_col: str = "content") -> DataFrame:
    """REAL media decode over ``mapInPandas``: BMP and WAV bytes are
    parsed field-by-field (``decode_bmp`` / ``decode_wav``); anything
    else — including malformed bytes — yields a row with
    ``parse_error`` set. A bad file must never fail a 100 TB stage."""

    cols = [f.name for f in MEDIA_STATS_SCHEMA.fields]

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf[content_col]
            ):
                row = {c: None for c in cols}
                row["media_id"], row["kind"] = media_id, kind
                try:
                    if content is None:
                        raise ValueError("null content")
                    content = bytes(content)
                    if content[:2] == b"BM":
                        row.update(decode_bmp(content))
                        row.pop("flipped", None)
                    elif content[:8] == _PNG_SIG:
                        row.update(decode_png(content))
                    elif content[:4] == b"GIF8":
                        row.update(decode_gif(content))
                    elif content[:4] == b"RIFF" and content[8:12] == b"AVI ":
                        from linkmerce_spark.operators.video import decode_avi

                        row.update(decode_avi(content))
                    elif content[:2] == b"\xff\xd8":
                        # Full baseline decode (operators/jpeg.py) where
                        # the stream is baseline 4:4:4/gray; progressive
                        # or subsampled streams degrade to the metadata
                        # walk — dimensions without pixel means, the
                        # `identify` tier.
                        from linkmerce_spark.operators.jpeg import decode_jpeg

                        try:
                            row.update(decode_jpeg(content))
                        except Exception:  # noqa: BLE001 — any entropy-
                            # level failure (unsupported mode, missing
                            # table, truncated scan) degrades to the
                            # header tier; header-level corruption then
                            # raises out of the meta walk into parse_error.
                            row.update(decode_jpeg_meta(content))
                    else:
                        row.update(decode_wav(content))
                except Exception as e:  # noqa: BLE001 — the contract is
                    # "a bad file must never fail a 100 TB stage": malformed
                    # headers raise struct.error / ZeroDivisionError /
                    # IndexError, not just ValueError, and ALL of them must
                    # land in parse_error rather than kill the task.
                    row["parse_error"] = f"{type(e).__name__}: {e}"
                out.append(row)
            yield pd.DataFrame(out, columns=cols)

    from linkmerce_spark.shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    return df.mapInPandas(_kernel, schema=MEDIA_STATS_SCHEMA)


def synthesize_media(df: DataFrame) -> DataFrame:
    """Deterministic media ingestion stand-in producing REAL files.

    For each (media_id, kind) row emits genuine container bytes built
    executor-side. ``kind='image'`` at ``4 + id%5`` x ``2 + id%3``
    routes by ``media_id % 8``:

    - ``0`` -> uncompressed 24-bit BMP, pixel byte j =
      ``(media_id*7 + j) % 251`` in file order B,G,R;
    - ``2`` -> 8-bit PNG (same byte formula, order R,G,B, rows
      zlib-deflated through the cycling 0-4 filter schedule). Image
      ids are multiples of 10, so ``mid % 32`` further picks the
      container layout over IDENTICAL pixels: 2 sequential RGB, 10
      Adam7 interlaced RGB, 18 paletted (PLTE = distinct colors in
      first-appearance order), 26 interlaced+paletted — the oracle
      values don't move, the hash gates the deinterlace/palette
      decode paths;
    - ``4`` -> GIF89a: palette INDEX j = ``(media_id*7 + j) % 251``
      LZW-compressed against the fixed ``_gif_palette`` table
      (r=i, g=2i%256, b=5i%256);
    - ``6`` -> a REAL baseline JPEG (operators/jpeg.py: FDCT,
      quantization, optimized Huffman entropy coding). ``id%16==6``:
      4:4:4 at 16x16 with a different solid color per 8x8 block
      (block f=``2*by+bx``, colors r=``(id*7+19f)%251``,
      g=``(id*11+23f)%251``, b=``(id*13+29f)%251`` — the AVI frame
      formula), so the scan carries real multi-block DC prediction
      while every block stays DC-only/closed-form. ``id%16==14``:
      4:2:0 of the solid f=0 color (a block pattern would put AC
      energy into the subsampled chroma). Decoded means are
      closed-form either way: color-convert -> DC quantize/
      reconstruct -> inverse convert, every rounding
      ``floor(x+0.5)``.

    ``kind='video'`` -> a REAL Motion-JPEG AVI (operators/video.py):
    ``2 + id%3`` frames at 10 fps, frame ``f`` a solid-color JPEG with
    r=``(id*7+19f)%251``, g=``(id*11+23f)%251``, b=``(id*13+29f)%251``
    — container walk, frame iteration, and the JPEG entropy decode all
    run on genuine bytes, and the frame-averaged means stay
    closed-form.

    Anything else -> a mono 16-bit PCM WAV of ``32 + id%50`` samples
    at 8 kHz with sample i = ``(media_id*31 + i*17) % 2048 - 1024``.
    The closed-form content lets a SQL oracle reproduce the decoded
    stats exactly while the decode side parses real bytes."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("content", BinaryType(), True),
        ]
    )

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = []
            for media_id, kind in zip(pdf["media_id"], pdf["kind"]):
                mid = int(media_id)
                if kind == "image":
                    w, h = 4 + mid % 5, 2 + mid % 3
                    route = mid % 8
                    if route == 6:
                        from linkmerce_spark.operators.jpeg import (
                            encode_jpeg,
                            encode_jpeg_progressive,
                        )

                        # Half of each JPEG sub-route encodes the SAME
                        # pixels PROGRESSIVELY (SOF2, mid % 32 picks):
                        # the quantized coefficients are identical, so
                        # every closed-form oracle value is unchanged —
                        # the hash gate then proves the progressive
                        # entropy decode, not just the container walk.
                        if mid % 16 == 6:
                            # 4:4:4 at 16x16 with a DIFFERENT solid color
                            # per 8x8 block (block index f = 2*by + bx,
                            # the same (id, f) color formula as the AVI
                            # frames): every block stays DC-only, so the
                            # lossy chain is still closed-form, but the
                            # scan now carries real multi-block DC
                            # prediction and four distinct entropy runs.
                            w, h = 16, 16
                            rgb = []
                            for r in range(h):
                                for c in range(w):
                                    f = 2 * (r // 8) + (c // 8)
                                    rgb += [
                                        (mid * 7 + 19 * f) % 251,
                                        (mid * 11 + 23 * f) % 251,
                                        (mid * 13 + 29 * f) % 251,
                                    ]
                            enc = (
                                encode_jpeg_progressive
                                if mid % 32 == 6
                                else encode_jpeg
                            )
                            content.append(enc(rgb, w, h, 3))
                        else:
                            # subsampled routes stay solid (a per-block
                            # pattern would put AC energy into the
                            # subsampled chroma and leave closed form).
                            # mid%32==14 -> progressive 4:2:0,
                            # mid%32==30 -> baseline 4:1:1 (the exotic
                            # 4x1 sampling container — solid color
                            # decodes to the SAME pixels as 4:2:0, so
                            # every closed-form oracle value is
                            # unchanged and the hash gate proves the
                            # generalized-sampling decode path).
                            rgb = [
                                (mid * 7) % 251,
                                (mid * 11) % 251,
                                (mid * 13) % 251,
                            ] * (w * h)
                            if mid % 32 == 14:
                                content.append(
                                    encode_jpeg_progressive(
                                        rgb, w, h, 3, subsampling="420"
                                    )
                                )
                            else:
                                content.append(
                                    encode_jpeg(rgb, w, h, 3, subsampling="411")
                                )
                    elif route == 4:
                        idx = [(mid * 7 + j) % 251 for j in range(w * h)]
                        content.append(encode_gif(idx, w, h))
                    else:
                        px = [(mid * 7 + j) % 251 for j in range(w * h * 3)]
                        if route == 0:
                            content.append(encode_bmp(px, w, h))
                        else:
                            # image ids are multiples of 10, so the PNG
                            # route (mid%8==2) is mid%32 in {2,10,18,26}
                            # — four sub-variants of the SAME RGB bytes:
                            # sequential, Adam7 interlaced, paletted,
                            # interlaced+paletted. Pixels are identical,
                            # so every closed-form oracle value is
                            # unchanged and the hash gate proves the
                            # deinterlace/PLTE decode paths.
                            sub = mid % 32
                            enc = (
                                encode_png_paletted
                                if sub in (18, 26)
                                else encode_png
                            )
                            content.append(
                                enc(px, w, h, interlace=sub in (10, 26))
                            )
                elif kind == "video":
                    from linkmerce_spark.operators.video import (
                        encode_solid_mjpeg_avi,
                    )

                    w, h = 4 + mid % 5, 2 + mid % 3
                    content.append(
                        encode_solid_mjpeg_avi(mid, w, h, 2 + mid % 3)
                    )
                else:
                    n = 32 + mid % 50
                    samples = [((mid * 31 + i * 17) % 2048) - 1024 for i in range(n)]
                    content.append(encode_wav(samples, 8000))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": content,
                }
            )

    from linkmerce_spark.shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    return df.select("media_id", "kind").mapInPandas(_kernel, schema=out_schema)


def repartition_for_media(df: DataFrame, rows_per_partition: int = 1024) -> DataFrame:
    """Size partitions by ROW COUNT, not bytes.

    File-split sizing assumes narrow rows; a binary media column makes
    a 128 MB split hold gigabytes decoded. One cheap count picks the
    partition count so each Arrow batch stays bounded.
    """
    n = df.count()
    parts = max(1, -(-n // rows_per_partition))
    return df.repartition(parts)
