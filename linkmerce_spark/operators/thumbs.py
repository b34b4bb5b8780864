"""Media thumbnails: REAL decode -> integer area-average resize.

Closes the multimodal quartet the build brief names — decode,
feature-extract, RESIZE, frame-sample — with a resize that is both a
genuine image operation and oracle-twinnable:

- ``area_resize``: box-filter downscale (what OpenCV calls
  ``INTER_AREA``, the correct filter for shrinking) in PURE INTEGER
  arithmetic — target cell ``(ti, tj)`` averages the source box
  ``[floor(ti*h/oh), floor((ti+1)*h/oh))`` x same for columns, value
  ``floor(sum/count)``; when a box is empty (upscale axis) the cell
  takes the box-center source pixel (nearest-neighbor fallback).
  Every step is integer division, so a SQL twin reproduces the
  thumbnail bit-for-bit from the fixture's generating formulas.
- ``extract_thumbnails``: the ``mapInPandas`` kernel — any container
  the real decode tier handles (BMP/PNG/GIF/baseline JPEG, and AVI
  via its first sampled frame) becomes a fixed ``oh x ow x 3``
  feature vector (flat [r,g,b,...], row-major). Fixed-size vectors
  feed the ANN family (operators/similarity) unchanged — this is the
  image-dedup / image-similarity entry point.

Scale notes: one Python pass per media row inside the same Arrow
kernel as the stats tier; output rows are fixed-width (3*oh*ow ints)
regardless of source size, so downstream shuffles are bounded. Audio
rows and undecodable streams yield NULL thumbnails with the error
recorded, never a task failure.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["THUMB_SCHEMA", "area_resize", "extract_thumbnails"]

THUMB_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("format", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("thumb", ArrayType(IntegerType()), True),
        StructField("parse_error", StringType(), True),
    ]
)


def area_resize(
    pixels: list, width: int, height: int, out_w: int, out_h: int
) -> list:
    """Integer box-filter resize of a flat [r,g,b,...] top-row-major
    pixel list to ``out_h x out_w``, returned in the same layout.

    Downscale: each target cell is ``floor(mean)`` of its source box.
    Upscale axis (empty box): the box-center source pixel — i.e.
    nearest neighbor, ``src = floor((2*t+1)*n / (2*out))``."""
    out = []
    for ti in range(out_h):
        r_lo, r_hi = ti * height // out_h, (ti + 1) * height // out_h
        if r_hi <= r_lo:
            r_lo = (2 * ti + 1) * height // (2 * out_h)
            r_hi = r_lo + 1
        for tj in range(out_w):
            c_lo, c_hi = tj * width // out_w, (tj + 1) * width // out_w
            if c_hi <= c_lo:
                c_lo = (2 * tj + 1) * width // (2 * out_w)
                c_hi = c_lo + 1
            cnt = (r_hi - r_lo) * (c_hi - c_lo)
            for ch in range(3):
                s = 0
                for r in range(r_lo, r_hi):
                    base = (r * width) * 3 + ch
                    for c in range(c_lo, c_hi):
                        s += pixels[base + 3 * c]
                out.append(s // cnt)
    return out


def extract_thumbnails(
    df: DataFrame,
    content_col: str = "content",
    out_w: int = 4,
    out_h: int = 4,
) -> DataFrame:
    """Decode every media row to pixels (image containers; first
    sampled frame for AVI video) and area-resize to a fixed
    ``out_h x out_w`` RGB thumbnail vector."""
    cols = [f.name for f in THUMB_SCHEMA.fields]

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from linkmerce_spark.operators.jpeg import decode_jpeg
        from linkmerce_spark.operators.multimodal import (
            _PNG_SIG,
            decode_bmp,
            decode_gif,
            decode_png,
        )
        from linkmerce_spark.operators.video import decode_avi

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
                        d = decode_bmp(content, want_pixels=True)
                    elif content[:8] == _PNG_SIG:
                        d = decode_png(content, want_pixels=True)
                    elif content[:4] == b"GIF8":
                        d = decode_gif(content, want_pixels=True)
                    elif content[:2] == b"\xff\xd8":
                        d = decode_jpeg(content, want_pixels=True)
                    elif content[:4] == b"RIFF" and content[8:12] == b"AVI ":
                        d = decode_avi(content, want_pixels=True)
                    else:
                        raise ValueError(
                            f"no pixel tier for this container ({kind})"
                        )
                    row["format"] = d["format"]
                    row["width"], row["height"] = d["width"], d["height"]
                    row["thumb"] = area_resize(
                        d["pixels"], d["width"], d["height"], out_w, out_h
                    )
                except Exception as e:  # noqa: BLE001 — same contract as
                    # extract_media_stats: a bad file never fails a stage.
                    row["parse_error"] = f"{type(e).__name__}: {e}"
                out.append(row)
            yield pd.DataFrame(out, columns=cols)

    from linkmerce_spark.shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    return df.mapInPandas(_kernel, schema=THUMB_SCHEMA)
