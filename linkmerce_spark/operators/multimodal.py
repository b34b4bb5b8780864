"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Training-data pipelines carry media as ``binary`` columns with a typed
metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` (the only layer where Python is the right tool — the
codec itself is imperative). The media codec libraries are not
available in this environment, so the decode kernels are STUBBED:
``decode_stub=True`` produces a deterministic fake (byte-hash derived
"pixels"), and ``decode_stub=False`` raises ``NotImplementedError``
where the real libraries (PIL/ffmpeg) would be called. The Spark-side
plumbing — schema, batch iteration, partition sizing — is real and
tested (tests/test_multimodal.py).

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
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "decode_media_features",
    "repartition_for_media",
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


def repartition_for_media(df: DataFrame, rows_per_partition: int = 1024) -> DataFrame:
    """Size partitions by ROW COUNT, not bytes.

    File-split sizing assumes narrow rows; a binary media column makes
    a 128 MB split hold gigabytes decoded. One cheap count picks the
    partition count so each Arrow batch stays bounded.
    """
    n = df.count()
    parts = max(1, -(-n // rows_per_partition))
    return df.repartition(parts)
