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
