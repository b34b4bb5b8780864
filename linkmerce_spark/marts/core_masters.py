"""Core item-derived masters: the product and brand dimension views.

Parity targets (semantics, not code):
- ``product_master`` ~ core__product_master (dbt_postgres/models/
  intermediate/core__product_master.sql:10-31): DISTINCT ON
  (product_id) over the raw item catalog ordered by item_seq ASC NULLS
  LAST, non-NULL product ids only, the picked row's rank kept as ``rn``.
- ``brand_master``   ~ core__brand_master (core__brand_master.sql:
  10-34): '2'-prefixed product ids with a real brand label, a global
  ``brand_seq`` (team DESC NULLS LAST, product ASC), deduped to one row
  per product AND per brand (rn1 = rn2 = 1 by item_seq).

Determinism deviation (documented): the reference's brand_seq ordering
(team_name, product_id) is not unique when one product has several item
rows, so which duplicate receives which seq — and therefore the seq on
the surviving row — is engine-arbitrary there. We append
(item_seq ASC NULLS LAST, item_id) tiebreaks, which never changes the
reference's result when it IS deterministic and pins it when it isn't.

Scale notes
-----------
- item is a dimension feed; the DISTINCT ON windows partition on
  product_id/brand_name (fine-grained). brand_seq is a global
  row_number over the filtered brand rows — brand cardinality, not fact
  cardinality; it runs through global_row_number (range-partitioned
  numbering, no single-reducer sort) so even a pathological catalog
  cannot bottleneck one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkmerce_spark.operators.rownum import global_row_number

__all__ = ["product_master", "brand_master"]

_ITEM_ATTRS = [
    "item_id",
    "item_seq",
    "team_name",
    "brand_name",
    "category_name1",
    "category_name2",
    "category_name3",
    "category_name4",
    "color",
    "product_name",
    "unit_name",
    "unit_scale",
]


def product_master(item: DataFrame) -> DataFrame:
    """One row per product_id, lowest item_seq first (NULLS LAST)."""
    w = Window.partitionBy("product_id").orderBy(
        F.col("item_seq").asc_nulls_last(), F.col("item_id").asc()
    )
    return (
        item.filter(F.col("product_id").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("product_id", *_ITEM_ATTRS, "rn")
    )


def brand_master(item: DataFrame) -> DataFrame:
    """'2'-prefixed branded products with a stable global brand_seq."""
    base = item.filter(
        F.col("product_id").startswith("2")
        & F.nullif(F.col("brand_name"), F.lit("브랜드 없음")).isNotNull()
    ).select(
        F.col("product_id").alias("brand_id"),
        "item_id",
        "item_seq",
        "team_name",
        "brand_name",
    )
    seq = global_row_number(
        base,
        [
            F.col("team_name").desc_nulls_last(),
            F.col("brand_id").asc(),
            F.col("item_seq").asc_nulls_last(),
            F.col("item_id").asc(),
        ],
        col_name="brand_seq",
    )
    order1 = [F.col("item_seq").asc_nulls_last(), F.col("item_id").asc()]
    w1 = Window.partitionBy("brand_id").orderBy(*order1)
    w2 = Window.partitionBy("brand_name").orderBy(*order1)
    return (
        seq.withColumn("rn1", F.row_number().over(w1))
        .withColumn("rn2", F.row_number().over(w2))
        .filter((F.col("rn1") == 1) & (F.col("rn2") == 1))
        .select("brand_id", "item_id", "item_seq", "team_name", "brand_name", "brand_seq")
    )
