"""searchad — the reference's ad-report dataset, Spark-first.

Per-dataset module in the ``core/{platform}/{host}/{category}`` shape
for the SearchAd master/report pipeline. Parity sites (semantics, not
code) in ``core/searchad/api/report/models.sql``:

- Campaign/Adgroup bulk_insert projections + boolean derivations
  (``"ON/OFF" = 0`` -> is_enabled, ``delTm IS NOT NULL`` -> is_deleted):
  models.sql:20-35,70-91
- campaign_type / adgroup_type / ad_type enum dimensions
  (UNNEST(STRUCT...) blocks): models.sql:37-45,93-107,610-625
- landing-URL product-id extraction (REGEXP_MATCHES + trailing-digits
  REGEXP_EXTRACT + TRY_CAST): models.sql:290-297,401-404
- shopping_product COALESCE(NULLIF(..)) fallbacks + TRY_CAST category
  ids: models.sql:341-356
- MasterAd transform_* staged UNION ALL with per-stage ad_type codes
  and COALESCE(category_id4..1), ON CONFLICT DO NOTHING across stages:
  models.sql:458-608
- AdvancedReport bulk_insert_ad_stat / _ad_conv pre-aggregations with
  the conditional direct-conversion sums: models.sql:712-773
- AdvancedReport merge_insert: the FULL OUTER stat-vs-conv join on the
  full PK with COALESCE'd keys and zero-filled measures:
  models.sql:775-797

Scale notes
-----------
- Every parse stage is a narrow projection (no shuffle, whole-stage
  codegen); the regex runs JVM-side.
- The stat/conv rollups are partial-aggregated groupBys on the report
  PK — uniform keys (ymd x ad x media x device), no skew.
- The FULL OUTER merge joins two aggregates that share the grouping
  key, so both sides are already co-partitioned by the shuffle of
  their groupBy; Catalyst reuses the exchange where possible.
- The staged master-ad dedup is one keyed shuffle (row_number window
  per ad_id over the stage rank) — the distributed equivalent of the
  reference's sequential ON CONFLICT inserts.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkmerce_spark.operators.dedup import dedupe_keep_first

__all__ = [
    "CAMPAIGN_TYPES",
    "ADGROUP_TYPES",
    "AD_TYPES",
    "INSPECT_STATUS",
    "extract_product_id",
    "parse_campaign",
    "parse_adgroup",
    "master_ads",
    "rollup_ad_stat",
    "rollup_ad_conv",
    "advanced_report",
]

# models.sql:37-45
CAMPAIGN_TYPES: Mapping[int, str] = {
    1: "powerlink",
    2: "shopping_search",
    3: "power_contents",
    4: "brand_search",
    5: "place",
}

# models.sql:93-107 (codes; names normalized to ascii slugs)
ADGROUP_TYPES: Mapping[int, str] = {
    1: "powerlink",
    2: "shopping_mall_product",
    3: "contents_info",
    4: "contents_product",
    5: "brand_basic",
    6: "place_local",
    7: "shopping_catalog",
    8: "brand_brand",
    9: "shopping_brand",
    10: "place_search",
    11: "brand_new_product",
}

# models.sql:610-625
AD_TYPES: Mapping[int, str] = {
    1: "powerlink_single",
    2: "shopping_product",
    3: "contents_info",
    9: "shopping_brand",
    12: "shopping_brand_thumbnail",
    13: "shopping_brand_banner",
}

# models.sql:136 comment
INSPECT_STATUS: Mapping[int, str] = {10: "pending", 20: "approved", 30: "held", 40: "rejected"}

_PRODUCT_URL_PAT = r"^https://(brand|smartstore)\.naver\.com/[^/]+/products/(\d+)"


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def extract_product_id(url: Column | str) -> Column:
    """Product id from a store landing URL, or NULL.

    models.sql:290-297: only URLs matching the brand/smartstore product
    pattern yield an id; the id is the trailing digit run, TRY_CAST so
    malformed tails become NULL instead of failing the batch.
    """
    u = _c(url)
    return (
        F.when(u.rlike(_PRODUCT_URL_PAT), F.regexp_extract(u, r"(\d+)$", 1))
        .otherwise(F.lit(None))
        .try_cast("bigint")
    )


def _flags(raw: DataFrame) -> list[Column]:
    # "ON/OFF" = 0 -> enabled; delTm set -> deleted (models.sql:30-31)
    return [
        (_c("on_off") == 0).alias("is_enabled"),
        _c("del_tm").isNotNull().alias("is_deleted"),
    ]


def parse_campaign(raw: DataFrame) -> DataFrame:
    """Campaign bulk_insert (models.sql:20-35): projection + flag
    derivations + PK insert-ignore (first occurrence wins by seq)."""
    out = raw.select(
        _c("campaign_id").cast("string").alias("campaign_id"),
        _c("campaign_name").alias("campaign_name"),
        _c("campaign_type").cast("int").alias("campaign_type"),
        _c("customer_id").cast("long").alias("customer_id"),
        *_flags(raw),
        _c("reg_tm").alias("created_at"),
        _c("del_tm").alias("deleted_at"),
        _c("seq").alias("seq"),
    )
    return dedupe_keep_first(out, ["campaign_id"], [F.col("seq").asc()]).drop("seq")


def parse_adgroup(raw: DataFrame) -> DataFrame:
    """Adgroup bulk_insert (models.sql:70-91)."""
    out = raw.select(
        _c("adgroup_id").cast("string").alias("adgroup_id"),
        _c("campaign_id").cast("string").alias("campaign_id"),
        _c("adgroup_name").alias("adgroup_name"),
        _c("adgroup_type").cast("int").alias("adgroup_type"),
        _c("customer_id").cast("long").alias("customer_id"),
        *_flags(raw),
        _c("bid_amount").cast("int").alias("bid_amount"),
        _c("seq").alias("seq"),
    )
    return dedupe_keep_first(out, ["adgroup_id"], [F.col("seq").asc()]).drop("seq")


_MASTER_COLS = [
    "ad_id",
    "adgroup_id",
    "ad_type",
    "customer_id",
    "title",
    "landing_url_pc",
    "product_id",
    "category_id",
    "is_enabled",
    "is_deleted",
    "bid_amount",
    "sales_price",
]


def _as_master(df: DataFrame, ad_type: int, stage: int, **cols: Column) -> DataFrame:
    """Normalize one staged ad shape to the master column set
    (models.sql:458-608: each transform_* projects its stage into the
    master table with a constant ad_type)."""
    defaults: dict[str, Column] = {
        "title": F.lit(None).cast("string"),
        "landing_url_pc": F.lit(None).cast("string"),
        "product_id": F.lit(None).cast("bigint"),
        "category_id": F.lit(None).cast("int"),
        "bid_amount": F.lit(None).cast("int"),
        "sales_price": F.lit(None).cast("int"),
    }
    defaults.update(cols)
    return df.select(
        _c("ad_id").cast("string").alias("ad_id"),
        _c("adgroup_id").cast("string").alias("adgroup_id"),
        F.lit(ad_type).cast("int").alias("ad_type"),
        _c("customer_id").cast("long").alias("customer_id"),
        defaults["title"].alias("title"),
        defaults["landing_url_pc"].alias("landing_url_pc"),
        defaults["product_id"].alias("product_id"),
        defaults["category_id"].alias("category_id"),
        *_flags(df),
        defaults["bid_amount"].alias("bid_amount"),
        defaults["sales_price"].alias("sales_price"),
        F.lit(stage).alias("__stage"),
    )


def master_ads(
    customer_id: int,
    link_ad: DataFrame | None = None,
    shopping_product: DataFrame | None = None,
    brand_ad: DataFrame | None = None,
    brand_thumbnail_ad: DataFrame | None = None,
    brand_banner_ad: DataFrame | None = None,
) -> DataFrame:
    """Assemble the MasterAd table from the staged ad shapes.

    The reference runs transform_link_ad, then transform_shopping_
    product, then the brand UNION — each ``ON CONFLICT DO NOTHING``, so
    an ad_id landing in an earlier stage wins (models.sql:458-608). The
    distributed equivalent: tag each stage with its rank and keep-first
    per ad_id ordered by stage — ONE keyed shuffle instead of N
    sequential inserts.

    - link_ad (ad_type 1): product id extracted from the landing URL
      pair (models.sql:290-297).
    - shopping_product (ad_type 2): name/image fallbacks via
      COALESCE(NULLIF(...)), category COALESCE(id4..id1)
      (models.sql:341-357,553).
    - brand_ad / thumbnail / banner (ad_types 9/12/13): link_url is the
      pc landing url; product id from the same URL pattern.
    """
    stages: list[DataFrame] = []
    if link_ad is not None:
        stages.append(
            _as_master(
                link_ad,
                ad_type=1,
                stage=0,
                title=_c("subject"),
                landing_url_pc=_c("landing_url_pc"),
                product_id=extract_product_id(
                    F.coalesce(_c("landing_url_pc"), _c("landing_url_mobile"))
                ),
            )
        )
    if shopping_product is not None:
        stages.append(
            _as_master(
                shopping_product,
                ad_type=2,
                stage=1,
                title=F.coalesce(
                    F.nullif(_c("ad_product_name"), F.lit("")), _c("product_name")
                ),
                landing_url_pc=_c("landing_url_pc"),
                product_id=_c("product_id_of_mall").try_cast("bigint"),
                category_id=F.coalesce(
                    *[
                        _c(f"category_id{i}").try_cast("int")
                        for i in (4, 3, 2, 1)
                    ]
                ),
                bid_amount=_c("bid").cast("int"),
                sales_price=_c("price").cast("int"),
            )
        )
    for stage_no, (ad_type, frame) in enumerate(
        [(9, brand_ad), (12, brand_thumbnail_ad), (13, brand_banner_ad)], start=2
    ):
        if frame is None:
            continue
        stages.append(
            _as_master(
                frame,
                ad_type=ad_type,
                stage=stage_no,
                title=_c("title"),
                landing_url_pc=_c("link_url"),
                product_id=extract_product_id(_c("link_url")),
            )
        )
    if not stages:
        raise ValueError("master_ads: no staged inputs given")
    unioned = stages[0]
    for s in stages[1:]:
        unioned = unioned.unionByName(s)
    scoped = unioned.filter(F.col("customer_id") == customer_id)
    return dedupe_keep_first(
        scoped, ["ad_id"], [F.col("__stage").asc()]
    ).drop("__stage").select(*_MASTER_COLS)


def _device_code() -> Column:
    # 'P' -> 0, 'M' -> 1, other -> 2 (models.sql:733)
    return (
        F.when(_c("pc_mobile_type") == "P", 0)
        .when(_c("pc_mobile_type") == "M", 1)
        .otherwise(2)
    )


_REPORT_KEY = ["ymd", "customer_id", "ad_id", "media_code", "pc_mobile_type"]


def _report_keys(raw: DataFrame, measures: Sequence[str]) -> DataFrame:
    """Shared key derivations of both report shapes (models.sql:726-739):
    media NULL -> 0, device char -> code, Date -> ymd."""
    return raw.select(
        _c("ad_id").cast("string").alias("ad_id"),
        _c("customer_id").cast("long").alias("customer_id"),
        F.coalesce(_c("media_code"), F.lit(0)).cast("long").alias("media_code"),
        _device_code().cast("int").alias("pc_mobile_type"),
        _c("date").cast("date").alias("ymd"),
        *[_c(m) for m in measures],
    )


def rollup_ad_stat(raw: DataFrame) -> DataFrame:
    """bulk_insert_ad_stat (models.sql:712-742): pre-aggregate the raw
    report to the PK grain with plain sums."""
    keyed = _report_keys(raw, ["impression", "click", "cost", "ad_rank"])
    return keyed.groupBy(*_REPORT_KEY).agg(
        F.sum(_c("impression").cast("long")).alias("impression_count"),
        F.sum(_c("click").cast("long")).alias("click_count"),
        F.sum(_c("cost").cast("long")).alias("ad_cost"),
        F.sum(_c("ad_rank").cast("long")).alias("ad_rank_sum"),
    )


def rollup_ad_conv(raw: DataFrame) -> DataFrame:
    """bulk_insert_ad_conv (models.sql:744-773): conversion rollup with
    the conditional direct-conversion slices (conv_method = 1)."""
    keyed = _report_keys(raw, ["conv_method", "conv_count", "conv_amount"])
    direct = F.when(_c("conv_method") == 1, _c("conv_count")).otherwise(F.lit(0))
    direct_amt = F.when(_c("conv_method") == 1, _c("conv_amount")).otherwise(F.lit(0))
    return keyed.groupBy(*_REPORT_KEY).agg(
        F.sum(_c("conv_count").cast("long")).alias("conv_count"),
        F.sum(direct.cast("long")).alias("direct_conv_count"),
        F.sum(_c("conv_amount").cast("long")).alias("conv_amount"),
        F.sum(direct_amt.cast("long")).alias("direct_conv_amount"),
    )


def advanced_report(
    stat: DataFrame,
    conv: DataFrame,
    customer_id: int | None = None,
    report_dates: Sequence[str] | None = None,
) -> DataFrame:
    """merge_insert (models.sql:775-797): FULL OUTER stat-vs-conv on
    the full report PK, COALESCE'd keys, measures zero-filled on the
    missing side.

    Both inputs are aggregates at the join grain, so the join runs on
    already-shuffled, co-partitioned children; the scoping filters are
    applied to BOTH sides before the join (as the reference does) so
    they push into the scans.
    """

    def scope(df: DataFrame) -> DataFrame:
        if customer_id is not None:
            df = df.filter(F.col("customer_id") == customer_id)
        if report_dates is not None:
            df = df.filter(F.col("ymd").isin(list(report_dates)))
        return df

    s = scope(stat).alias("stat")
    c = scope(conv).alias("conv")
    cond = F.lit(True)
    for k in _REPORT_KEY:
        cond = cond & (F.col(f"stat.{k}") == F.col(f"conv.{k}"))
    j = s.join(c, cond, "full_outer")

    def key(k: str) -> Column:
        return F.coalesce(F.col(f"stat.{k}"), F.col(f"conv.{k}")).alias(k)

    def zf(side: str, m: str) -> Column:
        return F.coalesce(F.col(f"{side}.{m}"), F.lit(0).cast("long")).alias(m)

    return j.select(
        key("ad_id"),
        key("customer_id"),
        key("media_code"),
        key("pc_mobile_type"),
        zf("stat", "impression_count"),
        zf("stat", "click_count"),
        zf("stat", "ad_cost"),
        zf("stat", "ad_rank_sum"),
        zf("conv", "conv_count"),
        zf("conv", "direct_conv_count"),
        zf("conv", "conv_amount"),
        zf("conv", "direct_conv_amount"),
        key("ymd"),
    )
