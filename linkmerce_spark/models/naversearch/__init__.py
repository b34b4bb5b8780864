"""naversearch — the reference's search-rank dataset, Spark-first.

Per-dataset module for the OpenAPI search tables. Parity sites
(semantics, not code) in ``core/naver/openapi/search/models.sql``:

- 8 rank tables whose PK is (keyword, display_rank) with
  ``display_rank = ROW_NUMBER() OVER () + $start - 1`` — the
  insertion-order global rank idiom (models.sql:18,44,73,103,124,148,
  184,234). Spark has no "insertion order"; callers provide an explicit
  ``seq`` column and the rank is a per-keyword window over the bounded
  API response (see display_ranked for the scale argument).
- HTML tag strip REGEXP_REPLACE(title, '<[^>]+>', '', 'g')
  (models.sql:20,45,190).
- TRY_CAST(TRY_STRPTIME(...)) date parsing ('%Y%m%d' and the RFC
  pubDate format, models.sql:24,48,84).
- NULLIF('' / '네이버') empty-and-placeholder scrubbing
  (models.sql:78,80,192,194).
- ShopSearch product-id extraction '/products/(\\d+)$' and the
  product_type arithmetic ((raw + 2) % 3) (models.sql:188-191).
- ShopRank product upsert ``ON CONFLICT DO UPDATE SET col =
  COALESCE(EXCLUDED.col, col)`` (models.sql:255-261) ->
  ``merge_frames`` with ``source_first`` verbs per updated column and
  ``replace`` for updated_at.

Scale notes
-----------
- Every parse is a narrow projection; the only shuffle in a rank build
  is the per-keyword window exchange (bounded groups).
- The product upsert is one full-outer merge on nv_mid — a keyed
  shuffle co-partitioned with the batch dedup that precedes it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkmerce_spark.operators.merge import merge_frames

__all__ = [
    "strip_tags",
    "display_ranked",
    "parse_blog",
    "parse_news",
    "parse_book",
    "parse_cafe",
    "parse_kin",
    "parse_image",
    "parse_shop",
    "shop_rank",
    "shop_product",
    "upsert_products",
]

_MALL_PLACEHOLDER = "네이버"  # models.sql:192 — first-party listings carry no mall


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def strip_tags(c: Column | str) -> Column:
    """Remove HTML tags from API titles/descriptions (models.sql:20)."""
    return F.regexp_replace(_c(c), "<[^>]+>", "")


def display_ranked(
    rows: DataFrame, keyword: str, start: int = 1, seq_col: str = "seq"
) -> DataFrame:
    """Tag ``keyword`` and the per-response display_rank.

    ``ROW_NUMBER() OVER () + $start - 1`` in the reference numbers ONE
    API response in arrival order; the Spark equivalent orders by the
    explicit ``seq`` and adds the page offset. A response is bounded by
    the API's paging contract (start+display ≤ ~1000 rows), so a plain
    window over the single (keyword) group is the scale-correct shape —
    the multi-keyword fan-out partitions by keyword and each group
    stays bounded. Unbounded numbering (marts: lot_seq, brand_seq,
    product variants) uses ``operators.rownum.global_row_number``
    instead; a bounded per-group rank does not need 4 jobs of range
    machinery.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(F.lit(keyword)).orderBy(F.col(seq_col).asc())
    ranked = rows.withColumn("__rn", F.row_number().over(w))
    return ranked.select(
        F.lit(keyword).alias("keyword"),
        (F.col("__rn") + F.lit(start - 1)).cast("int").alias("display_rank"),
        *[c for c in rows.columns if c != seq_col],
    )


def parse_blog(rows: DataFrame, keyword: str, start: int = 1) -> DataFrame:
    """BlogSearch bulk_insert (models.sql:15-26)."""
    projected = rows.select(
        _c("seq"),
        strip_tags("title").alias("title"),
        _c("link").alias("url"),
        strip_tags("description").alias("description"),
        _c("bloggername").alias("address"),
        _c("bloggerlink").alias("blogger_url"),
        F.try_to_timestamp(_c("postdate"), F.lit("yyyyMMdd"))
        .cast("date")
        .alias("post_date"),
    )
    return display_ranked(projected, keyword, start)


def parse_news(rows: DataFrame, keyword: str, start: int = 1) -> DataFrame:
    """NewsSearch bulk_insert (models.sql:40-50): RFC pubDate parse."""
    projected = rows.select(
        _c("seq"),
        strip_tags("title").alias("title"),
        _c("originallink").alias("url"),
        strip_tags("description").alias("description"),
        # RFC 'Mon, 15 Jan 1996 10:30:00 +0000': Spark's CORRECTED-mode
        # parser rejects day-of-week fields, and the weekday is
        # redundant with the date — strip it, parse the rest.
        F.try_to_timestamp(
            F.trim(F.substring_index(_c("pubdate"), ",", -1)),
            F.lit("dd MMM yyyy HH:mm:ss Z"),
        ).alias("publish_dt"),
    )
    return display_ranked(projected, keyword, start)


def parse_book(rows: DataFrame, keyword: str, start: int = 1) -> DataFrame:
    """BookSearch bulk_insert (models.sql:71-86)."""
    projected = rows.select(
        _c("seq"),
        _c("title"),
        _c("link").alias("url"),
        F.nullif(_c("description"), F.lit("")).alias("description"),
        _c("image").alias("image_url"),
        F.nullif(_c("author"), F.lit("")).alias("author"),
        _c("discount").try_cast("int").alias("sales_price"),
        _c("publisher"),
        _c("isbn").try_cast("bigint").alias("isbn"),
        F.try_to_timestamp(_c("pubdate"), F.lit("yyyyMMdd"))
        .cast("date")
        .alias("publish_date"),
    )
    return display_ranked(projected, keyword, start)


def parse_cafe(rows: DataFrame, keyword: str, start: int = 1) -> DataFrame:
    """CafeSearch bulk_insert (models.sql:100-111)."""
    projected = rows.select(
        _c("seq"),
        _c("title"),
        _c("link").alias("url"),
        _c("description"),
        _c("cafename").alias("address"),
        _c("cafeurl").alias("cafe_url"),
    )
    return display_ranked(projected, keyword, start)


def parse_kin(rows: DataFrame, keyword: str, start: int = 1) -> DataFrame:
    """KiNSearch bulk_insert (models.sql:123-132)."""
    projected = rows.select(
        _c("seq"), _c("title"), _c("link").alias("url"), _c("description")
    )
    return display_ranked(projected, keyword, start)


def parse_image(rows: DataFrame, keyword: str, start: int = 1) -> DataFrame:
    """ImageSearch bulk_insert (models.sql:147-158)."""
    projected = rows.select(
        _c("seq"),
        _c("title"),
        _c("link").alias("url"),
        _c("thumbnail"),
        _c("sizeheight").try_cast("int").alias("size_height"),
        _c("sizewidth").try_cast("int").alias("size_width"),
    )
    return display_ranked(projected, keyword, start)


def _shop_product_id(link: Column | str) -> Column:
    # '/products/(\d+)$' (models.sql:188): store links end in the id
    return F.regexp_extract(_c(link), r"/products/(\d+)$", 1).try_cast("bigint")


def parse_shop(rows: DataFrame, keyword: str, start: int = 1) -> DataFrame:
    """ShopSearch bulk_insert (models.sql:183-203)."""
    projected = rows.select(
        _c("seq"),
        _c("productId").cast("bigint").alias("nv_mid"),
        _shop_product_id("link").alias("product_id"),
        strip_tags("title").alias("product_name"),
        ((_c("productType").try_cast("int") + 2) % 3).alias("product_type"),
        F.nullif(_c("mallName"), F.lit(_MALL_PLACEHOLDER)).alias("mall_name"),
        _c("link").alias("url"),
        F.nullif(_c("brand"), F.lit("")).alias("brand_name"),
        _c("maker").alias("maker_name"),
        _c("category1").alias("category_name1"),
        _c("category2").alias("category_name2"),
        _c("category3").alias("category_name3"),
        _c("category4").alias("category_name4"),
        _c("image").alias("image_url"),
        _c("lprice").try_cast("int").alias("sales_price"),
    )
    return display_ranked(projected, keyword, start)


def shop_rank(rows: DataFrame, keyword: str, start: int = 1) -> DataFrame:
    """ShopRank rank bulk_insert (models.sql:234-247), minus the
    wall-clock created_at (callers stamp it — nondeterministic columns
    cannot participate in a verified pipeline)."""
    projected = rows.select(
        _c("seq"),
        _c("productId").cast("bigint").alias("nv_mid"),
        _shop_product_id("link").alias("product_id"),
        ((_c("productType").try_cast("int") + 2) % 3).alias("product_type"),
    )
    return display_ranked(projected, keyword, start)


def shop_product(rows: DataFrame, updated_at: str) -> DataFrame:
    """ShopRank product shape (models.sql:249-254): catalog links are
    price-comparison products (type 0), store links plain (type 1)."""
    return rows.select(
        _c("productId").cast("bigint").alias("nv_mid"),
        _shop_product_id("link").alias("product_id"),
        F.when(_c("link").like("%/catalog/%"), 0).otherwise(1).alias("product_type"),
        strip_tags("title").alias("product_name"),
        F.lit(None).cast("int").alias("category_id"),
        F.concat_ws(
            ">", _c("category1"), _c("category2"), _c("category3"), _c("category4")
        ).alias("full_category_name"),
        F.nullif(_c("mallName"), F.lit(_MALL_PLACEHOLDER)).alias("mall_name"),
        F.nullif(_c("brand"), F.lit("")).alias("brand_name"),
        _c("lprice").try_cast("int").alias("sales_price"),
        F.lit(updated_at).cast("timestamp").alias("updated_at"),
    )


def upsert_products(target: DataFrame, batch: DataFrame) -> DataFrame:
    """ON CONFLICT DO UPDATE SET col = COALESCE(EXCLUDED.col, col)
    (models.sql:255-261): newest crawl wins where it has data, existing
    values survive the crawl's gaps; updated_at always advances."""
    return merge_frames(
        target,
        batch,
        ["nv_mid"],
        matched={
            "product_id": "source_first",
            "product_name": "source_first",
            "full_category_name": "source_first",
            "mall_name": "source_first",
            "brand_name": "source_first",
            "updated_at": "replace",
        },
        not_matched="insert_all",
    )
