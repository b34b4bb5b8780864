"""naver main-search tab datasets (cafe tab, cafe articles, shopping
page units), Spark-first.

Parity sites (semantics, not code) in
``core/naver/main/search/models.sql``:

- CafeTab bulk_insert (:50-66): normalize-or-passthrough date —
  '%Y.%m.%d.'-shaped strings become ISO dates, anything else (e.g.
  '3시간 전') passes through verbatim (:65).
- CafeArticle bulk_insert (:93-115): nested cafe/article struct paths,
  LENGTH-derived metrics, and the epoch-millis write date
  (``make_timestamp(ms // 1000 * 1e6)`` == second-truncated
  ``timestamp_seconds``).
- ShoppingPage bulk_insert (:128-137): the conditional COUNT split of
  ad vs organic cards, load time parameterized as ``as_of``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["normalize_dot_date", "parse_cafe_tab", "parse_cafe_articles", "shopping_page_units"]


def normalize_dot_date(col: Column | str) -> Column:
    """COALESCE(STRFTIME(TRY_STRPTIME(x, '%Y.%m.%d.'), '%Y-%m-%d'), x)
    (models.sql:65): portal dates are either '2024.05.01.' or relative
    text; only the former normalizes."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.date_format(F.try_to_timestamp(c, F.lit("yyyy.MM.dd.")), "yyyy-MM-dd"), c
    )


def parse_cafe_tab(rows: DataFrame, query: str) -> DataFrame:
    """CafeTab bulk_insert (models.sql:50-66)."""
    return rows.select(
        F.lit(query).alias("query"),
        F.col("rank").cast("int").alias("rank"),
        F.col("cafe_url"),
        F.col("article_id").try_cast("bigint").alias("article_id"),
        F.col("ad_id"),
        F.col("cafe_name"),
        F.col("title"),
        F.col("description"),
        F.col("url"),
        F.col("image_url"),
        F.col("article_url"),
        F.col("replies"),
        normalize_dot_date("write_date").alias("write_date"),
    )


def parse_cafe_articles(rows: DataFrame) -> DataFrame:
    """CafeArticle bulk_insert (models.sql:93-115): the write date is
    epoch millis truncated to seconds."""
    return rows.select(
        F.col("cafeId").cast("bigint").alias("cafe_id"),
        F.col("articleId").cast("bigint").alias("article_id"),
        F.col("cafe.url").alias("cafe_url"),
        F.col("cafe.name").alias("cafe_name"),
        F.col("article.menu.name").alias("menu_name"),
        F.col("article.subject").alias("title"),
        F.col("tags"),
        F.col("article.writer.nick").alias("nick_name"),
        F.length(F.col("article.subject")).alias("title_length"),
        F.col("article.content.wordCount").cast("int").alias("content_length"),
        F.col("article.content.imageCount").cast("int").alias("image_count"),
        F.col("article.readCount").cast("int").alias("read_count"),
        F.col("article.commentCount").cast("int").alias("comment_count"),
        F.col("article.commenterCount").cast("int").alias("commenter_count"),
        # epoch millis -> wall-clock NTZ seconds: interval arithmetic
        # over the NTZ epoch keeps the value session-TZ-free
        # (timestamp_seconds would render shifted under a non-UTC
        # driver session — the round-5 TZ sweep caught this).
        (
            F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
            + F.make_interval(
                secs=(F.col("article.writeDate").cast("bigint") / F.lit(1000)).cast(
                    "bigint"
                )
            )
        ).alias("write_dt"),
    )


def shopping_page_units(rows: DataFrame, keyword: str, as_of: str) -> DataFrame:
    """ShoppingPage bulk_insert (models.sql:128-137): ad vs organic
    card counts in one pass (conditional COUNT == A2/A5)."""
    return rows.agg(
        F.count(F.when(F.col("cardType") == "AD_CARD", 1)).alias("page_unit_ad"),
        F.count(F.when(F.col("cardType") != "AD_CARD", 1)).alias("page_unit_shop"),
    ).select(
        F.lit(keyword).alias("keyword"),
        F.col("page_unit_ad").cast("int"),
        F.col("page_unit_shop").cast("int"),
        F.lit(as_of).cast("timestamp").alias("updated_at"),
    )
