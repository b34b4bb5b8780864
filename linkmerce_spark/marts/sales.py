"""Sales analytics marts: daily fact -> MoM -> rolling spine.

Parity targets (semantics, not code):
- ``sales_daily``   ~ core__sales_daily (dbt_postgres/models/
  intermediate/sales/core__sales_daily.sql): date-window fact build
  with conditional aggregation over joined sources.
- ``profit_mom``    ~ analytics__profit_mom (dbt_postgres/models/marts/
  sales/analytics__profit_mom.sql:49,72-75): one TVF calling another
  with shifted date windows, FULL OUTER month-over-month merge with
  COALESCE'd keys (the reference's stat-vs-conv merge idiom,
  core/searchad/api/report/models.sql:775-797).
- ``rolling_priority_sales`` ~ core__sold_qty_30d_daily
  (dbt_postgres/models/intermediate/stock/core__sold_qty_30d_daily.sql:
  17-22,112-115): generate_series date spine + trailing window
  [-N, -1] — expressed as a window rangeBetween over the spine rather
  than the reference's O(n*m) range self-join.

Scale notes
-----------
- Date literals arrive pre-plan (the reference renders them before
  planning so Postgres prunes partitions; here Catalyst pushes them
  into the parquet scan — check PushedFilters in .explain).
- Aggregations are partial (map-side combine) by construction.
- The MoM merge joins two one-row-per-group aggregates — broadcast-
  sized regardless of fact size.
- Money math follows the engine conventions (queries.py header):
  DECIMAL-exact aggregation, DOUBLE only at the edge, half-up rounding
  via floor(x * 10^s + 0.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkmerce_spark.frames import load_star

__all__ = ["sales_daily", "profit_mom", "rolling_priority_sales"]


def _dec(c: str, scale: int = 2) -> F.Column:
    return F.col(c).cast(f"decimal(18,{scale})")


def sales_daily(
    spark: SparkSession, sf_dir: str, start_date: str, end_date: str
) -> DataFrame:
    """Daily sales fact per (ymd, order priority) for the date window.

    Revenue is the lineitem net amount summed exactly in DECIMAL;
    ``high_disc_revenue`` is the conditional-aggregation slice
    (SUM(CASE WHEN ...)), the reference's A2 idiom.
    """
    t = load_star(spark, sf_dir, ["orders", "lineitem"])
    o = t["orders"].filter(
        F.col("o_orderdate").cast("date").between(F.lit(start_date), F.lit(end_date))
    )
    li = t["lineitem"]
    net = _dec("l_extendedprice") * (F.lit(1).cast("decimal(8,2)") - _dec("l_discount", 2))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_orderdate").cast("date").alias("ymd"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.sum(net).cast("double").alias("revenue"),
            F.sum(_dec("l_quantity")).cast("double").alias("qty"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.sum(
                F.when(F.col("l_discount") > 0.05, net).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            )
            .cast("double")
            .alias("high_disc_revenue"),
        )
    )


def _monthly(spark: SparkSession, sf_dir: str, month_start: str, month_end: str) -> DataFrame:
    daily = sales_daily(spark, sf_dir, month_start, month_end)
    # scale 4 matches the lineitem net-price product's scale: the
    # double round-trip through sales_daily stays exact, no rounding.
    # Output stays DECIMAL (half-up to cents) — no double leaves here.
    return daily.groupBy("priority").agg(
        F.sum(F.col("revenue").cast("decimal(18,4)")).cast("decimal(18,2)").alias("revenue"),
        F.sum("n_orders").alias("n_orders"),
    )


def profit_mom(
    spark: SparkSession,
    sf_dir: str,
    cur_start: str,
    cur_end: str,
    prev_start: str,
    prev_end: str,
) -> DataFrame:
    """Month-over-month revenue per priority: TVF-calls-TVF + FULL
    OUTER merge with COALESCE'd keys and half-up pct rounding."""
    # All money math stays DECIMAL-exact internally; the OUTPUT edge
    # casts to DOUBLE.  DECIMAL output columns fetch as object(Decimal)
    # from Spark but float64 from DuckDB's pandas path — a dtype-level
    # divergence no value-level check can see (tools/dtype_audit.py).
    # A decimal -> double cast is correctly rounded on both engines, so
    # the doubles are bit-identical; exactness is preserved because the
    # pct derives from integer cents before the edge cast.
    cur = _monthly(spark, sf_dir, cur_start, cur_end).select(
        F.col("priority").alias("c_priority"),
        F.col("revenue").cast("decimal(18,2)").alias("cur_revenue"),
        F.col("n_orders").alias("cur_orders"),
    )
    prev = _monthly(spark, sf_dir, prev_start, prev_end).select(
        F.col("priority").alias("p_priority"),
        F.col("revenue").cast("decimal(18,2)").alias("prev_revenue"),
        F.col("n_orders").alias("prev_orders"),
    )
    j = cur.join(prev, cur.c_priority == prev.p_priority, "full_outer")
    zero2 = F.lit(0).cast("decimal(18,2)")
    base = j.select(
        F.coalesce("c_priority", "p_priority").alias("priority"),
        F.coalesce("cur_revenue", zero2).alias("cur_revenue"),
        F.coalesce("prev_revenue", zero2).alias("prev_revenue"),
        F.coalesce("cur_orders", F.lit(0)).alias("cur_orders"),
        F.coalesce("prev_orders", F.lit(0)).alias("prev_orders"),
    )
    # mom_pct = round_half_up((cur/prev - 1) * 100, 2) in PURE integer
    # arithmetic (no double anywhere): with cents c, p the target is
    # floor(((c-p)*10000)/p + 1/2) at scale 2, i.e. floor((2N+p)/(2p))
    # with N=(c-p)*10000; the ((m % e) + e) % e non-negative remainder
    # makes the floor exact for negative N under both engines'
    # sign-of-dividend %. The final *0.01 decimal multiply is exact, so
    # Spark and DuckDB produce bit-identical DECIMAL(18,2) values.
    base = (
        base.withColumn("__c", (F.col("cur_revenue") * 100).cast("long"))
        .withColumn("__p", (F.col("prev_revenue") * 100).cast("long"))
        .withColumn("__m", (F.col("__c") - F.col("__p")) * 20000 + F.col("__p"))
        .withColumn("__e", F.col("__p") * 2)
    )
    scaled = F.expr(
        "(__m - ((__m % __e) + __e) % __e) div __e"
    )
    return base.select(
        "priority",
        F.col("cur_revenue").cast("double").alias("cur_revenue"),
        F.col("prev_revenue").cast("double").alias("prev_revenue"),
        "cur_orders",
        "prev_orders",
        F.when(
            F.col("__p") > 0,
            (scaled.cast("decimal(16,0)") * F.lit("0.01").cast("decimal(3,2)"))
            .cast("decimal(18,2)")
            .cast("double"),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("mom_pct"),
    )


def rolling_priority_sales(
    spark: SparkSession,
    sf_dir: str,
    start_date: str,
    end_date: str,
    lookback_days: int = 30,
) -> DataFrame:
    """Date spine x priority with a trailing [-N, -1]-day revenue sum.

    The spine guarantees a row for every (day, priority) even with no
    sales that day — the property the reference gets from
    generate_series; the trailing window reads sales *before* each
    spine day (the reference's BETWEEN ymd-30 AND ymd-1 range join),
    expressed as ONE window over day-numbers instead of an O(n*m)
    non-equi join. The daily pre-aggregate keeps the window input at
    one row per (priority, day) regardless of fact-table size.
    """
    import datetime as _dt

    from pyspark.sql.window import Window

    # Widen the fact window AND the spine backwards so early output
    # days see their trailing history (the reference's lookback
    # re-read, smartstore__sales_daily.sql:249-258); the final filter
    # trims back to the requested range.
    widened = (
        _dt.date.fromisoformat(start_date) - _dt.timedelta(days=lookback_days)
    ).isoformat()
    daily = sales_daily(spark, sf_dir, widened, end_date)

    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(widened).cast("date"),
                F.lit(end_date).cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("ymd")
    )
    pri = daily.select("priority").distinct()
    grid = spine.crossJoin(pri)
    merged = grid.join(daily, ["ymd", "priority"], "left").select(
        "ymd", "priority", F.coalesce(F.col("revenue"), F.lit(0.0)).alias("revenue")
    )
    w = (
        Window.partitionBy("priority")
        .orderBy(F.datediff(F.col("ymd"), F.lit("1970-01-01").cast("date")))
        .rangeBetween(-lookback_days, -1)
    )
    out = merged.withColumn(
        "trailing_revenue",
        F.coalesce(F.sum(F.col("revenue").cast("decimal(18,4)")).over(w).cast("double"), F.lit(0.0)),
    )
    return out.filter(F.col("ymd") >= F.lit(start_date).cast("date")).select(
        "ymd", "priority", "revenue", "trailing_revenue"
    )
