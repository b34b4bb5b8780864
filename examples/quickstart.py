"""Runnable quickstart — the USAGE.md tour, verbatim.

Reads the smallest bundled fixture star, builds a tiny daily-revenue
mart, writes it with dynamic partition overwrite, then merge-upserts a
correction batch. Prints row counts at each step and exits 0.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from linkmerce_spark import get_spark
from linkmerce_spark.frames import load_star
from linkmerce_spark.sources.writers import write_merge, write_overwrite_where

SF_DIR = os.environ.get("LM_SF_DIR", "/root/testdata/sf0.001")
OUT = "/tmp/lm_quickstart"


def main() -> None:
    spark = get_spark("quickstart")
    t = load_star(spark, SF_DIR, ("orders", "lineitem"))
    orders, lineitem = t["orders"], t["lineitem"]

    daily = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_orderdate").cast("date").alias("order_date"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,2)"
                )
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .withColumn("ym", F.date_format("order_date", "yyyy-MM"))
    )
    print(f"mart rows: {daily.count()}")

    shutil.rmtree(OUT, ignore_errors=True)
    write_overwrite_where(daily, f"{OUT}/daily", ["ym"])
    print(f"partitioned write: {spark.read.parquet(f'{OUT}/daily').count()} rows")

    # merge-upsert a correction batch: matched rows take source values
    fix = daily.limit(5).withColumn("n_items", F.col("n_items") + 1)
    write_merge(daily, f"{OUT}/merged", keys=["order_date"])
    write_merge(fix, f"{OUT}/merged", keys=["order_date"], matched="source_first")
    merged = spark.read.parquet(f"{OUT}/merged")
    print(f"after merge: {merged.count()} rows (5 corrected)")
    print("quickstart OK")


if __name__ == "__main__":
    main()
