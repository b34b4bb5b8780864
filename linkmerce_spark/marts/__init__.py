"""Parameterized analytics marts — the dbt/TVF layer re-expressed.

The reference materializes its analytics as SQL table-valued functions
taking ``(DS_START_DATE, DS_END_DATE, ...)`` and calling each other
with pushed-down date args (dbt_postgres/macros/table_functions.sql:
9-90; analytics__profit_mom.sql:49,72-75). In Spark the same pattern
is a plain Python function returning a DataFrame: date literals land
in the plan, Catalyst pushes them into the parquet scan, partition
pruning comes for free.
"""

from linkmerce_spark.marts.sales import (
    profit_mom,
    rolling_priority_sales,
    sales_daily,
)

__all__ = ["sales_daily", "profit_mom", "rolling_priority_sales"]
