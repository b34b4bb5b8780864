"""File-compaction planning (table-maintenance, Delta OPTIMIZE shape).

A 100 TB table accumulates small files (streaming micro-batches,
per-task writes); scan throughput dies on file-open overhead and
footer reads. Compaction planning is the aggregate that decides, per
partition, how many output files a rewrite should produce so every
file lands near a target size — the planner behind Delta Lake's
``OPTIMIZE``, Iceberg's ``rewrite_data_files``, and Hudi clustering.

The plan is ONE aggregation over the table (or, in production, over
the file-manifest metadata — same code, fewer rows): per partition
key, row count and an estimated byte size from row-level widths, then
integer-exact file math:

- ``n_files  = max(1, ceil(est_bytes / target_bytes))``
- ``rows_per_file = ceil(n_rows / n_files)``

Everything is `DIV`-based integer arithmetic (no doubles), so the
plan is deterministic and engine-portable. The writer consumes the
plan with ``repartitionByRange(n_files)`` inside each partition —
see sources/writers.py for the bucketed/partitioned write helpers.

Scale shape: one shuffle on the partition key with map-side partial
aggregation; output is partition-count-sized (thousands of rows for a
100 TB table). Nothing reaches the driver until the plan itself — the
one legitimately driver-sized artifact in the maintenance loop.

Reference behavioral parity: the reference's warehouse layer creates
and swaps tables (src/linkmerce/common/load.py) but has no file
layout maintenance; this fills that table-lifecycle gap Spark-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def plan_compaction(
    df: DataFrame,
    part_col: Column | str,
    row_bytes: Column,
    target_bytes: int,
    part_name: str = "part_key",
) -> DataFrame:
    """Build a per-partition compaction plan.

    ``part_col`` is the partition key expression (e.g. a month
    truncation); ``row_bytes`` estimates each row's serialized width
    (a column expression — at scale this comes from manifest
    ``file_size_in_bytes`` instead). Output columns:
    ``part_name, n_rows, est_bytes, n_files, rows_per_file``.
    """
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    part = F.col(part_col) if isinstance(part_col, str) else part_col
    agg = df.select(part.alias(part_name), row_bytes.alias("_b")).groupBy(part_name).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("_b").cast("bigint").alias("est_bytes"),
    )
    # ceil(a / b) as (a + b - 1) DIV b: integer-exact in every engine
    n_files = F.greatest(
        F.lit(1).cast("bigint"),
        F.expr(f"(est_bytes + {target_bytes} - 1) div {target_bytes}").cast("bigint"),
    )
    return agg.withColumn("n_files", n_files).select(
        part_name,
        "n_rows",
        "est_bytes",
        "n_files",
        F.expr("(n_rows + n_files - 1) div n_files").cast("bigint").alias(
            "rows_per_file"
        ),
    )
