"""Format-dispatching readers (reference: common/load.py read_* family).

The reference reads csv / json-auto / parquet / bound row batches into
its engine (load.py:411-447). Spark's native readers cover all of it;
this module only adds the uniform dispatch + schema pinning the
reference's API exposes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from linkmerce_spark.frames import from_rows

__all__ = ["read_table"]


def read_table(
    spark: SparkSession,
    source,
    format: str | None = None,
    schema: StructType | str | None = None,
    **options,
) -> DataFrame:
    """Read ``source`` into a DataFrame.

    ``source`` is a path (format inferred from suffix unless given) or a
    ``list[dict]`` row batch (values scan). CSV defaults to
    header=True + no inference when a schema is pinned.
    """
    if isinstance(source, list):
        return from_rows(spark, source, schema)
    fmt = format or str(source).rsplit(".", 1)[-1].lower()
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        return reader.options(header=True, **options).csv(source)
    if fmt in ("json", "jsonl", "ndjson"):
        return reader.options(**options).json(source)
    if fmt == "parquet":
        return reader.options(**options).parquet(source)
    if fmt == "orc":
        # columnar alternative Spark ships natively (no extra packages);
        # same pushdown/pruning contract as parquet in plans.
        return reader.options(**options).orc(source)
    raise ValueError(f"unsupported format {fmt!r}")
