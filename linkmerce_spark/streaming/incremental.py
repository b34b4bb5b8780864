"""Incremental-batch runner: the reference's re-run semantics on
Structured Streaming's availableNow trigger.

The reference has no streaming operators (SURVEY §2.11) — its late-data
story is Airflow re-runs over widened date windows written through the
``partitioned_table`` materialization (stage -> validate partitions ->
truncate target dates -> insert; dbt_postgres/macros/
partitioned_tables.sql:11-194). This module maps that contract onto
Spark's incremental-batch mode:

- ``run_incremental_batch`` reads a file source as a stream, processes
  ONLY data that arrived since the last checkpoint (Trigger.AvailableNow
  — drain-and-stop, exactly-once per file), and lands each micro-batch
  through dynamic partition overwrite via ``foreachBatch`` — so a
  re-run after new files appear overwrites exactly the partitions the
  new data touches, the partitioned_table idempotency property.
- Partition validation (NULL / out-of-range keys) runs per batch before
  any write, mirroring partitioned_tables.sql:274-307.

Scale notes
-----------
- The checkpoint tracks processed files — re-runs never rescan old
  data (the property Airflow date-window re-runs approximate by hand).
- Dynamic partition overwrite only rewrites touched partitions; the
  write parallelism is the transformed frame's, so the sink scales
  with the cluster, not the driver.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from linkmerce_spark.sources.writers import validate_partitions

__all__ = ["run_incremental_batch"]


def run_incremental_batch(
    spark: SparkSession,
    source_path: str,
    schema,
    transform: Callable[[DataFrame], DataFrame],
    target_path: str,
    partition_col: str,
    checkpoint_path: str,
    allowed_partitions: Sequence[str] | None = None,
    source_format: str = "parquet",
) -> None:
    """Drain new source files through ``transform`` into a partitioned
    parquet target with per-batch dynamic partition overwrite."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        # Persist the transformed frame: without it the transform DAG
        # executes three times per batch (emptiness probe, partition
        # validation aggregate, parquet write).
        out = transform(batch).persist()
        try:
            if out.isEmpty():  # empty-input short-circuit (load.py:378-381)
                return
            validate_partitions(out, partition_col, allowed_partitions)
            (
                out.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(partition_col)
                .parquet(target_path)
            )
        finally:
            out.unpersist()

    stream = (
        spark.readStream.format(source_format)
        .schema(schema)
        .load(source_path)
    )
    (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
