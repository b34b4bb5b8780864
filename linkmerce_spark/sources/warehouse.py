"""Table-level warehouse API: exports, create/copy/insert, dual load.

Closes the reference's table-management surface (SURVEY §2.1):

- S5  fetch_all_to_{csv,json,parquet} (common/load.py:476-518)
      -> ``export_rows`` / ``export_csv`` / ``export_json`` /
      ``export_parquet_bytes`` — driver-side materialization of a
      (small) result, the reference's API-return path. Big results
      belong in ``df.write``; these helpers are for API responses.
- S6  create_table(table, values, format, option) (load.py:522-568)
      -> ``create_table`` with replace/ignore modes over temp views.
- S7  copy_table(src, tgt, cols, limit) (load.py:570-585)
      -> ``copy_table``.
- S8  insert_into_table(..., on_conflict) (load.py:589-634)
      -> ``insert_into`` with ignore-on-PK via the dedup operator.
- S19 dual load, Postgres-first strict gate then BigQuery
      (airflow/plugins/dual_load.py:23-321) -> ``dual_load``: run the
      strict sink first; only on success run the lenient ones; report
      {sink: ok} like the reference's {table: bool} result dicts.

Tables here are Spark temp views managed through ``TableRegistry`` —
the in-engine equivalent of the reference's in-process DuckDB tables.
"""

from __future__ import annotations

import io
from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkmerce_spark.operators.dedup import insert_ignore
from linkmerce_spark.sources.readers import read_table

__all__ = [
    "export_rows",
    "export_csv",
    "export_json",
    "export_parquet_bytes",
    "create_table",
    "copy_table",
    "insert_into",
    "dual_load",
]


def export_rows(df: DataFrame) -> list[dict]:
    """Result as list[dict] (the reference's json return_type)."""
    return [r.asDict(recursive=True) for r in df.collect()]


def export_json(df: DataFrame) -> list[str]:
    """Result as JSON lines (toJSON collect)."""
    return df.toJSON().collect()


def export_csv(df: DataFrame, sep: str | None = None) -> list:
    """Result as header-row-first tuples (load.py csv shape). With
    ``sep`` set, each row is instead rendered as one delimited string
    (None -> empty field)."""
    rows = df.collect()
    out = [tuple(df.columns)] + [tuple(r) for r in rows]
    if sep is None:
        return out
    return [sep.join("" if v is None else str(v) for v in row) for row in out]


def export_parquet_bytes(df: DataFrame) -> bytes:
    """Result as parquet bytes (the reference's BigQuery staging
    payload, extensions/bigquery.py:552-555) via Arrow."""
    table = df.toArrow()
    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(table, buf)
    return buf.getvalue()


def create_table(
    spark: SparkSession,
    name: str,
    values,
    format: str | None = None,
    option: str = "replace",
    **read_opts,
) -> DataFrame:
    """CREATE [OR REPLACE / IF NOT EXISTS] view ``name`` from any source
    (path or row batch). ``option``: 'replace' | 'ignore' | 'error'."""
    exists = spark.catalog.tableExists(name)
    if exists and option == "ignore":
        return spark.table(name)
    if exists and option == "error":
        raise ValueError(f"table {name!r} already exists")
    df = read_table(spark, values, format=format, **read_opts)
    df.createOrReplaceTempView(name)
    return spark.table(name)


def copy_table(
    spark: SparkSession,
    src: str,
    tgt: str,
    columns: Sequence[str] | None = None,
    limit: int | None = None,
) -> DataFrame:
    """Copy (a projection/limit of) ``src`` into a new view ``tgt``."""
    df = spark.table(src)
    if columns:
        df = df.select(*columns)
    if limit is not None:
        df = df.limit(limit)
    df.createOrReplaceTempView(tgt)
    return spark.table(tgt)


def insert_into(
    spark: SparkSession,
    tgt: str,
    source,
    keys: Sequence[str] | None = None,
    order_by: Sequence = None,
    format: str | None = None,
) -> DataFrame:
    """INSERT INTO ... SELECT with optional ON CONFLICT DO NOTHING.

    With ``keys``, batch rows whose PK already exists in the target are
    dropped (keep-first by ``order_by`` within the batch) — A8
    semantics; without, a plain unionByName append.
    """
    target = spark.table(tgt)
    batch = read_table(spark, source, format=format).select(*target.columns)
    if keys:
        out = insert_ignore(target, batch, list(keys), order_by=order_by)
    else:
        out = target.unionByName(batch)
    # Re-materialize the view: temp views are lazy plans, so writing
    # the union back needs a stable snapshot first.
    snap = out.localCheckpoint(eager=True)
    snap.createOrReplaceTempView(tgt)
    return spark.table(tgt)


def dual_load(
    df: DataFrame,
    strict: Callable[[DataFrame], None],
    lenient: Mapping[str, Callable[[DataFrame], None]] | None = None,
) -> dict[str, bool]:
    """Reference dual-load policy (README.md:230-233): the strict sink
    (Postgres: PK + type constraints) must succeed FIRST; the lenient
    sinks (BigQuery, sheets) run only afterwards, each reported
    independently. Empty input short-circuits to all-False (the
    reference's empty guard)."""
    results: dict[str, bool] = {}
    if df.isEmpty():
        results["strict"] = False
        for name in lenient or {}:
            results[name] = False
        return results
    strict(df)  # raises -> nothing else runs
    results["strict"] = True
    for name, sink in (lenient or {}).items():
        try:
            sink(df)
            results[name] = True
        except Exception:
            results[name] = False
    return results
