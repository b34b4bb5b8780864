"""BigQuery sink contract tests against an in-memory emulator.

The sandbox has no live BigQuery endpoint, so — like the Derby
integration tests stand in for Postgres JDBC — a fake client pins the
CONTRACT the composer + staging layer rely on (extensions/bigquery.py
semantics, SURVEY S15-S17):

- S15 load_table_from_file over parquet BYTES with the four write
  dispositions (append / empty / truncate / truncate_data);
- S16 per-partition loads driven by relops.iter_partitions;
- S17 overwrite-scoped loads = the 'truncate_data' date-ranged
  delete-then-append transaction.

The emulator consumes exactly what the engine emits
(sources/warehouse.export_parquet_bytes) and re-reads it with pyarrow
— so schema/bytes drift in the staging path fails here, not in
production.
"""

from __future__ import annotations

import io

import pyarrow.parquet as pq
import pytest

from linkmerce_spark.frames import values_df
from linkmerce_spark.relops import iter_partitions
from linkmerce_spark.sources.warehouse import export_parquet_bytes


class FakeBigQuery:
    """extensions/bigquery.py:329-487 contract double."""

    def __init__(self):
        self.tables: dict[str, list[dict]] = {}

    def load_table_from_file(
        self,
        blob: bytes,
        table_id: str,
        write_disposition: str = "WRITE_APPEND",
        truncate_range: tuple[str, str, str] | None = None,
    ) -> int:
        rows = pq.read_table(io.BytesIO(blob)).to_pylist()
        cur = self.tables.get(table_id)
        if write_disposition == "WRITE_EMPTY":
            if cur:
                raise RuntimeError(f"table {table_id} is not empty")
            self.tables[table_id] = list(rows)
        elif write_disposition == "WRITE_TRUNCATE":
            self.tables[table_id] = list(rows)
        elif write_disposition == "WRITE_APPEND":
            self.tables.setdefault(table_id, []).extend(rows)
        elif write_disposition == "WRITE_TRUNCATE_DATA":
            if truncate_range is None:
                raise ValueError("truncate_data needs (col, lo, hi)")
            col, lo, hi = truncate_range
            kept = [
                r
                for r in self.tables.get(table_id, [])
                if not (lo <= str(r[col]) <= hi)
            ]
            self.tables[table_id] = kept + list(rows)
        else:
            raise ValueError(write_disposition)
        return len(rows)


def _orders(spark, rows):
    return values_df(spark, rows, "ymd string, k int, v string")


@pytest.fixture()
def bq():
    return FakeBigQuery()


def test_append_and_truncate_dispositions(spark, bq):
    df = _orders(spark, [("2024-01-01", 1, "a"), ("2024-01-02", 2, "b")])
    blob = export_parquet_bytes(df)
    assert bq.load_table_from_file(blob, "ds.t") == 2
    bq.load_table_from_file(blob, "ds.t")  # append doubles
    assert len(bq.tables["ds.t"]) == 4
    bq.load_table_from_file(blob, "ds.t", "WRITE_TRUNCATE")
    assert len(bq.tables["ds.t"]) == 2


def test_write_empty_gates_existing_table(spark, bq):
    df = _orders(spark, [("2024-01-01", 1, "a")])
    blob = export_parquet_bytes(df)
    bq.load_table_from_file(blob, "ds.t", "WRITE_EMPTY")
    with pytest.raises(RuntimeError, match="not empty"):
        bq.load_table_from_file(blob, "ds.t", "WRITE_EMPTY")


def test_truncate_data_is_scoped_overwrite(spark, bq):
    jan = [("2024-01-0%d" % d, d, "old") for d in range(1, 4)]
    feb = [("2024-02-0%d" % d, d, "keep") for d in range(1, 3)]
    bq.load_table_from_file(export_parquet_bytes(_orders(spark, jan + feb)), "ds.t")
    fresh = _orders(spark, [("2024-01-02", 9, "new")])
    bq.load_table_from_file(
        export_parquet_bytes(fresh),
        "ds.t",
        "WRITE_TRUNCATE_DATA",
        truncate_range=("ymd", "2024-01-01", "2024-01-31"),
    )
    rows = bq.tables["ds.t"]
    assert sorted(r["ymd"] for r in rows) == ["2024-01-02", "2024-02-01", "2024-02-02"]
    assert [r["v"] for r in rows if r["ymd"] == "2024-01-02"] == ["new"]


def test_per_partition_loads(spark, bq):
    df = _orders(
        spark,
        [("2024-01-01", 1, "a"), ("2024-01-01", 2, "b"), ("2024-01-02", 3, "c")],
    )
    loaded = []
    for (ymd,), part in iter_partitions(df, ["ymd"]):
        n = bq.load_table_from_file(
            export_parquet_bytes(part),
            "ds.t",
            "WRITE_TRUNCATE_DATA",
            truncate_range=("ymd", ymd, ymd),
        )
        loaded.append((ymd, n))
    assert loaded == [("2024-01-01", 2), ("2024-01-02", 1)]
    assert len(bq.tables["ds.t"]) == 3
    # idempotent re-run: per-partition overwrite, not append
    for (ymd,), part in iter_partitions(df, ["ymd"]):
        bq.load_table_from_file(
            export_parquet_bytes(part),
            "ds.t",
            "WRITE_TRUNCATE_DATA",
            truncate_range=("ymd", ymd, ymd),
        )
    assert len(bq.tables["ds.t"]) == 3
