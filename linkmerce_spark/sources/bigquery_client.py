"""BigQuery REST client (SURVEY S15-S17) over the injected transport.

The reference's BigQueryClient (reference: src/linkmerce/extensions/
bigquery.py:62-782) wraps google-cloud-bigquery: query execution with
typed fetches, parquet/json load jobs with write dispositions, the
staging-table MERGE flow, and a concurrent-update retry loop.  This
module re-expresses that surface against the BigQuery REST API
(``projects/{p}/queries``, the multipart ``upload/.../jobs`` endpoint,
``datasets/{d}/tables/{t}``) through the same injectable transport as
:mod:`linkmerce_spark.sources.http` — every request/response shape is
composed and parsed here and tested against a fake transport; a
production binding supplies a real transport, and
:class:`linkmerce_spark.sources.oauth.ServiceAccountTokenProvider`
(pure-stdlib RS256 JWT-bearer grant, round 6) serves as the real
``token_provider`` — no auth stub remains.

Spark edges: ``load_table_from_df`` stages a DataFrame as parquet
bytes (sources/warehouse.export_parquet_bytes — the reference's
staging payload, extensions/bigquery.py:552-555) into a load job;
``merge_table_from_df`` runs the reference's staging-MERGE-drop flow
(extensions/bigquery.py:488-531) with the engine's shared 6-verb merge
composer (sources/jdbc.compose_merge_sql).
"""

from __future__ import annotations

import datetime as dt
import json as _json
import uuid
from typing import Any, Callable, Mapping, Sequence

from linkmerce_spark.sources.http import HttpClient, Response, Transport
from linkmerce_spark.tasks import run_loop

__all__ = ["BigQueryClient", "decode_query_rows", "compose_multipart"]

_API = "https://bigquery.googleapis.com/bigquery/v2"
_UPLOAD = "https://bigquery.googleapis.com/upload/bigquery/v2"

_WRITE_DISPOSITION = {
    "append": "WRITE_APPEND",
    "truncate": "WRITE_TRUNCATE",
    "empty": "WRITE_EMPTY",
}


def _decode_value(v: str | None, bq_type: str) -> Any:
    if v is None:
        return None
    if bq_type in ("INT64", "INTEGER"):
        return int(v)
    if bq_type in ("FLOAT64", "FLOAT", "NUMERIC", "BIGNUMERIC"):
        return float(v)
    if bq_type in ("BOOL", "BOOLEAN"):
        return v == "true"
    if bq_type == "DATE":
        return dt.date.fromisoformat(v)
    if bq_type == "TIMESTAMP":
        # REST returns epoch seconds as a decimal string
        return dt.datetime.fromtimestamp(float(v), dt.timezone.utc).replace(tzinfo=None)
    return v


def decode_query_rows(body: Mapping[str, Any]) -> list[dict[str, Any]]:
    """REST ``{"schema": ..., "rows": [{"f": [{"v": ...}]}]}`` -> dicts."""
    fields = body.get("schema", {}).get("fields", [])
    out = []
    for row in body.get("rows", []):
        rec = {}
        for field, cell in zip(fields, row.get("f", [])):
            rec[field["name"]] = _decode_value(cell.get("v"), field.get("type", "STRING"))
        out.append(rec)
    return out


def compose_multipart(
    config: Mapping[str, Any], payload: bytes, boundary: str
) -> tuple[bytes, str]:
    """RFC 2387 multipart/related body: JSON job config + binary data
    (the upload endpoint's wire format)."""
    head = (
        f"--{boundary}\r\n"
        "Content-Type: application/json; charset=UTF-8\r\n\r\n"
        f"{_json.dumps(config)}\r\n"
        f"--{boundary}\r\n"
        "Content-Type: application/octet-stream\r\n\r\n"
    ).encode()
    tail = f"\r\n--{boundary}--\r\n".encode()
    return head + payload + tail, f"multipart/related; boundary={boundary}"


class BigQueryClient:
    """Query + load + merge against the BigQuery REST API."""

    def __init__(
        self,
        transport: Transport,
        token_provider: Callable[[], str],
        project: str,
    ):
        self.project = project
        self._token = token_provider
        self.http = HttpClient(transport, base_url=_API)
        self._upload = HttpClient(transport, base_url=_UPLOAD)

    def _headers(self, **extra: str) -> dict[str, str]:
        return {"authorization": f"Bearer {self._token()}", **extra}

    # -- queries -------------------------------------------------------
    def execute(self, query: str, timeout_ms: int = 60_000) -> dict[str, Any]:
        resp = self.http.request(
            "POST",
            f"projects/{self.project}/queries",
            json={"query": query, "useLegacySql": False, "timeoutMs": timeout_ms},
            headers=self._headers(),
        )
        body = resp.json()
        if resp.status >= 400 or "error" in body:
            msg = body.get("error", {}).get("message", f"HTTP {resp.status}")
            raise RuntimeError(f"BigQuery query failed: {msg}")
        return body

    def fetch_all(self, query: str) -> list[dict[str, Any]]:
        return decode_query_rows(self.execute(query))

    def fetch_one(self, query: str, index: int = 0) -> Any:
        rows = self.fetch_all(query)
        if not rows:
            return None
        first = rows[0]
        return list(first.values())[index]

    def fetch_values(self, query: str) -> tuple[Any, ...]:
        """First column across rows (reference fetch_values axis=0)."""
        return tuple(list(r.values())[0] for r in self.fetch_all(query))

    def table_exists(self, dataset: str, table: str) -> bool:
        resp = self.http.request(
            "GET",
            f"projects/{self.project}/datasets/{dataset}/tables/{table}",
            headers=self._headers(),
        )
        return resp.status == 200

    # -- load jobs -----------------------------------------------------
    def load_table_from_parquet(
        self,
        dataset: str,
        table: str,
        payload: bytes,
        write: str = "append",
        boundary: str | None = None,
    ) -> dict[str, Any]:
        """Multipart load job with PARQUET source format
        (reference load_table_from_parquet:310-327)."""
        if write not in _WRITE_DISPOSITION:
            raise ValueError(f"unknown write disposition: {write}")
        config = {
            "configuration": {
                "load": {
                    "destinationTable": {
                        "projectId": self.project,
                        "datasetId": dataset,
                        "tableId": table,
                    },
                    "sourceFormat": "PARQUET",
                    "writeDisposition": _WRITE_DISPOSITION[write],
                }
            }
        }
        boundary = boundary or f"==bq-{uuid.uuid4().hex}=="
        body, content_type = compose_multipart(config, payload, boundary)
        resp = self._upload.request(
            "POST",
            f"projects/{self.project}/jobs",
            params={"uploadType": "multipart"},
            data=body,
            headers=self._headers(**{"content-type": content_type}),
        )
        out = resp.json()
        if resp.status >= 400 or out.get("status", {}).get("errorResult"):
            err = out.get("status", {}).get("errorResult", {}).get("message", resp.status)
            raise RuntimeError(f"BigQuery load failed: {err}")
        return out

    def load_table_from_df(
        self, df, dataset: str, table: str, write: str = "append"
    ) -> dict[str, Any]:
        """DataFrame -> parquet bytes -> load job (the Spark edge)."""
        from linkmerce_spark.sources.warehouse import export_parquet_bytes

        return self.load_table_from_parquet(
            dataset, table, export_parquet_bytes(df), write=write
        )

    # -- merge flow ----------------------------------------------------
    def merge_table_from_df(
        self,
        df,
        dataset: str,
        table: str,
        keys: Sequence[str],
        matched: Mapping[str, str] | str = "source_first",
        not_matched: str = "insert_all",
        staging_suffix: str | None = None,
    ) -> str:
        """Stage -> MERGE -> drop (reference merge_table_from_file:488-531).

        Returns the MERGE SQL it ran (callers/tests can assert the verb
        rendering without a live warehouse).
        """
        from linkmerce_spark.sources.jdbc import compose_merge_sql

        suffix = staging_suffix or uuid.uuid4().hex[:8]
        staging = f"{table}__stg_{suffix}"
        self.load_table_from_df(df, dataset, staging, write="truncate")
        sql = compose_merge_sql(
            f"`{self.project}.{dataset}.{table}`",
            f"`{self.project}.{dataset}.{staging}`",
            keys=keys,
            columns=df.columns,
            matched=matched,
            not_matched=not_matched,
        )
        try:
            self.execute(sql)
        finally:
            self.execute(f"DROP TABLE IF EXISTS `{self.project}.{dataset}.{staging}`")
        return sql

    def execute_with_retry(
        self, query: str, max_retries: int = 5, backoff: float = 0.01
    ) -> dict[str, Any]:
        """Retry serialization conflicts (reference
        retry_on_concurrent_update:100-126) via the engine's run_loop."""

        def _attempt():
            try:
                return self.execute(query)
            except RuntimeError as e:
                if "concurrent update" in str(e).lower():
                    return None  # not-done -> run_loop retries
                raise

        out = run_loop(_attempt, max_retries=max_retries, backoff=backoff)
        if out is None:
            raise RuntimeError("BigQuery merge failed: concurrent update retries exhausted")
        return out
