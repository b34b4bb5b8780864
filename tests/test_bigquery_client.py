"""BigQuery REST client tests (SURVEY S15-S17) — fake transport."""

from __future__ import annotations

import datetime as dt
import io
import json

import pytest

from linkmerce_spark.sources.bigquery_client import (
    BigQueryClient,
    compose_multipart,
    decode_query_rows,
)
from linkmerce_spark.sources.http import Request, Response


class FakeTransport:
    def __init__(self, *responses: Response):
        self.sent: list[Request] = []
        self._responses = list(responses)

    def __call__(self, req: Request) -> Response:
        self.sent.append(req)
        return self._responses.pop(0) if self._responses else Response(200, b"{}")


def _client(*responses: Response) -> tuple[BigQueryClient, FakeTransport]:
    t = FakeTransport(*responses)
    return BigQueryClient(t, lambda: "tok-bq", project="proj1"), t


def _query_response(fields, rows) -> Response:
    body = {
        "jobComplete": True,
        "schema": {"fields": [{"name": n, "type": t} for n, t in fields]},
        "rows": [{"f": [{"v": v} for v in row]} for row in rows],
    }
    return Response(200, json.dumps(body).encode())


def test_decode_query_rows_types():
    body = json.loads(
        _query_response(
            [("n", "INT64"), ("x", "FLOAT64"), ("ok", "BOOL"), ("d", "DATE"), ("s", "STRING")],
            [["5", "1.5", "true", "2026-08-14", "abc"], [None, None, "false", None, None]],
        ).content
    )
    rows = decode_query_rows(body)
    assert rows[0] == {"n": 5, "x": 1.5, "ok": True, "d": dt.date(2026, 8, 14), "s": "abc"}
    assert rows[1] == {"n": None, "x": None, "ok": False, "d": None, "s": None}


def test_execute_and_fetch_helpers():
    c, t = _client(
        _query_response([("cnt", "INT64")], [["42"]]),
        _query_response([("id", "INT64")], [["1"], ["2"], ["3"]]),
    )
    assert c.fetch_one("SELECT COUNT(*) FROM d.t") == 42
    assert c.fetch_values("SELECT id FROM d.t") == (1, 2, 3)
    req = t.sent[0]
    assert req.url == "https://bigquery.googleapis.com/bigquery/v2/projects/proj1/queries"
    assert req.json["useLegacySql"] is False
    assert req.headers["authorization"] == "Bearer tok-bq"


def test_execute_raises_on_error_body():
    c, _ = _client(Response(400, json.dumps({"error": {"message": "boom"}}).encode()))
    with pytest.raises(RuntimeError, match="boom"):
        c.execute("SELECT 1")


def test_table_exists_via_status():
    c, _ = _client(Response(200, b"{}"), Response(404, b"{}"))
    assert c.table_exists("ds", "t1") is True
    assert c.table_exists("ds", "t2") is False


def test_multipart_composition_is_parseable():
    body, ctype = compose_multipart({"a": 1}, b"PARQUETBYTES", "==B==")
    assert ctype == "multipart/related; boundary===B=="
    parts = body.split(b"--==B==")
    assert b'{"a": 1}' in parts[1]
    assert b"PARQUETBYTES" in parts[2]
    assert body.endswith(b"--==B==--\r\n")


def test_load_table_from_df_stages_parquet(spark):
    import pyarrow.parquet as pq

    c, t = _client(Response(200, json.dumps({"status": {}}).encode()))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    out = c.load_table_from_parquet("ds", "t", b"", write="truncate", boundary="==B==")
    assert out == {"status": {}}
    # now the Spark edge: the multipart payload embeds real parquet
    t2 = FakeTransport(Response(200, json.dumps({"status": {}}).encode()))
    c2 = BigQueryClient(t2, lambda: "tok", project="p")
    c2.load_table_from_df(df, "ds", "t", write="append")
    sent = t2.sent[0]
    assert sent.params == {"uploadType": "multipart"}
    assert "WRITE_APPEND" in sent.data.decode("latin1")
    # extract the binary part and parse it as parquet
    marker = b"Content-Type: application/octet-stream\r\n\r\n"
    start = sent.data.index(marker) + len(marker)
    end = sent.data.rindex(b"\r\n--")
    table = pq.read_table(io.BytesIO(sent.data[start:end]))
    assert table.num_rows == 2 and table.column_names == ["id", "name"]


def test_merge_flow_stages_merges_drops(spark):
    ok = Response(200, json.dumps({"status": {}}).encode())
    qok = _query_response([("ok", "BOOL")], [["true"]])
    c, t = _client(ok, qok, qok)
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    sql = c.merge_table_from_df(
        df, "ds", "tgt", keys=["id"], matched="source_first", staging_suffix="s1"
    )
    load, merge, drop = t.sent
    assert "upload" in load.url
    assert merge.json["query"] == sql
    assert "MERGE INTO `proj1.ds.tgt`" in sql
    assert "USING `proj1.ds.tgt__stg_s1`" in sql
    assert drop.json["query"].startswith("DROP TABLE IF EXISTS `proj1.ds.tgt__stg_s1`")


def test_merge_drops_staging_even_on_failure(spark):
    ok = Response(200, json.dumps({"status": {}}).encode())
    bad = Response(400, json.dumps({"error": {"message": "merge broke"}}).encode())
    qok = _query_response([("ok", "BOOL")], [["true"]])
    c, t = _client(ok, bad, qok)
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    with pytest.raises(RuntimeError, match="merge broke"):
        c.merge_table_from_df(df, "ds", "tgt", keys=["id"], staging_suffix="s2")
    assert t.sent[-1].json["query"].startswith("DROP TABLE IF EXISTS")


def test_execute_with_retry_on_concurrent_update():
    conflict = Response(
        400, json.dumps({"error": {"message": "could not serialize: concurrent update"}}).encode()
    )
    ok = _query_response([("n", "INT64")], [["1"]])
    c, t = _client(conflict, conflict, ok)
    out = c.execute_with_retry("MERGE ...", max_retries=3, backoff=0.001)
    assert out["jobComplete"] is True
    assert len(t.sent) == 3
