"""GSheets connector tests (SURVEY S18) — fake transport, no network."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from linkmerce_spark.sources.gsheets import (
    ServiceAccount,
    WorksheetClient,
    py_to_sheet,
    sheet_dual_load,
    sheet_to_py,
    upsert_records,
)
from linkmerce_spark.sources.http import Request, Response


class FakeTransport:
    def __init__(self, *responses: Response):
        self.sent: list[Request] = []
        self._responses = list(responses)

    def __call__(self, req: Request) -> Response:
        self.sent.append(req)
        return self._responses.pop(0) if self._responses else Response(200, b"{}")


def _client(*responses: Response) -> tuple[WorksheetClient, FakeTransport]:
    t = FakeTransport(*responses)
    return WorksheetClient(t, lambda: "tok-123", key="KEY1", sheet="Data"), t


def _values_response(values) -> Response:
    return Response(200, json.dumps({"values": values}).encode())


def test_service_account_parsing():
    info = {"client_email": "x@p.iam", "private_key": "-----", "project_id": "p"}
    assert ServiceAccount(json.dumps(info))["project_id"] == "p"
    assert ServiceAccount(info)["client_email"] == "x@p.iam"
    with pytest.raises(KeyError):
        ServiceAccount({"client_email": "x"})


def test_value_conversions_round_trip():
    recs = sheet_to_py(
        [{"ok": "TRUE", "pct": "12.5%", "d": "2026-08-14", "ts": "2026-08-14 09:30:00", "s": "plain"}]
    )
    assert recs[0] == {
        "ok": True,
        "pct": 0.125,
        "d": dt.date(2026, 8, 14),
        "ts": dt.datetime(2026, 8, 14, 9, 30),
        "s": "plain",
    }
    rows = py_to_sheet([{"d": dt.date(2026, 8, 14), "n": 5}], include_header=True)
    assert rows[0] == ["d", "n"]
    # Sheets serial epoch is 1899-12-30
    assert rows[1][0] == dt.date(2026, 8, 14).toordinal() - 693594
    half_day = py_to_sheet([{"ts": dt.datetime(2026, 8, 14, 12)}])[0][0]
    assert half_day == pytest.approx(dt.date(2026, 8, 14).toordinal() - 693594 + 0.5)


def test_upsert_records_semantics():
    left = [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]
    right = [{"id": 2, "v": "B"}, {"id": 3, "v": "c"}]
    assert upsert_records(left, right, on="id") == [
        {"id": 1, "v": "a"},
        {"id": 2, "v": "B"},
        {"id": 3, "v": "c"},
    ]


def test_get_all_records_and_auth_header():
    c, t = _client(
        _values_response([["id", "name"], ["1", "ab"], ["2"]])
    )
    recs = c.get_all_records()
    assert recs == [{"id": "1", "name": "ab"}, {"id": "2", "name": None}]
    req = t.sent[0]
    assert req.url == "https://sheets.googleapis.com/v4/spreadsheets/KEY1/values/Data"
    assert req.headers["authorization"] == "Bearer tok-123"


def test_overwrite_clears_then_updates():
    c, t = _client(Response(200, b"{}"), Response(200, b"{}"))
    c.overwrite_worksheet([{"id": 1, "v": dt.date(2026, 1, 1)}])
    clear, update = t.sent
    assert clear.url.endswith("/values/Data!A2:ZZ:clear")
    assert update.method == "PUT"
    assert update.params == {"valueInputOption": "RAW"}
    assert update.json == {"values": [[1, dt.date(2026, 1, 1).toordinal() - 693594]]}


def test_upsert_worksheet_reads_merges_overwrites():
    c, t = _client(
        _values_response([["id", "v"], ["1", "a"]]),  # existing
        Response(200, b"{}"),  # clear
        Response(200, b"{}"),  # update
    )
    c.upsert_worksheet([{"id": "1", "v": "A"}, {"id": "9", "v": "z"}], on="id")
    update = t.sent[-1]
    assert update.json == {"values": [["1", "A"], ["9", "z"]]}


def test_sheet_dual_load_validates_and_loads(spark):
    c, _ = _client(
        _values_response(
            [
                ["id", "amount"],
                ["1", "10"],
                ["1", "11"],   # duplicate PK -> dropped
                ["", "12"],    # empty string id kept (not None)
                ["3", ""],     # not-null amount violated after transform? no - '' kept
                ["4", "40"],
            ]
        )
    )
    loaded = {}
    out = sheet_dual_load(
        spark,
        c,
        schema="id string, amount int",
        columns=["id", "amount"],
        strict=lambda df: loaded.__setitem__("strict", df.count()),
        lenient={"bq": lambda df: loaded.__setitem__("bq", df.count())},
        primary_key=["id"],
        apply_func={"amount": lambda v: int(v) if v else None},
    )
    assert out == {"strict": True, "bq": True}
    assert loaded["strict"] == loaded["bq"] == 4  # dup PK row dropped


def test_count_rows_header_exclusion():
    c, _ = _client(_values_response([["h"], ["1"], ["2"]]))
    assert c.count_rows() == 2
