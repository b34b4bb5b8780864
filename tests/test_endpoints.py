"""Endpoint builders: request-composition parity with the reference's
documented shapes (URL, params, payload, signed headers), driven
through a fake transport — no network.

Reference shapes under test:
- core/smartstore/api/order/extract.py build_request_params (:113-136,
  :248-268) + common.py auth params (:59-71) and retry policy (:73-97)
- core/searchad/api/common.py signature headers (:40-66) +
  api/report/extract.py workflow (:49-100, :163-166, :809-813)
- core/naver/openapi/search/extract.py url/params (:53-96)
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json

import pytest

from linkmerce_spark.sources.endpoints import (
    NaverOpenApiSearch,
    SearchAdApi,
    SmartstoreOrderApi,
    searchad_signature,
)
from linkmerce_spark.sources.http import Response


class ScriptedTransport:
    """Returns queued responses; records every composed request."""

    def __init__(self, *responses):
        self.queue = list(responses)
        self.calls = []

    def __call__(self, req):
        self.calls.append(req)
        if not self.queue:
            return Response(status=200, content=b"{}")
        nxt = self.queue.pop(0)
        return nxt if isinstance(nxt, Response) else Response(
            status=200, content=json.dumps(nxt).encode()
        )


# ------------------------------------------------------------- smartstore
def _fake_signer(message: bytes, secret: bytes) -> bytes:
    return hashlib.sha256(message + b"|" + secret).digest()


def test_smartstore_auth_params_shape():
    t = ScriptedTransport({"access_token": "tok-1"})
    api = SmartstoreOrderApi(
        t, "cid", "csec", secret_signer=_fake_signer, clock=lambda: 1_700_000_003.0
    )
    params = api.build_auth_params()
    # timestamp backdated 3 s, in ms
    assert params["timestamp"] == 1_700_000_000_000
    assert params["client_id"] == "cid"
    assert params["grant_type"] == "client_credentials"
    assert params["type"] == "SELF"
    expected = base64.b64encode(
        _fake_signer(b"cid_1700000000000", b"csec")
    ).decode()
    assert params["client_secret_sign"] == expected

    assert api.authorize() == "tok-1"
    assert api.headers["Authorization"] == "Bearer tok-1"
    req = t.calls[0]
    assert req.method == "POST"
    assert req.url == "https://api.commerce.naver.com/external/v1/oauth2/token"
    assert req.headers["content-type"] == "application/x-www-form-urlencoded"


def test_smartstore_auth_requires_signer():
    api = SmartstoreOrderApi(ScriptedTransport(), "cid", "csec")
    with pytest.raises(NotImplementedError, match="bcrypt"):
        api.build_auth_params()


def test_smartstore_order_params_match_reference():
    p = SmartstoreOrderApi.product_orders_params(
        "1996-03-01",
        product_order_status=["PAYED", "DELIVERED"],
        claim_status=["CANCEL_REQUEST"],
        page=3,
    )
    assert p == {
        "from": "1996-03-01T00:00:00.000+09:00",
        "to": "1996-03-01T23:59:59.999+09:00",
        "rangeType": "PAYED_DATETIME",
        "productOrderStatuses": "PAYED,DELIVERED",
        "claimStatuses": "CANCEL_REQUEST",
        "placeOrderStatusType": [],
        "page": 3,
        "pageSize": 300,
    }


def test_smartstore_last_changed_params_cursor_resume():
    first = SmartstoreOrderApi.last_changed_params("1996-03-01", "PAYED")
    assert first["lastChangedFrom"] == "1996-03-01T00:00:00.000+09:00"
    assert first["lastChangedType"] == "PAYED"
    assert "moreSequence" not in first
    resumed = SmartstoreOrderApi.last_changed_params(
        "1996-03-01",
        cursor={"moreFrom": "1996-03-01T11:22:33.000+09:00", "moreSequence": "77"},
    )
    assert resumed["lastChangedFrom"] == "1996-03-01T11:22:33.000+09:00"
    assert resumed["moreSequence"] == "77"
    assert resumed["limitCount"] == 300


def test_smartstore_cursor_walk_and_rate_limit_retry():
    pages = [
        {"data": {"pagination": {"page": 1, "hasNext": True}}},
        {"code": "GW.RATE_LIMIT", "message": "slow down"},
        {"data": {"pagination": {"page": 2, "hasNext": False}}},
    ]
    t = ScriptedTransport(*pages)
    naps = []
    api = SmartstoreOrderApi(
        t, "cid", "csec", secret_signer=_fake_signer, sleeper=naps.append
    )
    got = list(api.fetch_orders("1996-03-01"))
    assert [g["data"]["pagination"]["page"] for g in got] == [1, 2]
    assert naps == [1]  # one backoff, reference's linear retry_count sleep
    assert [c.params["page"] for c in t.calls] == [1, 2, 2]


def test_smartstore_hard_error_raises():
    t = ScriptedTransport({"code": "AUTH", "message": "bad token"})
    api = SmartstoreOrderApi(t, "cid", "csec", secret_signer=_fake_signer)
    with pytest.raises(ConnectionError, match="bad token"):
        api.request_json_until_success("GET", SmartstoreOrderApi.ORDERS_PATH)


# --------------------------------------------------------------- searchad
def test_searchad_signature_is_reference_hmac():
    sig = searchad_signature("sek", "1700000000000", "GET", "/master-reports")
    expected = base64.b64encode(
        hmac.new(
            b"sek", b"1700000000000.GET./master-reports", hashlib.sha256
        ).digest()
    )
    assert sig == expected


def test_searchad_signed_headers():
    api = SearchAdApi(
        ScriptedTransport(), "akey", "sek", 1234, clock=lambda: 1_700_000_000.0
    )
    h = api.build_request_headers("POST", "/master-reports")
    assert h["X-API-KEY"] == "akey"
    assert h["X-Customer"] == "1234"
    assert h["X-Timestamp"] == "1700000000000"
    assert h["Content-Type"] == "application/json; charset=UTF-8"
    assert h["X-Signature"] == searchad_signature(
        "sek", "1700000000000", "POST", "/master-reports"
    ).decode("ascii")


def test_searchad_master_report_workflow():
    t = ScriptedTransport(
        {"id": "job-9"},
        {"status": "REGIST"},
        {"status": "BUILT", "downloadUrl": "https://api.searchad.naver.com/report-download?id=job-9"},
        Response(status=200, content=b"Customer ID\tCampaign ID\n1\tc1\n"),
        Response(status=204),
    )
    naps = []
    api = SearchAdApi(ScriptedTransport(), "akey", "sek", 1, sleeper=naps.append)
    api._transport = t
    tsv = api.fetch_master_report("Campaign", from_date="1996-03-01")
    assert tsv == "Customer ID\tCampaign ID\n1\tc1\n"
    create, poll1, poll2, download, delete = t.calls
    assert (create.method, create.url) == (
        "POST", "https://api.searchad.naver.com/master-reports"
    )
    assert create.json == {"item": "Campaign", "fromTime": "1996-03-01T00:00:00Z"}
    assert poll1.url.endswith("/master-reports/job-9")
    assert download.url.startswith("https://api.searchad.naver.com/report-download")
    # signature stays on the API uri even though the url is the redirect
    assert download.headers["X-Signature"]
    assert (delete.method, delete.url) == (
        "DELETE", "https://api.searchad.naver.com/master-reports/job-9"
    )
    assert naps == [0.5]  # one REGIST poll wait


def test_searchad_stat_report_payload_and_delete_on_failure():
    t = ScriptedTransport(
        {"reportJobId": "sj-1"},
        {"status": "NONE"},  # poll: nothing to download
        Response(status=204),  # delete still runs
    )
    api = SearchAdApi(t, "akey", "sek", 1)
    assert api.fetch_stat_report("AD", "1996-03-02") is None
    assert t.calls[0].json == {"reportTp": "AD", "statDt": "19960302"}
    assert t.calls[-1].method == "DELETE"


def test_searchad_create_error_raises_keyerror():
    t = ScriptedTransport({"message": "quota exceeded"})
    api = SearchAdApi(t, "akey", "sek", 1)
    with pytest.raises(KeyError, match="quota exceeded"):
        api.fetch_master_report("Campaign")


# ----------------------------------------------------------- naver openapi
def test_openapi_search_request_shape():
    t = ScriptedTransport({"items": [{"title": "x"}]})
    api = NaverOpenApiSearch(t, "nid", "nsec", content_type="shop")
    out = api.search("토마토", start=101, display=100, sort="date")
    assert out == {"items": [{"title": "x"}]}
    req = t.calls[0]
    assert req.url == "https://openapi.naver.com/v1/search/shop.json"
    assert req.params == {
        "query": "토마토", "start": 101, "display": 100, "sort": "date"
    }
    assert req.headers["X-Naver-Client-Id"] == "nid"
    assert req.headers["X-Naver-Client-Secret"] == "nsec"


def test_openapi_rejects_unknown_content_type():
    with pytest.raises(ValueError, match="content_type"):
        NaverOpenApiSearch(ScriptedTransport(), "a", "b", content_type="nope")


def test_openapi_search_each_fans_out():
    t = ScriptedTransport({"items": []}, {"items": []})
    api = NaverOpenApiSearch(t, "nid", "nsec", content_type="book")
    api.search_each(["a", "b"], display=10)
    assert [c.params["query"] for c in t.calls] == ["a", "b"]
    assert all(c.url.endswith("/search/book.json") for c in t.calls)
