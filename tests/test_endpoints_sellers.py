"""Seller-admin endpoint builders (sources/endpoints_sellers.py):
request-composition parity with the reference's documented shapes,
driven through a fake transport — no network.

Reference shapes under test:
- core/sabangnet/admin/common.py login/token flow (:56-90) and
  compacted date pairs (:118-141); order/extract.py payload (:110-136)
  and counter (:105-108); product/extract.py payloads (:110-137,
  :225-226)
- core/coupang/wing/common.py XSRF auth (:26-37);
  settlement/extract.py payloads (:53-54, :108-121);
  product/extract.py payload + counter (:55-86)
- core/coupang/advertising/report/extract.py payload (:91-114),
  counter (:71-74), timeout retry (:76-89)
"""

from __future__ import annotations

import json

import pytest

from linkmerce_spark.sources.endpoints_sellers import (
    CoupangAdsApi,
    CoupangWingApi,
    SabangnetAdminApi,
    compact_datetime,
    kst_date_to_utc_iso,
    order_date_pair,
)
from linkmerce_spark.sources.http import Response


class ScriptedTransport:
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


# ------------------------------------------------------------ sabangnet
def test_compact_datetime_strips_trailing_zero_pairs():
    import datetime as dt

    assert compact_datetime(dt.datetime(2026, 8, 14, 0, 0, 0)) == "20260814"
    assert compact_datetime(dt.datetime(2026, 8, 14, 13, 0, 0)) == "2026081413"
    assert compact_datetime(dt.datetime(2026, 8, 14, 13, 45, 0)) == "202608141345"
    assert compact_datetime("2026-08-14 13:45:07") == "20260814134507"


def test_order_date_pair_start_date_sentinel():
    start, end = order_date_pair("2026-08-14 13:45:00")
    assert (start, end) == ("202608141345", "20260814")


def test_login_pins_bearer_and_sends_history_beacon():
    t = ScriptedTransport(
        {"data": {"accessToken": "acc-1", "refreshToken": "ref-1"}}, {}
    )
    api = SabangnetAdminApi(t, "uid", "pw", domain=14)
    token = api.login()
    assert token == "acc-1"
    login_req, history_req = t.calls
    assert login_req.url.endswith("/hp-prod/users/login")
    assert login_req.json == {"username": "uid", "password": "pw"}
    assert login_req.headers["program-name"] == "login-main"
    assert history_req.url.endswith("/hp-prod/users/login-history")
    assert history_req.headers["authorization"] == "Bearer acc-1"
    # data requests target the per-tenant admin origin
    assert api.base_url == "http://sbadmin14.sabangnet.co.kr"


def test_order_search_payload_matches_reference_shape():
    body = SabangnetAdminApi.order_search_payload(
        "20260814", "20260814",
        order_status=["001", "002"], sort_type="shma_ord_no_desc", page=3,
    )
    assert body["fnlChgPrgmNm"] == "order-confirm"
    assert body["currentPage"] == 3
    assert body["dateDiv"] == "reg_dm"
    assert body["pageSize"] == 500
    assert body["orderStrd"] == "shma_ord_no"
    assert body["orderDegreeStrd"] == "desc"
    assert body["orderStatus"] == ["001", "002"]
    assert body["chkOrdNo"] == [] and body["multiplexId"] == []


def test_product_search_payload_deleted_forces_status_006():
    body = SabangnetAdminApi.product_search_payload(
        "20250101", "20260814", is_deleted=True, sort_asc=False
    )
    assert body["prdSplyStsCd"] == "006"
    assert body["sort"] == "DESC"
    assert SabangnetAdminApi.option_payload("P1") == {
        "prdNo": "P1", "skuNo": None, "optDivCd": "basic"
    }


def test_fetch_orders_walks_pages_by_total_count():
    pages = [
        {"data": {"totAmtSummary": {"totCnt": 1200}, "list": ["a"]}},
        {"data": {"totAmtSummary": {"totCnt": 1200}, "list": ["b"]}},
        {"data": {"totAmtSummary": {"totCnt": 1200}, "list": ["c"]}},
    ]
    t = ScriptedTransport(*pages)
    api = SabangnetAdminApi(t, "u", "p", domain=1)
    out = list(api.fetch_orders("2026-08-14"))
    assert len(out) == 3                      # ceil(1200 / 500)
    sent = [c.json["currentPage"] for c in t.calls]
    assert sent == [1, 2, 3]
    assert t.calls[0].json["startDate"] == "20260814"
    assert t.calls[0].url.startswith("http://sbadmin1.sabangnet.co.kr/prod-api/")


# ---------------------------------------------------------- coupang wing
def test_kst_date_to_utc_iso():
    assert kst_date_to_utc_iso("2026-08-14") == "2026-08-13T15:00:00.000Z"


def test_profit_status_requires_xsrf_cookie():
    api = CoupangWingApi(ScriptedTransport({}), cookies={"sid": "x"})
    with pytest.raises(ValueError, match="XSRF-TOKEN"):
        api.fetch_profit_status("a", "b")


def test_profit_status_sends_xsrf_header_and_payload():
    t = ScriptedTransport({"ok": True})
    api = CoupangWingApi(t, cookies={"XSRF-TOKEN": "tok", "sid": "x"})
    api.fetch_profit_status("2026-08-01T00:00:00.000Z", "2026-08-14T00:00:00.000Z")
    (req,) = t.calls
    assert req.headers["x-xsrf-token"] == "tok"
    assert "XSRF-TOKEN=tok" in req.headers["cookie"]
    assert req.json == {
        "recognitionDateFrom": "2026-08-01T00:00:00.000Z",
        "recognitionDateTo": "2026-08-14T00:00:00.000Z",
    }


def test_rocket_settlement_payload_converts_kst_window():
    body = CoupangWingApi.rocket_settlement_payload("2026-08-14")
    assert body == {
        "startDate": "2026-08-13T15:00:00.000Z",
        "endDate": "2026-08-13T15:00:00.000Z",
        "searchDateType": "RECOGNITION_DATE",
    }


def test_inventory_payload_and_pagination():
    pages = [
        {"data": {"pagination": {"totalCount": 750}}},
        {"data": {"pagination": {"totalCount": 750}}},
    ]
    t = ScriptedTransport(*pages)
    api = CoupangWingApi(t, cookies={"sid": "x"})
    out = list(api.fetch_inventory())
    assert len(out) == 2                      # ceil(750 / 500)
    body = t.calls[0].json
    assert body["countPerPage"] == 500 and body["page"] == 1
    assert body["sortMethod"] == "SORT_BY_ITEM_LEVEL_UNIT_SOLD"
    assert body["displayDeletedProduct"] is False
    assert t.calls[1].json["page"] == 2
    assert t.calls[0].headers["referer"].endswith("/vendor-inventory/list")


# ----------------------------------------------------------- coupang ads
def test_campaigns_payload_shape_and_goal_validation():
    body = CoupangAdsApi.campaigns_payload("NCA", page=2, size=20)
    assert body["goalType"] == "NCA"
    assert body["pagination"] == {"page": 2, "size": 20}
    assert body["sortedBy"] == "ID" and body["isSortDesc"] == "DESC"
    with pytest.raises(ValueError):
        CoupangAdsApi.campaigns_payload("BAD")


def test_fetch_campaigns_zero_based_walk():
    pages = [
        {"pageInfo": {"totalCount": 45}},
        {"pageInfo": {"totalCount": 45}},
        {"pageInfo": {"totalCount": 45}},
    ]
    t = ScriptedTransport(*pages)
    api = CoupangAdsApi(t, cookies={"sid": "x"})
    out = list(api.fetch_campaigns())
    assert len(out) == 3                      # ceil(45 / 20), pages 0..2
    assert [c.json["pagination"]["page"] for c in t.calls] == [0, 1, 2]


def test_campaigns_timeout_retry_then_success():
    class FlakyTransport:
        def __init__(self):
            self.calls = 0

        def __call__(self, req):
            self.calls += 1
            if self.calls < 3:
                raise TimeoutError("slow")
            return Response(status=200, content=b'{"pageInfo": {"totalCount": 1}}')

    sleeps = []
    api = CoupangAdsApi(FlakyTransport(), cookies={}, sleeper=sleeps.append)
    out = list(api.fetch_campaigns())
    assert len(out) == 1
    assert sleeps == [1, 2]                   # backoff = retry count


def test_campaigns_timeout_exhausts_retries():
    class AlwaysTimeout:
        def __call__(self, req):
            raise TimeoutError("slow")

    api = CoupangAdsApi(AlwaysTimeout(), cookies={}, sleeper=lambda _s: None)
    with pytest.raises(TimeoutError):
        api.request_json_with_retry(api.CAMPAIGNS_PATH, {}, max_retries=2)
