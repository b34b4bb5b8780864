"""Seller-admin endpoint builders: Sabangnet admin, Coupang Wing/Ads.

Round 6's first endpoint batch (sources/endpoints.py) covered the
Naver-side APIs; this module adds the other two platform families a
migrating user pulls most, re-expressing the reference's request
composition over the same injected transport:

- Sabangnet admin (reference: src/linkmerce/core/sabangnet/admin/
  common.py:13-117 login/token flow; order/extract.py:11-166 order
  search; product/extract.py:11-232 product/option search) — the
  token login handshake, the ``searchOrders`` /
  ``getProductInquirySearchList`` / ``getOptionInfoList`` payloads,
  and the compacted ``YYYYMMDDHHMMSS`` date-pair rules.
- Coupang Wing (reference: src/linkmerce/core/coupang/wing/
  common.py:11-37 XSRF-cookie auth; settlement/extract.py:17-131;
  product/extract.py:11-97) — profit-status, rocket-settlement
  (KST->UTC ISO-8601Z window), and vendor-inventory search payloads.
- Coupang Ads (reference: src/linkmerce/core/coupang/advertising/
  report/extract.py:11-114) — campaign listing with page/size
  pagination and the timeout-retry loop.

Everything here is driver-side request composition; fetched row
batches enter Spark via ``tasks.distributed_fetch`` /
``frames.from_rows``. Transports, clocks, and sleepers are injected —
fully testable offline, one line binds a real transport in production.
"""

from __future__ import annotations

import datetime as dt
import time as _time
from typing import Any, Callable, Iterable, Mapping

from linkmerce_spark.sources.http import HttpClient, Transport

__all__ = [
    "SabangnetAdminApi",
    "CoupangWingApi",
    "CoupangAdsApi",
    "compact_datetime",
    "order_date_pair",
    "kst_date_to_utc_iso",
]


# ---------------------------------------------------------------------------
# Sabangnet admin
# ---------------------------------------------------------------------------


def compact_datetime(value: dt.datetime | dt.date | str) -> str:
    """``YYYYMMDDHHMMSS`` with trailing zero *pairs* stripped — the
    admin API's compacted timestamp (reference admin/common.py:125-135
    strips while the last two chars are "00", so midnight collapses to
    a plain ``YYYYMMDD`` date)."""
    if isinstance(value, dt.datetime):
        text = value.strftime("%Y%m%d%H%M%S")
    else:
        text = str(value).replace("-", "").replace(":", "").replace(" ", "")
    while text[-2:] == "00" and len(text) > 8:
        text = text[:-2]
    return text


def order_date_pair(
    start_date: dt.datetime | dt.date | str,
    end_date: dt.datetime | dt.date | str | None = None,
) -> tuple[str, str]:
    """Order-search window; ``end_date=None`` mirrors the reference's
    ``":start_date:"`` sentinel (end = start's date part,
    admin/common.py:137-141)."""
    start = compact_datetime(start_date)
    if end_date is None:
        return start, start[:8]
    return start, compact_datetime(end_date)


class SabangnetAdminApi(HttpClient):
    """Sabangnet admin request composition + token login.

    The reference authenticates against the main site, pins the issued
    bearer token, and records a login-history beacon before any data
    request (admin/common.py:46-90); data requests go to the per-tenant
    ``sbadmin{domain}`` origin.
    """

    MAIN_URL = "https://www.sabangnet.co.kr"
    ORDERS_PATH = "/prod-api/customer/order/OrderConfirm/searchOrders"
    PRODUCTS_PATH = "/prod-api/customer/product/getProductInquirySearchList"
    OPTIONS_PATH = "/prod-api/customer/product/getOptionInfoList"
    MAX_PAGE_SIZE = 500

    def __init__(self, transport: Transport, userid: str, passwd: str, domain: int):
        super().__init__(transport, base_url=f"http://sbadmin{domain}.sabangnet.co.kr")
        self.userid = userid
        self.passwd = passwd
        self.access_token = ""
        self.refresh_token = ""

    # -- auth (admin/common.py:56-90) ------------------------------------
    def login(self) -> str:
        body = self.request_json(
            "POST",
            f"{self.MAIN_URL}/hp-prod/users/login",
            json={"username": self.userid, "password": self.passwd},
            headers={
                "content-type": "application/json",
                "referer": f"{self.MAIN_URL}/login/login-main",
                "origin": self.MAIN_URL,
                "program-name": "login-main",
            },
        )
        data = body["data"]
        self.access_token = data["accessToken"]
        self.refresh_token = data["refreshToken"]
        self.headers["authorization"] = f"Bearer {self.access_token}"
        # login-history beacon — the reference sends it before any data pull
        self.request(
            "POST",
            f"{self.MAIN_URL}/hp-prod/users/login-history",
            headers={"program-name": "login-main"},
        )
        return self.access_token

    # -- payloads ---------------------------------------------------------
    @staticmethod
    def order_search_payload(
        start_date: str,
        end_date: str,
        date_type: str = "reg_dm",
        order_status_div: str = "",
        order_status: Iterable[str] = (),
        shop_id: str = "",
        sort_type: str = "ord_no_asc",
        page: int = 1,
        size: int = 500,
    ) -> dict[str, Any]:
        """``searchOrders`` body (reference order/extract.py:110-136)."""
        field, _, direction = sort_type.rpartition("_")
        return {
            "fnlChgPrgmNm": "order-confirm",
            "chkOrdNo": [],
            "currentPage": page,
            "dateDiv": date_type,
            "startDate": start_date,
            "endDate": end_date,
            "pageSize": size,
            "ordStsTpDivCd": order_status_div,
            "orderStrd": field,
            "orderDegreeStrd": direction,
            "orderStatus": list(order_status),
            "shmaId": shop_id,
            "multiplexId": [],
            "searchKeywordList": [],
        }

    @staticmethod
    def product_search_payload(
        start_date: str,
        end_date: str,
        date_type: str = "001",
        sort_type: str = "001",
        sort_asc: bool = True,
        is_deleted: bool = False,
        product_status: str | None = None,
        page: int = 1,
        size: int = 500,
    ) -> dict[str, Any]:
        """``getProductInquirySearchList`` body (reference
        product/extract.py:110-137; deleted search forces status 006)."""
        return {
            "dayOption": date_type,
            "startDate": start_date,
            "endDate": end_date,
            "pageSize": size,
            "sortOption": sort_type,
            "sort": "ASC" if sort_asc else "DESC",
            "searchCondition": None,
            "searchKeyword": None,
            "currentPage": page,
            "noOption": False,
            "mngrMemoTextExist": "",
            "nonExposureYn": "",
            "prdSplyStsCd": "006" if is_deleted else product_status,
        }

    @staticmethod
    def option_payload(product_id: str) -> dict[str, Any]:
        """``getOptionInfoList`` body (reference product/extract.py:225-226)."""
        return {"prdNo": product_id, "skuNo": None, "optDivCd": "basic"}

    # -- counters + walks -------------------------------------------------
    @staticmethod
    def order_total(response: Mapping[str, Any]) -> int | None:
        """Total order count (reference order/extract.py:105-108
        ``data.totAmtSummary.totCnt``)."""
        summary = (response.get("data") or {}).get("totAmtSummary") or {}
        return summary.get("totCnt")

    def fetch_orders(
        self,
        start_date: dt.datetime | dt.date | str,
        end_date: dt.datetime | dt.date | str | None = None,
        **options: Any,
    ) -> Iterable[Any]:
        """All pages of an order-search window (count-driven walk, the
        reference's ``PaginateAll`` over ``searchOrders``)."""
        start, end = order_date_pair(start_date, end_date)
        page, size = 1, self.MAX_PAGE_SIZE
        while True:
            resp = self.request_json(
                "POST",
                self.ORDERS_PATH,
                json=self.order_search_payload(start, end, page=page, size=size, **options),
            )
            yield resp
            total = self.order_total(resp)
            if total is None or page * size >= total:
                return
            page += 1


# ---------------------------------------------------------------------------
# Coupang Wing (cookie + XSRF auth)
# ---------------------------------------------------------------------------


def kst_date_to_utc_iso(value: dt.date | str) -> str:
    """KST calendar date -> UTC ``...T15:00:00.000Z`` instant — the
    Wing settlement window format (reference settlement/extract.py:
    108-121 converts Asia/Seoul to UTC and trims to milliseconds)."""
    day = dt.date.fromisoformat(str(value))
    utc = dt.datetime(day.year, day.month, day.day) - dt.timedelta(hours=9)
    return utc.strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z"


class CoupangWingApi(HttpClient):
    """Coupang Wing seller endpoints over a logged-in cookie jar.

    Auth is cookie-based; endpoints marked ``token_required`` in the
    reference additionally echo the ``XSRF-TOKEN`` cookie as the
    ``x-xsrf-token`` header (reference wing/common.py:26-37).
    """

    ORIGIN = "https://wing.coupang.com"
    PROFIT_STATUS_PATH = "/tenants/rfm/v2/settlements/profit-status/search"
    ROCKET_SETTLEMENT_PATH = "/tenants/rfm/v2/settlements/status/api"
    INVENTORY_PATH = "/tenants/seller-web/v2/vendor-inventory/search"

    def __init__(self, transport: Transport, cookies: Mapping[str, str]):
        super().__init__(transport, base_url=self.ORIGIN)
        self.cookies.update(cookies)

    def _xsrf_headers(self) -> dict[str, str]:
        token = self.cookies.get("XSRF-TOKEN")
        if not token:
            raise ValueError("XSRF-TOKEN cookie is required for this endpoint")
        return {"x-xsrf-token": token, "content-type": "application/json"}

    @staticmethod
    def profit_status_payload(start_from: str, end_to: str) -> dict[str, Any]:
        """Rocket-growth profit status (reference settlement/extract.py:53-54)."""
        return {"recognitionDateFrom": start_from, "recognitionDateTo": end_to}

    @staticmethod
    def rocket_settlement_payload(
        start_date: dt.date | str,
        end_date: dt.date | str | None = None,
        date_type: str = "RECOGNITION_DATE",
    ) -> dict[str, Any]:
        """Settlement-report search with the KST->UTC window
        (reference settlement/extract.py:108-121)."""
        end = start_date if end_date is None else end_date
        return {
            "startDate": kst_date_to_utc_iso(start_date),
            "endDate": kst_date_to_utc_iso(end),
            "searchDateType": date_type,
        }

    @staticmethod
    def inventory_payload(
        is_deleted: bool = False, page: int = 1, page_size: int = 500
    ) -> dict[str, Any]:
        """Vendor-inventory search (reference product/extract.py:61-86)."""
        return {
            "searchKeywordType": "ALL",
            "searchKeywords": "",
            "salesMethod": "ALL",
            "productStatus": ["ALL"],
            "stockSearchType": "ALL",
            "shippingFeeSearchType": "ALL",
            "displayCategoryCodes": [],
            "listingStartTime": None,
            "listingEndTime": None,
            "saleEndDateSearchType": "ALL",
            "bundledShippingSearchType": "ALL",
            "displayDeletedProduct": is_deleted,
            "shippingMethod": "ALL",
            "exposureStatus": "ALL",
            "sortMethod": "SORT_BY_ITEM_LEVEL_UNIT_SOLD",
            "countPerPage": page_size,
            "page": page,
            "locale": "ko_KR",
            "coupangAttributeOptimized": False,
            "upBundleSearchOption": "ALL",
            "exposureStatuses": [],
            "qualityEnhanceTypes": [],
        }

    @staticmethod
    def inventory_total(response: Mapping[str, Any]) -> int | None:
        """(reference product/extract.py:55-58 ``data.pagination.totalCount``)."""
        pagination = (response.get("data") or {}).get("pagination") or {}
        return pagination.get("totalCount")

    def fetch_profit_status(self, start_from: str, end_to: str) -> Any:
        return self.request_json(
            "POST",
            self.PROFIT_STATUS_PATH,
            json=self.profit_status_payload(start_from, end_to),
            headers=self._xsrf_headers(),
        )

    def fetch_inventory(self, is_deleted: bool = False, page_size: int = 500) -> Iterable[Any]:
        """All vendor-inventory pages (count-driven walk)."""
        page = 1
        while True:
            resp = self.request_json(
                "POST",
                self.INVENTORY_PATH,
                json=self.inventory_payload(is_deleted, page, page_size),
                headers={
                    "content-type": "application/json",
                    "referer": f"{self.ORIGIN}/vendor-inventory/list",
                },
            )
            yield resp
            total = self.inventory_total(resp)
            if total is None or page * page_size >= total:
                return
            page += 1


# ---------------------------------------------------------------------------
# Coupang advertising center
# ---------------------------------------------------------------------------


class CoupangAdsApi(HttpClient):
    """Coupang Ads campaign listing (reference advertising/report/
    extract.py:11-114): page/size pagination with ``pageInfo.totalCount``
    and a bounded timeout-retry loop."""

    ORIGIN = "https://advertising.coupang.com"
    CAMPAIGNS_PATH = "/marketing/tetris-api/campaigns"
    MAX_PAGE_SIZE = 20
    GOAL_TYPES = ("SALES", "NCA", "REACH")

    def __init__(
        self,
        transport: Transport,
        cookies: Mapping[str, str],
        sleeper: Callable[[float], None] = _time.sleep,
    ):
        super().__init__(transport, base_url=self.ORIGIN)
        self.cookies.update(cookies)
        self._sleep = sleeper

    @classmethod
    def campaigns_payload(
        cls,
        goal_type: str = "SALES",
        page: int = 0,
        size: int = 20,
        is_deleted: bool = False,
    ) -> dict[str, Any]:
        """(reference report/extract.py:91-114 — page starts at 0)."""
        if goal_type not in cls.GOAL_TYPES:
            raise ValueError(f"goal_type must be one of {cls.GOAL_TYPES}")
        return {
            "isDeleted": is_deleted,
            "pagination": {"page": page, "size": size},
            "sortedBy": "ID",
            "isSortDesc": "DESC",
            "budgetTypes": None,
            "isActive": None,
            "name": "",
            "creationContext": None,
            "objective": None,
            "primaryOrderBy": "DEFAULT",
            "goalType": goal_type,
            "targetCampaignId": None,
            "vendorItemId": None,
        }

    @staticmethod
    def campaigns_total(response: Mapping[str, Any]) -> int | None:
        """(reference report/extract.py:71-74 ``pageInfo.totalCount``)."""
        return (response.get("pageInfo") or {}).get("totalCount")

    @staticmethod
    def _is_timeout(error: Exception) -> bool:
        """requests' Timeout is NOT a builtin TimeoutError subclass —
        match both the builtin and any transport exception whose type
        name carries 'Timeout' (requests.Timeout/ConnectTimeout/
        ReadTimeout, urllib3 variants)."""
        return isinstance(error, TimeoutError) or "Timeout" in type(error).__name__

    def request_json_with_retry(
        self, path: str, payload: Mapping[str, Any], max_retries: int = 5
    ) -> Any:
        """Timeout-retry loop (reference report/extract.py:76-89)."""
        for retry_count in range(1, max_retries + 1):
            try:
                return self.request_json("POST", path, json=payload)
            except Exception as error:  # noqa: BLE001 — filtered below
                if not self._is_timeout(error) or retry_count == max_retries:
                    raise
                self._sleep(retry_count)

    def fetch_campaigns(
        self, goal_type: str = "SALES", is_deleted: bool = False
    ) -> Iterable[Any]:
        """All campaign pages for one goal type (0-based walk)."""
        page, size = 0, self.MAX_PAGE_SIZE
        while True:
            resp = self.request_json_with_retry(
                self.CAMPAIGNS_PATH,
                self.campaigns_payload(goal_type, page, size, is_deleted),
            )
            yield resp
            total = self.campaigns_total(resp)
            if total is None or (page + 1) * size >= total:
                return
            page += 1
