"""Per-platform endpoint builders over the injected-transport client.

The reference ships request composition per dataset (e.g.
src/linkmerce/core/smartstore/api/order/extract.py,
src/linkmerce/core/searchad/api/report/extract.py,
src/linkmerce/core/naver/openapi/search/extract.py); this module
re-expresses the top-3 families a migrating user pulls most — the
Naver Commerce order API, the SearchAd bulk-report workflow, and the
Naver OpenAPI search endpoints — as plain request builders over
``sources.http.HttpClient``. Everything is driver-side composition:
the fetched row batches enter Spark via ``tasks.distributed_fetch`` /
``frames.from_rows``.

Testability boundaries (same pattern as sources/bigquery_client.py):
the TRANSPORT is injected, the CLOCK and SLEEPER are injected, and the
one non-stdlib auth primitive — the Commerce API's bcrypt client-secret
signature — is an injected callable (the sandbox has no bcrypt; one
line binds ``bcrypt.hashpw`` in production). The SearchAd HMAC-SHA256
signature is pure stdlib and implemented for real.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import time as _time
import datetime as dt
from typing import Any, Callable, Iterable, Mapping

from linkmerce_spark.sources.http import HttpClient, Response, Transport

__all__ = [
    "SmartstoreOrderApi",
    "SearchAdApi",
    "NaverOpenApiSearch",
    "searchad_signature",
]

_Clock = Callable[[], float]


# ---------------------------------------------------------------------------
# Naver Commerce (smartstore) order API
# ---------------------------------------------------------------------------


class SmartstoreOrderApi(HttpClient):
    """Naver Commerce API order pulls (reference:
    core/smartstore/api/common.py:12-99 + api/order/extract.py:11-280).

    - token:  POST {origin}/v1/oauth2/token  (client_credentials with a
      bcrypt-signed ``{client_id}_{timestamp}`` secret)
    - orders: GET  {origin}/v1/pay-order/seller/product-orders
    - status: GET  {origin}/v1/pay-order/seller/product-orders/
      last-changed-statuses

    ``secret_signer(message, client_secret) -> bytes`` is the injected
    bcrypt boundary (reference common.py:61-71 calls
    ``bcrypt.hashpw(message, secret)``); production binds it in one
    line, tests inject a deterministic fake.
    """

    ORIGIN = "https://api.commerce.naver.com/external"
    ORDERS_PATH = "/v1/pay-order/seller/product-orders"
    STATUS_PATH = "/v1/pay-order/seller/product-orders/last-changed-statuses"

    RANGE_TYPES = (
        "PAYED_DATETIME", "ORDERED_DATETIME", "DISPATCHED_DATETIME",
        "PURCHASE_DECIDED_DATETIME", "CLAIM_REQUESTED_DATETIME",
        "CLAIM_COMPLETED_DATETIME", "COLLECT_COMPLETED_DATETIME",
        "GIFT_RECEIVED_DATETIME", "HOPE_DELIVERY_INFO_CHANGED_DATETIME",
    )

    def __init__(
        self,
        transport: Transport,
        client_id: str,
        client_secret: str,
        secret_signer: Callable[[bytes, bytes], bytes] | None = None,
        clock: _Clock = _time.time,
        sleeper: Callable[[float], None] = _time.sleep,
    ):
        super().__init__(transport, base_url=self.ORIGIN)
        self.client_id = client_id
        self.client_secret = client_secret
        self._signer = secret_signer
        self._clock = clock
        self._sleep = sleeper

    # -- auth ------------------------------------------------------------
    def build_auth_params(self) -> dict[str, Any]:
        """Token-request params (reference common.py:59-71): timestamp
        backdated 3 s, secret = b64(bcrypt(client_id_timestamp))."""
        if self._signer is None:
            raise NotImplementedError(
                "Commerce API auth needs a bcrypt signer; bind "
                "secret_signer=bcrypt.hashpw where the library exists"
            )
        timestamp = int((self._clock() - 3) * 1000)
        hashed = self._signer(
            f"{self.client_id}_{timestamp}".encode("utf-8"),
            self.client_secret.encode("utf-8"),
        )
        return {
            "client_id": self.client_id,
            "timestamp": timestamp,
            "client_secret_sign": base64.b64encode(hashed).decode("utf-8"),
            "grant_type": "client_credentials",
            "type": "SELF",
        }

    def authorize(self) -> str:
        """Fetch the OAuth token and pin the Bearer header."""
        resp = self.request_json(
            "POST",
            "/v1/oauth2/token",
            params=self.build_auth_params(),
            headers={"content-type": "application/x-www-form-urlencoded"},
        )
        token = resp["access_token"]
        self.headers["Authorization"] = f"Bearer {token}"
        return token

    # -- request composition (reference order/extract.py:113-136,248-268)
    @staticmethod
    def product_orders_params(
        date: dt.date | str,
        range_type: str = "PAYED_DATETIME",
        product_order_status: Iterable[str] = (),
        claim_status: Iterable[str] = (),
        place_order_status: str | None = None,
        page: int = 1,
        page_size: int = 300,
    ) -> dict[str, Any]:
        return {
            "from": f"{date}T00:00:00.000+09:00",
            "to": f"{date}T23:59:59.999+09:00",
            "rangeType": range_type,
            "productOrderStatuses": ",".join(product_order_status),
            "claimStatuses": ",".join(claim_status),
            "placeOrderStatusType": place_order_status if place_order_status is not None else [],
            "page": page,
            "pageSize": page_size,
        }

    @staticmethod
    def last_changed_params(
        date: dt.date | str,
        last_changed_type: str | None = None,
        cursor: Mapping[str, Any] | None = None,
        limit_count: int = 300,
    ) -> dict[str, Any]:
        cursor = dict(cursor or {})
        params: dict[str, Any] = {
            "lastChangedFrom": cursor.get("moreFrom") or f"{date}T00:00:00.000+09:00",
            "lastChangedTo": f"{date}T23:59:59.999+09:00",
        }
        if last_changed_type is not None:
            params["lastChangedType"] = last_changed_type
        if "moreSequence" in cursor:
            params["moreSequence"] = cursor["moreSequence"]
        params["limitCount"] = limit_count
        return params

    # -- cursors (reference order/extract.py:106-111, 243-249)
    @staticmethod
    def next_page(response: Mapping[str, Any]) -> int | None:
        pagination = (response.get("data") or {}).get("pagination") or {}
        return (pagination.get("page") + 1) if pagination.get("hasNext") else None

    @staticmethod
    def next_more(response: Mapping[str, Any], date: dt.date | str) -> dict | None:
        more = (response.get("data") or {}).get("more") or {}
        if more.get("moreFrom") and (more["moreFrom"] <= f"{date}T23:59:59.999+09:00"):
            return more
        return None

    # -- rate-limit-aware fetch (reference common.py:73-97)
    def request_json_until_success(
        self, method: str, path: str, max_retries: int = 5, **kwargs: Any
    ) -> Any:
        for retry_count in range(1, max_retries + 1):
            try:
                response = self.request_json(method, path, **kwargs)
            except Exception as error:  # noqa: BLE001 — mirrors the reference
                response = {
                    "code": "GW.RATE_LIMIT",
                    "message": f"{error.__class__.__name__}: {error}",
                }
            retriable = isinstance(response, dict) and (
                response.get("code") == "GW.RATE_LIMIT"
                or response.get("message") == "Internal server error"
            )
            if retriable:
                if retry_count == max_retries:
                    raise ConnectionError(response.get("message") or "")
                self._sleep(retry_count)
                continue
            if isinstance(response, dict) and response.get("code"):
                raise ConnectionError(response.get("message") or "")
            return response

    def fetch_orders(self, date: dt.date | str, **options: Any) -> Iterable[Any]:
        """All pages of one day's product orders (cursor walk)."""
        page: int | None = options.pop("page_start", 1)
        while page is not None:
            resp = self.request_json_until_success(
                "GET",
                self.ORDERS_PATH,
                params=self.product_orders_params(date, page=page, **options),
            )
            yield resp
            page = self.next_page(resp)


# ---------------------------------------------------------------------------
# Naver SearchAd API (HMAC-signed) — bulk-report workflow
# ---------------------------------------------------------------------------


def searchad_signature(secret_key: str, timestamp: str, method: str, uri: str) -> bytes:
    """HMAC-SHA256 request signature (reference:
    core/searchad/api/common.py:55-66): b64(hmac(secret,
    '{ts}.{METHOD}.{uri}')). Pure stdlib — implemented for real."""
    message = f"{timestamp}.{method}.{uri}"
    digest = hmac.new(
        secret_key.encode("utf-8"), message.encode("utf-8"), hashlib.sha256
    ).digest()
    return base64.b64encode(digest)


class SearchAdApi(HttpClient):
    """SearchAd master/stat bulk-report workflow (reference:
    core/searchad/api/report/extract.py:13-166,749-813).

    create -> poll until BUILT -> download -> delete, with the signed
    header set rebuilt per (method, uri)."""

    ORIGIN = "https://api.searchad.naver.com"

    MASTER_TYPES = (
        "Campaign", "CampaignBudget", "BusinessChannel", "Adgroup",
        "AdgroupBudget", "Keyword", "Account", "Ad", "AdExtension", "Qi",
        "Label", "LabelRef", "Media", "Biz", "ShoppingProduct", "ContentsAd",
        "CatalogAd", "ProductGroup", "ProductGroupRel", "BrandAd",
        "BrandThumbnailAd", "BrandBannerAd", "Criterion",
    )
    STAT_TYPES = (
        "AD", "AD_DETAIL", "AD_CONVERSION", "AD_CONVERSION_DETAIL",
        "ADEXTENSION", "ADEXTENSION_CONVERSION", "EXPKEYWORD",
        "SHOPPINGKEYWORD_DETAIL", "SHOPPINGKEYWORD_CONVERSION_DETAIL",
        "SHOPPINGBRANDPRODUCT", "SHOPPINGBRANDPRODUCT_CONVERSION",
        "CRITERION", "CRITERION_CONVERSION",
    )

    def __init__(
        self,
        transport: Transport,
        api_key: str,
        secret_key: str,
        customer_id: int | str,
        clock: _Clock = _time.time,
        sleeper: Callable[[float], None] = _time.sleep,
        poll_interval: float = 0.5,
        max_polls: int = 120,
    ):
        super().__init__(transport, base_url=self.ORIGIN)
        self.api_key = api_key
        self.secret_key = secret_key
        self.customer_id = customer_id
        self._clock = clock
        self._sleep = sleeper
        self._poll_interval = poll_interval
        self._max_polls = max_polls

    def build_request_headers(self, method: str, uri: str) -> dict[str, str]:
        """Signed header set (reference common.py:40-53)."""
        timestamp = str(round(self._clock() * 1000))
        return {
            "Content-Type": "application/json; charset=UTF-8",
            "X-Timestamp": timestamp,
            "X-API-KEY": self.api_key,
            "X-Customer": str(self.customer_id),
            "X-Signature": searchad_signature(
                self.secret_key, timestamp, method, uri
            ).decode("ascii"),
        }

    def signed_request(
        self, method: str, uri: str, url: str | None = None, **kwargs: Any
    ) -> Response:
        """Request with per-(method, uri) signature; ``url`` overrides
        the target while the signature stays on the API uri (the
        report-download redirect case, reference extract.py:94-100)."""
        headers = self.build_request_headers(method, uri)
        return self.request(method, url or uri, headers=headers, **kwargs)

    # -- workflow steps --------------------------------------------------
    def create_master_report(
        self, report_type: str, from_date: dt.date | str | None = None
    ) -> dict:
        data: dict[str, Any] = {"item": report_type}
        if from_date:
            data["fromTime"] = f"{from_date}T00:00:00Z"
        return self.signed_request("POST", "/master-reports", json=data).json()

    def create_stat_report(self, report_type: str, date: dt.date | str) -> dict:
        data = {"reportTp": report_type, "statDt": str(date).replace("-", "")}
        return self.signed_request("POST", "/stat-reports", json=data).json()

    def poll_report(self, job_type: str, report_job_id: str) -> str | None:
        """Wait for BUILT and return the download URL (NONE -> None)."""
        uri = f"/{job_type}/{report_job_id}"
        for _ in range(self._max_polls):
            report = self.signed_request("GET", uri).json()
            status = report.get("status")
            if status == "NONE":
                return None
            if status == "BUILT":
                return report["downloadUrl"]
            self._sleep(self._poll_interval)
        raise TimeoutError(f"report {report_job_id} never reached BUILT")

    def download_report(self, download_url: str | None) -> str | None:
        if not download_url:
            return None
        return self.signed_request("GET", "/report-download", url=download_url).text

    def delete_report(self, job_type: str, report_job_id: str) -> int:
        return self.signed_request("DELETE", f"/{job_type}/{report_job_id}").status

    def fetch_master_report(
        self, report_type: str, from_date: dt.date | str | None = None
    ) -> str | None:
        """create -> poll -> download -> delete (reference
        extract.py:49-60); the delete runs even when download fails."""
        job = self.create_master_report(report_type, from_date)
        if "id" not in job:
            raise KeyError(job.get("message") or "'id'")
        try:
            return self.download_report(self.poll_report("master-reports", job["id"]))
        finally:
            self.delete_report("master-reports", job["id"])

    def fetch_stat_report(self, report_type: str, date: dt.date | str) -> str | None:
        job = self.create_stat_report(report_type, date)
        if "reportJobId" not in job:
            raise KeyError(job.get("message") or "'reportJobId'")
        try:
            return self.download_report(
                self.poll_report("stat-reports", job["reportJobId"])
            )
        finally:
            self.delete_report("stat-reports", job["reportJobId"])


# ---------------------------------------------------------------------------
# Naver OpenAPI search
# ---------------------------------------------------------------------------


class NaverOpenApiSearch(HttpClient):
    """Naver OpenAPI search endpoints (reference:
    core/naver/openapi/common.py:6-38 + openapi/search/extract.py:11-96).

    GET {origin}/v1/search/{content_type}.{json|xml} with the
    client-id/secret header pair."""

    ORIGIN = "https://openapi.naver.com"
    CONTENT_TYPES = (
        "blog", "news", "book", "adult", "encyc", "cafearticle", "kin",
        "local", "errata", "webkr", "image", "shop", "doc",
    )

    def __init__(
        self,
        transport: Transport,
        client_id: str,
        client_secret: str,
        content_type: str = "shop",
        response_type: str = "json",
    ):
        if content_type not in self.CONTENT_TYPES:
            raise ValueError(f"unknown content_type {content_type!r}")
        super().__init__(
            transport,
            base_url=self.ORIGIN,
            headers={
                "X-Naver-Client-Id": client_id,
                "X-Naver-Client-Secret": client_secret,
                "Content-Type": "application/json",
            },
        )
        self.content_type = content_type
        self.response_type = response_type

    @property
    def search_path(self) -> str:
        return f"/v1/search/{self.content_type}.{self.response_type}"

    @staticmethod
    def search_params(
        query: str, start: int = 1, display: int = 100, sort: str = "sim"
    ) -> dict[str, Any]:
        return {"query": query, "start": start, "display": display, "sort": sort}

    def search(self, query: str, **options: Any) -> Any:
        return self.request_json(
            "GET", self.search_path, params=self.search_params(query, **options)
        )

    def search_each(self, queries: Iterable[str], **options: Any) -> list[Any]:
        """Sequential per-query fan-out (the reference's RequestEachLoop
        without the driver-side sleep; executor-side fan-out belongs to
        tasks.distributed_fetch)."""
        return [self.search(q, **options) for q in queries]
