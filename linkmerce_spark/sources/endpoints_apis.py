"""Open-API endpoint builders: Ecount, Dable, Meta Graph, Google Ads.

Third and final endpoint batch (after `endpoints.py` — Naver — and
`endpoints_sellers.py` — Sabangnet/Coupang): the reference's remaining
four platform families, re-expressed as request composition over the
injected transport:

- Ecount ERP open API (reference: src/linkmerce/core/ecount/api/
  common.py:12-172) — the Zone-discovery -> OAPILogin -> SESSION_ID
  handshake, per-zone origin templating, the sboapi test-API variant,
  and SESSION_ID substitution into caller bodies.
- Dable ads (reference: src/linkmerce/core/dable/api/common.py +
  report/extract.py:11-81) — api-key GET params, compacted dates,
  the ``group_by_campaign -> 1`` flag rule.
- Meta Graph API (reference: src/linkmerce/core/meta/api/common.py:
  17-60 + ads/extract.py:66-300) — token params, field lists,
  ``time_range`` JSON windows, insights level/``time_increment``
  rules, OAuthException surfacing, ad-account listing.
- Google Ads searchStream (reference: src/linkmerce/core/google/api/
  common.py:13-78 + ads/extract.py:11-131) — GAQL query composition
  (SELECT/FROM/WHERE date rules, DURING ranges), developer-token +
  login-customer-id headers. Auth binds the engine's REAL
  :class:`~linkmerce_spark.sources.oauth.ServiceAccountTokenProvider`
  (the reference's GoogleAuth JWT flow) — no stub anywhere in this
  chain.

Everything is driver-side composition; fetched batches enter Spark via
``tasks.distributed_fetch`` / ``frames.from_rows``.
"""

from __future__ import annotations

import datetime as dt
import json as _json
from typing import Any, Callable, Iterable, Mapping, Sequence

from linkmerce_spark.sources.http import HttpClient, Transport

__all__ = [
    "EcountApi",
    "DableApi",
    "MetaAdsApi",
    "GoogleAdsApi",
    "MetaOAuthError",
    "gaql_where",
]


# ---------------------------------------------------------------------------
# Ecount ERP open API
# ---------------------------------------------------------------------------


class EcountApi(HttpClient):
    """Ecount open-API session flow + request composition.

    The reference's handshake (ecount/api/common.py:43-77): POST
    ``/OAPI/V2/Zone`` with the company code to discover the tenant
    zone, then POST ``/OAPI/V2/OAPILogin`` on the zoned origin for a
    SESSION_ID; every subsequent call carries it as a query param (and
    substituted into any body field named ``SESSION_ID``).
    """

    VERSION = "V2"

    def __init__(
        self,
        transport: Transport,
        com_code: int | str,
        userid: str,
        api_key: str,
        locale: str = "ko-KR",
        test: bool = False,
    ):
        super().__init__(transport)
        self.com_code = com_code
        self.userid = userid
        self.api_key = api_key
        self.locale = locale
        # test=True -> the sboapi sandbox origin (common.py:130-143)
        self._host = "sboapi{zone}.ecount.com" if test else "oapi{zone}.ecount.com"
        self.zone = ""
        self.session_id = ""

    def _origin(self, zone: str) -> str:
        return f"https://{self._host.format(zone=zone)}/OAPI/{self.VERSION}"

    def login(self) -> str:
        """Zone discovery then OAPILogin -> SESSION_ID."""
        zone_body = self.request_json(
            "POST",
            f"{self._origin('')}/Zone",
            json={"COM_CODE": self.com_code},
            headers={"content-type": "application/json"},
        )
        try:
            self.zone = zone_body["Data"]["ZONE"]
        except (KeyError, TypeError):
            raise ConnectionError("Failed to retrieve Zone info.") from None
        login_body = self.request_json(
            "POST",
            f"{self._origin(self.zone)}/OAPILogin",
            json={
                "COM_CODE": self.com_code,
                "USER_ID": self.userid,
                "API_CERT_KEY": self.api_key,
                "LAN_TYPE": self.locale,
                "ZONE": self.zone,
            },
            headers={"content-type": "application/json"},
        )
        try:
            self.session_id = login_body["Data"]["Datas"]["SESSION_ID"]
        except (KeyError, TypeError):
            raise ConnectionError("Failed to login with the Ecount API.") from None
        return self.session_id

    def request_api(self, path: str, body: Mapping[str, Any] | None = None) -> Any:
        """One open-API call; ``SESSION_ID`` placeholders in the body
        are replaced with the live session (common.py:117-124)."""
        if not self.session_id:
            self.login()
        payload = dict(body) if body is not None else None
        if payload is not None and "SESSION_ID" in payload:
            payload["SESSION_ID"] = self.session_id
        return self.request_json(
            "POST",
            f"{self._origin(self.zone)}/{path.lstrip('/')}",
            params={"SESSION_ID": self.session_id},
            json=payload,
            headers={"content-type": "application/json"},
        )


# ---------------------------------------------------------------------------
# Dable ads
# ---------------------------------------------------------------------------


class DableApi(HttpClient):
    """Dable advertiser API (api-key in query params).

    (reference dable/api/common.py:6-35 origin rule;
    report/extract.py:70-81 param shape — compacted yyyymmdd dates,
    ``group_by_campaign`` present-as-1 or absent.)
    """

    DAYS_LIMIT = 90

    def __init__(self, transport: Transport, api_key: str, client_name: str):
        super().__init__(
            transport, base_url=f"https://marketing.dable.io/api/client/{client_name}"
        )
        self.api_key = api_key

    def daily_report_params(
        self,
        start_date: dt.date | str,
        end_date: dt.date | str | None = None,
        group_by_campaign: bool = True,
    ) -> dict[str, Any]:
        end = start_date if end_date is None else end_date
        return {
            "api_key": self.api_key,
            "start_date": str(start_date).replace("-", ""),
            "end_date": str(end).replace("-", ""),
            **({"group_by_campaign": 1} if group_by_campaign else {}),
        }

    def fetch_daily_report(
        self,
        start_date: dt.date | str,
        end_date: dt.date | str | None = None,
        group_by_campaign: bool = True,
    ) -> Any:
        return self.request_json(
            "GET",
            "/daily_report",
            params=self.daily_report_params(start_date, end_date, group_by_campaign),
        )


# ---------------------------------------------------------------------------
# Meta Graph API
# ---------------------------------------------------------------------------


class MetaOAuthError(Exception):
    """Expired/invalid Meta access token (reference meta/api/common.py:12-14)."""


class MetaAdsApi(HttpClient):
    """Meta marketing objects + insights over the Graph API.

    (reference meta/api/common.py:17-47 error surfacing;
    ads/extract.py:66-70 time_range JSON, :109-120 object params,
    :290-300 insights params.)
    """

    ORIGIN = "https://graph.facebook.com"
    VERSION = "v24.0"
    AD_LEVELS = ("campaign", "adset", "ad")

    def __init__(self, transport: Transport, access_token: str):
        super().__init__(transport, base_url=f"{self.ORIGIN}/{self.VERSION}")
        self.access_token = access_token

    @staticmethod
    def time_range(since: dt.date | str, until: dt.date | str) -> str:
        return _json.dumps({"since": str(since), "until": str(until)})

    def objects_params(
        self,
        fields: Sequence[str],
        start_date: dt.date | str | None = None,
        end_date: dt.date | str | None = None,
    ) -> dict[str, Any]:
        """Campaign/adset/ad listing params (ads/extract.py:109-120)."""
        params: dict[str, Any] = {
            "access_token": self.access_token,
            "fields": ",".join(fields),
        }
        if start_date and end_date:
            params["time_range"] = self.time_range(start_date, end_date)
        return params

    def insights_params(
        self,
        ad_level: str,
        start_date: dt.date | str,
        end_date: dt.date | str | None = None,
        date_type: str = "daily",
        fields: Sequence[str] = (),
    ) -> dict[str, Any]:
        """Insights params (ads/extract.py:290-300): daily adds
        ``time_increment=1``; limit pinned at 5000."""
        if ad_level not in self.AD_LEVELS:
            raise ValueError(f"ad_level must be one of {self.AD_LEVELS}")
        end = start_date if end_date is None else end_date
        return {
            "access_token": self.access_token,
            "fields": ",".join(fields),
            "level": ad_level,
            "time_range": self.time_range(start_date, end),
            **({"time_increment": 1} if date_type == "daily" else {}),
            "limit": 5000,
        }

    def _checked(self, body: Any) -> Any:
        """Surface Graph-API errors; OAuth expiry gets its own type
        (common.py:39-47)."""
        if isinstance(body, dict) and isinstance(body.get("error"), dict):
            message = body["error"].get("message") or "Undefined"
            if body["error"].get("type") == "OAuthException":
                raise MetaOAuthError(message)
            raise RuntimeError(message)
        return body

    def list_ad_accounts(self) -> Any:
        """(ads/extract.py:59-63 ``/me/adaccounts``)."""
        return self._checked(
            self.request_json(
                "GET",
                f"{self.ORIGIN}/{self.VERSION}/me/adaccounts",
                params={"access_token": self.access_token, "fields": "id,name"},
            )
        )

    def fetch_insights(self, account_id: str, **options: Any) -> Any:
        return self._checked(
            self.request_json(
                "GET", f"/{account_id}/insights", params=self.insights_params(**options)
            )
        )


# ---------------------------------------------------------------------------
# Google Ads (GAQL searchStream)
# ---------------------------------------------------------------------------


def gaql_where(
    start_date: dt.date | str | None = None,
    end_date: dt.date | str | None = None,
    date_range: str | None = None,
) -> str:
    """GAQL date predicate (reference google/api/ads/extract.py:113-131):
    an explicit window wins over a DURING range; open ends degrade to
    one-sided comparisons."""
    if (start_date is None) and (end_date is None):
        return f"segments.date DURING {date_range}" if date_range else ""
    if start_date is not None and end_date is not None:
        return f"segments.date BETWEEN '{start_date}' AND '{end_date}'"
    if start_date is not None:
        return f"segments.date >= '{start_date}'"
    return f"segments.date <= '{end_date}'"


class GoogleAdsApi(HttpClient):
    """Google Ads searchStream with real service-account auth.

    The reference authenticates through its GoogleAuth JWT flow
    (google/api/common.py:50-78); here ``token_provider`` is any
    ``() -> token`` callable — in production the engine's own
    :class:`~linkmerce_spark.sources.oauth.ServiceAccountTokenProvider`
    with scope ``https://www.googleapis.com/auth/adwords``.
    """

    SERVICE = "googleads"
    VERSION = "v23"
    SCOPE = "https://www.googleapis.com/auth/adwords"

    def __init__(
        self,
        transport: Transport,
        token_provider: Callable[[], str],
        customer_id: int | str,
        manager_id: int | str,
        developer_token: str,
    ):
        super().__init__(
            transport, base_url=f"https://{self.SERVICE}.googleapis.com/{self.VERSION}"
        )
        self._token = token_provider
        self.customer_id = customer_id
        self.manager_id = manager_id
        self.developer_token = developer_token

    @staticmethod
    def gaql_query(table: str, fields: Sequence[str], where: str = "") -> str:
        cond = f" WHERE {where}" if where else ""
        return f"SELECT {', '.join(fields)} FROM {table}{cond}"

    def _headers(self) -> dict[str, str]:
        """(reference ads/extract.py:102-110)."""
        return {
            "Content-Type": "application/json",
            "Authorization": f"Bearer {self._token()}",
            "developer-token": self.developer_token,
            "login-customer-id": str(self.manager_id),
        }

    def search_stream(
        self,
        table: str,
        fields: Sequence[str],
        start_date: dt.date | str | None = None,
        end_date: dt.date | str | None = None,
        date_range: str | None = "LAST_30_DAYS",
    ) -> Any:
        """One GAQL searchStream call for ``customer_id``."""
        if (start_date is not None) or (end_date is not None):
            date_range = None
        where = gaql_where(start_date, end_date, date_range)
        return self.request_json(
            "POST",
            f"/customers/{self.customer_id}/googleAds:searchStream",
            json={"query": self.gaql_query(table, fields, where)},
            headers=self._headers(),
        )
