"""Logistics-platform endpoint builders: CJ eFLEXs (WMS).

Request-composition parity with the reference's CJ module — the last
platform family without a builder here — over the same injected
``Transport`` as every other endpoint module (no network, no secrets):

- ``CjEflexsApi``: the Websquare-framed form protocol — session init,
  two-step login (password -> emailed one-time code -> certification),
  and the detailed-stock query (menu ``IMSI0002M``). Reference:
  ``core/cj/eflexs/common.py:27-110`` (login flow + form envelope),
  ``core/cj/eflexs/stock/extract.py:40-128`` (menu/path, date
  compaction, page walk, per-customer fan-out).
- ``MailCodeProvider``: the 2FA side channel — poll a webmail API for
  the auth mail, extract the 4-digit code, mark it read. Reference:
  ``core/cj/eflexs/common.py:113-185``. The poll loop takes injected
  ``sleep``/transport so tests drive it without waiting.

The eFLEXs backend is Websquare: every call POSTs a flat form whose
keys are ``@d1#``-prefixed field names plus a fixed envelope
(``@d#``/``@d1#``/``@d1#tp``) naming the data-map the server should
bind. ``websquare_form`` builds that envelope once so payload methods
stay declarative.
"""

from __future__ import annotations

import datetime as dt
import re
from collections.abc import Callable, Iterable, Mapping
from typing import Any

from linkmerce_spark.sources.http import HttpClient, Transport

__all__ = [
    "websquare_form",
    "resolve_date_window",
    "CjEflexsApi",
    "MailCodeProvider",
    "TwoFactorError",
]


class TwoFactorError(RuntimeError):
    """2FA handshake failed (bad code, expired key, or no mail)."""


def websquare_form(
    data_id: str, fields: Mapping[str, Any], pgm_id: str | None = None
) -> dict[str, Any]:
    """Websquare submission envelope (reference common.py:72-98): the
    ``@d1#``-prefixed fields plus the map-binding triplet. ``pgm_id``
    is the owning menu/program for data calls, absent for auth calls.
    """
    body: dict[str, Any] = {"pgmId": pgm_id, "requestDataIds": data_id}
    for key, value in fields.items():
        body[f"@d1#{key}"] = value
    body["@d#"] = "@d1#"
    body["@d1#"] = data_id
    body["@d1#tp"] = "dm"
    return body


def resolve_date_window(
    start_date: dt.date | str,
    end_date: dt.date | str,
    today: dt.date | None = None,
) -> tuple[str, str]:
    """Resolve the reference's sentinel dates (stock/extract.py:80-92)
    and compact to the ``yyyymmdd`` wire format (:117-118). ``today``
    is injectable so tests are clock-independent.
    """
    today = today or dt.date.today()
    if start_date == ":last_week:":
        start_date = today - dt.timedelta(days=7)
    if end_date == ":start_date:":
        end_date = start_date
    elif end_date == ":today:":
        end_date = today
    return str(start_date).replace("-", ""), str(end_date).replace("-", "")


class CjEflexsApi(HttpClient):
    """CJ eFLEXs request composition: login handshake + stock query.

    Auth is three POSTs (reference common.py:45-102): ``loginProc.do``
    trades credentials for a one-time ``key``; the user receives a
    4-digit code by mail; ``checkAuthInfo.do`` validates (key, code);
    ``certiLogin.do`` finalizes the session (cookie-based — the jar
    carries it). The code itself comes from an injected provider so
    the mail side channel stays swappable (and testable).
    """

    ORIGIN = "https://eflexs-x.cjlogistics.com"
    STOCK_MENU = "IMSI0002M"
    STOCK_PATH = "/selectDtlStckSearch.do"
    MAX_PAGE_ROWS = 100_000

    def __init__(self, transport: Transport, headers: Mapping[str, str] | None = None):
        super().__init__(transport, base_url=self.ORIGIN, headers=headers)
        self.headers.setdefault("origin", self.ORIGIN)
        self.headers.setdefault("referer", self.ORIGIN + "/index.do")

    # -- auth (common.py:45-102) ---------------------------------------
    def init_session(self) -> None:
        """GET the landing page; the response cookie jar picks up
        ``JSESSIONID`` (common.py:63-68)."""
        self.request("GET", "/index.do")

    def login_action(self, userid: str, passwd: str) -> str:
        """Password step -> the one-time 2FA ``key``
        (common.py:70-78)."""
        body = {
            "pgmId": "",
            "requestDataIds": "dmParam",
            "cjLoginId": userid,
            "cjLoginPw": passwd,
            "cjSecurityID": "",
            "langCd": "KO",
        }
        payload = self.request_json("POST", "/auth/loginProc.do", data=body)
        return payload["_METADATA_"]["key"]

    def submit_2fa(self, key: str, code: str) -> str:
        """Validate (key, code); returns the server's encrypted check
        key (common.py:80-91). ``checkKeyYn != 'Y'`` is a hard fail."""
        body = websquare_form(
            "reqParam",
            {
                "loginId": None,
                "freeYn": None,
                "checkKeyDe": code,
                "authKeyDe": key,
            },
        )
        results = self.request_json("POST", "/CMLN0003M/checkAuthInfo.do", data=body)[
            "resParam"
        ]
        if results.get("checkKeyYn") != "Y":
            raise TwoFactorError("eFLEXs rejected the 2FA code.")
        return results["checkKeyEnc"]

    def finalize_login(self, userid: str, key: str, code: str) -> bool:
        """Certification step; truthy ``usrStdInfo`` = logged in
        (common.py:93-102)."""
        body = websquare_form(
            "reqParam",
            {
                "loginId": userid,
                "freeYn": "E",
                "checkKeyDe": code,
                "authKeyDe": key,
            },
        )
        payload = self.request_json("POST", "/CMLN0001P/certiLogin.do", data=body)
        return bool(payload.get("usrStdInfo"))

    def login(self, userid: str, passwd: str, code_provider: Callable[[], str]) -> None:
        """The full handshake (common.py:45-56). ``code_provider`` is
        the injected 2FA side channel (e.g. ``MailCodeProvider``)."""
        self.init_session()
        key = self.login_action(userid, passwd)
        code = code_provider()
        self.submit_2fa(key, code)
        if not self.finalize_login(userid, key, code):
            raise TwoFactorError("eFLEXs certification login failed.")

    # -- stock query (stock/extract.py:94-128) ---------------------------
    def stock_payload(
        self,
        customer_id: int | str,
        start_date: str,
        end_date: str,
        page: int = 0,
        page_size: int = MAX_PAGE_ROWS,
    ) -> dict[str, Any]:
        """Detailed-stock search body: all filter fields present (the
        server binds the whole data map), dates already ``yyyymmdd``."""
        return websquare_form(
            "dmMainParam",
            {
                "strrId": str(customer_id),
                "oWhCd": None,
                "srchZoneCd": None,
                "srchZoneNm": None,
                "srchItemNm": None,
                "srchItemCd": None,
                "srchWcellNm": None,
                "srchWcellTcd": None,
                "srchLotNo": None,
                "srchItemRarcode": None,
                "srchHldScd": None,
                "fromCloseDate": start_date,
                "toCloseDate": end_date,
                "srchMallId": None,
                "page": page,
                "pageRow": page_size,
                "srchLotNo7": None,
                "srchLotNo10": None,
                "itemGcd": None,
            },
            pgm_id=self.STOCK_MENU,
        )

    def fetch_stock(
        self,
        customer_ids: int | str | Iterable[int | str],
        start_date: dt.date | str = ":last_week:",
        end_date: dt.date | str = ":today:",
        today: dt.date | None = None,
        sleep: Callable[[float], None] | None = None,
        request_delay: float = 1.0,
    ) -> list[Any]:
        """Per-customer stock pull (the reference's ``RequestEach`` with
        ``request_delay`` between customers, stock/extract.py:43-78).
        Scalar ``customer_ids`` yields one response; iterables, one per
        customer in order.
        """
        scalar = isinstance(customer_ids, (int, str))
        ids = [customer_ids] if scalar else list(customer_ids)
        start, end = resolve_date_window(start_date, end_date, today)
        out: list[Any] = []
        for i, cid in enumerate(ids):
            if i and sleep is not None:
                sleep(request_delay)
            out.append(
                self.request_json(
                    "POST",
                    f"/{self.STOCK_MENU}{self.STOCK_PATH}",
                    data=self.stock_payload(cid, start, end),
                )
            )
        return out


class MailCodeProvider:
    """2FA code retrieval from a webmail API (common.py:113-185): log
    in, poll the inbox for the unread auth mail, extract the 4-digit
    code from its body, mark it read. All I/O goes through the injected
    transport; the wait loop uses the injected ``sleep``.
    """

    SUBJECT = "LoIS eFLEXs 인증번호"
    CODE_PATTERN = re.compile(r"인증번호 : (\d{4})")

    def __init__(
        self,
        transport: Transport,
        origin: str,
        email: str,
        passwd: str,
        wait_seconds: int = 60 * 5 - 10,
        wait_interval: float = 1.0,
        sleep: Callable[[float], None] | None = None,
    ):
        self._client = HttpClient(transport)
        self.origin = origin
        self.email = email
        self.passwd = passwd
        self.wait_seconds = wait_seconds
        self.wait_interval = wait_interval
        self._sleep = sleep

    def __call__(self) -> str:
        self._login()
        return self._retrieve(self._wait_for_mail())

    def _login(self) -> None:
        """Webmail login (common.py:146-150)."""
        self._client.request(
            "POST",
            f"https://auth-api.{self.origin}/office-web/login",
            json={"id": self.email, "password": self.passwd, "ip_security_level": "1"},
        )

    def _wait_for_mail(self) -> int:
        """Poll the inbox until the unread auth mail lands
        (common.py:152-163); returns its mail number."""
        url = f"https://mail-api.{self.origin}/v2/mails"
        params = {
            "page[limit]": 30,
            "page[offset]": 0,
            "sort[received_date]": "desc",
            "filter[mailbox_id][eq]": "b0",
        }
        headers = {"x-skip-session-refresh": "true"}
        for attempt in range(self.wait_seconds):
            if attempt and self._sleep is not None:
                self._sleep(self.wait_interval)
            payload = self._client.request_json("GET", url, params=params, headers=headers)
            for mail in payload.get("data", [])[:5]:
                if mail.get("subject") == self.SUBJECT and mail.get("is_new"):
                    return mail["no"]
        raise TwoFactorError("2FA mail did not arrive within the wait window.")

    def _retrieve(self, mail_no: int) -> str:
        """Read the code out of the mail body, then mark it read even
        when parsing fails (common.py:165-180)."""
        url = f"https://mail-api.{self.origin}/v2/mails/{mail_no}"
        try:
            content = self._client.request_json("GET", url)["data"]["message"]["content"]
            match = self.CODE_PATTERN.search(content)
            if not match:
                raise TwoFactorError("Auth mail did not contain a 4-digit code.")
            return match.group(1)
        finally:
            self._client.request("PATCH", url, json={"is_read": True})
