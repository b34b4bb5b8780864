"""HTTP extract client layer — transport-injectable, sandbox-testable.

The reference's extraction stack (reference: src/linkmerce/common/
extract.py — BaseSessionClient:41-251, RequestSessionClient:253-342,
LoginHandler:966-1032; src/linkmerce/utils/headers.py:11-199) wraps
every platform pull in: Chrome-profile header synthesis, cookie
persistence across a login session, request composition (params/data/
json), typed response accessors (status/content/text/json/html/excel),
and date-window splitting for APIs that cap query ranges.

This module re-expresses that surface with composition instead of the
reference's five-way mixin inheritance, and with the TRANSPORT as an
injected callable — so the request/auth/header/cookie semantics are
fully testable without a network (tests drive a fake transport), and a
real ``requests``-backed transport binds in one line where the library
exists.  The data plane stays in Spark: fetched row batches land via
``tasks.distributed_fetch`` / ``frames.from_rows``; nothing here
touches executors.

Intentionally NOT ported: the aiohttp variant (AiohttpSessionClient) —
executor-side fan-out via ``distributed_fetch`` replaces driver-side
async concurrency in the Spark architecture (SURVEY §2.10).
"""

from __future__ import annotations

import json as _json
from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from typing import Any, Callable, Iterator, Literal, Mapping
import datetime as dt

__all__ = [
    "CHROME_VERSION",
    "build_headers",
    "add_headers",
    "cookies_to_dict",
    "cookies_to_str",
    "Request",
    "Response",
    "HttpClient",
    "LoginSession",
    "requests_transport",
    "date_range",
    "date_pairs",
    "date_split",
]

CHROME_VERSION = 146

_CONTENT_TYPES = {
    "form": "application/x-www-form-urlencoded",
    "javascript": "javascript",
    "json": "application/json",
    "text": "text/plain",
    "multipart": "multipart/form-data",
}

_LANGUAGES = {
    "ko": "ko-KR,ko;q=0.9,en-US;q=0.8,en;q=0.7",
    "en": "en-US,en;q=0.9",
}


def _hostname(url: str) -> str:
    if "://" in url:
        url = url.split("://", 1)[1]
    for sep in ("/", "?", "#"):
        if sep in url:
            url = url.split(sep, 1)[0]
    return url


def _content_type(contents: str | dict) -> str:
    if isinstance(contents, dict):
        base = _CONTENT_TYPES.get(contents.get("type", ""), contents.get("type", ""))
        charset = contents.get("charset")
        return f"{base}; charset={charset}" if charset else base
    return _CONTENT_TYPES.get(contents, contents)


def _fetch_metadata(metadata: str | Mapping[str, str]) -> dict[str, str]:
    if isinstance(metadata, Mapping):
        return {f"sec-fetch-{k.removeprefix('sec-fetch-')}": v for k, v in metadata.items()}
    if metadata == "navigate":
        return {
            "sec-fetch-dest": "document",
            "sec-fetch-mode": "navigate",
            "sec-fetch-site": "same-origin",
            "sec-fetch-user": "?1",
        }
    return {"sec-fetch-dest": "empty", "sec-fetch-mode": "cors", "sec-fetch-site": "same-origin"}


def _default_client(version: int) -> str:
    return (
        f'"Chromium";v="{version}", "Google Chrome";v="{version}", '
        f'"Not·A/Brand";v="99"'
    )


def _user_agent(version: int) -> str:
    return (
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
        f"(KHTML, like Gecko) Chrome/{version}.0.0.0 Safari/537.36"
    )


def build_headers(
    authority: str | None = None,
    accept: str = "*/*",
    encoding: str = "gzip, deflate, br",
    language: str = "ko",
    connection: str = "keep-alive",
    contents: str | dict | None = None,
    cookies: str | None = None,
    host: str | None = None,
    origin: str | None = None,
    priority: str = "u=0, i",
    referer: str | None = None,
    client: str | None = None,
    mobile: bool = False,
    platform: str | None = None,
    metadata: str | Mapping[str, str] = "cors",
    https: bool = False,
    user_agent: str | None = None,
    ajax: bool = False,
    version: int = CHROME_VERSION,
    **extra: str,
) -> dict[str, str]:
    """Chrome-profile request headers (reference utils/headers.py:11-56).

    Keys appear only when their source argument is set; the sec-ch-ua /
    sec-fetch / user-agent trio is always present (the fingerprint the
    platforms check). ``extra`` kwargs pass through verbatim.
    """
    headers: dict[str, str] = {}
    if authority:
        headers["authority"] = _hostname(authority)
    if accept:
        headers["accept"] = accept
    if encoding:
        headers["accept-encoding"] = encoding
    if language:
        headers["accept-language"] = _LANGUAGES.get(language, language)
    if connection:
        headers["connection"] = connection
    if contents:
        headers["content-type"] = _content_type(contents)
    if cookies:
        headers["cookie"] = cookies
    if host:
        headers["host"] = _hostname(host)
    if origin:
        headers["origin"] = origin
    if priority:
        headers["priority"] = priority
    if referer:
        headers["referer"] = referer
    headers["sec-ch-ua"] = client or _default_client(version)
    headers["sec-ch-ua-mobile"] = f"?{int(mobile)}"
    headers["sec-ch-ua-platform"] = platform or '"Windows"'
    headers.update(_fetch_metadata(metadata))
    if https:
        headers["upgrade-insecure-requests"] = "1"
    headers["user-agent"] = user_agent or _user_agent(version)
    if ajax:
        headers["x-requested-with"] = "XMLHttpRequest"
    headers.update(extra)
    return headers


def add_headers(headers: dict[str, str], **kwargs: Any) -> dict[str, str]:
    """Merge convenience keys into an existing header dict
    (reference utils/headers.py:59-88)."""
    remap: dict[str, tuple[str, Callable[[Any], str] | None]] = {
        "authority": ("authority", _hostname),
        "encoding": ("accept-encoding", None),
        "language": ("accept-language", lambda v: _LANGUAGES.get(v, v)),
        "contents": ("content-type", _content_type),
        "cookies": ("cookie", None),
        "host": ("host", _hostname),
        "client": ("sec-ch-ua", None),
        "mobile": ("sec-ch-ua-mobile", lambda v: f"?{int(v)}"),
        "platform": ("sec-ch-ua-platform", None),
        "user_agent": ("user-agent", None),
    }
    for key, value in kwargs.items():
        k = key.lower()
        if k in remap:
            target, fn = remap[k]
            headers[target] = fn(value) if fn else value
        elif k == "https" and value:
            headers["upgrade-insecure-requests"] = "1"
        elif k == "ajax" and value:
            headers["x-requested-with"] = "XMLHttpRequest"
        elif k == "metadata":
            headers.update(_fetch_metadata(value))
        else:
            headers[key] = value
    return headers


def cookies_to_dict(cookies: str | Mapping[str, str] | None) -> dict[str, str]:
    """``"a=1; b=2"`` -> ``{"a": "1", "b": "2"}`` (extract.py:143-154)."""
    if not cookies:
        return {}
    if isinstance(cookies, Mapping):
        return dict(cookies)
    out: dict[str, str] = {}
    for part in cookies.split(";"):
        part = part.strip()
        if not part:
            continue
        key, _, value = part.partition("=")
        out[key.strip()] = value.strip()
    return out


def cookies_to_str(cookies: str | Mapping[str, str] | None) -> str:
    if cookies is None:
        return ""
    if isinstance(cookies, str):
        return cookies
    return "; ".join(f"{k}={v}" for k, v in cookies.items())


@dataclass
class Request:
    """One composed HTTP request — what a transport executes."""

    method: str
    url: str
    params: Mapping[str, Any] | None = None
    data: Any = None
    json: Any = None
    headers: dict[str, str] = field(default_factory=dict)


@dataclass
class Response:
    """Transport result: status + headers + raw body, typed accessors."""

    status: int
    content: bytes = b""
    headers: dict[str, str] = field(default_factory=dict)
    cookies: dict[str, str] = field(default_factory=dict)

    @property
    def text(self) -> str:
        return self.content.decode("utf-8", errors="replace")

    def json(self) -> Any:
        return _json.loads(self.text)

    def json_safe(self) -> Any | None:
        try:
            return self.json()
        except ValueError:
            return None


Transport = Callable[[Request], Response]


def requests_transport(session: Any = None, timeout: float | tuple = 30.0) -> Transport:
    """Bind a real ``requests``-backed transport (import-gated: the
    sandbox has no requests/network; production environments do).
    ``timeout`` defaults to 30 s — requests' own default is NO timeout,
    which can hang an ingestion task indefinitely."""
    import requests  # noqa: PLC0415 — optional dependency by design

    sess = session or requests.Session()

    def _send(req: Request) -> Response:
        r = sess.request(
            req.method,
            req.url,
            params=req.params,
            data=req.data,
            json=req.json,
            headers=req.headers,
            timeout=timeout,
        )
        return Response(
            status=r.status_code,
            content=r.content,
            headers=dict(r.headers),
            cookies=dict(r.cookies.get_dict()),
        )

    return _send


class HttpClient:
    """Session-scoped request composer over an injected transport.

    Holds default headers + a cookie jar; every request merges them,
    and Set-Cookie responses update the jar (the reference's session
    persistence, extract.py:113-154). Accessors mirror the reference's
    request_* family (extract.py:275-324).
    """

    def __init__(
        self,
        transport: Transport,
        base_url: str = "",
        headers: Mapping[str, str] | None = None,
        cookies: str | Mapping[str, str] | None = None,
    ):
        self._transport = transport
        self.base_url = base_url.rstrip("/")
        self.headers = dict(headers or {})
        self.cookies = cookies_to_dict(cookies)

    # -- composition ---------------------------------------------------
    def concat_path(self, *parts: str) -> str:
        """URL join on '/' boundaries (extract.py:886-891)."""
        segs = [self.base_url] if self.base_url else []
        segs += [p.strip("/") for p in parts if p]
        return "/".join(segs)

    def set_cookies(self, cookies: str | Mapping[str, str] | None) -> None:
        self.cookies.update(cookies_to_dict(cookies))

    def get_cookies(self, to: Literal["str", "dict"] = "str") -> str | dict[str, str]:
        return cookies_to_str(self.cookies) if to == "str" else dict(self.cookies)

    def require_cookies(self, key: str | None = None) -> None:
        """Fail fast when an auth cookie is missing (extract.py:240-251)."""
        if key and key not in self.cookies:
            raise KeyError(f"Missing {key!r} in cookies.")
        if not self.cookies:
            import warnings

            warnings.warn("Cookies will be required for upcoming requests.")

    def compose(
        self,
        method: str,
        url: str,
        params: Mapping[str, Any] | None = None,
        data: Any = None,
        json: Any = None,
        headers: Mapping[str, str] | None = None,
    ) -> Request:
        merged = dict(self.headers)
        if headers:
            merged.update(headers)
        if self.cookies and "cookie" not in merged:
            merged["cookie"] = cookies_to_str(self.cookies)
        full = url if "://" in url else self.concat_path(url)
        return Request(method, full, params=params, data=data, json=json, headers=merged)

    # -- execution -----------------------------------------------------
    def request(self, method: str, url: str, **kwargs: Any) -> Response:
        resp = self._transport(self.compose(method, url, **kwargs))
        if resp.cookies:
            self.cookies.update(resp.cookies)
        return resp

    def request_status(self, method: str, url: str, **kwargs: Any) -> int:
        return self.request(method, url, **kwargs).status

    def request_content(self, method: str, url: str, **kwargs: Any) -> bytes:
        return self.request(method, url, **kwargs).content

    def request_text(self, method: str, url: str, **kwargs: Any) -> str:
        return self.request(method, url, **kwargs).text

    def request_json(self, method: str, url: str, **kwargs: Any) -> Any:
        return self.request(method, url, **kwargs).json()

    def request_json_safe(self, method: str, url: str, **kwargs: Any) -> Any | None:
        try:
            return self.request(method, url, **kwargs).json_safe()
        except Exception:  # noqa: BLE001 — the reference swallows to None
            return None

    def request_headers(self, method: str, url: str, **kwargs: Any) -> dict[str, str]:
        return self.request(method, url, **kwargs).headers


class LoginSession(HttpClient, ABC):
    """Authenticated session shape (extract.py LoginHandler:966-1032).

    Subclasses implement ``login(**creds)`` using the inherited request
    methods; the cookie jar carries the resulting auth state into every
    later request. ``build_headers`` is the Chrome-profile synthesizer
    bound as a method for subclass convenience.
    """

    @abstractmethod
    def login(self, **kwargs: Any) -> Any:
        raise NotImplementedError

    @staticmethod
    def build_headers(**kwargs: Any) -> dict[str, str]:
        return build_headers(**kwargs)


# -- date-window helpers (extract.py:893-964) -------------------------------

def _as_date(d: dt.date | str) -> dt.date:
    return d if isinstance(d, dt.date) else dt.date.fromisoformat(d)


def _month_first(d: dt.date) -> dt.date:
    return d.replace(day=1)


def _next_period(d: dt.date, freq: str) -> dt.date:
    if freq == "D":
        return d + dt.timedelta(days=1)
    if freq == "W":
        return d + dt.timedelta(days=7)
    nxt = (d.replace(day=1) + dt.timedelta(days=32)).replace(day=1)
    return nxt


def date_range(
    start_date: dt.date | str,
    end_date: dt.date | str | None = None,
    freq: Literal["D", "W", "M"] = "D",
) -> list[dt.date]:
    """Period starts in [start, end]: daily, Monday-anchored weekly, or
    first-of-month monthly (extract.py:893-910)."""
    start, end = _as_date(start_date), _as_date(end_date or start_date)
    if freq == "W":
        cur = start - dt.timedelta(days=start.weekday())
    elif freq == "M":
        cur = _month_first(start)
    else:
        cur = start
    out = []
    while cur <= end:
        out.append(max(cur, start) if freq != "D" else cur)
        cur = _next_period(cur, freq)
    return out


def date_pairs(
    start_date: dt.date | str,
    end_date: dt.date | str | None = None,
    freq: Literal["D", "W", "M"] = "D",
) -> list[dict[str, dt.date]]:
    """Split [start, end] into {"start_date", "end_date"} windows along
    period boundaries; edge windows clamp to the requested range
    (extract.py:911-929)."""
    start, end = _as_date(start_date), _as_date(end_date or start_date)
    out = []
    for anchor in date_range(start, end, freq):
        if freq == "D":
            lo = hi = anchor
        elif freq == "W":
            lo = max(anchor - dt.timedelta(days=anchor.weekday()), start)
            hi = min(lo + dt.timedelta(days=6 - lo.weekday()), end)
        else:
            lo = anchor
            hi = min(_next_period(_month_first(anchor), "M") - dt.timedelta(days=1), end)
        out.append({"start_date": lo, "end_date": hi})
    return out


def date_split(
    start_date: dt.date | str,
    end_date: dt.date | str | None = None,
    days: int = 1,
) -> list[tuple[dt.date, dt.date]]:
    """Split [start, end] into fixed-width (start, end) chunks — the
    shape APIs with max-range caps need (extract.py:930-944)."""
    start, end = _as_date(start_date), _as_date(end_date or start_date)
    step = dt.timedelta(days=days)
    out = []
    cur = start
    while cur <= end:
        hi = min(cur + step - dt.timedelta(days=1), end)
        out.append((cur, hi))
        cur = hi + dt.timedelta(days=1)
    return out
