"""HTTP extract client layer tests (SURVEY S9 upgrade, round 5).

A fake transport drives the full request/auth/header/cookie surface
with no network — the semantics the reference's per-platform extract
clients rely on (reference common/extract.py, utils/headers.py).
"""

from __future__ import annotations

import datetime as dt

import pytest

from linkmerce_spark.sources.http import (
    HttpClient,
    LoginSession,
    Request,
    Response,
    add_headers,
    build_headers,
    cookies_to_dict,
    cookies_to_str,
    date_pairs,
    date_range,
    date_split,
)


class FakeTransport:
    """Records composed requests; replays canned responses in order."""

    def __init__(self, *responses: Response):
        self.sent: list[Request] = []
        self._responses = list(responses)

    def __call__(self, req: Request) -> Response:
        self.sent.append(req)
        return self._responses.pop(0) if self._responses else Response(200, b"{}")


def test_build_headers_chrome_profile():
    h = build_headers(
        authority="https://api.example.com/v1?x=1",
        contents={"type": "json", "charset": "UTF-8"},
        origin="https://example.com",
        referer="https://example.com/page",
        ajax=True,
        language="en",
    )
    assert h["authority"] == "api.example.com"
    assert h["content-type"] == "application/json; charset=UTF-8"
    assert h["accept-language"] == "en-US,en;q=0.9"
    assert h["x-requested-with"] == "XMLHttpRequest"
    assert h["sec-fetch-mode"] == "cors"
    assert "Chrome/" in h["user-agent"]
    # navigate metadata switches the fetch trio
    h2 = build_headers(metadata="navigate", https=True)
    assert h2["sec-fetch-mode"] == "navigate"
    assert h2["upgrade-insecure-requests"] == "1"


def test_add_headers_remap():
    h = build_headers()
    add_headers(h, contents="form", cookies="sid=1", x_custom="v")
    assert h["content-type"] == "application/x-www-form-urlencoded"
    assert h["cookie"] == "sid=1"
    assert h["x_custom"] == "v"


def test_cookie_round_trip():
    d = cookies_to_dict("a=1; b=2;  c=x=y")
    assert d == {"a": "1", "b": "2", "c": "x=y"}
    assert cookies_to_str(d) == "a=1; b=2; c=x=y"
    assert cookies_to_dict(None) == {}


def test_client_composition_and_cookie_persistence():
    t = FakeTransport(
        Response(200, b'{"ok": true}', cookies={"sid": "abc"}),
        Response(200, b'{"rows": [1, 2]}'),
    )
    c = HttpClient(t, base_url="https://api.example.com/v2", headers={"accept": "*/*"})
    body = c.request_json("POST", "search/shop", json={"q": "widget"})
    assert body == {"ok": True}
    # Set-Cookie persisted into the jar and sent on the next request
    rows = c.request_json("GET", "page/2")
    assert rows == {"rows": [1, 2]}
    first, second = t.sent
    assert first.url == "https://api.example.com/v2/search/shop"
    assert first.json == {"q": "widget"}
    assert "cookie" not in first.headers
    assert second.headers["cookie"] == "sid=abc"
    assert c.get_cookies() == "sid=abc"


def test_require_cookies():
    c = HttpClient(FakeTransport(), cookies="auth=tok")
    c.require_cookies("auth")
    with pytest.raises(KeyError):
        c.require_cookies("missing")
    with pytest.warns(UserWarning):
        HttpClient(FakeTransport()).require_cookies()


def test_login_session_flow():
    class DemoLogin(LoginSession):
        def login(self, user: str = "", password: str = ""):
            resp = self.request(
                "POST",
                "login",
                data={"id": user, "pw": password},
                headers=self.build_headers(contents="form"),
            )
            self.require_cookies("NID_AUT")
            return resp.status

    t = FakeTransport(Response(200, b"", cookies={"NID_AUT": "tok", "NID_SES": "s"}))
    s = DemoLogin(t, base_url="https://nid.example.com")
    assert s.login(user="u", password="p") == 200
    assert s.get_cookies(to="dict")["NID_AUT"] == "tok"
    assert t.sent[0].headers["content-type"] == "application/x-www-form-urlencoded"


def test_request_json_safe_swallows_garbage():
    c = HttpClient(FakeTransport(Response(200, b"<html>nope</html>")))
    assert c.request_json_safe("GET", "x") is None


def test_date_range_frequencies():
    days = date_range("2026-02-26", "2026-03-02")
    assert [d.isoformat() for d in days] == [
        "2026-02-26", "2026-02-27", "2026-02-28", "2026-03-01", "2026-03-02"
    ]
    weeks = date_range("2026-01-07", "2026-01-21", freq="W")  # Wed .. Wed
    assert [d.isoformat() for d in weeks] == ["2026-01-07", "2026-01-12", "2026-01-19"]
    months = date_range("2026-01-15", "2026-03-02", freq="M")
    assert [d.isoformat() for d in months] == ["2026-01-15", "2026-02-01", "2026-03-01"]


def test_date_pairs_clamp_to_window():
    pairs = date_pairs("2026-01-15", "2026-03-02", freq="M")
    assert [(p["start_date"].isoformat(), p["end_date"].isoformat()) for p in pairs] == [
        ("2026-01-15", "2026-01-31"),
        ("2026-02-01", "2026-02-28"),
        ("2026-03-01", "2026-03-02"),
    ]


def test_date_split_fixed_chunks():
    chunks = date_split("2026-01-01", "2026-01-10", days=4)
    assert [(a.isoformat(), b.isoformat()) for a, b in chunks] == [
        ("2026-01-01", "2026-01-04"),
        ("2026-01-05", "2026-01-08"),
        ("2026-01-09", "2026-01-10"),
    ]


def test_paginate_all_over_client():
    """The task combinators drive the client exactly like the
    reference's Extractor composes TaskClient over SessionClient."""
    from linkmerce_spark.tasks import paginate_all

    pages = [
        Response(200, b'{"total": 5, "items": [1, 2]}'),
        Response(200, b'{"items": [3, 4]}'),
        Response(200, b'{"items": [5]}'),
    ]
    t = FakeTransport(*pages)
    c = HttpClient(t, base_url="https://api.example.com")
    out = paginate_all(
        fetch_page=lambda page: c.request_json("GET", "list", params={"page": page}),
        counter=lambda first: first["total"],
        page_size=2,
    )
    items = [i for r in out for i in r["items"]]
    assert items == [1, 2, 3, 4, 5]
    assert [r.params["page"] for r in t.sent] == [1, 2, 3]
