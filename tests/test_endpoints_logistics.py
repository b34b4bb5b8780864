"""CJ eFLEXs endpoint builder (sources/endpoints_logistics.py):
request-composition parity with the reference's documented shapes,
driven through a fake transport — no network.

Reference shapes under test:
- core/cj/eflexs/common.py login handshake (:45-102), Websquare form
  envelope (:72-98), webmail 2FA side channel (:113-185)
- core/cj/eflexs/stock/extract.py date sentinels (:80-92), stock
  payload (:94-128), per-customer fan-out with delay (:43-78)
"""

from __future__ import annotations

import datetime as dt
import json

import pytest

from linkmerce_spark.sources.endpoints_logistics import (
    CjEflexsApi,
    MailCodeProvider,
    TwoFactorError,
    resolve_date_window,
    websquare_form,
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


# --------------------------------------------------------- form + dates
def test_websquare_form_envelope():
    body = websquare_form("dmMainParam", {"strrId": "77", "page": 0}, pgm_id="IMSI0002M")
    assert body["pgmId"] == "IMSI0002M"
    assert body["requestDataIds"] == "dmMainParam"
    assert body["@d1#strrId"] == "77" and body["@d1#page"] == 0
    # the map-binding triplet, exactly as the reference composes it
    assert body["@d#"] == "@d1#" and body["@d1#"] == "dmMainParam" and body["@d1#tp"] == "dm"


def test_resolve_date_window_sentinels_and_compaction():
    today = dt.date(2026, 8, 14)
    assert resolve_date_window(":last_week:", ":today:", today) == ("20260807", "20260814")
    assert resolve_date_window("2026-08-01", ":start_date:", today) == ("20260801", "20260801")
    assert resolve_date_window(dt.date(2026, 8, 2), "2026-08-03", today) == (
        "20260802",
        "20260803",
    )


# -------------------------------------------------------------- login
def _login_responses():
    return (
        Response(status=200, content=b"{}", cookies={"JSESSIONID": "abc"}),
        {"_METADATA_": {"key": "K1"}},
        {"resParam": {"checkKeyYn": "Y", "checkKeyEnc": "ENC"}},
        {"usrStdInfo": {"usrId": "u1"}},
    )


def test_login_handshake_composes_all_three_posts():
    t = ScriptedTransport(*_login_responses())
    api = CjEflexsApi(t)
    api.login("u1", "pw", code_provider=lambda: "1234")

    assert [c.method for c in t.calls] == ["GET", "POST", "POST", "POST"]
    init, action, check, final = t.calls
    assert init.url.endswith("/index.do")
    assert action.url.endswith("/auth/loginProc.do")
    assert action.data["cjLoginId"] == "u1" and action.data["langCd"] == "KO"
    assert check.url.endswith("/CMLN0003M/checkAuthInfo.do")
    assert check.data["@d1#checkKeyDe"] == "1234" and check.data["@d1#authKeyDe"] == "K1"
    assert final.url.endswith("/CMLN0001P/certiLogin.do")
    assert final.data["@d1#loginId"] == "u1" and final.data["@d1#freeYn"] == "E"
    # session cookie from init_session flows into the later requests
    assert "JSESSIONID=abc" in final.headers.get("cookie", "")


def test_login_rejects_bad_2fa_code():
    t = ScriptedTransport(
        Response(status=200, content=b"{}"),
        {"_METADATA_": {"key": "K1"}},
        {"resParam": {"checkKeyYn": "N"}},
    )
    api = CjEflexsApi(t)
    with pytest.raises(TwoFactorError):
        api.login("u1", "pw", code_provider=lambda: "0000")


# -------------------------------------------------------------- stock
def test_stock_payload_matches_reference_shape():
    api = CjEflexsApi(ScriptedTransport())
    body = api.stock_payload(314, "20260807", "20260814", page=2, page_size=500)
    assert body["pgmId"] == "IMSI0002M"
    assert body["@d1#strrId"] == "314"
    assert body["@d1#fromCloseDate"] == "20260807"
    assert body["@d1#toCloseDate"] == "20260814"
    assert body["@d1#page"] == 2 and body["@d1#pageRow"] == 500
    # every filter field of the data map is present (server binds whole map)
    for field in ("oWhCd", "srchZoneCd", "srchItemCd", "srchLotNo", "srchMallId", "itemGcd"):
        assert body[f"@d1#{field}"] is None


def test_fetch_stock_fans_out_per_customer_with_delay():
    t = ScriptedTransport({"rows": 1}, {"rows": 2}, {"rows": 3})
    api = CjEflexsApi(t)
    naps = []
    out = api.fetch_stock(
        [11, 22, 33],
        start_date=":last_week:",
        end_date=":today:",
        today=dt.date(2026, 8, 14),
        sleep=naps.append,
        request_delay=1.5,
    )
    assert [r["rows"] for r in out] == [1, 2, 3]
    assert naps == [1.5, 1.5]  # delay BETWEEN customers, not before the first
    assert [c.data["@d1#strrId"] for c in t.calls] == ["11", "22", "33"]
    assert all(c.url.endswith("/IMSI0002M/selectDtlStckSearch.do") for c in t.calls)
    assert all(c.data["@d1#fromCloseDate"] == "20260807" for c in t.calls)


def test_fetch_stock_scalar_customer():
    t = ScriptedTransport({"rows": 9})
    out = CjEflexsApi(t).fetch_stock(7, "2026-08-01", ":start_date:")
    assert len(out) == 1 and out[0]["rows"] == 9
    assert t.calls[0].data["@d1#toCloseDate"] == "20260801"


# ---------------------------------------------------------------- 2FA
def _mail(no, subject, is_new):
    return {"no": no, "subject": subject, "is_new": is_new}


def test_mail_code_provider_polls_extracts_and_marks_read():
    t = ScriptedTransport(
        {},  # webmail login
        {"data": [_mail(1, "spam", True)]},  # poll 1: no auth mail yet
        {"data": [_mail(2, MailCodeProvider.SUBJECT, True), _mail(1, "spam", False)]},
        {"data": {"message": {"content": "... 인증번호 : 4711 ..."}}},
        {},  # mark-as-read PATCH
    )
    naps = []
    provider = MailCodeProvider(
        t, "mail.example.com", "me@example.com", "pw", wait_interval=2.0, sleep=naps.append
    )
    assert provider() == "4711"
    assert naps == [2.0]  # one sleep between the two polls
    login, poll1, poll2, read, patch = t.calls
    assert login.url == "https://auth-api.mail.example.com/office-web/login"
    assert poll1.params["sort[received_date]"] == "desc"
    assert poll1.headers["x-skip-session-refresh"] == "true"
    assert read.url.endswith("/v2/mails/2")
    assert patch.method == "PATCH" and patch.json == {"is_read": True}


def test_mail_code_provider_times_out():
    t = ScriptedTransport({}, {"data": []}, {"data": []})
    provider = MailCodeProvider(
        t, "mail.example.com", "me@example.com", "pw", wait_seconds=2, sleep=lambda _: None
    )
    with pytest.raises(TwoFactorError):
        provider()


def test_mail_code_provider_marks_read_even_on_parse_failure():
    t = ScriptedTransport(
        {},
        {"data": [_mail(3, MailCodeProvider.SUBJECT, True)]},
        {"data": {"message": {"content": "no code here"}}},
        {},
    )
    provider = MailCodeProvider(t, "m.example.com", "a@example.com", "pw")
    with pytest.raises(TwoFactorError):
        provider()
    assert t.calls[-1].method == "PATCH"  # mail still marked read
