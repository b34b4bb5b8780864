"""Open-API endpoint builders (sources/endpoints_apis.py): request
parity with the reference's documented shapes over a fake transport.

Reference shapes under test:
- ecount/api/common.py Zone->OAPILogin handshake (:43-77), SESSION_ID
  substitution (:117-124), sboapi test origin (:130-143)
- dable/api/report/extract.py params (:70-81)
- meta/api/common.py error surfacing (:39-47); ads/extract.py
  time_range (:66-70), object params (:109-120), insights (:290-300)
- google/api/ads/extract.py GAQL compose (:96-131), signed headers
  (:102-110), with the REAL ServiceAccountTokenProvider bound
"""

from __future__ import annotations

import json

import pytest

from linkmerce_spark.sources.endpoints_apis import (
    DableApi,
    EcountApi,
    GoogleAdsApi,
    MetaAdsApi,
    MetaOAuthError,
    gaql_where,
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


# --------------------------------------------------------------- ecount
def _ecount_handshake():
    return [
        {"Data": {"ZONE": "CC"}},
        {"Data": {"Datas": {"SESSION_ID": "sess-1"}}},
    ]


def test_ecount_zone_then_login_then_request():
    t = ScriptedTransport(*_ecount_handshake(), {"Status": "200"})
    api = EcountApi(t, com_code=123, userid="u", api_key="key")
    out = api.request_api("InventoryBalance/GetListInventoryBalanceStatus",
                          body={"SESSION_ID": "", "PROD_CD": "P1"})
    assert out == {"Status": "200"}
    zone_req, login_req, data_req = t.calls
    assert zone_req.url == "https://oapi.ecount.com/OAPI/V2/Zone"
    assert zone_req.json == {"COM_CODE": 123}
    assert login_req.url == "https://oapiCC.ecount.com/OAPI/V2/OAPILogin"
    assert login_req.json["API_CERT_KEY"] == "key"
    assert login_req.json["ZONE"] == "CC"
    # session id lands in query params AND replaces the body placeholder
    assert data_req.params == {"SESSION_ID": "sess-1"}
    assert data_req.json == {"SESSION_ID": "sess-1", "PROD_CD": "P1"}
    assert data_req.url.startswith("https://oapiCC.ecount.com/OAPI/V2/Inventory")


def test_ecount_test_variant_uses_sboapi_origin():
    t = ScriptedTransport(*_ecount_handshake(), {})
    api = EcountApi(t, 1, "u", "k", test=True)
    api.request_api("Zone2")
    assert t.calls[0].url.startswith("https://sboapi.ecount.com/")
    assert t.calls[2].url.startswith("https://sboapiCC.ecount.com/")


def test_ecount_login_failure_raises():
    api = EcountApi(ScriptedTransport({"oops": True}), 1, "u", "k")
    with pytest.raises(ConnectionError, match="Zone"):
        api.login()
    api2 = EcountApi(ScriptedTransport({"Data": {"ZONE": "A"}}, {"Data": {}}), 1, "u", "k")
    with pytest.raises(ConnectionError, match="login"):
        api2.login()


# ---------------------------------------------------------------- dable
def test_dable_params_and_url():
    t = ScriptedTransport({"result": []})
    api = DableApi(t, api_key="K", client_name="acme")
    api.fetch_daily_report("2026-08-01", "2026-08-14")
    (req,) = t.calls
    assert req.url == "https://marketing.dable.io/api/client/acme/daily_report"
    assert req.params == {
        "api_key": "K", "start_date": "20260801", "end_date": "20260814",
        "group_by_campaign": 1,
    }


def test_dable_flag_and_start_date_default():
    p = DableApi(ScriptedTransport(), "K", "c").daily_report_params(
        "2026-08-14", group_by_campaign=False
    )
    assert p == {"api_key": "K", "start_date": "20260814", "end_date": "20260814"}


# ----------------------------------------------------------------- meta
def test_meta_objects_params_time_range_json():
    api = MetaAdsApi(ScriptedTransport(), access_token="tok")
    p = api.objects_params(["id", "name"], "2026-08-01", "2026-08-14")
    assert p["fields"] == "id,name"
    assert json.loads(p["time_range"]) == {"since": "2026-08-01", "until": "2026-08-14"}
    # no window -> no time_range key
    assert "time_range" not in api.objects_params(["id"])


def test_meta_insights_params_daily_rules():
    api = MetaAdsApi(ScriptedTransport(), "tok")
    p = api.insights_params("adset", "2026-08-14", fields=["spend"])
    assert p["level"] == "adset" and p["time_increment"] == 1 and p["limit"] == 5000
    total = api.insights_params("ad", "2026-08-01", "2026-08-14", date_type="total")
    assert "time_increment" not in total
    with pytest.raises(ValueError):
        api.insights_params("campaign_group", "2026-08-14")


def test_meta_oauth_error_surfaced():
    t = ScriptedTransport(
        {"error": {"type": "OAuthException", "message": "Session expired"}}
    )
    api = MetaAdsApi(t, "tok")
    with pytest.raises(MetaOAuthError, match="Session expired"):
        api.list_ad_accounts()


def test_meta_other_errors_are_runtime():
    api = MetaAdsApi(ScriptedTransport({"error": {"type": "Other", "message": "nope"}}), "t")
    with pytest.raises(RuntimeError, match="nope"):
        api.fetch_insights("act_1", ad_level="ad", start_date="2026-08-14")


# --------------------------------------------------------------- google
def test_gaql_where_rules():
    assert gaql_where(date_range="LAST_7_DAYS") == "segments.date DURING LAST_7_DAYS"
    assert gaql_where("2026-08-01", "2026-08-14", "LAST_7_DAYS") == (
        "segments.date BETWEEN '2026-08-01' AND '2026-08-14'"
    )
    assert gaql_where(start_date="2026-08-01") == "segments.date >= '2026-08-01'"
    assert gaql_where(end_date="2026-08-14") == "segments.date <= '2026-08-14'"
    assert gaql_where() == ""


def test_google_ads_search_stream_request_shape():
    t = ScriptedTransport([{"results": []}])
    api = GoogleAdsApi(t, lambda: "tok-g", customer_id=111, manager_id=222,
                       developer_token="dev")
    api.search_stream("campaign", ["campaign.id", "metrics.clicks"],
                      start_date="2026-08-01", end_date="2026-08-14")
    (req,) = t.calls
    assert req.url == (
        "https://googleads.googleapis.com/v23/customers/111/googleAds:searchStream"
    )
    assert req.json == {"query": (
        "SELECT campaign.id, metrics.clicks FROM campaign"
        " WHERE segments.date BETWEEN '2026-08-01' AND '2026-08-14'"
    )}
    assert req.headers["Authorization"] == "Bearer tok-g"
    assert req.headers["developer-token"] == "dev"
    assert req.headers["login-customer-id"] == "222"


def test_google_ads_explicit_window_overrides_during():
    t = ScriptedTransport({})
    api = GoogleAdsApi(t, lambda: "t", 1, 2, "d")
    api.search_stream("ad_group", ["ad_group.id"], start_date="2026-08-14",
                      date_range="LAST_30_DAYS")
    query = t.calls[0].json["query"]
    assert "DURING" not in query
    assert "segments.date >= '2026-08-14'" in query


def test_google_ads_binds_real_service_account_provider():
    """End-to-end with the engine's ServiceAccountTokenProvider: the
    reference's GoogleAuth JWT flow, fully un-stubbed."""
    import base64

    from linkmerce_spark.sources.oauth import (
        ServiceAccountTokenProvider,
        encode_pkcs8_pem,
        rsa_verify_pkcs1v15_sha256,
    )
    from tests.test_oauth import _gen_key

    key = _gen_key(seed=4242)
    account = {
        "client_email": "ads@proj.iam.gserviceaccount.com",
        "private_key": encode_pkcs8_pem(key),
        "token_uri": "https://oauth2.example.test/token",
    }

    calls = []

    def transport(req):
        calls.append(req)
        if "oauth2.example.test" in req.url:
            form = dict(p.split("=", 1) for p in req.data.split("&"))
            import urllib.parse

            jwt = urllib.parse.unquote(form["assertion"])
            head, claims, sig = jwt.split(".")
            raw = base64.urlsafe_b64decode(sig + "=" * (-len(sig) % 4))
            assert rsa_verify_pkcs1v15_sha256(
                key.n, key.e, f"{head}.{claims}".encode(), raw
            )
            body = {"access_token": "ads-tok", "expires_in": 3600}
            return Response(status=200, content=json.dumps(body).encode())
        assert req.headers["Authorization"] == "Bearer ads-tok"
        return Response(status=200, content=b'[{"results": []}]')

    provider = ServiceAccountTokenProvider(transport, account, scope=GoogleAdsApi.SCOPE)
    api = GoogleAdsApi(transport, provider, 1, 2, "dev")
    out = api.search_stream("campaign", ["campaign.id"])
    assert out == [{"results": []}]
