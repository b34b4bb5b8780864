"""End-to-end ingestion path: endpoint builder -> distributed_fetch ->
DataFrame -> transform.

Proves the full migrating-user flow with zero network: the Sabangnet
order walk and the Dable report pull run INSIDE executor tasks (the
fetch closure and its fake transport are cloudpickled to workers),
and the fetched row batches come back as ordinary columns the model
layer can aggregate.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from linkmerce_spark.tasks import distributed_fetch


def test_sabangnet_orders_through_distributed_fetch(spark):
    """One executor task per day window; each walks its pages through
    the real SabangnetAdminApi pagination and yields order rows."""

    def fetch(rec):
        # runs on executors — construct the client inside the closure
        # (everything self-contained: the test module isn't importable
        # from worker processes)
        import json

        from linkmerce_spark.sources.endpoints_sellers import SabangnetAdminApi
        from linkmerce_spark.sources.http import Response

        day = rec["day"]
        rows = [{"ordNo": f"{day}-{i}", "amt": 10 * i} for i in range(7)]
        pages = [  # two pages: total 700 > page size 500
            {"data": {"totAmtSummary": {"totCnt": 700}, "list": rows[:5]}},
            {"data": {"totAmtSummary": {"totCnt": 700}, "list": rows[5:]}},
        ]

        def transport(req):
            body = pages[req.json["currentPage"] - 1]
            return Response(status=200, content=json.dumps(body).encode())

        api = SabangnetAdminApi(transport, "u", "p", domain=1)
        out = []
        for page in api.fetch_orders(day.replace("-", "")):
            for row in page["data"]["list"]:
                out.append({"day": day, "ord_no": row["ordNo"], "amt": row["amt"]})
        return out

    days = [{"day": d} for d in ("2026-08-12", "2026-08-13", "2026-08-14")]
    df = distributed_fetch(
        spark, days, fetch, "day string, ord_no string, amt long", parallelism=3
    )
    agg = {r.day: (r.n, r.total) for r in
           df.groupBy("day").agg(F.count("*").alias("n"), F.sum("amt").alias("total")).collect()}
    assert agg == {d["day"]: (7, 210) for d in days}


def test_dable_report_through_distributed_fetch(spark):
    def fetch(rec):
        from linkmerce_spark.sources.endpoints_apis import DableApi
        from linkmerce_spark.sources.http import Response

        def transport(req):
            assert req.params["api_key"] == "K"
            body = [{"campaign": f"c-{req.params['start_date']}", "cost": 5}]
            return Response(status=200, content=json.dumps(body).encode())

        api = DableApi(transport, api_key="K", client_name="acme")
        return api.fetch_daily_report(rec["date"])

    dates = [{"date": f"2026-08-{d:02d}"} for d in range(1, 5)]
    df = distributed_fetch(spark, dates, fetch, "campaign string, cost long")
    rows = sorted((r.campaign, r.cost) for r in df.collect())
    assert rows == [(f"c-202608{d:02d}", 5) for d in range(1, 5)]


def test_cj_eflexs_stock_through_distributed_fetch(spark):
    """One executor task per customer; each composes the real Websquare
    stock payload through CjEflexsApi and parses the dsRealTime scope
    into columns (the reference transform's field set)."""

    def fetch(rec):
        import datetime as dt
        import json

        from linkmerce_spark.sources.endpoints_logistics import CjEflexsApi
        from linkmerce_spark.sources.http import Response

        def transport(req):
            # the request must carry the composed Websquare data map
            assert req.data["pgmId"] == "IMSI0002M"
            assert req.data["@d1#fromCloseDate"] == "20260807"
            cid = req.data["@d1#strrId"]
            body = {
                "dsRealTime": [
                    {"itemCd": f"I-{cid}-{i}", "strrId": cid, "invnQty": 10 * i}
                    for i in range(3)
                ]
            }
            return Response(status=200, content=json.dumps(body).encode())

        api = CjEflexsApi(transport)
        (resp,) = api.fetch_stock(
            rec["customer_id"], ":last_week:", ":today:", today=dt.date(2026, 8, 14)
        )
        return [
            {
                "item_code": row["itemCd"],
                "customer_id": int(row["strrId"]),
                "total_quantity": row["invnQty"],
            }
            for row in resp["dsRealTime"]
        ]

    customers = [{"customer_id": c} for c in (101, 202)]
    df = distributed_fetch(
        spark, customers, fetch, "item_code string, customer_id long, total_quantity long"
    )
    got = sorted((r.item_code, r.customer_id, r.total_quantity) for r in df.collect())
    assert got == [
        ("I-101-0", 101, 0), ("I-101-1", 101, 10), ("I-101-2", 101, 20),
        ("I-202-0", 202, 0), ("I-202-1", 202, 10), ("I-202-2", 202, 20),
    ]
