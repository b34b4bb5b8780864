"""Third-engine spot-oracle: pure-Python expected outputs for the
highest-value catalog twins.

Both sides of every catalog twin (Spark query + DuckDB SQL) are
builder-written, so DuckDB independence protects against ENGINE bugs
but not against a shared misreading of the reference semantics. This
module is the third, independent computation for 15 of the twins the
round-7 verdict ranked highest-value: plain-Python loops over the
sf0.001 parquet (read via pyarrow, no SQL engine involved), mirroring
the documented semantics — decimal-exact aggregation, floor(x+0.5)
rounding, deterministic window orders — and comparing row multisets
exactly (floats must match bit-for-bit; every value in these queries
is engine-deterministic by the repo's determinism rules).

Reference chains being triple-checked (dbt_postgres parity notes in
each query's docstring): the allocation marts
(smartstore__sales_daily.sql:170-216, searchad__insight_daily.sql:
195-216), the merge vocabulary (extensions/postgres.py:554-597),
core__sales_daily.sql's full fan-in/ad-rehoming/rollup, the rolling
spine (core__sold_qty_30d_daily.sql:17-22), and the window idioms
(W2/W3/W5/W7, A4, A7).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import re
from collections import Counter, defaultdict
from decimal import ROUND_FLOOR, ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"

_TABLES: dict[str, list[dict]] = {}


def _tbl(name: str) -> list[dict]:
    if name not in _TABLES:
        _TABLES[name] = pq.read_table(f"{SF_DIR}/{name}.parquet").to_pylist()
    return _TABLES[name]


def _dec(x, scale: int = 2) -> Decimal:
    """Mirror Spark's double -> decimal(p,s) cast: shortest-repr string
    of the double, then HALF_UP to the target scale (BigDecimal.valueOf
    + changePrecision)."""
    q = Decimal(1).scaleb(-scale)
    return Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP)


def _floor_dec(d: Decimal) -> int:
    return int(d.to_integral_value(rounding=ROUND_FLOOR))


def _run(spark, name: str):
    from linkmerce_spark.queries import QUERIES

    return QUERIES[name](spark, SF_DIR).collect()


def _assert_rows(spark, name: str, expected: list[tuple], columns: list[str]):
    got = Counter(tuple(repr(r[c]) for c in columns) for r in _run(spark, name))
    exp = Counter(tuple(repr(v) for v in row) for row in expected)
    missing = exp - got
    extra = got - exp
    assert not missing and not extra, (
        f"{name}: {sum(missing.values())} expected rows missing "
        f"(e.g. {list(missing)[:3]}), {sum(extra.values())} unexpected "
        f"(e.g. {list(extra)[:3]})"
    )


# ---------------------------------------------------------------- A1/A2


def test_pricing_summary(spark):
    cutoff = dt.datetime(2001, 6, 1)
    groups: dict[tuple, dict] = {}
    for r in _tbl("lineitem"):
        if r["l_shipdate"] > cutoff:
            continue
        key = (r["l_returnflag"], r["l_linestatus"])
        g = groups.setdefault(
            key,
            {
                "qty": Decimal(0),
                "base": Decimal(0),
                "disc_price": Decimal(0),
                "charge": Decimal(0),
                "n": 0,
                "hd": Decimal(0),
            },
        )
        ep = _dec(r["l_extendedprice"])
        disc = _dec(r["l_discount"])
        tax = _dec(r["l_tax"])
        dp = ep * (1 - disc)
        g["qty"] += _dec(r["l_quantity"])
        g["base"] += ep
        g["disc_price"] += dp
        g["charge"] += dp * (1 + tax)
        g["n"] += 1
        if r["l_discount"] > 0.05:
            g["hd"] += _dec(r["l_quantity"])

    def _cents(d: Decimal) -> float:
        return float(_floor_dec(d * 100 + Decimal("0.5"))) / 100

    expected = [
        (
            rf,
            ls,
            float(g["qty"]),
            float(g["base"]),
            _cents(g["disc_price"]),
            _cents(g["charge"]),
            g["n"],
            float(g["hd"]),
        )
        for (rf, ls), g in groups.items()
    ]
    _assert_rows(
        spark,
        "pricing_summary",
        expected,
        [
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            "count_order",
            "sum_qty_highdisc",
        ],
    )


def test_star_join_revenue(spark):
    orders = {r["o_orderkey"]: r for r in _tbl("orders")}
    cust = {r["c_custkey"]: r for r in _tbl("customer")}
    nation = {r["n_nationkey"]: r for r in _tbl("nation")}
    region = {r["r_regionkey"]: r for r in _tbl("region")}
    agg: dict[tuple, list] = defaultdict(lambda: [Decimal(0), set()])
    for li in _tbl("lineitem"):
        o = orders.get(li["l_orderkey"])
        if o is None:
            continue
        c = cust.get(o["o_custkey"])
        if c is None:
            continue
        n = nation.get(c["c_nationkey"])
        if n is None:
            continue
        r = region.get(n["n_regionkey"])
        if r is None:
            continue
        rev = _dec(li["l_extendedprice"]) * (1 - _dec(li["l_discount"]))
        slot = agg[(r["r_name"], n["n_name"])]
        slot[0] += rev
        slot[1].add(o["o_orderkey"])
    expected = [
        (rn, nn, float(total), len(oks)) for (rn, nn), (total, oks) in agg.items()
    ]
    _assert_rows(
        spark,
        "star_join_revenue",
        expected,
        ["r_name", "n_name", "revenue", "n_orders"],
    )


# ---------------------------------------------------------------- A7/W2/W3


def test_top_order_per_customer(spark):
    best: dict[int, dict] = {}
    for r in _tbl("orders"):
        k = r["o_custkey"]
        cur = best.get(k)
        cand = (-r["o_totalprice"], r["o_orderkey"])
        if cur is None or cand < (-cur["o_totalprice"], cur["o_orderkey"]):
            best[k] = r
    expected = [
        (r["o_custkey"], r["o_orderkey"], r["o_totalprice"]) for r in best.values()
    ]
    _assert_rows(
        spark,
        "top_order_per_customer",
        expected,
        ["o_custkey", "o_orderkey", "o_totalprice"],
    )


def test_latest_order_dedupe(spark):
    best: dict[int, dict] = {}
    for r in _tbl("orders"):
        k = r["o_custkey"]
        cur = best.get(k)
        # latest-wins: o_orderdate DESC, o_orderkey DESC
        cand = (r["o_orderdate"], r["o_orderkey"])
        if cur is None or cand > (cur["o_orderdate"], cur["o_orderkey"]):
            best[k] = r
    expected = [
        (r["o_custkey"], r["o_orderkey"], r["o_orderdate"].date())
        for r in best.values()
    ]
    _assert_rows(
        spark,
        "latest_order_dedupe",
        expected,
        ["o_custkey", "latest_orderkey", "latest_order_date"],
    )


# ------------------------------------------------------------------- W6


def _order_groups():
    orders = {r["o_orderkey"]: r for r in _tbl("orders")}
    groups: dict[int, list[dict]] = defaultdict(list)
    for li in _tbl("lineitem"):
        o = orders.get(li["l_orderkey"])
        if o is not None:
            groups[li["l_orderkey"]].append(li)
    totals = {
        ok: _floor_dec(_dec(orders[ok]["o_totalprice"]) * 100) for ok in groups
    }
    return groups, totals


def test_allocation_proportional(spark):
    groups, totals = _order_groups()
    expected = []
    for ok, rows in groups.items():
        total = totals[ok]
        weights = [_dec(r["l_extendedprice"], 6) for r in rows]
        wsum = sum(weights, Decimal(0))
        wsum_f = float(wsum)
        shares = []
        for w in weights:
            if wsum == 0:
                shares.append(0)
            else:
                ratio = float(total) * float(w) / wsum_f
                shares.append(int(math.floor(ratio * 1.0 + 0.5)))
        order = sorted(
            range(len(rows)),
            key=lambda i: (
                rows[i]["l_linenumber"],
                rows[i]["l_partkey"],
                rows[i]["l_suppkey"],
                rows[i]["l_extendedprice"],
            ),
        )
        resid = total - sum(shares)
        alloc = list(shares)
        alloc[order[0]] += resid
        for i, r in enumerate(rows):
            expected.append((ok, r["l_linenumber"], alloc[i]))
    _assert_rows(
        spark,
        "allocation_proportional",
        expected,
        ["l_orderkey", "l_linenumber", "allocated_cents"],
    )


def test_allocation_integer_even(spark):
    groups, totals = _order_groups()
    expected = []
    for ok, rows in groups.items():
        total = totals[ok]
        n = len(rows)
        base = int(math.floor(total / n))  # same float division as Spark
        extra = total - base * n
        order = sorted(range(n), key=lambda i: rows[i]["l_linenumber"])
        for rank, i in enumerate(order, start=1):
            expected.append(
                (ok, rows[i]["l_linenumber"], base + (1 if rank <= extra else 0))
            )
    _assert_rows(
        spark,
        "allocation_integer_even",
        expected,
        ["l_orderkey", "l_linenumber", "even_cents"],
    )


# ------------------------------------------------------------------- W5


def test_next_order_gap(spark):
    by_cust: dict[int, list[dict]] = defaultdict(list)
    for r in _tbl("orders"):
        by_cust[r["o_custkey"]].append(r)
    expected = []
    for k, rows in by_cust.items():
        rows.sort(key=lambda r: (r["o_orderdate"], r["o_orderkey"]))
        for i, r in enumerate(rows):
            nxt = rows[i + 1]["o_orderdate"].date() if i + 1 < len(rows) else None
            d = r["o_orderdate"].date()
            gap = (nxt - d).days if nxt is not None else None
            expected.append((k, r["o_orderkey"], d, nxt, gap))
    _assert_rows(
        spark,
        "next_order_gap",
        expected,
        ["o_custkey", "o_orderkey", "order_date", "next_order_date", "gap_days"],
    )


# ------------------------------------------------------------------- A4


def test_string_agg_names(spark):
    nation = {r["n_nationkey"]: r["n_name"] for r in _tbl("nation")}
    agg: dict[str, list[str]] = defaultdict(list)
    for c in _tbl("customer"):
        n = nation.get(c["c_nationkey"])
        if n is not None:
            agg[n].append(c["c_name"])
    expected = [
        (n, ",".join(sorted(names)), len(names)) for n, names in agg.items()
    ]
    _assert_rows(
        spark,
        "string_agg_names",
        expected,
        ["n_name", "customer_csv", "n_customers"],
    )


# ------------------------------------------------------------- A9/A10 merge


def test_merge_upsert_balances(spark):
    target = {
        r["c_custkey"]: (_dec(r["c_acctbal"]), r["c_mktsegment"])
        for r in _tbl("customer")
    }
    source: dict[int, Decimal] = defaultdict(lambda: Decimal(0))
    for o in _tbl("orders"):
        source[o["o_custkey"]] += _dec(o["o_totalprice"])
    expected = []
    for k in set(target) | set(source):
        if k in target and k in source:
            bal = max(target[k][0], source[k])  # greatest, both non-null
            seg = target[k][1]  # target_first with NULL source seg
        elif k in target:
            bal, seg = target[k]
        else:
            bal, seg = source[k], None
        expected.append((k, float(bal), seg))
    _assert_rows(spark, "merge_upsert_balances", expected, ["k", "bal", "seg"])


def test_insert_ignore_orders(spark):
    cutoff = dt.date(1999, 1, 1)
    rows = [
        (r["o_orderkey"], r["o_custkey"], r["o_totalprice"], r["o_orderdate"].date())
        for r in _tbl("orders")
    ]
    target = [r for r in rows if r[3] < cutoff]
    target_keys = {r[0] for r in target}
    # source deduped on o_orderkey (keys are unique at sf0.001 — assert,
    # so a fixture change fails loudly instead of silently diverging)
    assert len({r[0] for r in rows}) == len(rows)
    fresh = [r for r in rows if r[0] not in target_keys]
    expected = target + fresh
    _assert_rows(
        spark,
        "insert_ignore_orders",
        expected,
        ["o_orderkey", "o_custkey", "o_totalprice", "order_date"],
    )


# ------------------------------------------------------------- date spine


def test_date_spine_daily_orders(spark):
    daily: dict[dt.date, list] = defaultdict(lambda: [0, Decimal(0)])
    for r in _tbl("orders"):
        d = r["o_orderdate"].date()
        daily[d][0] += 1
        daily[d][1] += _dec(r["o_totalprice"])
    expected = []
    day = dt.date(1995, 1, 1)
    while day <= dt.date(1995, 3, 31):
        if day in daily:
            expected.append((day, daily[day][0], float(daily[day][1])))
        else:
            expected.append((day, 0, 0.0))
        day += dt.timedelta(days=1)
    _assert_rows(
        spark,
        "date_spine_daily_orders",
        expected,
        ["ymd", "n_orders", "total_value"],
    )


# ------------------------------------------------------------------- W7/W4


def test_customer_order_anchor(spark):
    by_cust: dict[int, list[dict]] = defaultdict(list)
    for r in _tbl("orders"):
        by_cust[r["o_custkey"]].append(r)
    expected = []
    for k, rows in by_cust.items():
        anchor = min(r["o_orderkey"] for r in rows)
        total = float(sum((_dec(r["o_totalprice"]) for r in rows), Decimal(0)))
        for r in rows:
            expected.append((k, r["o_orderkey"], anchor, len(rows), total))
    _assert_rows(
        spark,
        "customer_order_anchor",
        expected,
        ["o_custkey", "o_orderkey", "anchor_orderkey", "n_orders_cust", "cust_total"],
    )


# ------------------------------------------------------------- exact dedup


def _normalize(text: str) -> str:
    # Java \s (no UNICODE flag) = ASCII whitespace only; Python \s is
    # wider, so use the explicit class.
    return re.sub(r"[ \t\n\x0b\f\r]+", " ", text.lower()).strip(" ")


def test_doc_exact_dedup(spark):
    groups: dict[str, list[int]] = defaultdict(list)
    for r in _tbl("documents"):
        fp = hashlib.md5(_normalize(r["text"]).encode("utf-8")).hexdigest()
        groups[fp].append(r["doc_id"])
    expected = [(fp, min(ids), len(ids)) for fp, ids in groups.items()]
    _assert_rows(spark, "doc_exact_dedup", expected, ["fp", "keep_id", "dup_count"])


# ------------------------------------------------------------- rolling mart


def test_mart_rolling_sales(spark):
    start, end, lookback = dt.date(1996, 2, 1), dt.date(1996, 2, 14), 30
    widened = start - dt.timedelta(days=lookback)
    orders = {
        r["o_orderkey"]: r
        for r in _tbl("orders")
        if widened <= r["o_orderdate"].date() <= end
    }
    daily: dict[tuple, Decimal] = defaultdict(lambda: Decimal(0))
    for li in _tbl("lineitem"):
        o = orders.get(li["l_orderkey"])
        if o is None:
            continue
        net = _dec(li["l_extendedprice"]) * (1 - _dec(li["l_discount"]))
        daily[(o["o_orderdate"].date(), o["o_orderpriority"])] += net
    revenue = {k: float(v) for k, v in daily.items()}
    priorities = sorted({p for (_, p) in revenue})
    spine = []
    day = widened
    while day <= end:
        spine.append(day)
        day += dt.timedelta(days=1)
    merged = {
        (d, p): revenue.get((d, p), 0.0) for d in spine for p in priorities
    }
    expected = []
    for d in spine:
        if d < start:
            continue
        for p in priorities:
            trail = Decimal(0)
            for back in range(1, lookback + 1):
                prev = d - dt.timedelta(days=back)
                if (prev, p) in merged:
                    trail += _dec(merged[(prev, p)], 4)
            expected.append((d, p, merged[(d, p)], float(trail)))
    _assert_rows(
        spark,
        "mart_rolling_sales",
        expected,
        ["ymd", "priority", "revenue", "trailing_revenue"],
    )


# ------------------------------------------------- core__sales_daily (mart)


def _core_sales_expected():
    """Pure-Python mirror of q_core_sales_daily's full chain:
    harmonized fan-in, top-shop maps, ad re-homing, status-8/9 frames,
    7-measure rollup (marts/core_sales.py semantics)."""
    MEASURES = (
        "sku_quantity",
        "payment_amount",
        "supply_amount",
        "supply_cost",
        "delivery_fee",
        "ad_cost",
        "extra_cost",
    )

    def pid_of(k: int, mod: int) -> str:
        return "200000" if k % mod == 0 else f"P{k % 20}"

    sales_frames = {"smt": [], "sbn": [], "cpg": []}
    extra_sales = []
    ads_raw: dict[str, list] = defaultdict(list)
    expense: dict[dt.date, int] = defaultdict(int)
    opex: dict[tuple, int] = defaultdict(int)

    for r in _tbl("orders"):
        k = r["o_orderkey"]
        d = r["o_orderdate"].date()
        tp = _dec(r["o_totalprice"])
        pid = pid_of(k, 30)
        base = {
            "product_id": pid,
            "order_status": k % 4,
            "sku_quantity": k % 5,
            "payment_amount": _floor_dec(tp),
            "supply_amount": _floor_dec(tp * Decimal("0.9")),
            "supply_cost": _floor_dec(tp * Decimal("0.6")),
            "delivery_fee": (k % 7) * 100,
            "order_date": d,
        }
        if k % 3 == 0:
            sales_frames["smt"].append(
                dict(base, shop_id="shop9000" if k % 6 == 0 else "shop0055")
            )
        elif k % 3 == 1:
            shops = ["shop0075", "shop0011", "shop0012"]
            sales_frames["sbn"].append(
                dict(base, shop_id=shops[int((k % 9) / 3 + 1) - 1])
            )
        else:
            sales_frames["cpg"].append(dict(base, shop_id="shop9001"))
        if k % 40 == 21:
            extra_sales.append(
                {
                    "product_id": pid,
                    "shop_id": "shop0100",
                    "order_status": 0,
                    "payment_amount": _floor_dec(tp * Decimal("0.5")),
                    "supply_amount": _floor_dec(tp * Decimal("0.4")),
                    "order_date": d,
                }
            )
        apid = pid_of(k, 25)
        if k % 5 == 0:
            ads_raw["sa_insight"].append((d, apid, "shop0055", (k % 9 + 1) * 10))
        if k % 11 == 0:
            ads_raw["sa_contract"].append((d, apid, "shop0055", (k % 5 + 1) * 7))
        if k % 7 == 0:
            ads_raw["cpg_ads"].append((d, apid, "shop9001", (k % 6 + 1) * 5))
        if k % 13 == 0:
            ads_raw["google"].append((d, apid, "adop0001", (k % 4 + 1) * 3))
        if k % 17 == 0:
            ads_raw["meta"].append((d, apid, "adop0002", (k % 3 + 1) * 2))
        if k % 19 == 0:
            ads_raw["dable"].append((d, apid, "adop0009", (k % 5 + 1) * 4))
        if k % 23 == 0:
            ads_raw["extra_ads"].append((d, apid, "adop0008", (k % 7 + 1) * 6))
        if k % 29 == 0:
            expense[d] += (k % 11 + 1) * 9
        if k % 31 == 0:
            opex[(d, f"P{k % 4}", "adop0004" if k % 2 == 1 else "adop0003")] += (
                k % 13 + 1
            ) * 8

    def grouped_ads(rows):
        g: dict[tuple, int] = defaultdict(int)
        for d, p, s, a in rows:
            g[(d, p, s)] += a
        return [(p, s, a, d) for (d, p, s), a in g.items()]

    pm = {f"P{i}": f"Brand{i % 3}" for i in range(15)}

    def top_shop(rows, key_fn, shop_asc: bool):
        agg: dict[tuple, int] = defaultdict(int)
        for r in rows:
            key = key_fn(r)
            if key is None:
                continue
            agg[(r["order_date"], key, r["shop_id"])] += r["payment_amount"]
        best: dict[tuple, tuple] = {}
        for (d, key, shop), pay in agg.items():
            rank = (-pay, shop if shop_asc else _desc_str(shop))
            cur = best.get((d, key))
            if cur is None or rank < cur[0]:
                best[(d, key)] = (rank, shop)
        return {k: v[1] for k, v in best.items()}

    def _desc_str(s: str):
        # invert byte order for a DESC string sort inside a min()
        return tuple(-b for b in s.encode("utf-8")) + (1,)

    def brand_key(r):
        p = r["product_id"]
        return pm.get(p) if p != "200000" else None

    smt_prd = top_shop(sales_frames["smt"], lambda r: r["product_id"], True)
    smt_brd = top_shop(sales_frames["smt"], brand_key, True)
    cpg_pool = sales_frames["cpg"] + [
        r for r in sales_frames["sbn"] if r["shop_id"] == "shop0075"
    ]
    cpg_prd = top_shop(cpg_pool, lambda r: r["product_id"], False)
    cpg_brd = top_shop(cpg_pool, brand_key, False)

    def rehome(rows, prd, brd):
        out = []
        for p, s, a, d in rows:
            brand = pm.get(p)
            shop = prd.get((d, p))
            if shop is None and brand is not None:
                shop = brd.get((d, brand))
            if shop is None:
                shop = s
            out.append((p, shop, a, d))
        return out

    sa_mapped = rehome(
        grouped_ads(ads_raw["sa_insight"]) + grouped_ads(ads_raw["sa_contract"]),
        smt_prd,
        smt_brd,
    )
    cpg_mapped = rehome(grouped_ads(ads_raw["cpg_ads"]), cpg_prd, cpg_brd)
    insight = (
        sa_mapped
        + cpg_mapped
        + grouped_ads(ads_raw["google"])
        + grouped_ads(ads_raw["meta"])
        + grouped_ads(ads_raw["dable"])
        + [(p, s, a, d) for d, p, s, a in ads_raw["extra_ads"]]
    )

    rollup: dict[tuple, dict] = {}

    def feed(key, values: dict):
        g = rollup.setdefault(key, {m: None for m in MEASURES})
        for m, v in values.items():
            if v is None:
                continue
            g[m] = v if g[m] is None else g[m] + v

    for frame in ("sbn", "smt", "cpg"):
        for r in sales_frames[frame]:
            feed(
                (r["order_date"], r["product_id"], r["shop_id"], r["order_status"]),
                {m: r.get(m) for m in MEASURES},
            )
    for r in extra_sales:
        feed(
            (r["order_date"], r["product_id"], r["shop_id"], r["order_status"]),
            {m: r.get(m) for m in MEASURES},
        )
    for p, s, a, d in insight:
        feed((d, p, s, 8), {"ad_cost": a})
    for d, cost in expense.items():
        feed((d, "200000", "adop0005", 9), {"extra_cost": cost})
    for (d, p, s), cost in opex.items():
        feed((d, p, s, 9), {"extra_cost": cost})

    return [
        (d, p, s, st, *[g[m] for m in MEASURES])
        for (d, p, s, st), g in rollup.items()
    ], MEASURES


def test_core_sales_daily(spark):
    expected, measures = _core_sales_expected()
    _assert_rows(
        spark,
        "core_sales_daily",
        expected,
        ["order_date", "product_id", "shop_id", "order_status", *measures],
    )


# =========================================================== round-9 pins
# The r8 verdict's Next #5: the highest-remaining-value shared-author
# twins — the searchad FULL OUTER report merge, stock_report's
# cumulative chain, the smartstore fee allocation, the SCD2 pair —
# plus the window/range/pivot idioms that feed them.


def _months_add(d: dt.date, n: int) -> dt.date:
    """Spark add_months: clamp the day to the target month's length."""
    import calendar

    y, m = divmod(d.year * 12 + (d.month - 1) + n, 12)
    return dt.date(y, m + 1, min(d.day, calendar.monthrange(y, m + 1)[1]))


def test_searchad_report_merge(spark):
    """AdvancedReport merge (models.sql:712-797): stat + conv rollups
    at the report PK, FULL OUTER with COALESCE'd keys, zero-filled
    measures, customer scope applied to both sides."""
    from collections import defaultdict

    stat = defaultdict(lambda: [0, 0, 0, 0])
    conv = defaultdict(lambda: [0, 0, 0, 0])
    for e in _tbl("events"):
        media = e["event_id"] % 4
        m3 = e["event_id"] % 3
        key = (
            e["ts"].date(),                                  # ymd
            e["user_id"] % 5,                                # customer_id
            f"ad-{e['user_id'] % 50}",                       # ad_id
            0 if media == 3 else media,                      # media NULL -> 0
            0 if m3 == 0 else (1 if m3 == 1 else 2),         # device code
        )
        et = e["event_type"]
        if et in ("view", "click"):
            s = stat[key]
            s[0] += math.floor(e["value"])
            s[1] += 1 if et == "click" else 0
            s[2] += math.floor(e["value"] * 7)
            s[3] += e["event_id"] % 10
        elif et == "purchase":
            direct = (1 + e["event_id"] % 2) == 1
            amt = math.floor(e["value"] * 100)
            c = conv[key]
            c[0] += 1
            c[1] += 1 if direct else 0
            c[2] += amt
            c[3] += amt if direct else 0
    keys = {k for k in stat if k[1] == 2} | {k for k in conv if k[1] == 2}
    expected = []
    for k in sorted(keys):
        ymd, cust, ad, media, dev = k
        s = stat.get(k, [0, 0, 0, 0])
        c = conv.get(k, [0, 0, 0, 0])
        expected.append((ad, cust, media, dev, *s, *c, ymd))
    _assert_rows(
        spark,
        "searchad_report_merge",
        expected,
        [
            "ad_id", "customer_id", "media_code", "pc_mobile_type",
            "impression_count", "click_count", "ad_cost", "ad_rank_sum",
            "conv_count", "direct_conv_count", "conv_amount",
            "direct_conv_amount", "ymd",
        ],
    )


def test_full_outer_merge_events(spark):
    """J3: purchase/error per-user halves FULL OUTER merged with
    COALESCE'd key and zero-filled measures."""
    from collections import defaultdict

    p_cnt: dict = defaultdict(int)
    p_val: dict = defaultdict(Decimal)
    e_cnt: dict = defaultdict(int)
    for e in _tbl("events"):
        if e["event_type"] == "purchase":
            p_cnt[e["user_id"]] += 1
            p_val[e["user_id"]] += _dec(e["value"])
        elif e["event_type"] == "error":
            e_cnt[e["user_id"]] += 1
    expected = [
        (u, p_cnt.get(u, 0),
         float(p_val[u]) if u in p_val else 0.0,
         e_cnt.get(u, 0))
        for u in set(p_cnt) | set(e_cnt)
    ]
    _assert_rows(
        spark,
        "full_outer_merge_events",
        expected,
        ["user_id", "purchase_count", "purchase_value", "error_count"],
    )


def test_rolling_30d_qty(spark):
    """J6: trailing [d-30, d-1] per-part rolling decimal sum as a
    RANGE window (the reference's date-spine join re-expressed)."""
    from collections import defaultdict

    by_part = defaultdict(list)
    for li in _tbl("lineitem"):
        by_part[li["l_partkey"]].append(li)
    expected = []
    for rows in by_part.values():
        for r in rows:
            d = r["l_shipdate"].date()
            window = [
                _dec(o["l_quantity"])
                for o in rows
                if 1 <= (d - o["l_shipdate"].date()).days <= 30
            ]
            qty = float(sum(window)) if window else None
            expected.append((r["l_orderkey"], r["l_linenumber"], qty))
    _assert_rows(
        spark, "rolling_30d_qty", expected,
        ["l_orderkey", "l_linenumber", "qty_30d"],
    )


def test_cumulative_customer_spend(spark):
    """J7: running cumulative decimal spend per customer ordered by
    (o_orderdate, o_orderkey), double out per row."""
    from collections import defaultdict

    by_cust = defaultdict(list)
    for o in _tbl("orders"):
        by_cust[o["o_custkey"]].append(o)
    expected = []
    for cust, rows in by_cust.items():
        rows.sort(key=lambda o: (o["o_orderdate"], o["o_orderkey"]))
        run = Decimal(0)
        for o in rows:
            run += _dec(o["o_totalprice"])
            expected.append((cust, o["o_orderkey"], float(run)))
    _assert_rows(
        spark, "cumulative_customer_spend", expected,
        ["o_custkey", "o_orderkey", "cum_spend"],
    )


def test_effective_dated_campaign(spark):
    """J5: segment-keyed effective-dated LEFT join (inclusive interval)
    against the inline campaign relation, then a campaign rollup."""
    campaigns = [
        ("BUILDING", dt.date(1995, 1, 1), dt.date(1997, 12, 31), "early-building"),
        ("BUILDING", dt.date(1998, 1, 1), dt.date(2999, 12, 31), "late-building"),
        ("AUTOMOBILE", dt.date(1996, 1, 1), dt.date(1998, 12, 31), "auto-mid"),
        ("MACHINERY", dt.date(2000, 1, 1), dt.date(2999, 12, 31), "machinery-recent"),
    ]
    seg = {c["c_custkey"]: c["c_mktsegment"] for c in _tbl("customer")}
    agg: dict = {}
    for o in _tbl("orders"):
        s, d = seg[o["o_custkey"]], o["o_orderdate"].date()
        camp = next(
            (c[3] for c in campaigns if c[0] == s and c[1] <= d <= c[2]), None
        )
        n, tot = agg.get(camp, (0, Decimal(0)))
        agg[camp] = (n + 1, tot + _dec(o["o_totalprice"]))
    expected = [(camp, n, float(t)) for camp, (n, t) in agg.items()]
    _assert_rows(
        spark, "effective_dated_campaign", expected,
        ["campaign", "n_orders", "total_value"],
    )


def test_pivot_status_counts(spark):
    """A2 pivot: status counts per priority with a pinned value list,
    missing cells zero-filled."""
    from collections import Counter as _C

    cnt = _C((o["o_orderpriority"], o["o_orderstatus"]) for o in _tbl("orders"))
    prios = {o["o_orderpriority"] for o in _tbl("orders")}
    expected = [
        (p, cnt.get((p, "O"), 0), cnt.get((p, "F"), 0), cnt.get((p, "P"), 0))
        for p in prios
    ]
    _assert_rows(
        spark, "pivot_status_counts", expected,
        ["o_orderpriority", "n_open", "n_filled", "n_partial"],
    )


def _scd2_regimes():
    """Pure-Python scd2_from_changelog over the orders changelog:
    per (cust, date) highest orderkey wins, consecutive identical
    priorities collapse, half-open [from, to) windows."""
    from collections import defaultdict

    best: dict = {}
    for o in _tbl("orders"):
        k = (o["o_custkey"], o["o_orderdate"].date())
        if k not in best or o["o_orderkey"] > best[k]["o_orderkey"]:
            best[k] = o
    by_cust = defaultdict(list)
    for (cust, d), o in best.items():
        by_cust[cust].append((d, o["o_orderpriority"]))
    regimes = []
    for cust, rows in by_cust.items():
        rows.sort()
        kept = [r for i, r in enumerate(rows) if i == 0 or r[1] != rows[i - 1][1]]
        for i, (d, prio) in enumerate(kept):
            to = kept[i + 1][0] if i + 1 < len(kept) else None
            regimes.append((cust, prio, d, to, to is None))
    return regimes


def test_scd2_order_priority(spark):
    expected = _scd2_regimes()
    _assert_rows(
        spark, "scd2_order_priority", expected,
        ["o_custkey", "o_orderpriority", "effective_from", "effective_to",
         "is_current"],
    )


def test_scd2_effective_revenue(spark):
    """SCD2 producer + effective-dated consumer composed: quantity
    shipped under the priority regime in effect at ship time."""
    from collections import defaultdict

    dim = defaultdict(list)
    for cust, prio, frm, to, _cur in _scd2_regimes():
        dim[cust].append((frm, to or dt.date(9999, 12, 31), prio))
    cust_of = {o["o_orderkey"]: o["o_custkey"] for o in _tbl("orders")}
    agg: dict = {}
    for li in _tbl("lineitem"):
        cust = cust_of[li["l_orderkey"]]
        ship = li["l_shipdate"].date()
        prio = next(
            (p for frm, to, p in dim[cust] if frm <= ship < to), None
        )
        n, tot = agg.get(prio, (0, Decimal(0)))
        agg[prio] = (n + 1, tot + _dec(li["l_quantity"]))
    expected = [(p, n, float(t)) for p, (n, t) in agg.items()]
    _assert_rows(
        spark, "scd2_effective_revenue", expected,
        ["o_orderpriority", "n_items", "sum_qty"],
    )


def test_smartstore_split_sales(spark):
    """W6 fee allocation end-to-end (smartstore__sales_daily steps
    2-3+8): bundle explode with ':N' multipliers, cost-weight split
    with the remainder on the first row, singleton bypass, daily
    re-aggregation preserving group totals exactly."""
    from collections import defaultdict

    prices = {"p0": 1000, "p1": 2000, "p2": 1500, "p3": 800, "p4": 0}
    daily: dict = defaultdict(lambda: [0, 0, 0])
    for o in _tbl("orders"):
        ok = o["o_orderkey"]
        if ok % 12 == 2:
            bundle = "p4:2,p7"
        elif ok % 3 == 0:
            bundle = "p0:2,p3,p5"
        elif ok % 3 == 1:
            bundle = "p1:3,p4:x"
        else:
            bundle = "p2"
        oq = ok % 4 + 1
        payment = math.floor(o["o_totalprice"])
        supply = math.floor(o["o_totalprice"] * 0.9)
        rows = []
        for bp in bundle.split(","):
            parts = bp.split(":")
            pid = parts[0]
            suf = parts[1] if len(parts) > 1 else None
            mult = int(suf) if suf is not None and re.fullmatch(r"[0-9]+", suf) else 1
            sku_q = mult * oq
            cost = prices.get(pid, 0) * sku_q
            rows.append([pid, sku_q, cost])
        rows.sort(key=lambda r: r[0])
        total_cost = sum(r[2] for r in rows)
        out = []
        for amount in (payment, supply):
            if len(rows) == 1:
                out.append([amount])
                continue
            splits = [
                math.floor(amount * (r[2] / total_cost) + 0.5)
                if total_cost != 0
                else 0
                for r in rows
            ]
            splits[0] += amount - sum(splits)
            out.append(splits)
        for i, (pid, sku_q, _cost) in enumerate(rows):
            d = daily[(o["o_orderdate"].date(), pid)]
            d[0] += sku_q
            d[1] += out[0][i] if len(rows) > 1 else out[0][0]
            d[2] += out[1][i] if len(rows) > 1 else out[1][0]
    expected = [
        (date, pid, v[0], v[1], v[2]) for (date, pid), v in daily.items()
    ]
    _assert_rows(
        spark, "smartstore_split_sales", expected,
        ["order_date", "product_id", "sku_quantity", "payment_amount",
         "supply_amount"],
    )


def test_stock_report(spark):
    """analytics__stock_report end-to-end: lot build, ordered
    cumulative stock, velocity attach, remain-days, performance
    ladder, expiration string_agg, global lot_seq + option_seq."""
    from collections import defaultdict

    rd = dt.date(2001, 6, 1)
    lots: dict = defaultdict(Decimal)
    sold: dict = defaultdict(Decimal)
    for li in _tbl("lineitem"):
        d = li["l_shipdate"].date()
        if rd - dt.timedelta(days=120) < d <= rd:
            lots[(li["l_partkey"], dt.date(d.year, d.month, 1))] += _dec(
                li["l_quantity"]
            )
        if rd - dt.timedelta(days=30) <= d < rd:
            sold[li["l_partkey"]] += _dec(li["l_quantity"])
    part = {p["p_partkey"]: p for p in _tbl("part")}

    rows = []
    for (pid, lot_month), qty_d in lots.items():
        p = part[pid]
        priority = 0 if p["p_name"].startswith("small") else 1
        exp = None if p["p_type"] == "PROMO" else _months_add(lot_month, 6)
        sold0 = float(sold[pid]) if pid in sold else 0.0
        rows.append(
            dict(
                product_id=pid, lot_month=lot_month, qty_d=qty_d,
                brand=p["p_brand"], priority=priority, exp=exp,
                org_price=p["p_retailprice"], sold0=sold0,
            )
        )
    by_prod = defaultdict(list)
    for r in rows:
        by_prod[r["product_id"]].append(r)
    enriched = []
    for pid, lot_rows in by_prod.items():
        lot_rows.sort(
            key=lambda r: (
                -r["priority"], (r["exp"] is None, r["exp"]), r["lot_month"],
            )
        )
        run = Decimal(0)
        exp_strs = sorted(
            {r["exp"].isoformat() for r in lot_rows if r["exp"] is not None}
        )
        exp_agg = "\n".join(exp_strs) or None
        for r in lot_rows:
            run += r["qty_d"]
            cum = float(run)
            sold0 = r["sold0"]
            if sold0 == 0.0:
                remain = 0
            else:
                remain = math.floor(cum / (sold0 / 30.0))
            expected_date = rd + dt.timedelta(days=remain)
            exp = r["exp"]
            if r["priority"] == 0:
                perf = "excluded"
            elif exp is None:
                perf = "no-expiry"
            elif rd > exp:
                perf = "expired"
            elif sold0 == 0.0:
                perf = "no-sales"
            elif expected_date > exp:
                perf = "sellout-after-expiry"
            elif _months_add(expected_date, 6) > exp:
                perf = "slow"
            else:
                perf = "ok"
            stock_qty = float(r["qty_d"])
            enriched.append(
                dict(
                    r, cum=cum, stock_qty=stock_qty,
                    avg=0.0 if sold0 == 0.0 else sold0 / 30.0,
                    remain=remain, expected_date=expected_date,
                    exp_agg=exp_agg, perf=perf,
                    stock_cost=r["org_price"] * stock_qty,
                )
            )
    enriched.sort(
        key=lambda r: (
            r["brand"], -r["priority"], (r["exp"] is None, r["exp"]),
            r["product_id"], r["lot_month"],
        )
    )
    min_seq: dict = {}
    for i, r in enumerate(enriched, start=1):
        r["lot_seq"] = i
        min_seq.setdefault(r["product_id"], i)
    expected = [
        (
            r["lot_seq"], min_seq[r["product_id"]], r["brand"],
            r["product_id"], r["lot_month"], r["exp"], r["exp_agg"],
            r["stock_qty"], r["cum"], r["sold0"], r["avg"], r["remain"],
            r["expected_date"], r["perf"], r["stock_cost"], r["priority"],
        )
        for r in enriched
    ]
    _assert_rows(
        spark, "stock_report", expected,
        ["lot_seq", "option_seq", "brand", "product_id", "lot_month",
         "expiration_date", "expiration_dates", "stock_qty",
         "cum_stock_qty", "sold_qty_30d", "avg_sold_qty_30d",
         "remain_days", "expected_date", "performance", "stock_cost",
         "priority"],
    )


# ------------------------------------------------- round-9 second wave


def test_events_sessions(spark):
    """session_window(30 min) == gaps-and-islands: a new session starts
    when the gap from the previous event is >= the window (session end
    is exclusive: an event at exactly last+30min opens a new session)."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for e in _tbl("events"):
        by_user[e["user_id"]].append(e["ts"].replace(microsecond=0))
    expected = []
    for u, times in by_user.items():
        times.sort()
        cur = [times[0]]
        for t in times[1:]:
            if (t - cur[-1]).total_seconds() >= 1800:
                expected.append(
                    (u, cur[0].strftime("%Y-%m-%d %H:%M:%S"),
                     cur[-1].strftime("%Y-%m-%d %H:%M:%S"), len(cur))
                )
                cur = [t]
            else:
                cur.append(t)
        expected.append(
            (u, cur[0].strftime("%Y-%m-%d %H:%M:%S"),
             cur[-1].strftime("%Y-%m-%d %H:%M:%S"), len(cur))
        )
    _assert_rows(
        spark, "events_sessions", expected,
        ["user_id", "session_start", "session_last", "n_events"],
    )


def test_asof_click_attribution(spark):
    """Backward as-of join: per purchase the greatest click_ts <= ts,
    nulled when farther than 24h, left row always preserved."""
    from collections import defaultdict

    epoch = dt.datetime(1970, 1, 1)

    def us(t):
        d = t - epoch
        return d.days * 86_400_000_000 + d.seconds * 1_000_000 + d.microseconds

    clicks = defaultdict(list)
    for e in _tbl("events"):
        if e["event_type"] == "click":
            clicks[e["user_id"]].append((e["ts"], e["event_id"]))
    for v in clicks.values():
        v.sort()
    expected = []
    for e in _tbl("events"):
        if e["event_type"] != "purchase":
            continue
        best = None
        for cts, cid in clicks.get(e["user_id"], []):
            if cts <= e["ts"]:
                best = (cts, cid)
            else:
                break
        if best and (e["ts"] - best[0]).total_seconds() <= 24 * 3600:
            cus, cid = us(best[0]), best[1]
            row = (e["event_id"], e["user_id"], us(e["ts"]), cus, cid,
                   us(e["ts"]) - cus, e["value"])
        else:
            row = (e["event_id"], e["user_id"], us(e["ts"]), None, None,
                   None, e["value"])
        expected.append(row)
    _assert_rows(
        spark, "asof_click_attribution", expected,
        ["event_id", "user_id", "purchase_us", "click_us", "click_id",
         "gap_us", "purchase_value"],
    )


def test_sales_rollup(spark):
    """ROLLUP over (region, nation): leaf rows + region subtotals +
    the grand total, decimal-exact sums."""
    from collections import defaultdict

    nat = {n["n_nationkey"]: n for n in _tbl("nation")}
    reg = {r["r_regionkey"]: r["r_name"] for r in _tbl("region")}
    cust = {c["c_custkey"]: c["c_nationkey"] for c in _tbl("customer")}
    leaf = defaultdict(lambda: [0, Decimal(0)])
    for o in _tbl("orders"):
        n = nat[cust[o["o_custkey"]]]
        k = (reg[n["n_regionkey"]], n["n_name"])
        leaf[k][0] += 1
        leaf[k][1] += _dec(o["o_totalprice"])
    expected = []
    region_tot = defaultdict(lambda: [0, Decimal(0)])
    grand = [0, Decimal(0)]
    for (r, n), (c, t) in leaf.items():
        expected.append((r, n, c, float(t)))
        region_tot[r][0] += c
        region_tot[r][1] += t
        grand[0] += c
        grand[1] += t
    for r, (c, t) in region_tot.items():
        expected.append((r, None, c, float(t)))
    expected.append((None, None, grand[0], float(grand[1])))
    _assert_rows(
        spark, "sales_rollup", expected,
        ["r_name", "n_name", "n_orders", "total_value"],
    )


def test_events_funnel(spark):
    """Ordered funnel booleans with SQL three-valued logic preserved
    (a NULL step timestamp makes the comparison NULL, not False)."""
    from collections import defaultdict

    firsts = defaultdict(dict)
    for e in _tbl("events"):
        if e["event_type"] in ("signup", "view", "purchase"):
            t2 = e["ts"].replace(microsecond=0)
            d = firsts[e["user_id"]]
            k = e["event_type"]
            if k not in d or t2 < d[k]:
                d[k] = t2

    def gt(a, b):
        return None if a is None or b is None else a > b

    def sql_and(a, b):
        if a is False or b is False:
            return False
        if a is None or b is None:
            return None
        return True

    expected = []
    for u, d in firsts.items():
        s, v, p = d.get("signup"), d.get("view"), d.get("purchase")
        expected.append(
            (u, s is not None, gt(v, s), sql_and(gt(p, v), gt(v, s)))
        )
    _assert_rows(
        spark, "events_funnel", expected,
        ["user_id", "did_signup", "viewed_after_signup", "full_funnel"],
    )


def test_doc_hash_splits(spark):
    """The reproducible-split primitive: md5(doc_id) buckets 0-9999,
    thresholds 9000/9500 — pinned against hashlib directly."""
    from collections import defaultdict

    agg = defaultdict(lambda: [0, None, None])
    for d in _tbl("documents"):
        b = int(hashlib.md5(str(d["doc_id"]).encode()).hexdigest()[:8], 16) % 10000
        split = "train" if b < 9000 else ("val" if b < 9500 else "test")
        a = agg[split]
        a[0] += 1
        a[1] = d["doc_id"] if a[1] is None else min(a[1], d["doc_id"])
        a[2] = d["doc_id"] if a[2] is None else max(a[2], d["doc_id"])
    expected = [(s, c, lo, hi) for s, (c, lo, hi) in agg.items()]
    _assert_rows(
        spark, "doc_hash_splits", expected,
        ["split", "n_docs", "min_doc", "max_doc"],
    )


def test_largest_parts(spark):
    """Scalar MAX subquery via broadcast cross join."""
    parts = _tbl("part")
    mx = max(p["p_size"] for p in parts)
    expected = [
        (p["p_partkey"], p["p_name"], p["p_size"])
        for p in parts
        if p["p_size"] == mx
    ]
    _assert_rows(spark, "largest_parts", expected,
                 ["p_partkey", "p_name", "p_size"])


def test_order_value_quantiles(spark):
    """Exact interpolated percentiles per priority — the classic
    pos = p*(n-1) linear interpolation, mirrored in double math."""
    from collections import defaultdict

    vals = defaultdict(list)
    for o in _tbl("orders"):
        vals[o["o_orderpriority"]].append(o["o_totalprice"])

    def pct(xs, p):
        # Spark's Percentile.getPercentile: lower*(1-d) + higher*d —
        # NOT lo + d*(hi-lo); the two differ in the last ulp
        xs = sorted(xs)
        pos = p * (len(xs) - 1)
        lo = int(math.floor(pos))
        if lo == pos:
            return float(xs[lo])
        d = pos - lo
        return xs[lo] * (1.0 - d) + xs[lo + 1] * d

    expected = [
        (prio, len(xs), pct(xs, 0.25), pct(xs, 0.5), pct(xs, 0.75))
        for prio, xs in vals.items()
    ]
    _assert_rows(
        spark, "order_value_quantiles", expected,
        ["priority", "n_orders", "q25", "q50", "q75"],
    )
