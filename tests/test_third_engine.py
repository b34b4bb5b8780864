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
