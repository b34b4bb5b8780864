"""Unit tests for the sabangnet dataset module (models/sabangnet).

Oracle parity for the option-upsert and invoice-enum paths runs in
tools/check_oracle.py; these pin the parse semantics on tiny frames:
NULLIF(0) scrub, TRY_CAST failures, the order_dt collection-time
fallback, the date_type status codes, and the sku option-id synthesis.
"""

from __future__ import annotations

import datetime as dt

from linkmerce_spark.models.sabangnet import (
    DATE_TYPE_STATUS,
    download_invoice,
    download_option,
    download_order,
    order_status_events,
    parse_sku_mapping,
    upsert_options,
)

RAW_COLS = [
    "주문번호(사방넷)", "원주문번호(사방넷)", "주문번호(쇼핑몰)", "부주문번호",
    "계정등록순번", "상품코드(사방넷)", "상품코드(쇼핑몰)", "수량", "EA(확정)",
    "결제금액", "주문금액", "수집일시(YYYY-MM-DD HH:MM:SS)",
    "주문일시(YYYY-MM-DD HH:MM)", "모델명", "자체상품코드", "상품명(확정)",
    "상품명(수집)", "상품약어", "옵션(확정)", "옵션(수집)", "옵션별칭",
    "판매가(상품)", "송장번호", "택배사", "주문구분", "주문상태",
    "송장등록일자(YYYY-MM-DD)", "출고완료일자(YYYY-MM-DD)",
]


def _raw(spark, rows):
    data = []
    for over in rows:
        base = {c: None for c in RAW_COLS}
        base.update(over)
        data.append(tuple(base[c] for c in RAW_COLS))
    schema = ", ".join(f"`{c}` string" for c in RAW_COLS)
    return spark.createDataFrame(data, schema)


def test_download_order_fallback_and_nullif(spark):
    raw = _raw(
        spark,
        [
            {
                "주문번호(사방넷)": "7",
                "원주문번호(사방넷)": "0",  # NULLIF(0)
                "계정등록순번": "2",
                "수량": "x",  # TRY_CAST failure
                "수집일시(YYYY-MM-DD HH:MM:SS)": "2024-05-01 23:59:59",
                "주문일시(YYYY-MM-DD HH:MM)": "bad",  # -> register fallback
            }
        ],
    )
    (r,) = download_order(raw).collect()
    assert r["order_seq"] == 7 and r["order_seq_org"] is None
    assert r["order_quantity"] is None
    assert r["order_dt"] == dt.datetime(2024, 5, 1, 23, 59, 59)


def test_option_dedup_keeps_latest(spark):
    raw = _raw(
        spark,
        [
            {"계정등록순번": "1", "상품코드(쇼핑몰)": "ps1", "상품코드(사방넷)": "o1",
             "모델명": "old", "주문일시(YYYY-MM-DD HH:MM)": "2024-05-01 10:00",
             "주문번호(쇼핑몰)": "a"},
            {"계정등록순번": "1", "상품코드(쇼핑몰)": "ps1", "상품코드(사방넷)": "o1",
             "모델명": "new", "주문일시(YYYY-MM-DD HH:MM)": "2024-05-02 10:00",
             "주문번호(쇼핑몰)": "b"},
        ],
    )
    (r,) = download_option(raw).collect()
    assert r["model_code"] == "new"
    assert r["first_order_dt"] == dt.datetime(2024, 5, 2, 10, 0)


def test_upsert_least_greatest_and_coalesce(spark):
    old = _raw(
        spark,
        [{"계정등록순번": "1", "상품코드(쇼핑몰)": "ps1", "상품코드(사방넷)": "o1",
          "모델명": "kept", "주문일시(YYYY-MM-DD HH:MM)": "2024-05-01 10:00"}],
    )
    new = _raw(
        spark,
        [{"계정등록순번": "1", "상품코드(쇼핑몰)": "ps1", "상품코드(사방넷)": "o1",
          "모델명": None, "옵션별칭": "fresh",
          "주문일시(YYYY-MM-DD HH:MM)": "2024-05-09 08:00"}],
    )
    (r,) = upsert_options(download_option(old), download_option(new)).collect()
    assert r["model_code"] == "kept"  # source NULL -> target wins
    assert r["option_name_abbr"] == "fresh"  # source non-NULL wins
    assert r["first_order_dt"] == dt.datetime(2024, 5, 1, 10, 0)  # LEAST
    assert r["last_order_dt"] == dt.datetime(2024, 5, 9, 8, 0)  # GREATEST


def test_invoice_filters_and_enum(spark):
    raw = _raw(
        spark,
        [
            {"주문번호(사방넷)": "1", "계정등록순번": "0", "송장번호": "inv1",
             "주문구분": "회수(진행)", "주문상태": "폐기",
             "주문일시(YYYY-MM-DD HH:MM)": "2024-05-01 10:00"},
            {"주문번호(사방넷)": "2", "계정등록순번": "0", "송장번호": None,
             "주문일시(YYYY-MM-DD HH:MM)": "2024-05-01 10:00"},  # dropped
            {"주문번호(사방넷)": "3", "계정등록순번": "0", "송장번호": "inv3",
             "주문구분": "알수없음", "주문상태": "신규주문",
             "주문일시(YYYY-MM-DD HH:MM)": "bad"},  # dropped (bad dt)
        ],
    )
    out = download_invoice(raw).collect()
    assert len(out) == 1
    assert out[0]["order_status_div"] == 5 and out[0]["order_status"] == 999


def test_order_status_events_codes_and_guards(spark):
    raw = _raw(
        spark,
        [
            {"주문번호(사방넷)": "1",
             "주문일시(YYYY-MM-DD HH:MM)": "2024-05-01 10:00",
             "출고완료일자(YYYY-MM-DD)": "2024-05-03"},
            {"주문번호(사방넷)": "2",
             "주문일시(YYYY-MM-DD HH:MM)": "2024-05-01 10:00",
             "출고완료일자(YYYY-MM-DD)": "nope"},  # dropped
        ],
    )
    out = order_status_events(
        raw, "출고완료일", "출고완료일자(YYYY-MM-DD)", "yyyy-MM-dd"
    ).collect()
    assert len(out) == 1
    assert out[0]["order_status"] == DATE_TYPE_STATUS["출고완료일"] == 4
    assert out[0]["update_date"] == dt.date(2024, 5, 3)


def test_sku_mapping_option_id_synthesis(spark):
    rows = spark.createDataFrame(
        [("sp1", "P1", None, "nm", "opt", 3, "sku", "2024-05-01 00:00:00"),
         ("sp2", "P2", "0007", "nm", "opt", 1, "sku", "bad")],
        "shmaPrdNo string, prdNo string, skuNo string, prdNm string, "
        "optDtlNm string, rn int, skuDscr string, fstRegsDt string",
    )
    out = {r["product_id_shop"]: r for r in parse_sku_mapping(rows, "s9").collect()}
    assert out["sp1"]["option_id"] == "P1-0001"  # COALESCE default sku
    assert out["sp2"]["option_id"] == "P2-0007"
    assert out["sp2"]["register_dt"] is None  # TRY_CAST failure
    assert out["sp1"]["shop_id"] == "s9"
