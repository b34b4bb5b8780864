"""Unit tests for the searchad extras module (GFA, exposure, center
report, keyword tool, contracts). Oracle parity for the exposure
upsert and contract union runs in tools/check_oracle.py; these pin
the remaining parse semantics.
"""

from __future__ import annotations

import base64
import datetime as dt

from pyspark.sql import functions as F

from linkmerce_spark.models.searchad.extras import (
    center_daily_report,
    nv_mid_from_image_url,
    parse_gfa_creatives,
    parse_keywords,
    parse_time_contracts,
)


def test_nv_mid_extraction_branches(spark):
    b64 = base64.b64encode(b"4567").decode()
    df = spark.createDataFrame(
        [("https://shopping-phinf.net/main_20/123.jpg",),
         (f"https://searchad-phinf.net/ad/{b64}.png",),
         ("https://searchad-phinf.net/ad/!!!.png",),  # bad base64 -> NULL
         ("https://elsewhere.net/9.jpg",)],
        "imageUrl string",
    )
    out = [r[0] for r in df.select(nv_mid_from_image_url("imageUrl")).collect()]
    assert out == [123, 4567, None, None]


def test_gfa_creative_numeric_struct_field(spark):
    rows = spark.createDataFrame(
        [(None, "7", "9", "SINGLE_VIDEO", "nm", "msg", True, "ON",
          "https://brand.example/products/8812"),
         ("55", "6", "9", "HOLOGRAM", "nm", "msg", False, "DELETED",
          "https://brand.example/catalog")],
        "realCreativeNo string, no string, adSetNo string, creativeType string, "
        "name string, message string, activated boolean, status string, link string",
    ).select(
        "realCreativeNo", "no", "adSetNo", "creativeType", "name", "message",
        "activated", "status",
        F.struct(
            F.struct(F.col("link").alias("linkUrl")).alias("content")
        ).alias("1_struct"),
    ).select(
        "realCreativeNo", "no", "adSetNo", "creativeType", "name", "message",
        "activated", "status",
        F.struct(F.col("1_struct").alias("1")).alias("medias"),
    )
    out = {r["ad_id"]: r for r in parse_gfa_creatives(rows, 3).collect()}
    assert out["7"]["product_id"] == 8812  # trailing digits extracted
    assert out["7"]["ad_type"] == 103
    assert out["55"]["ad_id"] == "55"  # COALESCE(realCreativeNo, no)
    assert out["55"]["product_id"] is None and out["55"]["ad_type"] is None
    assert out["55"]["is_deleted"] is True


def test_center_report_tombstone_and_enums(spark):
    rows = spark.createDataFrame(
        [("nad-123(삭제)", "네이버", "모바일", "콘텐츠", 1, 1, 10, 0, 0, 0, 0,
          2.5, 1.2, 30.5, "2024-05-01"),
         ("nad-9", "파트너", "기타기기", "???", 1, 1, 10, 0, 0, 0, 0,
          None, None, None, "2024-05-01")],
        "nccAdId string, mediaNm string, pcMblTp string, ntwkTp string, "
        "impCnt int, clkCnt int, salesAmt int, ccnt int, drtCcnt int, "
        "convAmt int, drtConvAmt int, avgRnk double, pv double, stayTm double, "
        "ymd string",
    )
    out = {r["ad_id"]: r for r in center_daily_report(rows, 7).collect()}
    assert "nad-123" in out  # (삭제) stripped
    assert out["nad-123"]["pc_mobile_type"] == 1
    assert out["nad-123"]["network_type"] == 1
    assert out["nad-9"]["pc_mobile_type"] == 2 and out["nad-9"]["network_type"] == 2


def test_keyword_floor_bucket_and_window(spark):
    rows = spark.createDataFrame(
        [("빵", "< 10", "1500", 1.5, 2.5, "높음", 8),
         ("떡", "junk", "< 10", None, None, "???", None)],
        "relKeyword string, monthlyPcQcCnt string, monthlyMobileQcCnt string, "
        "monthlyAvePcClkCnt double, monthlyAveMobileClkCnt double, "
        "compIdx string, plAvgDepth int",
    )
    out = {r["keyword"]: r for r in parse_keywords(rows, "2026-08-13").collect()}
    assert out["빵"]["monthly_qc_cnt_pc"] == 10  # '< 10' floor bucket
    assert out["빵"]["monthly_qc_cnt_mo"] == 1500
    assert out["빵"]["comp_idx"] == 2
    assert out["떡"]["monthly_qc_cnt_pc"] == 0  # junk -> COALESCE 0
    assert out["떡"]["monthly_qc_cnt_mo"] == 10
    assert out["떡"]["comp_idx"] is None
    assert out["빵"]["start_date"] == dt.date(2026, 7, 13)
    assert out["빵"]["end_date"] == dt.date(2026, 8, 12)


def test_time_contract_kst_and_vat(spark):
    rows = spark.createDataFrame(
        [("tc1", "g1", "5", "c", "ON_EXPOSING", "1000", 0, 1, 2,
          "2024-05-01 20:00:00", "bad", "2024-05-01 16:00:00",
          "2024-05-31 14:59:59", None, "2024-05-31 15:00:00", None)],
        "nccTimeContractId string, nccAdgroupId string, customerId string, "
        "contractName string, contractStatus string, paymentAmt string, "
        "refundAmt int, contractQc int, totalKeywordQc int, regTm string, "
        "editTm string, contractStartDt string, contractEndDt string, "
        "exposureStartDt string, exposureEndDt string, cancelTm string",
    )
    (r,) = parse_time_contracts(rows).collect()
    assert r["contract_amount"] == 1100  # VAT x1.1, exact decimal
    assert r["contract_status"] == 21 and r["contract_type"] == 0
    assert r["register_dt"] == dt.datetime(2024, 5, 2, 5, 0)  # +9h day roll
    assert r["edit_dt"] is None  # TRY_CAST failure propagates through +9h
    assert r["contract_start_date"] == dt.date(2024, 5, 2)  # 16:00+9h -> next day
    assert r["contract_end_date"] == dt.date(2024, 5, 31)  # 14:59+9h -> same day
    assert r["cancel_date"] is None
