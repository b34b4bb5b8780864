"""Third-engine pins for the quantized-serving and media-stats tiers.

Both sides of every catalog twin are builder-written; these tests are
the INDEPENDENT third computation (pure Python over the sf0.001
parquet via pyarrow — no Spark expressions, no DuckDB, no package
codecs) for the two newest twin families the r9 verdict flagged as
un-pinned:

- ``embedding_sq8_roundtrip`` — the full quantized-storage serving
  chain: SQ8 train/encode/reconstruct -> sign-bit BQ signatures ->
  Hamming top-20 pre-filter -> quantized-cosine rerank top-5 ->
  recall audit vs the exact float path. Every float op mirrors the
  documented expression trees (same operand order, binary64
  throughout), so equality is exact, not approximate.
- ``media_stats_real`` — the decoded stats recomputed from the
  GENERATING formulas alone (synthesize_media's closed forms + the
  JFIF DC-only lossy chain), independent of operators/{multimodal,
  jpeg,video}.py.
"""

from __future__ import annotations

import math
from collections import Counter

import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"
_LEVELS = 255.0
_QUANT = 1000


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


# ------------------------------------------------------------ quantize


def _emb() -> dict:
    rows = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pylist()
    return {r["vec_id"]: r["embedding"] for r in rows if r["embedding"]}


def _sq8_reconstruct(emb: dict) -> dict:
    dims = len(next(iter(emb.values())))
    mn = [min(v[d] for v in emb.values()) for d in range(dims)]
    mx = [max(v[d] for v in emb.values()) for d in range(dims)]
    out = {}
    for vid, v in emb.items():
        rv = []
        for d, x in enumerate(v):
            if mx[d] > mn[d]:
                code = math.floor(((x - mn[d]) * _LEVELS) / (mx[d] - mn[d]) + 0.5)
            else:
                code = 0
            rv.append(mn[d] + (code * (mx[d] - mn[d])) / _LEVELS)
        out[vid] = rv
    return out


def _bq_sig(v: list) -> tuple:
    lo = 0
    for i, x in enumerate(v[:32]):
        if x > 0.0:
            lo |= 1 << i
    hi = 0
    for i, x in enumerate(v[32:64]):
        if x > 0.0:
            hi |= 1 << i
    return lo, hi


def _qcos(a: list, b: list):
    qa = [math.floor(x * _QUANT + 0.5) for x in a]
    qb = [math.floor(x * _QUANT + 0.5) for x in b]
    dot = float(sum(x * y for x, y in zip(qa, qb)))
    na = math.sqrt(float(sum(x * x for x in qa)))
    nb = math.sqrt(float(sum(x * x for x in qb)))
    denom = na * nb
    if denom == 0.0:
        return None
    return dot / denom


def _round6(c):
    return None if c is None else math.floor(c * 1000000.0 + 0.5) / 1000000.0


def test_embedding_sq8_roundtrip(spark):
    emb = _emb()
    rv = _sq8_reconstruct(emb)
    sig = {vid: _bq_sig(v) for vid, v in rv.items()}
    queries = sorted(vid for vid in rv if vid % 50 == 0)

    expected = []
    for q in queries:
        qlo, qhi = sig[q]
        cands = [
            (
                bin(qlo ^ sig[n][0]).count("1") + bin(qhi ^ sig[n][1]).count("1"),
                n,
            )
            for n in rv
            if n != q
        ]
        surv = sorted(cands)[:20]  # (hamming asc, id asc)
        scored = [
            (_round6(_qcos(rv[q], rv[n])), ham, n) for ham, n in surv
        ]
        # cosine desc NULLS LAST, neighbor asc
        scored.sort(key=lambda t: ((t[0] is None), -(t[0] or 0.0), t[2]))
        top5 = scored[:5]
        # exact float audit leg over the ORIGINAL vectors
        exact = [
            (_round6(_qcos(emb[q], emb[n])), n) for n in emb if n != q
        ]
        exact.sort(key=lambda t: ((t[0] is None), -(t[0] or 0.0), t[1]))
        exact5 = {n for _, n in exact[:5]}
        for rank, (cos, ham, n) in enumerate(top5, start=1):
            expected.append((q, n, rank, ham, cos, n in exact5))

    _assert_rows(
        spark,
        "embedding_sq8_roundtrip",
        expected,
        ["query_id", "neighbor_id", "rank", "hamming", "cosine_q", "hit"],
    )


# --------------------------------------------------------------- media


def _jfif_dc_mean(colors: list) -> tuple:
    """Mean (r, g, b) after the DC-only lossy chain, floor(x+0.5) at
    every rounding, q=16 with flat table -> DC step 2 (16*8/64)."""

    def clamp(x):
        return min(255, max(0, x))

    rs = gs = bs = 0
    for r0, g0, b0 in colors:
        y0 = clamp(math.floor(0.299 * r0 + 0.587 * g0 + 0.114 * b0 + 0.5))
        cb0 = clamp(
            math.floor(128 - 0.168736 * r0 - 0.331264 * g0 + 0.5 * b0 + 0.5)
        )
        cr0 = clamp(
            math.floor(128 + 0.5 * r0 - 0.418688 * g0 - 0.081312 * b0 + 0.5)
        )
        y2 = clamp(2 * math.floor((y0 - 128) / 2.0 + 0.5) + 128)
        cb2 = clamp(2 * math.floor((cb0 - 128) / 2.0 + 0.5) + 128)
        cr2 = clamp(2 * math.floor((cr0 - 128) / 2.0 + 0.5) + 128)
        rs += clamp(math.floor(y2 + 1.402 * (cr2 - 128) + 0.5))
        gs += clamp(
            math.floor(y2 - 0.344136 * (cb2 - 128) - 0.714136 * (cr2 - 128) + 0.5)
        )
        bs += clamp(math.floor(y2 + 1.772 * (cb2 - 128) + 0.5))
    n = len(colors)
    return float(rs) / n, float(gs) / n, float(bs) / n


def _block_colors(mid: int, n_blocks: int) -> list:
    return [
        ((mid * 7 + 19 * f) % 251, (mid * 11 + 23 * f) % 251, (mid * 13 + 29 * f) % 251)
        for f in range(n_blocks)
    ]


def test_media_stats_real(spark):
    doc_ids = sorted(
        r["doc_id"]
        for r in pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id"]).to_pylist()
        if r["doc_id"] % 5 == 0
    )
    expected = []
    for mid in doc_ids:
        kind = "image" if mid % 2 == 0 else ("audio" if mid % 4 == 1 else "video")
        if kind == "image":
            w = 16 if mid % 16 == 6 else 4 + mid % 5
            h = 16 if mid % 16 == 6 else 2 + mid % 3
            route = mid % 8
            if route == 0:  # BMP: file order B,G,R; byte j = (7*mid + j) % 251
                npx = w * h
                mb = sum((mid * 7 + 3 * i) % 251 for i in range(npx)) / npx
                mg = sum((mid * 7 + 3 * i + 1) % 251 for i in range(npx)) / npx
                mr = sum((mid * 7 + 3 * i + 2) % 251 for i in range(npx)) / npx
                fmt = "bmp"
            elif route == 2:  # PNG: same bytes in R,G,B order
                npx = w * h
                mr = sum((mid * 7 + 3 * i) % 251 for i in range(npx)) / npx
                mg = sum((mid * 7 + 3 * i + 1) % 251 for i in range(npx)) / npx
                mb = sum((mid * 7 + 3 * i + 2) % 251 for i in range(npx)) / npx
                fmt = "png"
            elif route == 4:  # GIF: palette index j=(7*mid+j)%251, pal r=i,g=2i,b=5i
                npx = w * h
                idx = [(mid * 7 + i) % 251 for i in range(npx)]
                mr = sum(idx) / npx
                mg = sum((v * 2) % 256 for v in idx) / npx
                mb = sum((v * 5) % 256 for v in idx) / npx
                fmt = "gif"
            else:  # JPEG still: %16==6 four block colors, %16==14 solid f=0
                colors = _block_colors(mid, 4 if mid % 16 == 6 else 1)
                mr, mg, mb = _jfif_dc_mean(colors)
                fmt = "jpeg"
            expected.append(
                (mid, kind, fmt, w, h, 3, None, None, mb, mg, mr, None, True)
            )
        elif kind == "audio":
            n = 32 + mid % 50
            sq = sum(((mid * 31 + i * 17) % 2048 - 1024) ** 2 for i in range(n))
            rms = math.sqrt(float(sq) / n)
            expected.append(
                (mid, kind, "wav", None, None, 1, 8000, (n * 1000) // 8000,
                 None, None, None, rms, True)
            )
        else:  # video: MJPEG AVI, n frames of solid per-frame colors
            w, h, n = 4 + mid % 5, 2 + mid % 3, 2 + mid % 3
            mr, mg, mb = _jfif_dc_mean(_block_colors(mid, n))
            expected.append(
                (mid, kind, "avi", w, h, 3, None, n * 100, mb, mg, mr, None, True)
            )
    _assert_rows(
        spark,
        "media_stats_real",
        expected,
        ["media_id", "kind", "format", "width", "height", "channels",
         "sample_rate", "duration_ms", "mean_b", "mean_g", "mean_r",
         "rms", "parse_ok"],
    )


def test_embedding_bq_topk(spark):
    """Hamming top-5 over sign-bit signatures of the ORIGINAL vectors
    (the pre-filter tier alone, no reconstruction in the path)."""
    emb = _emb()
    sig = {vid: _bq_sig(v) for vid, v in emb.items()}
    expected = []
    for q in sorted(vid for vid in sig if vid % 50 == 0):
        qlo, qhi = sig[q]
        cands = sorted(
            (
                bin(qlo ^ sig[n][0]).count("1") + bin(qhi ^ sig[n][1]).count("1"),
                n,
            )
            for n in sig
            if n != q
        )
        for rank, (ham, n) in enumerate(cands[:5], start=1):
            expected.append((q, n, ham, rank))
    _assert_rows(
        spark,
        "embedding_bq_topk",
        expected,
        ["query_id", "neighbor_id", "hamming", "rank"],
    )
