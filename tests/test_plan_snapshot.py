"""Replay the committed plan-shape ledger (tools/digests/PLANS.json).

Drift in these counts is how plan regressions actually arrive — a
lost broadcast becomes an SMJ, a collapsed projection un-collapses
into an extra exchange. The replay subset is where drift bites:
every query whose committed plan contains any SortMergeJoin or
BroadcastNestedLoopJoin (the two shapes with a legality budget), plus
the heavy mart chains. Full-catalog regeneration is
``python tools/plan_snapshot.py`` (run it deliberately after a
reviewed plan change and commit the diff).
"""

from __future__ import annotations

import json
import os

import pytest

LEDGER = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "digests",
    "PLANS.json",
)

_HEAVY = {
    "core_sales_daily",
    "smartstore_sales_daily",
    "stock_report_ds",
    "searchad_insight_daily",
    "doc_curation_e2e",
    "doc_dup_clusters",
    "minhash_near_dups",
    "stock_cost_mom",
}


def _ledger() -> dict:
    with open(LEDGER, encoding="utf-8") as f:
        return json.load(f)


def test_ledger_global_invariants():
    led = _ledger()
    assert len(led) >= 179
    for name, row in led.items():
        # CartesianProduct anywhere in the catalog is a bug
        assert row["cartesian"] == 0, name
        # BroadcastNestedLoopJoin is legal ONLY as 1-row totals
        # crossJoins (kmv's pair enumeration holds two)
        assert row["bnlj"] <= 2, name


def test_replay_matches_committed_ledger(spark):
    from tools.plan_snapshot import build_snapshot

    led = _ledger()
    subset = {
        n for n, row in led.items() if row["smj"] or row["bnlj"]
    } | _HEAVY
    got = build_snapshot(spark, subset)
    drift = {}
    for name in sorted(subset):
        want = led[name]
        have = got[name]
        # exact equality: a deliberate plan change regenerates the
        # ledger (and the diff documents what moved)
        if have != want:
            drift[name] = {"committed": want, "now": have}
    assert not drift, json.dumps(drift, indent=1)
