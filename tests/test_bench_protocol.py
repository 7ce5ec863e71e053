"""Bench-protocol invariants (round-11 verdict): the min-merge artifact
must auto-reset a query's best-ever minimum when its physical plan
changes, and the plan fingerprint must be stable across sessions (i.e.
insensitive to monotonic expression IDs) so unchanged queries KEEP their
adjudicated minima."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import merge_detail, plan_fingerprint  # noqa: E402


def _prior(**fps):
    return {
        "queries": {n: 0.1 for n in fps},
        "repeats": {n: [0.1, 0.2] for n in fps},
        "fingerprints": dict(fps),
    }


def test_plan_change_resets_min_but_keeps_unchanged_entries():
    prior = _prior(q_changed="aaa", q_same="ccc")
    merged_q, merged_raw, merged_fp, plan_changed = merge_detail(
        prior,
        timings={"q_changed": 5.0, "q_same": 5.0},
        raw={"q_changed": [5.0], "q_same": [5.0]},
        fps={"q_changed": "bbb", "q_same": "ccc"},
        known={"q_changed", "q_same"},
        manual_invalid=set(),
    )
    # Changed plan: the stale 0.1 min is gone, this sweep's time stands.
    assert merged_q["q_changed"] == 5.0
    assert merged_raw["q_changed"] == [5.0]
    assert plan_changed == ["q_changed"]
    # Unchanged plan: the adjudicated min survives the slower sweep.
    assert merged_q["q_same"] == 0.1
    assert merged_fp == {"q_changed": "bbb", "q_same": "ccc"}


def test_legacy_artifact_without_fingerprints_is_grandfathered():
    prior = {"queries": {"q": 0.1}, "repeats": {"q": [0.1]}}
    merged_q, _, merged_fp, plan_changed = merge_detail(
        prior,
        timings={"q": 5.0},
        raw={"q": [5.0]},
        fps={"q": "new"},
        known={"q"},
        manual_invalid=set(),
    )
    assert merged_q["q"] == 0.1  # kept once
    assert merged_fp == {"q": "new"}  # fingerprinted from now on
    assert plan_changed == []


def test_manual_invalidate_still_resets():
    prior = _prior(q="aaa")
    merged_q, _, _, plan_changed = merge_detail(
        prior,
        timings={"q": 5.0},
        raw={"q": [5.0]},
        fps={"q": "aaa"},
        known={"q"},
        manual_invalid={"q"},
    )
    assert merged_q["q"] == 5.0
    assert plan_changed == []  # manual reset is not a plan change


def test_renamed_or_removed_queries_are_dropped():
    prior = _prior(q_gone="aaa")
    merged_q, _, merged_fp, _ = merge_detail(
        prior, timings={}, raw={}, fps={}, known={"q_new"},
        manual_invalid=set(),
    )
    assert merged_q == {} and merged_fp == {}


def test_fingerprint_stable_across_expression_id_drift(spark, sf_dir):
    """Expression IDs (#123) are monotonic per session: building OTHER
    plans in between must not change a query's fingerprint, while a
    genuinely different plan must."""
    from extract_transform_load_template_multidb_spark.queries import (
        all_queries,
    )

    qs = all_queries()
    fp1 = plan_fingerprint(qs["q1_pricing_summary"](spark, sf_dir))
    # Burn expression IDs with a different plan.
    other_fp = plan_fingerprint(qs["agg_linear_trend"](spark, sf_dir))
    fp2 = plan_fingerprint(qs["q1_pricing_summary"](spark, sf_dir))
    assert fp1 == fp2
    assert fp1 != other_fp
