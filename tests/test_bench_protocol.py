"""Bench-protocol invariants (round-11 verdict): the min-merge artifact
must auto-reset a query's best-ever minimum when its physical plan
changes, and the plan fingerprint must be stable across sessions (i.e.
insensitive to monotonic expression IDs) so unchanged queries KEEP their
adjudicated minima."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _normalize_plan, merge_detail, plan_fingerprint  # noqa: E402


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


def test_normalizer_strips_session_varying_tokens():
    """Round-11 regression: a full sweep invalidated 54 unchanged
    queries because RDD ids (session-global, AQE-nondeterministic) and
    mkdtemp scratch paths leaked into the fingerprint."""
    a = _normalize_plan(
        "Arguments: [a#12L], MapPartitionsRDD[95] at localCheckpoint\n"
        "Location: InMemoryFileIndex [file:/tmp/etl_xml_4yvzoqa3/docs]\n"
        "output=[path#44: string], /tmp/fixture_abc/part-0.parquet"
    )
    b = _normalize_plan(
        "Arguments: [a#99L], MapPartitionsRDD[1047] at localCheckpoint\n"
        "Location: InMemoryFileIndex [file:/tmp/etl_xml_zzz912/docs]\n"
        "output=[path#7: string], /tmp/fixture_xyz/part-0.parquet"
    )
    assert a == b
    # Non-scratch inputs keep their identity.
    assert "/root/testdata" in _normalize_plan(
        "Location: InMemoryFileIndex [file:/root/testdata/sf0.1/x.parquet]"
    )
    # JVM reflection call-site inflation: the localCheckpoint scan's
    # call site reads NativeMethodAccessorImpl.java:0 early in a
    # session and <unknown>:0 once inflated.
    assert _normalize_plan(
        "MapPartitionsRDD[95] at localCheckpoint at "
        "NativeMethodAccessorImpl.java:0, ExistingRDD"
    ) == _normalize_plan(
        "MapPartitionsRDD[1047] at localCheckpoint at <unknown>:0, "
        "ExistingRDD"
    )
    # RewriteDistinctAggregates orders Expand arms / grouping keys by
    # expression-id hash — a session-varying permutation WITHIN a line.
    assert _normalize_plan(
        "Keys [3]: [c#, r#, gid#]\nhashpartitioning(c#, r#, gid#, 32)"
    ) == _normalize_plan(
        "Keys [3]: [r#, c#, gid#]\nhashpartitioning(r#, c#, gid#, 32)"
    )
    # ...while a genuine plan difference still fingerprints differently.
    assert _normalize_plan("Keys [3]: [c#, r#, gid#]") != _normalize_plan(
        "Keys [2]: [c#, r#]"
    )
    assert _normalize_plan("SortMergeJoin [a#], [b#], Inner") != (
        _normalize_plan("BroadcastHashJoin [a#], [b#], Inner")
    )
    # Idempotent (explainString ends with a blank line; re-normalizing
    # a normalized plan must not flap the hash).
    raw = "Keys [2]: [c#, r#]\nArguments: isFinalPlan=false\n\n"
    assert _normalize_plan(_normalize_plan(raw)) == _normalize_plan(raw)


def test_normalizer_version_migration_regrandfathers(tmp_path):
    """When FP_VERSION bumps, stored fingerprints are dropped BEFORE the
    merge so every entry re-grandfathers (minima kept) instead of being
    misread as 571 simultaneous plan changes."""
    prior = _prior(q="old-normalizer-fp")
    # main() strips the fingerprints key on version mismatch; emulate.
    prior = {k: v for k, v in prior.items() if k != "fingerprints"}
    merged_q, _, merged_fp, plan_changed = merge_detail(
        prior,
        timings={"q": 5.0},
        raw={"q": [5.0]},
        fps={"q": "new-normalizer-fp"},
        known={"q"},
        manual_invalid=set(),
    )
    assert merged_q["q"] == 0.1  # adjudicated min survives the bump
    assert merged_fp == {"q": "new-normalizer-fp"}
    assert plan_changed == []


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
