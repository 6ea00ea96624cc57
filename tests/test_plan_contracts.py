"""Executable plan contracts: the 100-TB shape claims in BENCH/PLANS.md as
assertions over the ACTUAL physical plans, so a refactor that silently
introduces a row-at-a-time Python UDF, an unexpected shuffle in a
zero-shuffle query, or a lost broadcast fails CI instead of a future bench.

Plans are inspected as built (AQE initial plan): explicit F.broadcast()
joins and codegen projections are visible there; AQE-decided runtime
broadcasts deliberately are NOT pinned (they are allowed to change with
scale — that's the point of AQE)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"

# Queries whose callables run real side-effect stages (streaming delivery,
# image/audio/video synth + decode, k-means, snapshot commits) before
# returning a DataFrame. Their returned plan is just a scan of the landed
# parquet — nothing to pin — and executing them here would race the other
# suites' fixed /tmp landing dirs for no added coverage.
LANDED = {
    "image_dedup_clusters",
    "image_tiered_dedup",
    "image_tiered_crop_dedup",
    "streaming_first_seen_dedup",
    "streaming_windowed_counts",
    "audio_near_dups",
    "frame_near_dups",
    "dihedral_image_neardup",
    "crop_image_neardup",
    "ann_topk_ivf",
    "semdedup_prune",
    "snapshot_diff_dedup",
    "tiered_incremental_dedup",
    "bloom_prefilter",
    # not landed, but their BUILD runs the full union-find driver loop —
    # covered by their own suites; nothing extra to pin in the final scan
    "dedup_clusters",
    "leakage_safe_split",
}


def _plan(spark, name: str) -> str:
    df = entry_mod.queries()[name](spark, SF)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


@pytest.fixture(scope="module")
def plans(spark):
    names = [n for n in sorted(entry_mod.queries()) if n not in LANDED]
    return {n: _plan(spark, n) for n in names}


def test_no_row_python_udf_anywhere(plans):
    """The repo-wide hot-path rule: zero row-at-a-time Python UDFs. Arrow
    stages (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) are the
    sanctioned slow path; BatchEvalPython is banned outright."""
    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not offenders, f"row-at-a-time Python UDF in: {offenders}"


def test_zero_shuffle_queries_have_zero_exchanges(plans):
    """decontaminate_overlap and pii_scrub are documented as pure maps over
    the scan (their 100-TB cost model depends on it): no Exchange of any
    kind may appear."""
    for name in ("decontaminate_overlap", "pii_scrub"):
        assert "Exchange" not in plans[name], f"{name} gained a shuffle"


def test_winnowing_window_is_the_only_wide_stage(plans):
    """One per-document Window (bounded partitions by construction), no
    join of any kind, and the explode feeds the window through a single
    hash-partitioned Exchange; the distinct adds at most one more."""
    p = plans["winnowing_fingerprints"]
    assert p.count("(1) Scan parquet") == 1 and "Join" not in p
    assert "Window" in p
    assert p.count("Exchange") <= 2 + 2  # partition + distinct, formatted
    # mode lists each op in both tree and detail sections (hence the x2)


def test_bm25_probe_joins_are_broadcast_and_topk_prunes_early(plans):
    p = plans["bm25_topk"]
    assert "WindowGroupLimit" in p, "rank top-k must prune before the window"
    assert "BroadcastHashJoin" in p, "probe relation must broadcast"
    assert "SortMergeJoin" not in p, (
        "no corpus-vs-corpus sort-merge join belongs in this query at "
        "build time; scale-path joins are AQE's call, not the plan's"
    )


def test_decontaminate_ngram_join_probe_side_broadcast(plans):
    p = plans["decontaminate_ngram_join"]
    assert "BroadcastHashJoin" in p
    assert "BatchEvalPython" not in p


def test_exact_dedup_is_one_aggregation_no_join(plans):
    p = plans["exact_dedup_representatives"]
    assert "Join" not in p, "representative selection is an aggregate, not a join"


def test_scan_filter_project_pushes_down(plans):
    """O1/O18's contract: the filter reaches the parquet scan."""
    p = plans["scan_filter_project"]
    assert "PushedFilters: [" in p
    assert "IsNotNull" in p or "GreaterThan" in p
