"""Headline benchmark — one JSON line for the driver.

Runs the flagship dedup/detector/relational queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``. Each query is fully materialized through the
``noop`` sink (all compute, no write cost). Prints exactly one JSON line:

  {"metric": "bench_total_sec", "value": N, "value_min": N_floor, "unit": "sec",
   "queries": {...per-query MEDIAN sec...}, "trials": 3,
   "spread": {...per-query [min, max] sec...},
   "steal_pct_max": hypervisor-steal%% high-water over any query window,
   "sf": 0.1, "warmup": true}

Methodology (for honest cross-round comparison):

* The session is WARMED before timing — a codegen-heavy throwaway job plus
  one full scan of each input table — so per-query numbers are steady-state
  engine cost, not JVM JIT / codegen-compile / parquet-footer-cache noise
  (measured: the first query absorbed ~6s of one-time cost at sf0.1).
* Since round 5 every query runs ``$SPARK_GRAFT_BENCH_TRIALS`` (default 3)
  times and the reported number is the per-query MEDIAN, with the [min, max]
  spread alongside. Trials are INTERLEAVED (full pass over all queries, then
  the next pass — the same discipline as BENCH/scaling.py) so a transient
  ambient-load burst on this shared host degrades one PASS, not one QUERY:
  round 4's single-trial driver bench swung ~25% against the builder's own
  same-code run purely on host load, which medians absorb. ``value`` is the
  sum of medians. Round-4-and-earlier BENCH_r*.json lines are single-trial
  (no "trials" field).

A second, larger SF point: BENCH/make_sfx.py synthesizes a deterministic
10x corpus (BENCH/data/sf1) whose duplicate DENSITY matches sf0.1 (per-copy
substitution ciphers keep within-copy overlap exact, cross-copy near zero),
so  SPARK_GRAFT_SF_DIR=BENCH/data/sf1 python bench.py  gives the linearity
curve; committed runs live in BENCH/bench_sf*.json.

The two-parallelism scaling evidence (1 vs 4 executors, images/sec,
efficiency >= 0.8) is the separate harness BENCH/cluster_scaling.py ->
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from tbdedup_spark.session import get_spark

# The headline set: the dedup core + detectors + training-data primitives +
# representative relational ops. Contract queries NOT here fall into four
# documented classes: (a) fixed-size in-query corpora that don't scale with
# $SPARK_GRAFT_SF_DIR (image/audio/video/streaming queries — their cost is
# constant by construction); (b) deliberate exclusions with their own
# evidence (leakage_safe_split = the benched dedup_clusters subtree + one
# projection; soft_dedup_weights / cluster_quality_representatives = the
# same subtree + one cheap aggregate/join tail over its localCheckpoint-
# backed labels; incremental_cluster_update = the same detector subtree +
# a history CC + a batch-scale merge whose scale evidence is the dedicated
# BENCH/incremental_scale.py harness; minhash_recall_block = a constant-size
# block probe (RECALL_BLOCK^2/2 comparisons by design) + the benched minhash
# subtree; embedding_neardup_pairs = the documented-saturation oracle
# variant, guarded); (c) pure-map text variants whose cost shape is the
# benched doc_fingerprint/quality_filter_chain (token_counts, lang_id,
# quality_scores, bpe_token_counts); (d) relational one-shots whose plan
# family is covered (anti_join/cube/rollup/set_ops/regex_filter/
# derived_key_group/scan_filter_project ~ group_agg/broadcast_join_agg;
# dual_hash_sanity/count_distinct_agg ~ exact_dedup; asof_join_tolerance
# ~ asof_join).
BENCH_QUERIES = [
    "exact_dedup_representatives",
    "minhash_lsh_pairs",
    "simhash_hamming_pairs",
    "substr_containment_pairs",
    "dedup_clusters",
    "ngram_jaccard_pairs",
    "editdist_pairs",
    "embedding_neardup_capped",
    "doc_fingerprint",
    "ngram_topk",
    "hapax_counts",
    "decontaminate_overlap",
    "decontaminate_ngram_join",
    "winnowing_fingerprints",
    "winnow_dup_pairs",
    "url_canonical_dedup",
    "tier_attribution",
    "html_text_extract",
    "crawl_dedup_pipeline",
    "bm25_topk",
    "bigram_lm_nll",
    "repetition_scores",
    "tiered_incremental_dedup",
    "snapshot_diff_dedup",
    "bloom_prefilter",
    "cdc_chunk_dedup",
    "dsir_importance_weights",
    "semdedup_prune",
    "paragraph_dedup",
    "stratified_sample",
    "quality_filter_chain",
    "pii_scrub",
    "domain_quota_sample",
    "pack_sequences",
    "token_budget_mix",
    "countmin_heavy_hitters",
    "kmv_distinct_sketch",
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "group_agg",
    "topk_per_group",
    "topk_per_group_salted",
    "rolling_agg",
    "asof_join",
    "broadcast_join_agg",
    "sessionize",
]


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))
    # Optional comma-separated subset for targeted re-measurement after a
    # single-query fix (full-list runs remain the reference numbers).
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = {q.strip() for q in only.split(",")}
        global BENCH_QUERIES
        BENCH_QUERIES = [q for q in BENCH_QUERIES if q in keep]
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("tbdedup_bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    queries = entry_mod.queries()

    # Session warm-up, excluded from the per-query timings: the first query
    # otherwise absorbs one-time JVM JIT + whole-stage-codegen compilation +
    # parquet footer caching (measured: exact_dedup 6.1s cold vs 0.4s warm
    # at sf0.1) — steady-state per-query cost is what BASELINE comparisons
    # track, same long-lived-session rationale as BENCH/cluster_run.py.
    from pyspark.sql import functions as F

    warm = spark.range(200_000).select(
        F.sha2(F.encode(F.col("id").cast("string"), "utf-8"), 256).alias("s"),
        F.md5(F.col("id").cast("string")).alias("m"),
    )
    warm.groupBy(F.substring("s", 1, 2)).count().write.mode("overwrite").format("noop").save()
    for t in ("documents", "embeddings", "orders", "lineitem", "events"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).write.mode("overwrite").format("noop").save()

    import gc

    def release() -> None:
        # Release localCheckpoint blocks left by the previous query: queries
        # checkpoint narrow signature/prefix relations, the Python refs die
        # when the query returns, but the JVM blocks are only dropped when
        # GC runs and ContextCleaner drains — without this, repeated
        # invocations accumulate block-manager memory and later work
        # degrades monotonically (measured: dedup_clusters 43.7s -> 152.5s
        # -> 252.0s across 3 un-GC'd trials; 80.9s -> 78.4s with the
        # explicit collect). Runs BETWEEN queries, not just between passes:
        # with pass-level-only release, a heavy query's blocks (union-find
        # label checkpoints) stay live while the NEXT query runs, and the
        # added old-gen pressure melted same-pass neighbors by >10x under
        # ambient load (ngram_jaccard_pairs 5.5s quiet-pass vs 319.7s in a
        # pass entered right after dedup_clusters). Outside the timed
        # region by construction — per-query steady-state cost is the
        # metric, so inter-query hygiene is methodology, not hidden cost.
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)  # let the async ContextCleaner drain

    def cpu_counters() -> list[int] | None:
        # Aggregate jiffies from /proc/stat line 1:
        # user nice system idle iowait irq softirq steal ...
        try:
            with open("/proc/stat") as f:
                return [int(x) for x in f.readline().split()[1:]]
        except (OSError, ValueError):
            return None

    def steal_pct(before: list[int] | None, after: list[int] | None) -> float | None:
        if before is None or after is None:
            return None
        delta = [b - a for a, b in zip(before, after)]
        tot = sum(delta)
        return round(100.0 * delta[7] / tot, 2) if tot > 0 and len(delta) > 7 else None

    samples: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    steals: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    for _trial in range(trials):
        for name in BENCH_QUERIES:
            c0 = cpu_counters()
            t0 = time.time()
            materialize(queries[name](spark, sf_dir))
            samples[name].append(time.time() - t0)
            sp = steal_pct(c0, cpu_counters())
            if sp is not None:
                steals[name].append(sp)
            release()

    timings = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    spread = {n: [round(min(s), 3), round(max(s), 3)] for n, s in samples.items()}
    total = sum(timings.values())
    # Sum of per-query MINIMA: ambient co-tenant load only ever ADDS wall
    # time, so the min across interleaved trials is the best available
    # steady-state engine-cost floor when a load burst outlasts a whole
    # pass and corrupts even the median (observed: a burst inflated one
    # ngram_jaccard_pairs trial 8.1s -> 160.3s in the same session).
    # "value" (sum of medians) stays the number of record.
    total_min = sum(v[0] for v in spread.values())
    # Hypervisor steal%% over each query's window, max across trials: this VM
    # sits on a shared host, and sustained steal turns straggler-gated
    # multi-round jobs (union-find label propagation: dozens of sequential
    # stages, each gated by its slowest task) into 3-4x outliers — measured
    # 22.8s at ~0.5%% steal vs 79.5s at 7-11%% steal for the SAME query in
    # the SAME session. Reporting it makes load luck attributable instead of
    # invisible (see BENCH/PLANS.md round-5 section).
    steal_max = (
        round(max(max(v) for v in steals.values() if v), 2)
        if any(steals.values())
        else None
    )

    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": round(total, 3),
                "value_min": round(total_min, 3),
                "unit": "sec",
                "queries": timings,
                "trials": trials,
                "spread": spread,
                "steal_pct_max": steal_max,
                "sf": sf,
                "warmup": True,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
