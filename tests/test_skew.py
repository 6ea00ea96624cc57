"""Skew handling: the three bucket regimes of minhash.candidate_pairs
(plain / salted / dropped+reported) — the north_rule's skew ladder."""

from pyspark.sql import functions as F

from tbdedup_spark.operators import minhash


def _banded(spark, n_hot, n_cold):
    """n_hot docs in ONE bucket + n_cold singleton buckets."""
    rows = [(f"h{i:04d}", 0, "HOT") for i in range(n_hot)]
    rows += [(f"c{i:04d}", 0, f"cold{i}") for i in range(n_cold)]
    return spark.createDataFrame(rows, ["_id", "band_idx", "band_key"])


def test_salted_bucket_pairs_complete(spark):
    """Salted regime must produce exactly the full within-bucket pair set."""
    banded = _banded(spark, n_hot=60, n_cold=10)
    pairs, dropped = minhash.candidate_pairs(
        banded, max_bucket=16, salt_cap=128, salt_chunks=4
    )
    got = {(r.a_id, r.b_id) for r in pairs.collect()}
    hot_ids = sorted(f"h{i:04d}" for i in range(60))
    expect = {(a, b) for i, a in enumerate(hot_ids) for b in hot_ids[i + 1 :]}
    assert got == expect  # all 1770 pairs, none lost to chunk ordering
    assert dropped.count() == 0


def test_oversized_bucket_dropped_and_reported(spark):
    banded = _banded(spark, n_hot=200, n_cold=5)
    pairs, dropped = minhash.candidate_pairs(
        banded, max_bucket=16, salt_cap=128, salt_chunks=4
    )
    assert pairs.count() == 0  # hot bucket over salt_cap, cold are singletons
    d = dropped.collect()
    assert len(d) == 1 and d[0].bucket_size == 200  # reported, not silent


def test_no_salting_default_unchanged(spark):
    banded = _banded(spark, n_hot=60, n_cold=10)
    pairs, dropped = minhash.candidate_pairs(banded, max_bucket=16)
    assert pairs.count() == 0
    assert dropped.collect()[0].bucket_size == 60
