"""Storage bucketing (sources/bucketed.py): the plan property is the
product — aggregates and co-bucketed joins on the bucket key must plan
with NO Exchange, while the identical plain-parquet plans DO shuffle, and
both paths must agree on results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tbdedup_spark.sources.bucketed import (
    drop_table,
    physical_plan,
    plans_shuffle,
    write_bucketed,
)


@pytest.fixture()
def sig_tables(spark, tmp_path):
    """A history and a batch signature relation, persisted twice: bucketed
    by sig (8 buckets) and as plain parquet."""
    base = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        # 499 is coprime to the %5 batch/history split below, so every sig
        # group straddles both sides and the join is non-empty
        F.md5((F.col("id") % 499).cast("string")).alias("sig"),
    )
    hist = base.filter(F.col("doc_id") % 5 != 0)
    batch = base.filter(F.col("doc_id") % 5 == 0)
    names = ("t_bkt_hist", "t_bkt_batch")
    bh = write_bucketed(hist, names[0], "sig", 8, path=str(tmp_path / "h"))
    bb = write_bucketed(batch, names[1], "sig", 8, path=str(tmp_path / "b"))
    hist.write.mode("overwrite").parquet(str(tmp_path / "hp"))
    batch.write.mode("overwrite").parquet(str(tmp_path / "bp"))
    ph = spark.read.parquet(str(tmp_path / "hp"))
    pb = spark.read.parquet(str(tmp_path / "bp"))
    yield bh, bb, ph, pb
    for n in names:
        drop_table(spark, n)


def test_bucketed_aggregate_plans_no_exchange(spark, sig_tables):
    bh, _, ph, _ = sig_tables
    agg_b = bh.groupBy("sig").agg(F.count(F.lit(1)).alias("n"))
    agg_p = ph.groupBy("sig").agg(F.count(F.lit(1)).alias("n"))
    assert not plans_shuffle(agg_b), physical_plan(agg_b)
    assert plans_shuffle(agg_p), "plain parquet aggregate must shuffle"
    assert sorted(map(tuple, agg_b.collect())) == sorted(map(tuple, agg_p.collect()))


def test_cobucketed_join_plans_no_exchange(spark, sig_tables):
    """The day-2 join: batch vs history on sig. Co-bucketed tables must
    sort-merge join with neither Exchange nor per-side Sort; the plain
    path shuffles both sides."""
    bh, bb, ph, pb = sig_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        jb = bb.join(bh, "sig").select(bb.doc_id.alias("new_id"), bh.doc_id.alias("hist_id"))
        jp = pb.join(ph, "sig").select(pb.doc_id.alias("new_id"), ph.doc_id.alias("hist_id"))
        plan = physical_plan(jb)
        assert "Exchange" not in plan, plan
        assert plans_shuffle(jp), "plain parquet join must shuffle"
        assert jb.count() == jp.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_roundtrip_preserves_rows(spark, sig_tables):
    bh, _, ph, _ = sig_tables
    assert sorted(map(tuple, bh.collect())) == sorted(map(tuple, ph.collect()))


def test_write_bucketed_validates_bucket_count(spark):
    with pytest.raises(ValueError):
        write_bucketed(spark.range(1), "t_bad", "id", 0)
