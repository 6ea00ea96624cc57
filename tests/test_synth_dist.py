"""Distributed corpus generation must equal driver-side generation exactly,
under any partitioning (the determinism contract of synth.rows_for_base)."""

from tbdedup_spark import synth
from tbdedup_spark.synth_dist import images_distributed


def test_distributed_equals_sequential(spark):
    n = 25
    seq = sorted(
        (r.image_id, r.data, r.w, r.h, r.fmt, r.caption, r.phash)
        for r in synth.generate_corpus(n, seed=42)
    )
    for parts in (1, 7):
        dist = sorted(
            (r.image_id, bytes(r["bytes"]), r.w, r.h, r.fmt, r.caption, r.phash)
            for r in images_distributed(spark, n, seed=42, partitions=parts).collect()
        )
        assert dist == seq
