"""Verify-on-write — the integrity filter (reference O13).

The reference re-reads each representative's byte range from disk, re-hashes,
and quarantines mismatches instead of aborting
(tbdedup/dedup/__init__.py:142-151, quarantine file at :146-149). Our analog
(north_rule invariant): every cluster member must relate to its
representative by decoded-pixel PSNR ≥ 40 dB (allclose for lossless) OR
caption near-duplication (the member may have joined via a caption detector).
Rows failing both are quarantined to their own table and excluded from the
final clusters — verified output, never trusted candidates.

This is the ONLY stage that touches ``bytes`` after ingest, and it joins
bytes back by id at the last moment (late materialization; shuffles before
this point moved only ids/signatures). The pixel comparison is an
Arrow-batched pandas UDF (decode is C-backed zlib/numpy per image); the
caption check is built-in array ops.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .. import codecs


def _psnr_fn(a: pd.Series, b: pd.Series) -> pd.Series:
    out = []
    for x, y in zip(a, b):
        try:
            px, py = codecs.decode_image(bytes(x)), codecs.decode_image(bytes(y))
            v = codecs.psnr(px, py)
            out.append(1e9 if v == float("inf") else v)
        except Exception:
            out.append(0.0)
    return pd.Series(out)


_psnr_cached = None


def _psnr_udf(a, b):
    # pandas_udf registration needs an active session → create lazily
    global _psnr_cached
    if _psnr_cached is None:
        _psnr_cached = pandas_udf(_psnr_fn, "double")
    return _psnr_cached(a, b)


def check_members(
    clusters: DataFrame,
    images: DataFrame,
    min_psnr_db: float = 40.0,
    caption_tau: float = 0.5,
) -> DataFrame:
    """The expensive half: one pass computing per-member invariants
    (psnr_db, cap_sim, cap_contain, ok) vs the representative. Narrow output —
    pipeline checkpoints it so verified/quarantine splits don't re-decode.

    ``clusters``: (image_id, cluster_id, is_representative);
    ``images``: full IMAGES table. Representative rows pass by definition.
    """
    members = clusters.filter(~F.col("is_representative"))
    reps = clusters.filter(F.col("is_representative")).select(
        F.col("cluster_id"), F.col("image_id").alias("_rep_id")
    )
    img_narrow = images.select("image_id", "bytes", "caption")
    joined = (
        members.join(reps, "cluster_id")
        .join(img_narrow.withColumnRenamed("bytes", "_mb").withColumnRenamed("caption", "_mc"), "image_id")
        .join(
            img_narrow.select(
                F.col("image_id").alias("_rep_id"),
                F.col("bytes").alias("_rb"),
                F.col("caption").alias("_rc"),
            ),
            "_rep_id",
        )
    )
    toks = lambda c: F.array_distinct(F.split(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")), " "))
    checked = joined.withColumn("_psnr", _psnr_udf("_mb", "_rb")).withColumn(
        "_cap_sim",
        F.size(F.array_intersect(toks(F.col("_mc")), toks(F.col("_rc"))))
        / F.greatest(F.size(F.array_union(toks(F.col("_mc")), toks(F.col("_rc")))), F.lit(1)).cast("double"),
    ).withColumn(
        "_cap_contain",
        F.col("_mc").contains(F.col("_rc")) | F.col("_rc").contains(F.col("_mc")),
    )
    ok = (F.col("_psnr") >= min_psnr_db) | (F.col("_cap_sim") >= caption_tau) | F.col("_cap_contain")
    return checked.select(
        "image_id",
        "cluster_id",
        F.round("_psnr", 2).alias("psnr_db"),
        F.round("_cap_sim", 3).alias("cap_sim"),
        F.col("_cap_contain").alias("cap_contain"),
        ok.alias("ok"),
    )


def split_verified(clusters: DataFrame, checked: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(verified CLUSTERS rows, QUARANTINE rows) from a materialized
    ``check_members`` output — the cheap half."""
    verified = checked.filter("ok").select(
        "image_id", "cluster_id", F.lit(False).alias("is_representative")
    )
    quarantined = checked.filter(~F.col("ok")).select(
        "image_id",
        "cluster_id",
        F.concat(
            F.lit("psnr="), F.col("psnr_db").cast("string"),
            F.lit(" cap_sim="), F.col("cap_sim").cast("string"),
        ).alias("reason"),
    )
    reps_rows = clusters.filter(F.col("is_representative"))
    return reps_rows.unionByName(verified), quarantined


def verify_members(
    clusters: DataFrame,
    images: DataFrame,
    min_psnr_db: float = 40.0,
    caption_tau: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """One-call convenience: check (materialized once) + split."""
    checked = check_members(clusters, images, min_psnr_db, caption_tau).localCheckpoint()
    return split_verified(clusters, checked)
