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
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Per-member invariants (psnr_db, cap_sim, cap_contain, ok) vs the
    representative — LAZILY: the invariant is (pixel-dup OR caption-dup), so
    the expensive half (shuffling image bytes + decoding for PSNR) runs only
    for the residual that the cheap checks cannot prove:

      1. canonical signatures equal          -> pixels identical, PSNR = inf
         (no decode; the reference's byte-range re-read analog short-cut)
      2. caption equal / contained / token-overlap >= tau -> caption-dup
      3. residual only: join bytes by id, decode both sides, exact PSNR

    At web scale this is the difference between shuffling the ENTIRE image
    corpus twice per run and shuffling a sliver: members that need pixel
    proof are typically phash-detected re-encodes whose captions differ —
    rare by construction.

    ``clusters``: (image_id, cluster_id, is_representative);
    ``images``: full IMAGES table; ``sigs``: optional SIGNATURES relation
    (computed from images when absent).
    """
    if sigs is None:
        from . import exact as _exact

        sigs = _exact.signatures(images)
    narrow = sigs.select("image_id", "sig", "caption")

    members = clusters.filter(~F.col("is_representative"))
    reps = clusters.filter(F.col("is_representative")).select(
        F.col("cluster_id"), F.col("image_id").alias("_rep_id")
    )
    toks = lambda c: F.array_distinct(F.split(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")), " "))
    cheap = (
        members.join(reps, "cluster_id")
        .join(
            narrow.withColumnRenamed("sig", "_ms").withColumnRenamed("caption", "_mc"),
            "image_id",
        )
        .join(
            narrow.select(
                F.col("image_id").alias("_rep_id"),
                F.col("sig").alias("_rs"),
                F.col("caption").alias("_rc"),
            ),
            "_rep_id",
        )
        .withColumn("_sig_eq", F.col("_ms") == F.col("_rs"))
        # Empty/whitespace captions carry NO duplicate evidence and must not
        # take the cheap path (review catch: contains('') is always true, so
        # an empty representative caption would approve EVERY member — and
        # toks('') is [''], making two empty captions similarity-1.0). Gate
        # both caption branches on non-emptiness; empty-captioned members
        # fall through to the PSNR pixel proof.
        # coalesce(..., False): a NULL caption (schema says non-nullable, but
        # precondition-level holes must not silently drop rows) makes _cap_ev
        # NULL, _cap_contain NULL, and cheap_ok NULL — a row neither
        # filter(cheap_ok) nor filter(~cheap_ok) keeps, i.e. it would VANISH
        # from the checked output. With the coalesce a NULL caption falls
        # through to the PSNR pixel proof exactly like an empty one (ADVICE r5).
        .withColumn(
            "_cap_ev",
            F.coalesce(
                (F.length(F.trim("_mc")) > 0) & (F.length(F.trim("_rc")) > 0),
                F.lit(False),
            ),
        )
        .withColumn(
            "_cap_sim",
            F.when(
                F.col("_cap_ev"),
                F.size(F.array_intersect(toks(F.col("_mc")), toks(F.col("_rc"))))
                / F.greatest(F.size(F.array_union(toks(F.col("_mc")), toks(F.col("_rc")))), F.lit(1)).cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "_cap_contain",
            F.col("_cap_ev")
            & (F.col("_mc").contains(F.col("_rc")) | F.col("_rc").contains(F.col("_mc"))),
        )
    )
    cheap_ok = (
        F.col("_sig_eq") | (F.col("_cap_sim") >= caption_tau) | F.col("_cap_contain")
    )
    # Materialize the NARROW relation once: it feeds three consumers (proven
    # rows, the residual, and the residual's id list) — without this the
    # token-array join DAG re-executes per consumer. No bytes in it.
    cheap = cheap.select(
        "image_id", "cluster_id", "_rep_id", "_sig_eq", "_cap_sim", "_cap_contain"
    ).localCheckpoint()
    proven = cheap.filter(cheap_ok).select(
        "image_id",
        "cluster_id",
        F.col("_rep_id").alias("rep_id"),
        F.when(F.col("_sig_eq"), F.lit(1e9)).otherwise(F.lit(None)).alias("psnr_db"),
        F.round("_cap_sim", 3).alias("cap_sim"),
        F.col("_cap_contain").alias("cap_contain"),
        F.lit(True).alias("ok"),
    )

    residual = cheap.filter(~cheap_ok).select("image_id", "cluster_id", "_rep_id", "_cap_sim", "_cap_contain")
    # Bytes fetch for the residual ONLY, as one broadcast-semi-filtered scan:
    # joining the full images table against a 0.1%-sized residual would
    # otherwise shuffle the entire bytes column (measured: the verify stage
    # spent ~20s re-scanning+joining a 4.2 GB corpus for 276 residual rows).
    # The id list is tiny (2 ids per residual row), the scan happens once,
    # and the resulting narrow bytes relation is small enough for AQE to
    # broadcast into both sides of the residual join.
    ids = (
        residual.select(F.col("image_id").alias("_fid"))
        .unionByName(residual.select(F.col("_rep_id").alias("_fid")))
        .distinct()
        .withColumnRenamed("_fid", "image_id")
    )
    # The residual id set is tiny by construction (cheap proofs cover ~99.9%
    # of members), so push it down as an isin FILTER: parquet row-group stats
    # + column-index page pruning then skip most of the bytes pages, where a
    # broadcast semi-join must decompress the full bytes column (measured on
    # a 17 GB corpus, 1190 residual ids: 33.5s semi-join scan vs 12.3s
    # pushdown). Fallback to the semi-join if the residual is abnormally
    # large (corrupt corpus) — an isin literal list has driver-size limits.
    # take(cap+1), never collect(): on exactly the corrupt corpus the guard
    # exists for, an unbounded collect would pull the whole id set into the
    # driver before the fallback could trigger.
    id_rows = [r.image_id for r in ids.take(100_001)]
    if len(id_rows) <= 100_000:
        img_bytes = (
            images.filter(F.col("image_id").isin(id_rows))
            .select("image_id", "bytes")
            .localCheckpoint()
        )
    else:
        img_bytes = (
            images.join(F.broadcast(ids), "image_id", "left_semi")
            .select("image_id", "bytes")
            .localCheckpoint()
        )
    decoded = (
        residual.join(img_bytes.withColumnRenamed("bytes", "_mb"), "image_id")
        .join(
            img_bytes.select(F.col("image_id").alias("_rep_id"), F.col("bytes").alias("_rb")),
            "_rep_id",
        )
        .withColumn("_psnr", _psnr_udf("_mb", "_rb"))
        .select(
            "image_id",
            "cluster_id",
            F.col("_rep_id").alias("rep_id"),
            F.round("_psnr", 2).alias("psnr_db"),
            F.round("_cap_sim", 3).alias("cap_sim"),
            F.col("_cap_contain").alias("cap_contain"),
            (F.col("_psnr") >= min_psnr_db).alias("ok"),
        )
    )
    return proven.unionByName(decoded)


def split_verified(
    clusters: DataFrame,
    checked: DataFrame,
    images: DataFrame | None = None,
    evidence_cap: int = 1 << 20,
) -> tuple[DataFrame, DataFrame]:
    """(verified CLUSTERS rows, QUARANTINE rows) from a materialized
    ``check_members`` output — the cheap half.

    When ``images`` is given, each quarantine row carries the failing
    member's bytes (size-capped at ``evidence_cap``) — parity with the
    reference preserving the mismatched record as a standalone
    ``<hash>.orig-<id>.mboxrecord`` artifact
    (tbdedup/dedup/__init__.py:146-149): the row alone reproduces the
    mismatch offline (decode evidence_bytes, decode the rep via rep_id,
    recompute PSNR) without re-running the join."""
    verified = checked.filter("ok").select(
        "image_id", "cluster_id", F.lit(False).alias("is_representative")
    )
    quarantined = checked.filter(~F.col("ok")).select(
        "image_id",
        "cluster_id",
        "rep_id",
        F.concat(
            F.lit("psnr="), F.col("psnr_db").cast("string"),
            F.lit(" cap_sim="), F.col("cap_sim").cast("string"),
        ).alias("reason"),
        F.col("psnr_db"),
        F.col("cap_sim"),
    )
    quarantined = attach_evidence(quarantined, images, evidence_cap)
    reps_rows = clusters.filter(F.col("is_representative")).select(
        "image_id", "cluster_id", "is_representative"
    )
    return reps_rows.unionByName(verified), quarantined


def attach_evidence(
    quarantined: DataFrame, images: DataFrame | None, evidence_cap: int = 1 << 20
) -> DataFrame:
    """Left-join the failing member's bytes (size-capped) as evidence_bytes.
    ``images=None`` keeps the column (null) so the QUARANTINE schema is
    stable. Quarantine is rare by construction, so the broadcast-semi
    filtered scan is a sliver of the corpus."""
    if images is None:
        return quarantined.withColumn("evidence_bytes", F.lit(None).cast("binary"))
    # same isin pushdown as check_members' residual fetch: quarantine is rare
    # by construction, so the literal id list lets parquet skip bytes pages
    # instead of decompressing the full column for a semi-join. take(cap+1),
    # never collect() — the driver must not hold an unbounded id list on the
    # corrupt corpus the semi-join fallback exists for.
    id_rows = [r.image_id for r in quarantined.select("image_id").distinct().take(100_001)]
    if len(id_rows) <= 100_000:
        src = images.filter(F.col("image_id").isin(id_rows))
    else:
        ids = quarantined.select("image_id").distinct()
        src = images.join(F.broadcast(ids), "image_id", "left_semi")
    ev = src.select(
        "image_id",
        F.when(F.length("bytes") <= evidence_cap, F.col("bytes")).alias("evidence_bytes"),
    )
    return quarantined.join(ev, "image_id", "left")


def verify_members(
    clusters: DataFrame,
    images: DataFrame,
    min_psnr_db: float = 40.0,
    caption_tau: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """One-call convenience: check (materialized once) + split.

    COST NOTE: with no ``sigs`` parameter, check_members recomputes the
    full signature relation INCLUDING the whole-corpus canonical pixel
    decode. The pipeline (plans/pipeline.py stage H) calls the pair
    directly with its committed ``sigs_ok`` to avoid that second decode —
    do the same anywhere the signatures already exist."""
    checked = check_members(clusters, images, min_psnr_db, caption_tau).localCheckpoint()
    return split_verified(clusters, checked, images=images)
