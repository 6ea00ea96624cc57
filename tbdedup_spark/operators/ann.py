"""Similarity search over embedding columns (array<float>).

Two paths, per the large-scale-training-pipeline contract:

* ``topk_bruteforce`` — exact cosine top-k for a (small) probe set against
  the full corpus: broadcast the probes, one pass over the corpus, window
  top-k. The baseline and the verifier for the approximate path. All
  built-in higher-order functions (functions/vectors.py), no UDFs.
* ``topk_lsh`` — random-hyperplane LSH bucketing (seeded deterministic
  projections baked as literals): probe and corpus rows meet only within
  matching signature buckets (optionally multi-probe over Hamming-1
  neighbors), cosine computed only inside buckets. The scale path: the
  cross product never materializes.
* ``neardup_pairs`` — embedding-cosine NEAR-DUP detection (all pairs with
  cosine >= tau), the fifth dedup detector: a 16-bit hyperplane signature
  (SimHash over the embedding) is banded with the pigeonhole machinery of
  ``operators.simhash``, so candidates come only from shared band buckets —
  complete for pairs within the contract's Hamming bound, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors
from . import simhash


def topk_bruteforce(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """(probe_id, neighbor_id, score, rank): exact cosine top-k per probe.

    Probes are broadcast (they are small by contract — ANN with a huge probe
    side should use ``topk_lsh``). Deterministic tie-break on neighbor id.
    """
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("_pv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        c.crossJoin(F.broadcast(p))
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .withColumn("score", vectors.cosine("_pv", "_cv"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", F.round("score", 6).alias("score"), "rank")
    )


def topk_lsh(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_bits: int = 12,
    dim: int = 64,
    seed: int = 42,
    multiprobe_hamming1: bool = True,
) -> DataFrame:
    """Approximate top-k: bucket on an n_bits hyperplane signature.

    ``multiprobe_hamming1`` also probes the n_bits signatures at Hamming
    distance 1 (flip each bit) — the standard recall boost that costs
    n_bits probe rows instead of a bigger index. Candidates are then scored
    exactly; output schema matches ``topk_bruteforce`` (rank within found
    candidates — recall < 1 by design, measured in tests vs brute force).
    """
    proj = vectors.seeded_projections(n_bits, dim, seed)
    sig = lambda df, idn, vn: df.select(
        F.col(id_col).alias(idn), F.col(vec_col).alias(vn),
        vectors.lsh_signature(vec_col, proj).alias("_sig"),
    )
    c = sig(corpus, "neighbor_id", "_cv")
    p = sig(probes, "probe_id", "_pv")
    if multiprobe_hamming1:
        flips = F.array(*[F.lit(0)] + [F.lit(1 << j) for j in range(n_bits)])
        p = p.select(
            "probe_id", "_pv", F.explode(flips).alias("_flip"), "_sig"
        ).select(
            "probe_id", "_pv", F.col("_sig").bitwiseXOR(F.col("_flip")).alias("_sig")
        )
    cand = (
        c.join(p, "_sig")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .dropDuplicates(["probe_id", "neighbor_id"])
        .withColumn("score", vectors.cosine("_pv", "_cv"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", F.round("score", 6).alias("score"), "rank")
    )


def neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tau: float = 0.9,
    n_bits: int = 16,
    dim: int = 64,
    seed: int = 42,
    max_hamming: int = 3,
    n_bands: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs: (a_id, b_id, score) with a < b,
    hamming(sig(a), sig(b)) <= max_hamming AND cosine(a, b) >= tau.

    The Hamming bound over the ``n_bits`` hyperplane signature IS part of the
    detector contract (the classic SimHash near-dup semantics), which is what
    makes the plan exact AND bucketed: pigeonhole banding (simhash.simhash_pairs,
    complete for max_hamming <= n_bands - 1) generates candidates from shared
    band buckets only — never an all-pairs join — and the cosine verify joins
    the two vectors back BY ID, so embeddings never ride through the band
    explode shuffle. ``max_bucket=None`` for oracle-exact queries; set a cap
    in pipelines (dropped buckets are the documented skew valve).

    This is the reference's canonical-signature match (hash-equality,
    tbdedup/dedup/__init__.py:109-118) relaxed to approximate vector equality;
    at 10^12 rows the bucketed self-join is the only viable shape.
    """
    proj = vectors.seeded_projections(n_bits, dim, seed)
    sigs = df.select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).alias("_v"),
        vectors.lsh_signature(vec_col, proj).alias("_esig"),
    )
    # signature relation is tiny (id + vec + long); reuse it for banding and
    # both verify joins without recomputing the n_bits dot products
    sigs = sigs.localCheckpoint()
    cand, _dropped = simhash.simhash_pairs(
        sigs.select("_vid", "_esig"),
        id_col="_vid",
        sig_col="_esig",
        max_hamming=max_hamming,
        n_bands=n_bands,
        width=n_bits,
        max_bucket=max_bucket,
        detector_name="embedding",
    )
    va = sigs.select(F.col("_vid").alias("a_id"), F.col("_v").alias("_va"))
    vb = sigs.select(F.col("_vid").alias("b_id"), F.col("_v").alias("_vb"))
    return (
        cand.select("a_id", "b_id")
        .join(va, "a_id")
        .join(vb, "b_id")
        .withColumn("score", F.round(vectors.cosine("_va", "_vb"), 6))
        .filter(F.col("score") >= tau)
        .select("a_id", "b_id", "score")
    )
