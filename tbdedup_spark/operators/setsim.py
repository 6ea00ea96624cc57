"""Exact token-set Jaccard similarity join via prefix filtering.

The round-1 implementation was a within-block all-pairs self-join — O(n²/L)
candidate rows each carrying two full token arrays through the shuffle;
correct at sf0.1 (36.6s, the #2 bench query), dead at 100×. This is the
classic replacement (Chaudhuri et al. SSJoin / Bayardo et al. "Scaling Up
All Pairs" / PPJoin): under ANY global total order on tokens, if
J(A, B) ≥ τ then A and B must share a token within their *prefixes* of
length |X| − ⌈τ·|X|⌉ + 1 (proof: |A∩B| ≥ τ·|A∪B| ≥ ⌈τ·|X|⌉ for each side;
if the prefixes were disjoint, every common token would have to sit in one
suffix of size ⌈τ|X|⌉ − 1 — pigeonhole contradiction). So:

    tokens → document-frequency total order (rarest first: smallest
    prefixes-postings lists) → explode prefixes → equi-join on
    (block, token) → exact |∩|/|∪| verify on the candidate pairs only.

Candidates are a provable superset of the τ-pairs; the exact verify makes
the result IDENTICAL to the brute-force oracle. The frequency relation is an
aggregate small enough for AQE to broadcast; hot (stopword-ish) prefix
tokens are sheared by AQE skew-join splitting. The generalization of the
reference's derived-key grouping (tbdedup/planner/walk.py:100-125) to a
similarity predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    tau: float,
    block_cols: tuple[str, ...] = (),
) -> DataFrame:
    """All (a_id, b_id, score) with token-set Jaccard ≥ tau (a_id < b_id),
    optionally restricted to pairs agreeing on ``block_cols`` (the oracle's
    same-lang semantic). ``tokens_col`` must already be distinct tokens."""
    blocks = list(block_cols)
    docs = df.select(
        F.col(id_col).alias("_id"), *blocks, F.col(tokens_col).alias("_toks")
    )

    # global order: (document frequency asc, token) — rare-first minimizes
    # candidate postings; any total order preserves the guarantee
    ex = docs.select("_id", *blocks, F.size("_toks").alias("_sz"), F.explode("_toks").alias("_tok"))
    freq = ex.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    # prefix length p = n - ceil(tau*n) + 1 (1e-9: don't let float noise
    # round an exact tau*n UP, which would shrink the prefix below the bound)
    p_len = (F.col("_sz") - F.ceil(F.lit(tau) * F.col("_sz") - F.lit(1e-9)) + 1).cast("int")
    prefix = (
        ex.join(freq, "_tok")
        .groupBy("_id", *blocks, "_sz")
        .agg(F.sort_array(F.collect_list(F.struct("_df", "_tok"))).alias("_ord"))
        .select(
            "_id", *blocks,
            F.explode(F.slice(F.col("_ord._tok"), F.lit(1), p_len)).alias("_tok"),
        )
    )

    cand = (
        prefix.select(F.col("_id").alias("a_id"), *blocks, "_tok")
        .join(prefix.select(F.col("_id").alias("b_id"), *blocks, "_tok"), ["_tok", *blocks])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )

    toks = docs.select("_id", "_toks")
    return (
        cand.join(toks.select(F.col("_id").alias("a_id"), F.col("_toks").alias("_ta")), "a_id")
        .join(toks.select(F.col("_id").alias("b_id"), F.col("_toks").alias("_tb")), "b_id")
        .withColumn(
            "score",
            F.size(F.array_intersect("_ta", "_tb"))
            / F.size(F.array_union("_ta", "_tb")).cast("double"),
        )
        .filter(F.col("score") >= tau)
        .select("a_id", "b_id", "score")
    )
