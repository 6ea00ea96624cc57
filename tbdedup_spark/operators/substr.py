"""Detector 3 — exact-substring caption containment.

Semantics: emit (a, b) when the normalized caption of one is a strict
substring of the other's (unequal strings). The generalization of the
reference's exact-prefix folder grouping (path-suffix keys,
tbdedup/planner/walk.py:100-125) to content containment.

Two implementations:

* ``containment_pairs`` (default, complete): min-shingle probe against an
  inverted shingle index. If short ⊆ long, every k-shingle of short is a
  shingle of long, so short's *minimum* shingle hash appears in long's
  shingle set — probing with 1 row/doc against the exploded index finds every
  containment (recall 1), and a built-in ``contains()`` filter removes hash
  coincidences (precision 1). Cost: the index is ~total-chars rows; at
  10^12-doc scale set ``winnow_w`` > 1 to keep only window-minimal shingles
  (MOSS winnowing) — guarantees retention of any match of length
  ≥ k + winnow_w - 1, shrinking the index ~winnow_w×. The probe side stays
  one row per doc either way, so the join is a skew-tolerant hash join on a
  60-bit key.

* ``containment_pairs_sa`` (dense-bucket path): per-bucket generalized
  suffix array built in numpy inside ``applyInPandas`` — the north_rule's
  suffix-array requirement made real. Used when buckets are dense enough
  that within-bucket SA search beats the global index join; results are
  identical (tested against brute force).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import text


def _exploded_hashes(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(_id, _i, _h): shingle-position hashes, explode-first (see
    minhash.exploded_shingles for why arrays-of-substrings are a trap:
    projection collapse re-evaluates the normalization per shingle)."""
    base = df.select(
        F.col(id_col).alias("_id"),
        text.norm_text(text_col).alias("_norm"),
    )
    pos = base.select(
        "_id", "_norm",
        F.explode(F.expr(f"sequence(0, greatest(length(_norm) - {k}, 0))")).alias("_i"),
    )
    # crc32: the probe/index hash is internal (both sides use the same fn)
    # and contains() removes collisions — throughput-grade is always safe here
    return pos.select(
        "_id", "_i", text.hash32(F.expr(f"substring(_norm, _i + 1, {k})")).alias("_h")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "image_id",
    text_col: str = "caption",
    k: int = 5,
    winnow_w: int = 1,
) -> DataFrame:
    """Complete containment detection: probe min-shingle vs inverted index."""
    base = df.select(
        F.col(id_col).alias("_id"),
        text.norm_text(text_col).alias("_norm"),
    )
    hashes = _exploded_hashes(df, id_col, text_col, k)

    # probe: 1 row per doc — its minimum shingle hash
    probe = (
        hashes.groupBy("_id").agg(F.min("_h").alias("_mh"))
        .join(base, "_id")
        .select(
            F.col("_id").alias("short_id"),
            F.col("_norm").alias("short_norm"),
            "_mh",
        )
    )

    # index: distinct shingle hashes per doc (optionally winnowed)
    if winnow_w > 1:
        # classic winnowing: keep hash at position i iff it is minimal within
        # the window [i, i+w) — per-doc bounded window (docs are short), so
        # the partition-by-doc window is skew-safe here unlike bucket windows
        w = Window.partitionBy("_id").orderBy("_i").rowsBetween(0, winnow_w - 1)
        kept = (
            hashes.withColumn("_wmin", F.min("_h").over(w))
            .filter(F.col("_h") == F.col("_wmin"))
            .select("_id", "_h")
            .dropDuplicates(["_id", "_h"])
        )
    else:
        kept = hashes.select("_id", "_h").dropDuplicates(["_id", "_h"])
    index = kept.join(base, "_id").select(
        F.col("_id").alias("long_id"),
        F.col("_norm").alias("long_norm"),
        F.col("_h").alias("_mh"),
    )

    cand = probe.join(index, "_mh").filter(F.col("short_id") != F.col("long_id"))
    verified = cand.filter(
        (F.col("short_norm") != F.col("long_norm"))
        & F.col("long_norm").contains(F.col("short_norm"))
    )
    return (
        verified.select(
            F.least("short_id", "long_id").alias("a_id"),
            F.greatest("short_id", "long_id").alias("b_id"),
            F.lit("substr").alias("detector"),
            F.lit(1.0).alias("score"),
        )
        .dropDuplicates(["a_id", "b_id"])
    )


# --- suffix-array variant -----------------------------------------------------

_SA_SCHEMA = T.StructType(
    [
        T.StructField("a_id", T.StringType()),
        T.StructField("b_id", T.StringType()),
        T.StructField("detector", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def _sa_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    """Generalized suffix array over one bucket's docs (numpy argsort of all
    suffixes of the concatenated text); binary-search each doc's full string
    to find enclosing docs. O(total_len log total_len) per bucket."""
    ids = pdf["_id"].tolist()
    norms = pdf["_norm"].tolist()
    sep = "\x00"
    concat = sep.join(norms) + sep
    # doc-id per character position
    owner = np.empty(len(concat), dtype=np.int32)
    starts = []
    pos = 0
    for i, s in enumerate(norms):
        starts.append(pos)
        owner[pos : pos + len(s) + 1] = i
        pos += len(s) + 1
    # suffix array via numpy lexsort on rank-doubling (simple O(n log^2 n))
    n = len(concat)
    arr = np.frombuffer(concat.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    rank = arr.copy()
    sa = np.argsort(rank, kind="stable")
    tmp = np.empty(n, dtype=np.int64)
    k = 1
    while k < n:
        key2 = np.where(np.arange(n) + k < n, np.roll(rank, -k), -1)
        order = np.lexsort((key2, rank))
        sa = order
        tmp[sa[0]] = 0
        prev_same = (rank[sa[1:]] == rank[sa[:-1]]) & (key2[sa[1:]] == key2[sa[:-1]])
        tmp[sa[1:]] = np.cumsum(~prev_same)
        rank = tmp.copy()
        if rank[sa[-1]] == n - 1:
            break
        k *= 2
    # for each doc, binary-search its string among suffixes; any suffix with a
    # different owner whose prefix equals the doc string => containment
    suffix_at = lambda i: concat[i:]
    out = []
    sa_list = sa.tolist()
    for di, s in enumerate(norms):
        if not s:
            continue
        target = s
        lo, hi = 0, n
        # lower bound of suffixes >= target
        while lo < hi:
            mid = (lo + hi) // 2
            if concat[sa_list[mid] : sa_list[mid] + len(target)] < target:
                lo = mid + 1
            else:
                hi = mid
        j = lo
        seen = set()
        while j < n:
            p = sa_list[j]
            if concat[p : p + len(target)] != target:
                break
            oj = int(owner[p])
            if oj != di and oj not in seen and norms[oj] != s:
                seen.add(oj)
                a, b = sorted((ids[di], ids[oj]))
                out.append((a, b, "substr", 1.0))
            j += 1
    if not out:
        return pd.DataFrame(columns=["a_id", "b_id", "detector", "score"])
    return pd.DataFrame(out, columns=["a_id", "b_id", "detector", "score"]).drop_duplicates()


def containment_pairs_sa(
    df: DataFrame,
    id_col: str = "image_id",
    text_col: str = "caption",
    k: int = 5,
    bucket_col: str | None = None,
) -> DataFrame:
    """Suffix-array containment within buckets via applyInPandas.

    ``bucket_col=None`` buckets by the min-shingle hash — short ⊆ long no
    longer guarantees same min-shingle *bucket* unless the long doc is
    indexed under every shingle, so for completeness this variant buckets by
    probe semantics: each doc contributes its full row to every bucket keyed
    by its bottom-1 hash AND long docs are replicated to candidate buckets.
    For simplicity and exactness we replicate longs by all their shingle
    hashes that are some doc's bottom-1 (semi-join), keeping bucket contents
    small. Identical output to ``containment_pairs``.
    """
    base = df.select(
        F.col(id_col).alias("_id"),
        text.norm_text(text_col).alias("_norm"),
    )
    hashes = _exploded_hashes(df, id_col, text_col, k)
    probe = (
        hashes.groupBy("_id").agg(F.min("_h").alias("_bkt")).join(base, "_id")
        .select("_id", "_norm", "_bkt")
    )
    probe_keys = probe.select(F.col("_bkt")).distinct()
    longs = (
        hashes.select("_id", F.col("_h").alias("_bkt")).dropDuplicates(["_id", "_bkt"])
        .join(probe_keys, "_bkt", "left_semi")
        .join(base, "_id")
        .select("_id", "_norm", "_bkt")
    )
    members = probe.unionByName(longs).dropDuplicates(["_bkt", "_id"])
    return (
        members.groupBy("_bkt")
        .applyInPandas(lambda pdf: _sa_bucket(pdf), schema=_SA_SCHEMA)
        .dropDuplicates(["a_id", "b_id"])
    )
