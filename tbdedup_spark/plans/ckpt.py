"""Stats-hygienic local checkpoints for ITERATED plans.

``Dataset.localCheckpoint`` truncates lineage but **preserves the
checkpointed plan's size estimate** in the resulting ``LogicalRDD`` leaf
(``LogicalRDD.fromDataset`` copies ``originStats``; Spark 4.1.2,
sql/core ExistingRDD.scala). For a one-shot checkpoint that is a feature —
downstream planning sees a realistic size. For an ITERATED plan it is a
time bomb: Catalyst's fallback size estimate for a join is the *product*
of its children's sizes (``SizeInBytesOnlyStatsPlanVisitor.default``), so
an algorithm that checkpoints a self-join of the previous checkpoint
compounds the estimate multiplicatively per round. The BigInteger holding
``sizeInBytes`` grows to ``O(m^k)`` bits after k rounds of a plan with
leaf multiplicity m — and every optimizer rule that asks for stats
(``InjectRuntimeFilter.isProbablyShuffleJoin`` → ``canBroadcastBySize``,
join selection, AQE explain) then multiplies multi-megabit integers via
Toom-Cook on the DRIVER. Measured here: union-find on a 400-node graph
went from seconds to >30 *minutes*, 100% driver CPU inside
``BigInteger.multiply`` during ``localCheckpoint``'s explainString pass.

``local_checkpoint_fresh_stats`` is the cure for iterated checkpoints: it
localCheckpoints, then rebuilds the ``LogicalRDD`` leaf with
``originStats=None`` (and ``originConstraints=None``) so the leaf reports
the session default size (``Long.MaxValue``, a constant 63-bit value)
instead of the compounded product. Output attributes, the materialized
RDD, output partitioning, and ordering are all preserved — the physical
plan is identical to a plain ``localCheckpoint`` (verified: the same
post-checkpoint Exchange appears either way), only the *estimate* is
reset. With AQE on, runtime join strategy comes from actual shuffle sizes,
so dropping the estimate costs nothing; explicit ``F.broadcast`` hints are
unaffected.

Use it wherever a checkpoint's input plan contains a previous checkpoint
of the same relation (fixpoint loops). Keep plain ``localCheckpoint`` for
one-shot materializations, where the carried estimate is bounded and can
help initial planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def local_checkpoint_fresh_stats(df: DataFrame) -> DataFrame:
    """``df.localCheckpoint()`` with the carried size estimate reset.

    Falls back to the plain checkpoint if the JVM plan shape is not the
    expected ``LogicalRDD`` leaf (e.g. a future Spark changes the
    checkpoint representation, or a Connect session has no ``_jdf``) —
    correctness never depends on the reset, only planning latency does.
    """
    ckpt = df.localCheckpoint()
    try:
        jdf = ckpt._jdf
        node = jdf.queryExecution().analyzed()
        if not node.getClass().getName().endswith("LogicalRDD"):
            return ckpt
        spark = df.sparkSession
        none = spark._jvm.scala.Option.empty()
        fresh = node.copy(
            node.output(),
            node.rdd(),
            node.outputPartitioning(),
            node.outputOrdering(),
            node.isStreaming(),
            node.stream(),
            spark._jsparkSession,
            none,  # originStats: the compounding channel — reset
            none,  # originConstraints: private accessor; safe to drop
        )
        jnew = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            jdf.sparkSession(), fresh
        )
        return DataFrame(jnew, spark)
    except Exception:
        return ckpt


def plan_size_bits(df: DataFrame) -> int:
    """Bit length of the optimized plan's sizeInBytes estimate — the
    regression probe for the compounding bug (tests assert it stays small
    across union-find iterations)."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()).bit_length()
