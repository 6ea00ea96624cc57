"""Scan-parallelism repair for small unsplittable inputs.

Heavy per-row map stages (shingle explode + md5, regex extraction chains,
higher-order-function aggregates) run at the SCAN's parallelism. A small
corpus packed into one parquet row group yields ONE input split no matter
what ``spark.sql.files.maxPartitionBytes`` says (parquet only splits at
row-group boundaries), so the whole CPU-bound stage runs on a single core —
measured 9.0s for the minhash signature build at sf0.1 (1 task) vs ~1s at
32-way parallelism (BENCH/dissect_r06.py, round 6).

``fan_out_small_scan`` is the adaptive form of the fix ``operators/cdc.py``
already shipped as a manual ``min_partitions`` knob: repartition up to the
session's default parallelism ONLY when the physical plan would yield fewer
partitions. At real corpus scale the scan has thousands of splits and this
is a structural no-op — the guard is what keeps the fix from turning into a
full-corpus shuffle at 100 TB (guide §2.4: remove shuffles outright; §6:
input split sizing). The keyless round-robin repartition is retry-safe:
``spark.sql.execution.sortBeforeRepartition`` (default on) pins the
row-to-partition assignment under task retries (SPARK-23207).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out_small_scan(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin ``df`` up to ``target`` partitions (default: the session's
    ``defaultParallelism``) iff its physical plan yields fewer — a no-op for
    well-split inputs, so callers can apply it unconditionally at every
    narrow-input → CPU-heavy-map boundary.

    Call it on the NARROW projection feeding the heavy stage (ids + the text
    column about to be exploded/hashed), never on a wide payload relation:
    the point is to move kilobytes once so megabytes of downstream compute
    parallelize.
    """
    spark = df.sparkSession
    if target is None:
        target = spark.sparkContext.defaultParallelism
    if target <= 1:
        return df
    try:
        # planning-only probe: no job runs, the RDD is never materialized.
        # JVM-side toRdd, NOT df.rdd — the PySpark property additionally
        # plans a javaToPython conversion stage (measured ~1.0s per fresh
        # DataFrame vs ~0.05s for the internal-row RDD).
        n = df._jdf.queryExecution().toRdd().getNumPartitions()
    except Exception:
        return df  # exotic plan the RDD conversion rejects — leave it alone
    return df.repartition(target) if n < target else df
