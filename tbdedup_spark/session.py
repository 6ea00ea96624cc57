"""SparkSession factory.

One place to configure the session so tests, bench, and spark-submit entry
points agree. Tuned for the sandbox (single-JVM local[N]) but every knob is
the one you would also set on a real 1000-executor cluster:

* AQE on (runtime re-plan, skew-join splitting, partition coalescing) — the
  scale path for hot LSH buckets;
* Arrow on — all Python stages are Arrow-batched pandas UDFs;
* shuffle partitions sized to cores locally; on a real cluster you would set
  this to ~2-3x total executor cores (or rely on AQE coalescing from a high
  initial value).

The reference had no equivalent — it was a single-process asyncio loop
(tbdedup/dedup/__init__.py:109-119); the Spark scheduler replaces it.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tbdedup_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default all
    cores). ``shuffle_partitions`` defaults to the local core count — at
    cluster scale you want a multiple of total cores instead; AQE coalesces
    downward either way.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        if master.startswith("local[") and master[6:-1].isdigit():
            n = int(master[6:-1])
        shuffle_partitions = n

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        # Pandas-UDF batches: large enough to amortize Arrow transfer, small
        # enough that a batch of decoded images fits comfortably in memory.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
