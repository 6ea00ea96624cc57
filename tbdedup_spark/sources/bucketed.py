"""Storage-level bucketing for the signature tables that repeated dedup
runs keep re-joining.

The day-2 deployment shape (operators/incremental.py, SURVEY round-5
addenda) re-joins every incoming batch against the HISTORY signature
relation — by exact signature, then by LSH band key. Stored as plain
parquet, history pays a full shuffle on every one of those joins and
groupBys, at 100 TB the single dominant recurring cost. Persisting the
table with Spark storage bucketing (``DataFrameWriter.bucketBy`` +
``sortBy``) pre-hashes rows into a fixed number of bucket files ON DISK:
scans of the table then report a ``HashPartitioning`` output that Catalyst
recognizes, so

- aggregations keyed on the bucket key plan with NO Exchange at all, and
- joins between two tables bucketed the same way (same key, same bucket
  count) plan as shuffle-free sort-merge joins — the batch side is
  bucketed once at its (small) size, the history side never moves again.

This is the Spark-native analog of the reference's persistent hash INDEX
on its catalog database (/root/reference/tbdedup — the SQLite hashes
table's index serves every later lookup without a re-scan): pay the
organization cost once at write, amortize it over every subsequent run.

Bucketed tables require the session catalog (``saveAsTable``); pass
``path`` to keep the data in an external location instead of the
warehouse. Bucket count is part of the table's physical contract — both
sides of a co-located join must agree on it, so pick it for the TARGET
scale (buckets ~ total cores at peak; 2048 for a 1000-executor cluster)
and keep it stable across runs.

tests/test_bucketed.py pins the plan property itself: no Exchange under
the bucketed aggregate and the bucketed-bucketed join, Exchange present
on the identical plain-parquet plans, identical results both ways.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Persist ``df`` as a parquet table bucketed (and sorted) by ``key``;
    returns the re-read table whose scan carries the bucketed distribution.

    ``sortBy(key)`` is included so per-bucket files are key-sorted: the
    sort-merge join over two such tables needs neither Exchange NOR Sort.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    spark = df.sparkSession
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, key).sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)
    return spark.table(name)


def drop_table(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (AQE initial plan — bucketing
    decisions are made at planning time, so Exchange presence/absence is
    visible before execution)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def plans_shuffle(df: DataFrame) -> bool:
    """True when the physical plan contains any Exchange operator."""
    return "Exchange" in physical_plan(df)
