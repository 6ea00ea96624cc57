"""Loaders for the driver-provided parquet tables (TESTDATA.md) and for
materializing the synthetic image corpus as a Spark DataFrame."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .. import schema, synth

TPCH_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TPCH_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TPCH_TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def images_df(spark: SparkSession, n_bases: int = 200, seed: int = 42) -> DataFrame:
    """Materialize the synthetic F1 corpus (FIXTURES.md) as a DataFrame."""
    rows = synth.generate_corpus(n_bases, seed)
    return spark.createDataFrame(synth.to_spark_rows(rows), schema.IMAGES)
