"""Distributed synthetic-corpus generation — corpus synthesis AS a Spark job.

At bench scale (10^5+ rows here, 10^12 in design) the corpus can't be built
on the driver; each executor generates the rows for its slice of base
indices. Determinism: ``synth.rows_for_base`` seeds per base index, so the
output is identical under any partitioning (tested). This is the pattern the
reference's test generator (tests/base.py:144-416) needs at scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from . import schema, synth


def images_distributed(
    spark: SparkSession, n_bases: int, seed: int = 42, partitions: int = 64,
    sizes: tuple = (64, 96, 128),
) -> DataFrame:
    """IMAGES-schema DataFrame of ~2.5x n_bases rows, generated in executors."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for idx in pdf["id"]:
                for r in synth.rows_for_base(int(idx), seed, sizes):
                    rows.append(
                        (r.image_id, r.data, r.w, r.h, r.fmt, r.caption, r.phash)
                    )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
            )

    return (
        spark.range(n_bases)
        .repartition(partitions)
        .mapInPandas(gen, schema=schema.IMAGES)
    )
