"""Shared fixtures: one session for the whole test run (JVM startup is ~10s),
a small deterministic corpus, and its trusted oracle outputs."""

from __future__ import annotations

import pytest

from tbdedup_spark import schema, synth
from tbdedup_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tbdedup_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_rows():
    return synth.generate_corpus(n_bases=80, seed=42)


@pytest.fixture(scope="session")
def golden(corpus_rows):
    pairs = synth.golden_pairs(corpus_rows)
    clusters = synth.golden_clusters(corpus_rows, pairs)
    return {"pairs": pairs, "clusters": clusters}


@pytest.fixture(scope="session")
def images(spark, corpus_rows):
    df = spark.createDataFrame(synth.to_spark_rows(corpus_rows), schema.IMAGES)
    df.persist()
    df.count()
    return df
