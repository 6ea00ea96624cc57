"""URL canonicalization (functions/url.py) — unit semantics plus the
url_canonical_dedup contract invariants beyond sf0.01 oracle equality."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from __spark_entry__ import _q_url_canonical_dedup
from tbdedup_spark.functions.url import canonical_url

SF = "/root/testdata/sf0.001"


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in df.select(canonical_url("url").alias("c")).collect()]


def test_canonical_collapses_each_variant_family(spark):
    """One assertion per documented equivalence: case, default port,
    trailing slash, fragment, tracking params, query-param order."""
    variants = [
        "https://news.example.com/a/b?id=1&lang=en",
        "HTTPS://NEWS.EXAMPLE.COM/a/b?id=1&lang=en",
        "https://news.example.com:443/a/b?id=1&lang=en",
        "https://news.example.com/a/b/?id=1&lang=en",
        "https://news.example.com/a/b?id=1&lang=en#frag",
        "https://news.example.com/a/b?id=1&lang=en&utm_source=x&fbclid=y",
        "https://news.example.com/a/b?lang=en&id=1",
    ]
    out = set(_canon(spark, variants))
    assert out == {"https://news.example.com/a/b?id=1&lang=en"}


def test_canonical_preserves_distinguishing_parts(spark):
    """Things that DO identify a different resource must NOT collapse:
    non-default port, different path case, a non-tracking param, http vs
    https, and a param VALUE difference."""
    urls = [
        "https://h.com/a?x=1",
        "https://h.com:8443/a?x=1",
        "https://h.com/A?x=1",
        "https://h.com/a?x=1&y=2",
        "http://h.com/a?x=1",
        "https://h.com/a?x=2",
    ]
    assert len(set(_canon(spark, urls))) == len(urls)


def test_canonical_edge_shapes(spark):
    """Bare host, root path, empty query after tracking-strip, and the
    http:80 default port."""
    got = _canon(
        spark,
        [
            "https://h.com",
            "https://h.com/",
            "https://h.com/?utm_source=x",
            "http://h.com:80/p",
            "https://h.com/p?b=2&a=1",
        ],
    )
    assert got[0] == got[1] == got[2] == "https://h.com"
    assert got[3] == "http://h.com/p"
    assert got[4] == "https://h.com/p?a=1&b=2"  # survivors sorted


def test_url_dedup_contract_invariants(spark):
    """Over the synthesized corpus: groups partition the docs, rep_id is
    the group min, n_variants <= n_urls, and the group count equals the
    200-resource construction (when >= 200 docs exist)."""
    rows = _q_url_canonical_dedup(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n_urls for r in rows) == n_docs
    assert all(r.n_variants <= r.n_urls for r in rows)
    assert all(r.rep_id % 200 == int(r.canonical_url.split("item-")[1].split("?")[0]) for r in rows)
    assert len(rows) == min(200, n_docs)


def test_url_query_registered_with_oracle():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert "url_canonical_dedup" in qs and "url_canonical_dedup" in os_
