"""PII detection + redaction — the privacy-scrub primitive every
production training-data pipeline runs before anything else ships
(C4/Dolma-class pipelines scrub emails/phones/IPs as a standard pass).

Pure JVM expressions (regexp_extract_all / regexp_replace — zero Python,
zero shuffles: one codegen projection over the scan), with patterns chosen
for EXACT cross-engine parity: every construct (ASCII classes, bounded
repetition, non-capturing groups, \\b word boundaries) means the same
thing to Java's regex engine and DuckDB's RE2, verified empirically on
adversarial cases (trailing `1.2.3.4567` is rejected by both; `x@y.io`
accepted by both). Counts are computed over the ORIGINAL text; redaction
replaces in the fixed order email -> ipv4 -> phone (an IP can be a
substring of neither after email placeholders land, so the order is
deterministic and mirrorable).

Reference analog: the planner's regex include/exclude predicate
(/root/reference/tbdedup/planner/plan.py:96-102) turned from a row gate
into a value transform.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"

# (pattern, placeholder) in REDACTION ORDER — email first (it may contain
# digit runs a later pattern could half-match), then ipv4, then phone.
PII_RULES = (
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
)


def _count(col: Column, pat: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))


def redact(col: Column) -> Column:
    """The text with every PII span replaced by its placeholder."""
    out = col
    for pat, repl in PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_email, n_phone, n_ipv4, redacted): per-document PII counts
    (over the original text) and the scrubbed text. One projection; at
    100 TB this is a pure map over the scan — the cheapest possible shape,
    so it belongs at the FRONT of the pipeline where it guards everything
    downstream."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        _count(c, EMAIL_RE).alias("n_email"),
        _count(c, PHONE_RE).alias("n_phone"),
        _count(c, IPV4_RE).alias("n_ipv4"),
        redact(c).alias("redacted"),
    )
