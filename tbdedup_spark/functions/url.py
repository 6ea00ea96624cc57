"""URL canonicalization — the crawl-frontier / pre-fetch dedup key.

Web-scale corpora reference the same resource under many spellings:
mixed-case scheme/host, explicit default ports, trailing slashes,
fragments, tracking parameters (utm_*, fbclid, ...), and permuted query
strings. ``canonical_url`` maps all of them to one stable key so URL-level
dedup is a plain groupBy — the stage that runs BEFORE any content is
fetched, where it prunes fetch volume, and again after ingest as the
cheapest dedup tier (tier 0: same canonical URL => same resource claim,
ahead of content hashing).

Everything is built from codegen-friendly JVM expressions (regexp, split,
higher-order filter, array_sort) — zero Python in the hot path, and the
EXACT same chain is expressible in ANSI-ish SQL (the DuckDB oracle mirrors
it operation for operation), so canonicalization semantics are pinned
cross-engine rather than delegated to an engine-specific parse_url.

Semantics (documented, deterministic):
- fragment dropped;
- scheme and host lowercased; explicit default port stripped
  (http:80, https:443); NON-default ports kept;
- path: trailing '/'s stripped (so '/a/' == '/a'; a bare host keeps '');
- query: parameters with tracking keys dropped (TRACKING_PARAM_RE),
  survivors sorted bytewise and rejoined — '?b=2&a=1' == '?a=1&b=2';
  an emptied query string drops its '?'.

Reference analog: the canonical-signature normalization stage (SURVEY §2
O4/O23 — lower/trim/collapse before hashing) applied to the resource
IDENTIFIER instead of the content.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tracking/session parameters that never identify the resource. Kept in one
# regex so the Spark expression and the DuckDB oracle share it verbatim.
TRACKING_PARAM_RE = "^(utm_[a-z]+|fbclid|gclid|msclkid|mc_cid|mc_eid|ref|ref_src)="

_SCHEME_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://"


def canonical_url(col: str | Column) -> Column:
    """Canonical form of a URL string column (see module doc for the rules).

    Implemented as one nested expression tree of regexp/split/filter/
    array_sort — whole-stage-codegen keeps it a pure map, so at 100 TB this
    canonicalization is free relative to the scan that feeds it.
    """
    url = F.col(col) if isinstance(col, str) else col
    no_frag = F.regexp_replace(url, "#.*", "")
    scheme = F.lower(F.regexp_extract(no_frag, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    after = F.regexp_replace(no_frag, _SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(after, "^([^/?]+)", 1))
    host = (
        F.when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .otherwise(hostport)
    )
    pathq = F.substring(after, F.length(hostport) + F.lit(1), F.lit(1 << 30))
    path = F.regexp_extract(pathq, "^([^?]*)", 1)
    # query string = everything after the first '?' (empty when absent)
    qs = F.when(
        F.length(pathq) > F.length(path),
        F.substring(pathq, F.length(path) + F.lit(2), F.lit(1 << 30)),
    ).otherwise(F.lit(""))
    kept = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    canon_path = F.regexp_replace(path, "/+$", "")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        canon_path,
        F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(
            F.lit("")
        ),
    )
