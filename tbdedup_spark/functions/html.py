"""HTML -> text extraction — the first transform of a web-crawl training
pipeline (CommonCrawl WARC payloads arrive as markup; every downstream
dedup/quality stage wants visible text).

Heuristic, regex-based, and deliberately engine-portable: script/style
blocks die first, then boilerplate containers (nav/header/footer/aside),
then every remaining tag becomes a space, then the handful of entities
that dominate real markup are unescaped, then whitespace collapses. This
is the 95% extractor a distributed pipeline runs at scan time (a pure
whole-stage-codegen map, zero Python) — a DOM-fidelity extractor
(trafilatura-class) would ride mapInPandas behind the same column
contract, the multimodal decode pattern.

Regex dialect note: every pattern uses only the Java-regex-and-RE2
intersection ((?is) flags, non-greedy .*?, character classes), so the
Spark expression and the DuckDB oracle mirror are the SAME patterns
verbatim — the cross-engine discipline functions/url.py established.

Reference analog: the MBOX payload normalization before signature
hashing (SURVEY §2 O3/O23) — strip transport framing, keep content.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) applied IN ORDER; order is part of the semantics
# (script bodies may contain '<' that must not survive into tag-strip).
STRIP_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"(?is)<script\b.*?</script>", " "),
    (r"(?is)<style\b.*?</style>", " "),
    # whole <head> after script/style: titles and meta are not visible text
    # (the \b keeps <header> out of this pattern's reach)
    (r"(?is)<head\b.*?</head>", " "),
    (r"(?is)<nav\b.*?</nav>", " "),
    (r"(?is)<header\b.*?</header>", " "),
    (r"(?is)<footer\b.*?</footer>", " "),
    (r"(?is)<aside\b.*?</aside>", " "),
    (r"(?is)<!--.*?-->", " "),
    (r"(?s)<[^>]*>", " "),
)

# common-entity unescape (in order; &amp; LAST so '&amp;lt;' decodes to
# the literal '&lt;' text rather than double-unescaping to '<')
ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def html_to_text(col: str | Column) -> Column:
    """Visible text of an HTML column: boilerplate stripped, tags removed,
    common entities unescaped, whitespace collapsed and trimmed."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, rep in STRIP_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    for ent, ch in ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))
