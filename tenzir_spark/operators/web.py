"""Web-document curation: HTML → text extraction and URL filtering.

The C4/RefinedWeb pipelines start from crawled pages: boilerplate HTML
is stripped before any quality rule runs (Raffel et al. 2020 §2.2;
Penedo et al. 2023 §3), and documents from blocklisted or malformed
URLs are dropped before dedup. Both stages here are pure Catalyst
projections / one broadcast anti-join — no Python in the hot path, no
shuffle on the corpus, embarrassingly parallel at 100 TB.

Every regex is RE2-compatible (no backreferences, no lookaround) so the
DuckDB oracle replays the exact semantics with the same pattern strings.

Reference analog: the reference parses wire/log formats on ingest
(read json/syslog/…, libtenzir/builtins/formats/); HTML/URL curation is
the training-pipeline extension over the same parse-then-filter shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# decode order matters: "&amp;" LAST, or "&amp;lt;" would double-decode
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]

# block-level elements whose removal also removes their content
_BLOCK_STRIP = [
    r"(?is)<script\b[^>]*>.*?</script\s*>",
    r"(?is)<style\b[^>]*>.*?</style\s*>",
    r"(?s)<!--.*?-->",
]
_TAG = r"<[^>]*>"
_LINK_TAG = r"(?i)<a[\s>]"


def html_extract(df: DataFrame, html_col: str, out: str = "extracted") -> DataFrame:
    """Strip HTML down to whitespace-normalized text, one pure-Catalyst
    projection (whole-stage codegen, zero shuffle):

    1. count ``<a`` tags (``n_links`` — a standard boilerplate signal);
    2. remove ``<script>``/``<style>`` blocks WITH their content, and
       comments (their text is never document text);
    3. count and strip the remaining tags (``n_tags``);
    4. decode the six common entities (``&amp;`` last — an encoded
       ``&amp;lt;`` is content, not markup, and must surface as ``<``);
    5. collapse all whitespace runs to single spaces and trim.

    Adds ``out`` (the extracted text), ``n_links`` and ``n_tags``.
    """
    c = F.col(html_col)
    n_links = F.size(F.regexp_extract_all(c, F.lit(_LINK_TAG), F.lit(0)))
    for pat in _BLOCK_STRIP:
        c = F.regexp_replace(c, pat, " ")
    n_tags = F.size(F.regexp_extract_all(c, F.lit(_TAG), F.lit(0)))
    c = F.regexp_replace(c, _TAG, " ")
    for ent, rep in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return (
        df.withColumn("n_links", n_links)
        .withColumn("n_tags", n_tags)
        .withColumn(out, c)
    )


# second-level registrable suffixes (public-suffix-list shape, tiny
# deterministic subset — swap in the full PSL as a broadcast table for
# production use; the ALGORITHM is what the oracle verifies)
MULTI_TLDS: tuple[str, ...] = (
    "co.uk", "org.uk", "gov.uk", "ac.uk",
    "com.au", "net.au", "co.jp", "com.br", "co.in",
)

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"
_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_IPV4_RE = r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"


def url_host(col: Column) -> Column:
    """Lower-cased host of a URL ('' when the URL has no ``scheme://``
    authority). Userinfo and port are excluded."""
    return F.lower(F.regexp_extract(col, _HOST_RE, 1))


def registrable_domain(host: Column) -> Column:
    """eTLD+1 via last-two-labels, with a public-suffix table for the
    two-level suffixes (``a.b.co.uk`` → ``b.co.uk``). Hosts with fewer
    labels than the suffix needs collapse to themselves; IP literals
    pass through unchanged (callers drop them separately)."""
    parts = F.split(host, r"\.", -1)
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2),
        F.element_at(parts, -1))
    return (
        F.when(n <= 1, host)
        .when((n >= 3) & last2.isin(*MULTI_TLDS), last3)
        .otherwise(last2)
    )


def url_stats(df: DataFrame, url_col: str) -> DataFrame:
    """Adds ``url_scheme``/``url_host``/``url_domain``/``url_is_ip``
    columns — the parse half of :func:`url_filter`, usable standalone."""
    u = F.col(url_col)
    host = url_host(u)
    return (
        df.withColumn("url_scheme", F.lower(F.regexp_extract(u, _SCHEME_RE, 1)))
        .withColumn("url_host", host)
        .withColumn("url_domain", registrable_domain(host))
        .withColumn("url_is_ip", host.rlike(_IPV4_RE))
    )


def url_filter(
    df: DataFrame,
    url_col: str,
    blocked_domains: DataFrame | list[str],
    allow_schemes: tuple[str, ...] = ("http", "https"),
    drop_ip_hosts: bool = True,
) -> DataFrame:
    """C4-style URL filtering: keep rows whose URL parses, whose scheme
    is allowed, whose host is not an IPv4 literal (optional), and whose
    registrable domain is NOT on the blocklist.

    The blocklist joins as a BROADCAST anti-join (real blocklists — UT1,
    adult/malware feeds — are a few MB against a 100 TB corpus; a
    shuffled join would repartition the corpus for nothing). Pass a
    DataFrame with a ``domain`` column, or a plain list.

    Adds the :func:`url_stats` columns to the surviving rows.
    """
    spark = df.sparkSession
    if isinstance(blocked_domains, list):
        blocked_domains = spark.createDataFrame(
            [(d.lower(),) for d in blocked_domains], "domain string")
    parsed = url_stats(df, url_col)
    kept = parsed.filter(
        (F.col("url_host") != "")
        & F.col("url_scheme").isin(*allow_schemes)
    )
    if drop_ip_hosts:
        kept = kept.filter(~F.col("url_is_ip"))
    return kept.join(
        F.broadcast(blocked_domains.select(F.lower("domain").alias("url_domain"))),
        "url_domain",
        "left_anti",
    )
