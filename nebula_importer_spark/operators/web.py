"""Web-corpus URL operators — parsing, registrable domains, crawl stats.

Every web-scale corpus pipeline keys its politeness, dedup, and quality
decisions on the REGISTRABLE domain (example.co.uk, not
a.b.example.co.uk and not co.uk), so the engine needs URL structure as
first-class columns. Parsing is pure regexp projection (map-only,
whole-stage codegen, no UDF); the registrable-domain rule is the
standard public-suffix heuristic with the multi-label suffixes that
matter pinned as a module constant BOTH engines read (the
``normalize_text`` accent-map precedent) — a full Public Suffix List is
a data file a deployment can swap in, not something to hardcode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Multi-label public suffixes recognized by the registrable-domain
#: heuristic. The rule: registrable = last 2 labels, or last 3 when the
#: last 2 are in this set. Deployments with broader needs swap in the
#: full PSL as a broadcast table; the operator semantics stay the same.
MULTI_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gov.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "org.mx", "co.za", "org.za", "co.kr", "or.kr",
    "com.tr", "com.ar", "com.sg", "com.hk", "co.nz", "org.nz",
)

_SCHEME_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_HOST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
_PORT_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]+:([0-9]+)"
_PATH_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)"
# anchored to the first '?' BEFORE any '#': an unanchored \?([^#]*) would
# treat a '?' inside the fragment (SPA routes like '#/r?tab=2') as the
# query start, leaking fragment content into has_query/canonical_url
_QUERY_RE = "^[^#?]*\\?([^#]*)"


def parse_urls(
    df: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Decompose a URL column into structural fields, map-only.

    Adds ``scheme`` (lowercased), ``host`` (lowercased), ``port`` (long,
    NULL when absent), ``path`` (NULL when absent), ``path_depth``
    (count of non-empty ``/`` segments), ``has_query`` (bool), and
    ``registrable_domain`` (the public-suffix heuristic over
    :data:`MULTI_LABEL_SUFFIXES`; hosts with < 2 labels — localhost,
    bare IP-like single labels — return the host itself). Unparseable
    rows (no ``scheme://host``) get NULL in every derived field —
    visible, not dropped.

    Every field is one ``regexp_extract``/arithmetic expression — zero
    Exchange, zero UDF, the whole operator inlines into the scan.
    """
    if url_col not in df.columns:
        raise ValueError(f"column {url_col!r} not in input: {df.columns}")
    u = F.coalesce(F.col(url_col), F.lit(""))
    scheme = F.lower(F.nullif(F.regexp_extract(u, _SCHEME_RE, 1), F.lit("")))
    host = F.lower(F.nullif(F.regexp_extract(u, _HOST_RE, 1), F.lit("")))
    port = F.nullif(F.regexp_extract(u, _PORT_RE, 1), F.lit("")).cast("long")
    path = F.nullif(F.regexp_extract(u, _PATH_RE, 1), F.lit(""))
    depth = F.when(
        path.isNotNull(),
        F.size(F.filter(F.split(path, "/"), lambda s: s != "")),
    ).cast("long")
    has_q = F.when(
        host.isNotNull(), F.regexp_extract(u, _QUERY_RE, 1) != ""
    )
    # registrable domain: last2, or last3 when last2 is a listed suffix
    labels = F.split(host, "\\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    is_multi = last2.isin(*MULTI_LABEL_SUFFIXES)
    reg = (
        F.when(host.isNull(), F.lit(None).cast("string"))
        .when(n < 2, host)
        .when(is_multi & (n >= 3), last3)
        .when(is_multi, host)
        .otherwise(last2)
    )
    return df.select(
        "*",
        scheme.alias("scheme"),
        host.alias("host"),
        port.alias("port"),
        path.alias("path"),
        depth.alias("path_depth"),
        has_q.alias("has_query"),
        reg.alias("registrable_domain"),
    )


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Per-registrable-domain crawl statistics — the politeness/budget
    planning table: URL count, distinct hosts (subdomain spread),
    exact mean path depth in milli-units, and query-string share in
    ppm. One :func:`parse_urls` projection + one partial-agg'd groupBy
    on the domain (domains are Zipf-bounded — the table is
    vocabulary-sized, never corpus-sized). Unparseable URLs aggregate
    under a NULL domain row — the rejection-visibility rule.

    Returns ``(registrable_domain, n_urls, n_hosts, mean_depth_milli,
    query_ppm)``.
    """
    p = parse_urls(df, url_col)
    return (
        p.groupBy("registrable_domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.count_distinct("host").cast("long").alias("n_hosts"),
            F.sum(F.coalesce("path_depth", F.lit(0))).alias("_sd"),
            F.sum(
                F.when(F.col("has_query"), F.lit(1)).otherwise(F.lit(0))
            ).alias("_nq"),
        )
        .select(
            "registrable_domain",
            "n_urls",
            "n_hosts",
            F.expr("_sd * 1000L div n_urls").cast("long").alias(
                "mean_depth_milli"
            ),
            F.expr("_nq * 1000000L div n_urls").cast("long").alias("query_ppm"),
        )
    )


#: query parameters dropped by canonicalize_urls: pure click-tracking
#: identifiers (the de-facto crawl-dedup list; utm_* is matched by prefix)
TRACKING_PARAMS = ("gclid", "fbclid", "msclkid", "igshid", "ref")

_TRACKING_RE = "^(utm_[^=&]*|gclid|fbclid|msclkid|igshid|ref)(=|$)"


def canonicalize_urls(
    df: DataFrame,
    url_col: str = "url",
    *,
    strip_www: bool = True,
) -> DataFrame:
    """Crawl-dedup URL canonicalization, map-only: two URLs that differ
    only in case of scheme/host, a default port, duplicate or trailing
    slashes, fragment, query-parameter ORDER, or click-tracking
    parameters (``utm_*``, ``gclid``, ``fbclid``, ``msclkid``,
    ``igshid``, ``ref``) canonicalize to the same string — the key a
    frontier dedups on before fetching, and the join key for
    cross-crawl URL-level dedup.

    Pinned normalization (documented scope — no percent-decoding, no
    IDN, both of which are representation changes a crawler does NOT
    want silently merged): lowercase scheme+host; drop ``www.`` (flag);
    drop ``:80``/``:443`` for http/https (other ports kept); collapse
    ``//+`` runs in the path and strip trailing slashes (empty path →
    ``/``); drop the fragment; drop tracking params; SORT the surviving
    params bytewise (order is almost never semantic, and unsorted
    params are the top cause of crawl-frontier duplicates). Rows with
    no parseable ``scheme://host`` get NULL — visible, not dropped.

    Every step is a regexp/array Column expression — zero Exchange,
    zero UDF; the whole operator inlines into the scan. Adds
    ``canonical_url``.
    """
    if url_col not in df.columns:
        raise ValueError(f"column {url_col!r} not in input: {df.columns}")
    u = F.coalesce(F.col(url_col), F.lit(""))
    scheme = F.lower(F.nullif(F.regexp_extract(u, _SCHEME_RE, 1), F.lit("")))
    host0 = F.lower(F.nullif(F.regexp_extract(u, _HOST_RE, 1), F.lit("")))
    host = F.regexp_replace(host0, "^www\\.", "") if strip_www else host0
    port = F.regexp_extract(u, _PORT_RE, 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    path0 = F.regexp_extract(u, _PATH_RE, 1)
    path1 = F.regexp_replace(path0, "/{2,}", "/")
    path2 = F.regexp_replace(path1, "/+$", "")
    path = F.when(path2 == "", F.lit("/")).otherwise(path2)
    query0 = F.regexp_extract(u, _QUERY_RE, 1)
    params = F.filter(
        F.split(query0, "&"),
        lambda p: (p != "") & ~F.lower(p).rlike(_TRACKING_RE),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    canon = F.when(
        scheme.isNull() | host.isNull(), F.lit(None).cast("string")
    ).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
            path,
            F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(
                F.lit("")
            ),
        )
    )
    return df.select("*", canon.alias("canonical_url"))
