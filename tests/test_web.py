import pytest
from pyspark.sql import functions as F

from nebula_importer_spark.operators.web import domain_stats, parse_urls


def test_parse_urls_fields(spark):
    urls = [
        (1, "https://www.Example.co.uk:8443/a/b/c?q=1#frag"),
        (2, "http://sub.deep.example.com/page"),
        (3, "https://example.com"),
        (4, "ftp://user:pw@files.example.org/pub/x.txt"),
        (5, "http://localhost/x"),
        (6, "not a url"),
        (7, None),
    ]
    df = spark.createDataFrame(urls, "id long, url string")
    got = {r.id: r for r in parse_urls(df).collect()}
    r1 = got[1]
    assert (r1.scheme, r1.host, r1.port) == ("https", "www.example.co.uk", 8443)
    assert (r1.path, r1.path_depth, r1.has_query) == ("/a/b/c", 3, True)
    assert r1.registrable_domain == "example.co.uk"  # 3-label PSL rule
    assert got[2].registrable_domain == "example.com"
    assert got[3].path is None and got[3].path_depth is None
    assert got[4].host == "files.example.org"  # userinfo stripped
    assert got[5].registrable_domain == "localhost"  # single label
    for i in (6, 7):
        assert got[i].host is None and got[i].registrable_domain is None


def test_domain_stats_exact(spark):
    urls = [
        ("https://a.example.com/x/y",),
        ("https://b.example.com/z?q=1",),
        ("https://example.com",),
        ("junk",),
    ]
    df = spark.createDataFrame(urls, "url string")
    got = {r.registrable_domain: r for r in domain_stats(df).collect()}
    ex = got["example.com"]
    assert (ex.n_urls, ex.n_hosts) == (3, 3)
    assert ex.mean_depth_milli == (2 + 1 + 0) * 1000 // 3
    assert ex.query_ppm == 1 * 10**6 // 3
    assert got[None].n_urls == 1  # unparseable rows stay visible


def test_parse_urls_validation(spark):
    df = spark.createDataFrame([("x",)], "url string")
    with pytest.raises(ValueError, match="not in input"):
        parse_urls(df, url_col="zz")
    # map-only contract
    plan = parse_urls(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_canonicalize_urls_hand_cases(spark):
    from nebula_importer_spark.operators.web import canonicalize_urls

    cases = [
        # case/port/fragment/tracking/ordering all collapse
        ("HTTPS://WWW.Example.COM:443/a//b/?z=2&utm_source=x&a=1#frag",
         "https://example.com/a/b?a=1&z=2"),
        ("http://example.com:80/", "http://example.com/"),
        ("http://example.com:8080/x/", "http://example.com:8080/x"),
        ("https://cdn.site.co.uk/p?gclid=abc&ref=tw&b=2&a=1",
         "https://cdn.site.co.uk/p?a=1&b=2"),
        ("https://example.com", "https://example.com/"),
        ("https://example.com/?utm_campaign=x&utm_medium=y",
         "https://example.com/"),
        ("ftp://Files.example.com/Dir//file.txt",
         "ftp://files.example.com/Dir/file.txt"),
        ("not a url", None),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, url string"
    )
    got = {
        r.i: r.canonical_url
        for r in canonicalize_urls(df).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i][0], got[i])
    # identical after canonicalization → usable as a dedup key
    dup = spark.createDataFrame(
        [(1, "https://www.a.com/x?b=2&a=1"), (2, "https://a.com/x/?a=1&b=2")],
        "i long, url string",
    )
    vals = {r.canonical_url for r in canonicalize_urls(dup).collect()}
    assert vals == {"https://a.com/x?a=1&b=2"}
    # strip_www=False keeps the label
    keep = canonicalize_urls(
        spark.createDataFrame([(1, "https://www.a.com/")], "i long, url string"),
        strip_www=False,
    ).collect()[0]
    assert keep.canonical_url == "https://www.a.com/"


def test_canonicalize_urls_validation(spark):
    import pytest

    from nebula_importer_spark.operators.web import canonicalize_urls

    df = spark.createDataFrame([(1,)], "i long")
    with pytest.raises(ValueError, match="not in input"):
        canonicalize_urls(df)


def test_fragment_question_mark_is_not_a_query(spark):
    """Review finding: the unanchored query regex treated '?' inside a
    fragment as the query start, leaking fragment content into the
    canonical URL (and has_query)."""
    from nebula_importer_spark.operators.web import (
        canonicalize_urls,
        parse_urls,
    )

    df = spark.createDataFrame(
        [
            (1, "http://example.com/p#sec?x=1"),
            (2, "http://example.com/p"),
            (3, "https://a.com/#/route?tab=2"),
            (4, "https://a.com/?real=1#frag?fake=2"),
        ],
        "i long, url string",
    )
    canon = {r.i: r.canonical_url for r in canonicalize_urls(df).collect()}
    assert canon[1] == canon[2] == "http://example.com/p"
    assert canon[3] == "https://a.com/"
    assert canon[4] == "https://a.com/?real=1"
    hq = {r.i: r.has_query for r in parse_urls(df).collect()}
    assert hq == {1: False, 2: False, 3: False, 4: True}


def test_canonicalize_urls_idempotent(spark):
    """canonical(canonical(u)) == canonical(u): the output is a fixed
    point (already lowercased, de-tracked, sorted, slash-normalized), so
    re-canonicalizing a frontier that stored canonical keys is a no-op —
    property-tested over a generated mess of URLs."""
    import random

    rng = random.Random(31)
    schemes = ["http", "HTTPS", "ftp"]
    hosts = ["www.Example.com", "cdn.site.co.uk", "A.B.ORG", "localhost"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "//a//b/", "/x/y", "/x/"]
    queries = ["", "?b=2&a=1", "?utm_source=x", "?z=1&ref=t&a=2", "?a"]
    frags = ["", "#top", "#/r?tab=2"]
    urls = [
        rng.choice(schemes) + "://" + rng.choice(hosts) + rng.choice(ports)
        + rng.choice(paths) + rng.choice(queries) + rng.choice(frags)
        for _ in range(120)
    ]
    from nebula_importer_spark.operators.web import canonicalize_urls

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, url string"
    )
    once = canonicalize_urls(df).select(
        "i", F.col("canonical_url").alias("url")
    )
    twice = canonicalize_urls(once.filter(F.col("url").isNotNull()))
    mismatch = twice.filter(
        F.col("canonical_url") != F.col("url")
    ).collect()
    assert mismatch == [], mismatch[:5]

