"""URL canonicalization (functions/urlnorm.py) — RFC 3986 normalization
rules + tracking-param scrub, and canonical dedup."""
import pytest
from pyspark.sql import functions as F

from imagery_utils_spark.functions.urlnorm import (
    canonical_url, dedup_canonical)

CASES = [
    ("HTTP://Example.COM:80/a?b=2&a=1&utm_source=x#frag",
     "http://example.com/a?a=1&b=2"),
    ("https://example.com:443/", "https://example.com/"),
    ("https://example.com:80/x", "https://example.com:80/x"),  # non-default
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/?utm_source=x", "http://example.com/"),
    ("http://example.com/p?fbclid=1&z=9&a", "http://example.com/p?a&z=9"),
    ("http://example.com/p?gclid=abc&utm_medium=m",
     "http://example.com/p"),
    ("http://example.com/P/Q", "http://example.com/P/Q"),  # path case kept
    ("http://example.com/p?b=2&a=10", "http://example.com/p?a=10&b=2"),
]


def test_canonical_url_rules(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)],
                               "i long, url string")
    got = {r.i: r.c for r in
           df.select("i", canonical_url(F.col("url")).alias("c")).collect()}
    for i, (u, want) in enumerate(CASES):
        assert got[i] == want, u


def test_dedup_canonical(spark):
    urls = ["HTTP://A.com:80/x#f", "http://a.com/x", "http://a.com/x?utm_source=t",
            "http://b.com/y?p=1&q=2", "http://b.com/y?q=2&p=1"]
    df = spark.createDataFrame(list(enumerate(urls)), "doc_id long, url string")
    rows = {r.canonical_url: r for r in dedup_canonical(df).collect()}
    assert rows["http://a.com/x"].n_variants == 3
    assert rows["http://a.com/x"].kept_id == 0
    assert rows["http://b.com/y?p=1&q=2"].n_variants == 2
    assert rows["http://b.com/y?p=1&q=2"].kept_id == 3


def test_surt_key(spark):
    from imagery_utils_spark.functions.urlnorm import surt_col
    from pyspark.sql import functions as F
    rows = [
        (0, "https://www.Example.com/a?b=1"),
        (1, "http://sub.example.com:8080/x/y"),
        (2, "https://example.com"),
        (3, "http://a.b.c.org/p"),
    ]
    df = spark.createDataFrame(rows, "i long, url string")
    got = {r.i: r.s for r in
           df.select("i", surt_col(F.col("url")).alias("s")).collect()}
    assert got[0] == "com,example)/a?b=1"
    assert got[1] == "com,example,sub)/x/y"
    assert got[2] == "com,example)/"
    assert got[3] == "org,c,b,a)/p"
    # domain-contiguity: all example.com variants sort together
    assert got[0].split(")")[0] == got[2].split(")")[0]
