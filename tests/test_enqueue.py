"""enqueueLinks gating: strategies, globs/regexps, skip reasons.

Mirrors /root/reference/test/core/enqueue_links/enqueue_links.test.ts
strategy cases (:452-538) and glob/exclude cases (:93-576) at predicate level.
"""

import pytest

from crawlee_spark.operators.enqueue import EnqueueOptions, gate_candidates, glob_to_regex


ORIGIN = "https://example.com/base"


def run_gate(spark, urls, options, origin=ORIGIN, depth=0):
    df = spark.createDataFrame(
        [(u, origin, depth) for u in urls], "url string, origin_url string, crawl_depth int"
    )
    accepted, skipped = gate_candidates(df, options)
    return (
        sorted(r["url"] for r in accepted.collect()),
        {r["url"]: r["reason"] for r in skipped.collect()},
    )


CANDIDATES = [
    "https://example.com/x",           # same host
    "http://example.com/y",            # same host, other protocol
    "https://sub.example.com/z",       # subdomain
    "https://other.com/w",             # other domain
    "ftp://example.com/f",             # bad scheme
]


def test_strategy_same_hostname(spark):
    acc, skip = run_gate(spark, CANDIDATES, EnqueueOptions(strategy="same-hostname"))
    assert acc == ["http://example.com/y", "https://example.com/x"]
    assert skip["ftp://example.com/f"] == "filters"


def test_strategy_same_domain(spark):
    acc, _ = run_gate(spark, CANDIDATES, EnqueueOptions(strategy="same-domain"))
    assert acc == ["http://example.com/y", "https://example.com/x", "https://sub.example.com/z"]


def test_strategy_same_origin(spark):
    acc, _ = run_gate(spark, CANDIDATES, EnqueueOptions(strategy="same-origin"))
    assert acc == ["https://example.com/x"]


def test_strategy_all(spark):
    acc, skip = run_gate(spark, CANDIDATES, EnqueueOptions(strategy="all"))
    assert acc == sorted(CANDIDATES[:4])  # everything http(s)
    assert skip == {"ftp://example.com/f": "filters"}


def test_strategy_same_domain_ip_origin_falls_back(spark):
    urls = ["https://1.2.3.4/x", "https://other.com/y"]
    acc, _ = run_gate(spark, urls, EnqueueOptions(strategy="same-domain"), origin="https://1.2.3.4/")
    assert acc == ["https://1.2.3.4/x"]


def test_globs_include_exclude(spark):
    urls = [
        "https://example.com/docs/a",
        "https://example.com/docs/deep/b",
        "https://example.com/blog/c",
        "https://example.com/docs/skip/d",
    ]
    opts = EnqueueOptions(
        strategy="all",
        globs=("https://example.com/docs/**",),
        exclude_globs=("**/skip/**",),
    )
    acc, skip = run_gate(spark, urls, opts)
    assert acc == ["https://example.com/docs/a", "https://example.com/docs/deep/b"]
    assert skip["https://example.com/blog/c"] == "filters"
    assert skip["https://example.com/docs/skip/d"] == "filters"


def test_regexps(spark):
    urls = ["https://example.com/p1", "https://example.com/q2"]
    opts = EnqueueOptions(strategy="all", regexps=(r".*/p\d$",))
    acc, _ = run_gate(spark, urls, opts)
    assert acc == ["https://example.com/p1"]


def test_depth_gate_reason(spark):
    opts = EnqueueOptions(strategy="all", max_crawl_depth=1)
    df_urls = ["https://example.com/deep"]
    acc, skip = run_gate(spark, df_urls, opts, depth=2)
    assert acc == []
    assert skip["https://example.com/deep"] == "depth"


def test_glob_to_regex():
    import re

    r = glob_to_regex("https://example.com/docs/**")
    assert re.match(r.replace("(?i)", ""), "https://example.com/docs/a/b", re.I)
    r2 = glob_to_regex("https://example.com/*/x")
    assert re.match(r2.replace("(?i)", ""), "https://example.com/one/x", re.I)
    assert not re.match(r2.replace("(?i)", ""), "https://example.com/one/two/x", re.I)
    r3 = glob_to_regex("https://{a,b}.com/?")
    assert re.match(r3.replace("(?i)", ""), "https://a.com/z", re.I)
    assert not re.match(r3.replace("(?i)", ""), "https://c.com/z", re.I)
