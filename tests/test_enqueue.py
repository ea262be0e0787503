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


# ---------------------------------------------------------------------------
# F3 object patterns: per-pattern requestOptions + pseudoUrls
# (enqueue_links.test.ts:93-686 'works with globs/regexps/pseudoUrls')
# ---------------------------------------------------------------------------

from crawlee_spark.operators.enqueue import UrlPattern, purl_to_regex  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def run_gate_rows(spark, urls, options, origin=ORIGIN, depth=0):
    df = spark.createDataFrame(
        [(u, origin, depth) for u in urls], "url string, origin_url string, crawl_depth int"
    )
    accepted, skipped = gate_candidates(df, options)
    return (
        {r["url"]: r.asDict() for r in accepted.collect()},
        {r["url"]: r["reason"] for r in skipped.collect()},
    )


PATTERN_CANDIDATES = [
    "https://example.com/x",
    "https://example.com/deep/page",
    "http://cool.com/",
    "https://other.net/w",
]


def test_pattern_overrides_first_match_wins(spark):
    """First matching pattern's label/method apply (createRequests walks the
    pattern list in order and stops at the first match)."""
    opts = EnqueueOptions(
        strategy="all",
        patterns=(
            UrlPattern(glob="https://example.com/**", label="EXAMPLE"),
            UrlPattern(regexp=r"^(http|https)://example\.com/.*", label="NEVER"),
            UrlPattern(glob="?(http|https)://cool.com/", method="post", label="COOL"),
        ),
    )
    acc, skip = run_gate_rows(spark, PATTERN_CANDIDATES, opts)
    assert acc["https://example.com/x"]["label"] == "EXAMPLE"
    assert acc["https://example.com/deep/page"]["label"] == "EXAMPLE"
    assert acc["http://cool.com/"]["label"] == "COOL"
    assert acc["http://cool.com/"]["method"] == "post"
    # example rows matched pattern 1 → its (absent) method stays None
    assert acc["https://example.com/x"]["method"] is None
    # no-pattern-match URLs are skipped with reason 'filters'
    assert skip == {"https://other.net/w": "filters"}


def test_pattern_userdata_override(spark):
    opts = EnqueueOptions(
        strategy="all",
        patterns=(UrlPattern(glob="**cool.com**", user_data='{"label":"COOL"}'),),
    )
    acc, _ = run_gate_rows(spark, PATTERN_CANDIDATES, opts)
    assert acc["http://cool.com/"]["user_data"] == '{"label":"COOL"}'


def test_pseudourl_patterns(spark):
    """The deprecated pseudoUrls form still gates + overrides
    (enqueue_links.test.ts:312-347: ['https://example.com/[(\\w|-|/)*]',
    {purl: '[http|https]://cool.com/', userData.label COOL}]). First match
    wins: example URLs bind to pattern 1 (no label) even though pattern 2's
    loose '^http' branch would also match them."""
    opts = EnqueueOptions(
        strategy="all",
        patterns=(
            UrlPattern(purl="https://example.com/[(\\w|-|/)*]"),
            UrlPattern(purl="[http|https]://cool.com/", label="COOL"),
        ),
    )
    acc, skip = run_gate_rows(spark, PATTERN_CANDIDATES, opts)
    assert acc["http://cool.com/"]["label"] == "COOL"
    assert acc["https://example.com/x"]["label"] is None
    # grouped alternation gates strictly
    opts2 = EnqueueOptions(
        strategy="all",
        patterns=(UrlPattern(purl="[(http|https)]://cool.com/", label="COOL"),),
    )
    acc2, skip2 = run_gate_rows(spark, PATTERN_CANDIDATES, opts2)
    assert set(acc2) == {"http://cool.com/"}
    assert skip2["https://other.net/w"] == "filters"


def test_purl_to_regex_semantics():
    import re as _re

    r = purl_to_regex("[http|https]://cool.com/")
    jre = r.replace("(?i)", "")
    assert _re.match(jre, "http://cool.com/", _re.I)
    assert _re.match(jre, "https://cool.com/", _re.I)
    assert not _re.match(jre, "ftp://cool.com/", _re.I)
    # faithful to the reference: '[http|https]' compiles to '^http|https...$'
    # whose '^http' branch is a loose prefix match — exactly what the JS
    # RegExp from purlToRegExp does
    assert _re.match(jre, "https://coolXcom/", _re.I)
    # literal sections are escaped inside an anchored (grouped) pattern
    g = purl_to_regex("[(http|https)]://cool.com/").replace("(?i)", "")
    assert not _re.match(g, "https://coolXcom/", _re.I)
    # case-insensitive like the reference RegExp 'i' flag
    r2 = purl_to_regex("https://example.com/[.*]")
    assert _re.match(r2.replace("(?i)", ""), "HTTPS://EXAMPLE.COM/abc", _re.I)
    with pytest.raises(ValueError):
        purl_to_regex("   ")


def test_extglob_alternation():
    import re as _re

    jre = glob_to_regex("?(http|https)://cool.com/").replace("(?i)", "")
    assert _re.match(jre, "http://cool.com/")
    assert _re.match(jre, "https://cool.com/")
    assert _re.match(jre, "://cool.com/")  # '?' = zero-or-one occurrence
    assert not _re.match(jre, "httpx://cool.com/")


def test_patterns_and_plain_globs_compose(spark):
    """Plain globs stay include-only; pattern overrides never leak onto
    rows that matched only a plain glob."""
    opts = EnqueueOptions(
        strategy="all",
        globs=("https://other.net/**",),
        patterns=(UrlPattern(glob="**cool.com**", label="COOL"),),
    )
    acc, _ = run_gate_rows(spark, PATTERN_CANDIDATES, opts)
    assert set(acc) == {"http://cool.com/", "https://other.net/w"}
    assert acc["https://other.net/w"]["label"] is None
    assert acc["http://cool.com/"]["label"] == "COOL"
