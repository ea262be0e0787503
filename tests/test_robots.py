"""robots.txt matcher semantics (robots.ts + robots-parser longest-match)."""

from crawlee_spark.functions.robots import RobotsRules, is_allowed_py


def test_missing_robots_allows_all():
    assert is_allowed_py("http://x.com/anything", None)
    assert is_allowed_py("http://x.com/anything", "")


def test_basic_disallow():
    txt = "User-agent: *\nDisallow: /private\n"
    assert not is_allowed_py("http://x.com/private", txt)
    assert not is_allowed_py("http://x.com/private/sub", txt)
    assert is_allowed_py("http://x.com/public", txt)


def test_disallow_all_and_empty_disallow():
    assert not is_allowed_py("http://x.com/", "User-agent: *\nDisallow: /\n")
    assert is_allowed_py("http://x.com/a", "User-agent: *\nDisallow:\n")


def test_longest_match_allow_wins():
    txt = "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
    assert not is_allowed_py("http://x.com/private/no", txt)
    assert is_allowed_py("http://x.com/private/ok", txt)
    assert is_allowed_py("http://x.com/private/ok/deeper", txt)


def test_allow_wins_ties():
    txt = "User-agent: *\nDisallow: /page\nAllow: /page\n"
    assert is_allowed_py("http://x.com/page", txt)


def test_wildcards_and_anchor():
    txt = "User-agent: *\nDisallow: /*.pdf$\n"
    assert not is_allowed_py("http://x.com/doc.pdf", txt)
    assert is_allowed_py("http://x.com/doc.pdfx", txt)
    txt2 = "User-agent: *\nDisallow: /a*/b\n"
    assert not is_allowed_py("http://x.com/a1/b", txt2)
    assert is_allowed_py("http://x.com/c/b", txt2)


def test_user_agent_groups():
    txt = "User-agent: specialbot\nDisallow: /\n\nUser-agent: *\nDisallow: /tmp\n"
    rules = RobotsRules(txt)
    assert not rules.is_allowed("http://x.com/any", "SpecialBot/1.0")
    assert rules.is_allowed("http://x.com/any", "otherbot")
    assert not rules.is_allowed("http://x.com/tmp/x", "otherbot")


def test_consecutive_ua_lines_share_rules():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    rules = RobotsRules(txt)
    assert not rules.is_allowed("http://x.com/x", "a")
    assert not rules.is_allowed("http://x.com/x", "b")


def test_query_string_matched():
    txt = "User-agent: *\nDisallow: /*?session=\n"
    assert not is_allowed_py("http://x.com/p?session=1", txt)
    assert is_allowed_py("http://x.com/p?other=1", txt)


def test_no_rule_means_allowed():
    # undefined ⇒ allowed (robots.ts:122-124)
    txt = "User-agent: *\nDisallow: /only-this\n"
    assert is_allowed_py("http://x.com/else", txt)


def test_sitemap_directives(spark):
    """robots.ts:127-137 getSitemaps: Sitemap: lines → array of URLs."""
    from crawlee_spark.functions.robots import sitemap_urls_col

    txt = (
        "User-agent: *\nDisallow: /private\n"
        "Sitemap: https://example.com/sitemap.xml  \n"
        "sitemap: https://example.com/news.xml # inline comment\n"
        "# Sitemap: https://example.com/commented-out.xml\n"
    )
    df = spark.createDataFrame([(txt,), (None,), ("User-agent: *\n",)], "robots_txt string")
    rows = [r["s"] for r in df.select(sitemap_urls_col("robots_txt").alias("s")).collect()]
    assert rows[0] == ["https://example.com/sitemap.xml", "https://example.com/news.xml"]
    assert rows[1] is None or rows[1] == []
    assert rows[2] == []
