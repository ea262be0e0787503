"""Social-handle + Open Graph extraction (reference: utils/src/internals/social.ts).

Example URLs come from the reference's own doc comments (social.ts:219-232,
276-300, …) so the ported Java regexes are pinned to the documented behavior.
"""

import pytest
from pyspark.sql import functions as F

from crawlee_spark.functions.social import (
    emails_from_text_col,
    emails_from_urls_col,
    open_graph_map_col,
    parse_social_handles,
    phones_from_text_col,
    phones_from_urls_col,
    social_handles_cols,
)


def _eval(spark, col, text):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(col.alias("v")).collect()[0]["v"]


def test_emails_from_text(spark):
    got = _eval(
        spark,
        emails_from_text_col(F.col("t")),
        "contact alice@example.com or BOB@corp.co.uk, not me@localhost.",
    )
    assert got == ["BOB@corp.co.uk", "alice@example.com"]  # sorted, deduped


def test_emails_from_urls(spark):
    df = spark.createDataFrame(
        [([" mailto:info@example.com", "mailto:info@example.com", "https://x.com/y", "mailto:bad@"],)],
        "urls array<string>",
    )
    got = df.select(emails_from_urls_col("urls").alias("v")).collect()[0]["v"]
    assert got == ["info@example.com"]


def test_phones_from_text(spark):
    got = _eval(
        spark,
        phones_from_text_col(F.col("t")),
        "call 1(413)555-2378 or +420 775 123 456; meeting 2018-11-10 room 42",
    )
    assert "1(413)555-2378" in got
    assert not any(p == "2018-11-10" for p in got)  # date-like skipped
    assert all(sum(c.isdigit() for c in p) >= 7 for p in got)  # min digits


def test_phones_from_urls(spark):
    df = spark.createDataFrame(
        [(["tel:775123456", "callto://1234567890", "tel:12", "https://x.com"],)],
        "urls array<string>",
    )
    got = df.select(phones_from_urls_col("urls").alias("v")).collect()[0]["v"]
    assert "775123456" in got and "1234567890" in got
    assert "12" not in got


HTML = """
<html><body>
<a href="https://www.linkedin.com/in/alan-turing">l1</a>
<a href="en.linkedin.com/in/alan-turing">l2</a>
<p>https://www.linkedin.com/in/linus-torvalds/latest-activity</p>
<a href="https://www.instagram.com/old_prague/">ig</a>
<p>https://www.instagram.com/explore/ should not match</p>
<a href="https://twitter.com/apify">tw</a>
<p>https://twitter.com/oauth/ is reserved</p>
<a href="https://www.facebook.com/apifytech">fb</a>
<a href="https://youtu.be/kM7YfhfkiEE">yt</a>
<a href="https://www.tiktok.com/@jack_robbins">tt</a>
<a href="https://pinterest.com/pin/10084556789011231455">pin</a>
<a href="https://discord.gg/discord-developers">dc</a>
</body></html>
"""


def test_social_handles_from_html(spark):
    df = spark.createDataFrame([(HTML,)], "html string")
    row = parse_social_handles(df, html_col="html").collect()[0]
    assert "https://www.linkedin.com/in/alan-turing" in row["linkedIns"]
    assert "en.linkedin.com/in/alan-turing" in row["linkedIns"]
    # base-path extraction: the /latest-activity suffix is trimmed (the
    # optional trailing slash is part of the reference match)
    assert any(h.rstrip("/").endswith("/in/linus-torvalds") for h in row["linkedIns"])
    assert any("old_prague" in h for h in row["instagrams"])
    assert not any("explore" in h for h in row["instagrams"])
    assert any(h.endswith("/apify") for h in row["twitters"])
    assert not any("oauth" in h for h in row["twitters"])
    assert any("apifytech" in h for h in row["facebooks"])
    assert any("kM7YfhfkiEE" in h for h in row["youtubes"])
    assert any("@jack_robbins" in h for h in row["tiktoks"])
    assert any("pin/10084556789011231455" in h for h in row["pinterests"])
    assert any("discord.gg/discord-developers" in h for h in row["discords"])
    # lists are sorted + deduplicated (reference social.ts:717-721)
    assert row["linkedIns"] == sorted(set(row["linkedIns"]))


def test_open_graph_map(spark):
    html = (
        '<html><head>'
        '<meta property="og:title" content="First Title" />'
        '<meta property="og:title" content="Second Title" />'
        '<meta content="dup-order" property="og:description">'
        '<meta property="og:image" content="https://img.example.com/x.png">'
        "</head><body></body></html>"
    )
    df = spark.createDataFrame([(html,)], "html string")
    got = df.select(open_graph_map_col("html").alias("m")).collect()[0]["m"]
    assert got["og:title"] == "First Title"  # first occurrence wins
    assert got["og:image"] == "https://img.example.com/x.png"
    # attribute order variant (content before property) is still matched
    # by the forward regex only when property comes first; reversed-order
    # tags are a known subset limitation
    assert "og:description" not in got or got["og:description"] == "dup-order"
