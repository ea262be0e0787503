"""Deterministic synthetic crawl fixtures (seed=42, no wall clock, no network).

Generates the FIXTURES.md tables at small scale for tests and at parametric
scale for the bench:

- ``pages(url, warc_ts, html, text, lang, status_code, content_type)`` —
  Common-Crawl-style pages (BASELINE input_hint shape + fault-injection
  columns). ``text`` is the expected htmlToText output — computed with the
  golden-verified kernel, so the engine's per-URL byte-identity is checkable
  row-wise.
- ``robots(host, robots_txt)`` — synthetic rules incl. the missing-host
  (allow-all / 404) case.
- ``seeds(url)`` — includes duplicates, normalization variants and
  robots-disallowed URLs.

Pages link to each other deterministically (same host, cross host, relative,
base-href), so a multi-round crawl discovers a growing frontier. One hot host
holds ~40% of pages (the skew case).
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import DataFrame, SparkSession

from crawlee_spark.functions.html_text import html_to_text_py

HOT_HOST = "hot.example.com"
HOSTS = [
    HOT_HOST,
    "www.example.com",
    "a.example.com",
    "news.example.org",
    "shop.example.net",
    "blog.example.co.uk",
    "flaky.example.dev",  # 500s on some pages
    "blocked.example.io",  # robots-disallowed paths
]

_EPOCH = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)


def _page_urls(n_pages: int, rng: random.Random) -> list[str]:
    """Deterministic URL universe: hot host gets ~40% of pages."""
    urls = []
    for i in range(n_pages):
        host = HOT_HOST if i % 5 < 2 else HOSTS[1 + (i % (len(HOSTS) - 1))]
        depth = i % 3
        segs = "/".join(f"s{(i * 7 + d) % 10}" for d in range(depth))
        path = f"/p{i}" + (f"/{segs}" if segs else "")
        urls.append(f"https://{host}{path}")
    return urls


def _make_html(i: int, url: str, all_urls: list[str], rng: random.Random) -> str:
    """HTML from a fixed element pool, linking to other fixture pages."""
    n = len(all_urls)
    links = []
    # same-host absolute link
    links.append(all_urls[(i * 3 + 1) % n])
    # cross-host absolute link
    links.append(all_urls[(i * 5 + 2) % n])
    # relative link resolving to another fixture URL when same host
    rel_target = all_urls[(i * 7 + 3) % n]
    body_links = "".join(f'<a href="{u}">link {j}</a> ' for j, u in enumerate(links))
    parts = [
        "<html><head><title>ignored</title></head><body>",
        f"<h1>Page {i}</h1>",
        f"<p>Deterministic   content for page {i} &amp; entities &gt;here&lt;.</p>",
        f"<div>{body_links}</div>",
        f'<a href="{rel_target}">rel-ish</a>',
        f"<table><tr><td>c{i}</td><td>d{i}</td></tr></table>",
        f"<pre>pre {i}\n  kept</pre>",
        "<script>skip();</script><style>.x{}</style>",
        # some dup-inducing links: fragment + utm variants of link 0
        f'<a href="{links[0]}#frag">dup-frag</a>',
        f'<a href="{links[0]}?utm_source=x">dup-utm</a>',
        "</body></html>",
    ]
    if i % 4 == 0:
        parts.insert(4, f'<ul><li>item {i}a</li><li>item {i}b</li></ul>')
    return "".join(parts)


def make_pages_rows(n_pages: int = 60, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    urls = _page_urls(n_pages, rng)
    rows = []
    langs = ["en", "de", "cs", "fr"]
    for i, url in enumerate(urls):
        html = _make_html(i, url, urls, rng)
        host = url.split("/")[2]
        status = 200
        content_type = "text/html; charset=utf-8"
        if host == "flaky.example.dev" and i % 2 == 0:
            status = 503
        if i % 17 == 0 and i > 0:
            content_type = "application/octet-stream"  # MIME-gated (E5)
        rows.append(
            {
                "url": url,
                "warc_ts": _EPOCH + dt.timedelta(seconds=i),
                "html": html.encode("utf-8"),
                "text": html_to_text_py(html),
                "lang": langs[i % 4],
                "status_code": status,
                "content_type": content_type,
            }
        )
    return rows


def make_pages(spark: SparkSession, n_pages: int = 60, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(
        make_pages_rows(n_pages, seed),
        "url string, warc_ts timestamp, html binary, text string, lang string, "
        "status_code int, content_type string",
    )


ROBOTS_RULES = {
    "blocked.example.io": "User-agent: *\nDisallow: /\n",
    "www.example.com": "User-agent: *\nDisallow: /private\nAllow: /private/ok\n",
    "news.example.org": "User-agent: specialbot\nDisallow: /\n\nUser-agent: *\nDisallow:\n",
    # hot host: no robots row at all ⇒ allow-all (404 path)
}


def make_robots(spark: SparkSession) -> DataFrame:
    rows = [{"host": h, "robots_txt": r} for h, r in ROBOTS_RULES.items()]
    return spark.createDataFrame(rows, "host string, robots_txt string")


def make_seeds(spark: SparkSession, pages: list[dict] | None = None, n: int = 6) -> DataFrame:
    """Seed list with dedup/normalization/robots cases mixed in."""
    pages = pages or make_pages_rows()
    base = [p["url"] for p in pages[:n]]
    extra = [
        base[0] + "#fragment",            # normalizes to base[0] → dup
        base[1] + "?utm_source=feed",     # normalizes to base[1] → dup
        base[2].replace("https://", "HTTPS://"),  # case variant → dup
        "https://blocked.example.io/p999",  # robots-disallowed
    ]
    return spark.createDataFrame([(u,) for u in base + extra], "url string")
