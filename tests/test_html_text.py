"""htmlToText / extract-links parity tests.

Mirrors /root/reference/test/utils/cheerio.test.ts (golden corpus + unit
cases); golden text is byte-exact."""

import pytest

from crawlee_spark.functions.html_text import extract_links_py, html_to_text_py
from tests.golden_html import GOLDEN_HTML, GOLDEN_LINKS, GOLDEN_TEXT


def check(html, expected, has_body=False):
    assert html_to_text_py(html) == expected
    if not has_body:
        embedded = f"""
        <html>
            <head>
                <title>Title should be ignored</title>
                <style>
                    .styles_should_be_ignored_too {{}}
                </style>
                <script type="application/javascript">
                    scriptsShouldBeIgnoredToo();
                </script>
            </head>
            <body>
                {html}
            </body>
        </html>"""
        assert html_to_text_py(embedded) == expected


def test_invalid_args():
    assert html_to_text_py(None) == ""
    assert html_to_text_py("") == ""


def test_basic_elements():
    check("Plain text node", "Plain text node")
    check("   Plain    text     node    ", "Plain text node")
    check("   \nPlain    text     node  \n  ", "Plain text node")

    check("<h1>Header 1</h1> <h2>Header 2</h2>", "Header 1\nHeader 2")
    check("<h1>Header 1</h1> <h2>Header 2</h2><br>", "Header 1\nHeader 2")
    check("<h1>Header 1</h1> <h2>Header 2</h2><br><br>", "Header 1\nHeader 2")
    check("<h1>Header 1</h1> <h2>Header 2</h2><br><br><br>", "Header 1\nHeader 2")

    check("<h1>Header 1</h1><br><h2>Header 2</h2><br><br><br>", "Header 1\n\nHeader 2")
    check("<h1>Header 1</h1> <br> <h2>Header 2</h2><br><br><br>", "Header 1\n\nHeader 2")
    check("<h1>Header 1</h1>  \n <br>\n<h2>Header 2</h2><br><br><br>", "Header 1\n\nHeader 2")
    check("<h1>Header 1</h1>  \n <br>\n<br><h2>Header 2</h2><br><br><br>", "Header 1\n\n\nHeader 2")
    check("<h1>Header 1</h1>  \n <br>\n<br><br><h2>Header 2</h2><br><br><br>", "Header 1\n\n\n\nHeader 2")


def test_td_tabs():
    # trailing tab is removed by the final trim (cheerio.test.ts:83-94)
    check(
        """<table>
                <tr>
                    <td>Cell    A1</td><td>Cell A2</td>
                    <td>    Cell A3    </td>
                </tr>
                <tr>
                    <td>Cell    B1</td><td>Cell B2</td>
                </tr>
            </table>""",
        "Cell A1\tCell A2\tCell A3 \t\nCell B1\tCell B2",
    )


def test_divs_and_nesting():
    check("<div><div>Div</div><p>Paragraph</p></div>", "Div\nParagraph")
    check("<div>Div1</div><!-- Some comments --><div>Div2</div>", "Div1\nDiv2")
    check("<div>Div1</div><style>Skip styles</style>", "Div1")
    check("<script>Skip_scripts();</script><div>Div1</div>", "Div1")
    check("<SCRIPT>Skip_scripts();</SCRIPT><div>Div1</div>", "Div1")
    check("<svg>Skip svg</svg><div>Div1</div>", "Div1")
    check("<canvas>Skip canvas</canvas><div>Div1</div>", "Div1")
    check(
        "<h1>Heading 1</h1><div><div><div><div>Deep  Div</div></div></div></div><h2>Heading       2</h2>",
        "Heading 1\nDeep Div\nHeading 2",
    )
    check("<a>this_word</a>_should_<b></b>be_<span>one</span>", "this_word_should_be_one")
    check('<span attributes="should" be="ignored">some <span>text</span></span>', "some text")


def test_pre_preserved():
    check("<b>A  B  C  D  E\n\nF  G</b>", "A B C D E F G")
    check("<pre>A  B  C  D  E\n\nF  G</pre>", "A  B  C  D  E\n\nF  G")


def test_named_entities():
    check("<span>&aacute; &eacute;</span>", "á é")


def test_entities_decoded():
    check("a &gt; b &lt; c &amp; d", "a > b < c & d")
    # &nbsp; is unicode whitespace → compressed like any whitespace
    check("HTML&nbsp;entities", "HTML entities")


def test_skip_tags():
    check("before<script>skip();</script>after", "beforeafter")
    check("before<style>.x{}</style>after", "beforeafter")
    check("before<svg><text>skip</text></svg>after", "beforeafter")
    check("before<noscript>skip</noscript>after", "beforeafter")
    check("before<!-- comment -->after", "beforeafter")


def test_golden_corpus():
    assert html_to_text_py(GOLDEN_HTML) == GOLDEN_TEXT


def test_extract_links_golden():
    assert extract_links_py(GOLDEN_HTML, "https://example.com/") == GOLDEN_LINKS


def test_extract_links_relative_resolution():
    html = '<a href="/x">a</a><a href="y/z">b</a><a href="https://abs.com/q">c</a>'
    assert extract_links_py(html, "https://base.com/dir/page") == [
        "https://base.com/x",
        "https://base.com/dir/y/z",
        "https://abs.com/q",
    ]


def test_extract_links_base_href():
    html = '<base href="https://based.com/sub/"><a href="rel">a</a>'
    assert extract_links_py(html, "https://orig.com/") == ["https://based.com/sub/rel"]
    # relative base href resolves against the document URL first
    html2 = '<base href="/b/"><a href="rel">a</a>'
    assert extract_links_py(html2, "https://orig.com/x/y") == ["https://orig.com/b/rel"]


def test_extract_links_relative_without_base_dropped():
    # reference throws; set-oriented engine drops (counted as skipped)
    assert extract_links_py('<a href="rel">a</a>', "") == []


def test_extract_links_empty_href_dropped():
    assert extract_links_py('<a href="">a</a><a>b</a>', "https://x.com/") == []


def test_charset_decode_udf(spark):
    """E6: per-row charset decode before the text walk."""
    from pyspark.sql import functions as F

    from crawlee_spark.functions.html_text import html_to_text_charset_udf

    latin = "<html><body><p>café straße</p></body></html>".encode("latin-1")
    utf8 = "<html><body><p>café</p></body></html>".encode("utf-8")
    df = spark.createDataFrame(
        [(latin, "ISO-8859-1"), (utf8, None), (utf8, "bogus-charset")],
        "html binary, charset string",
    )
    rows = [r["t"] for r in df.select(html_to_text_charset_udf("html", "charset").alias("t")).collect()]
    assert rows[0] == "café straße"
    assert rows[1] == "café"
    assert rows[2] == "café"  # unknown charset falls back to utf-8


# ---------------------------------------------------------------------------
# E9: RETRY_CSS_SELECTORS probe (blocked.ts:1-11) + fused extraction
# ---------------------------------------------------------------------------

def test_blocked_selectors_probe():
    from crawlee_spark.functions.html_text import RETRY_CSS_SELECTORS, blocked_selectors_py

    cloudflare = (
        '<html><body><div id="turnstile-wrapper">'
        '<iframe src="https://challenges.cloudflare.com/x"></iframe></div></body></html>'
    )
    google = '<div id="infoDiv0"><p><a href="https://www.google.com/policies/terms/x">t</a></p></div>'
    incapsula = '<iframe src="/_Incapsula_Resource?SWJIYLWA=1"></iframe>'
    assert blocked_selectors_py(cloudflare) == [RETRY_CSS_SELECTORS[0]]
    assert blocked_selectors_py(google) == [RETRY_CSS_SELECTORS[1]]
    assert blocked_selectors_py(incapsula) == [RETRY_CSS_SELECTORS[2]]
    # negatives: right structure, wrong attribute / not a descendant
    assert blocked_selectors_py(
        '<div id="turnstile-wrapper"><iframe src="https://example.com"></iframe></div>'
    ) == []
    assert blocked_selectors_py(
        '<iframe src="https://challenges.cloudflare.com/x"></iframe>'
    ) == []  # iframe not under #turnstile-wrapper
    assert blocked_selectors_py("<p>plain page</p>") == []


def test_extract_page_single_parse_equivalence():
    """Fused extraction must agree byte-for-byte with the standalone walks."""
    from crawlee_spark.functions.html_text import (
        extract_links_py,
        extract_page_py,
        html_to_text_py,
    )

    html = (
        '<html><head><base href="https://b.com/dir/"></head><body><h1>T</h1>'
        '<p>a  b</p><a href="x">x</a><a href="https://e.com/y">y</a>'
        "<pre>  keep\n me </pre></body></html>"
    )
    text, links, blocked = extract_page_py(html, "https://a.com/p")
    assert text == html_to_text_py(html)
    assert links == extract_links_py(html, "https://a.com/p")
    assert blocked == []


def test_extract_page_charset_decode(spark):
    """E6: latin-1 bytes decode per the charset column, byte-identical text."""
    from pyspark.sql import functions as F
    from crawlee_spark.functions.html_text import extract_page_udf

    latin = "<p>café</p>".encode("iso-8859-1")
    df = spark.createDataFrame(
        [(latin, "https://a.com/", "iso-8859-1"), (latin, "https://a.com/", "utf-8")],
        "html binary, base string, charset string",
    )
    rows = df.select(
        "charset", extract_page_udf("html", "base", "charset").alias("p")
    ).collect()
    got = {r["charset"]: r["p"]["text"] for r in rows}
    assert got["iso-8859-1"] == "café"
    assert got["utf-8"] != "café"  # mojibake without the charset wire-through
