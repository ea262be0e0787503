"""HTML → text and link extraction, byte-identical to the reference.

Reference algorithm: ``htmlToText`` at
``packages/utils/src/internals/cheerio.ts:44-87`` (cheerio over a spec-compliant
HTML parse with decoded entities):

- skip ``script|style|canvas|svg|noscript`` subtrees and comments;
- text nodes: collapse ``\\s+`` → single space unless the parent is ``<pre>``;
  suppress a leading space if the output already ends with whitespace (or is
  empty);
- ``<br>`` → ``\\n``; ``<td>`` → children then ``\\t``;
- block tags (``p h1-h6 ol ul li pre address blockquote dl div fieldset form
  table tr select option``) are surrounded by single ``\\n`` without stacking;
- convert only the ``<body>`` subtree when present; final ``.trim()``.

Link extraction: ``extractUrlsFromCheerio`` at ``cheerio.ts:98-122`` — collect
``href`` of matched elements, honor ``<base href>``, resolve relative URLs
against the base, drop unresolvable ones.

The DOM here is built with Python's ``html.parser`` plus the handful of HTML5
tree-construction behaviors the walk is sensitive to (void elements, implied
end tags, the newline-after-``<pre>`` strip, head/body separation). Golden
corpus: ``test/shared/data/html_to_text_test_data.ts`` (transcribed in
``tests/golden_html.py``).

Everything is exposed as Arrow-batched pandas UDFs — the only Python in the
extraction path, amortized over Arrow record batches (no per-row Python).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

# E9 blocked-detection probe (packages/utils/src/internals/blocked.ts:1-11):
# elements whose presence means the crawler is being challenged, checked by
# HttpCrawler.isRequestBlocked (http-crawler.ts:600-614) on every HTML page.
CLOUDFLARE_RETRY_CSS_SELECTORS = (
    '#turnstile-wrapper iframe[src^="https://challenges.cloudflare.com"]',
)
RETRY_CSS_SELECTORS = CLOUDFLARE_RETRY_CSS_SELECTORS + (
    'div#infoDiv0 a[href*="//www.google.com/policies/terms/"]',
    'iframe[src*="_Incapsula_Resource"]',
)

SKIP_TAGS = {"script", "style", "canvas", "svg", "noscript"}
BLOCK_TAGS = {
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "ol", "ul", "li", "pre",
    "address", "blockquote", "dl", "div", "fieldset", "form", "table", "tr",
    "select", "option",
}
VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}
# Implied end tags (HTML5 subset): starting tag K closes an open element in V.
_IMPLIED_CLOSERS = {
    "li": {"li"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "tr": {"tr", "td", "th"},
    "option": {"option"},
    "p": {"p"},
    "dt": {"dt", "dd"},
    "dd": {"dt", "dd"},
}
# Block-level starts that close an open <p> (HTML5 "in body" subset).
_P_CLOSERS = BLOCK_TAGS - {"option", "tr", "select"}


class _Node:
    __slots__ = ("tag", "attrs", "children", "parent", "data", "is_text")

    def __init__(self, tag=None, attrs=None, parent=None, data=None, is_text=False):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list[_Node] = []
        self.parent = parent
        self.data = data
        self.is_text = is_text


class _DomBuilder(HTMLParser):
    """Minimal HTML5-ish DOM: void elements, implied end tags, pre-newline."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node(tag="#root")
        self.stack = [self.root]

    # -- helpers --
    def _top(self) -> _Node:
        return self.stack[-1]

    def _append(self, node: _Node):
        node.parent = self._top()
        self._top().children.append(node)

    def _close_implied(self, tag: str):
        closers = _IMPLIED_CLOSERS.get(tag, set())
        while len(self.stack) > 1 and self._top().tag in closers:
            self.stack.pop()
        if tag in _P_CLOSERS:
            # a block start closes an open <p> if it's the nearest open element
            if len(self.stack) > 1 and self._top().tag == "p" and tag != "p":
                self.stack.pop()

    # -- parser events --
    def handle_starttag(self, tag, attrs):
        self._close_implied(tag)
        node = _Node(tag=tag, attrs=dict(attrs))
        self._append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._close_implied(tag)
        self._append(_Node(tag=tag, attrs=dict(attrs)))

    def handle_endtag(self, tag):
        if tag in VOID_TAGS:
            return
        # pop to the matching open tag if present; otherwise ignore
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        top = self._top()
        if top.tag == "pre" and not top.children and data.startswith("\n"):
            # HTML5 tree construction drops a newline right after <pre>
            data = data[1:]
            if not data:
                return
        self._append(_Node(data=data, is_text=True))

    def handle_comment(self, data):
        pass  # comments are skipped by the walk anyway

    def handle_decl(self, decl):
        pass


def _find_first(node: _Node, tag: str) -> _Node | None:
    for child in node.children:
        if not child.is_text:
            if child.tag == tag:
                return child
            found = _find_first(child, tag)
            if found is not None:
                return found
    return None


_WS_RE = re.compile(r"\s+")
_ENDS_WS_RE = re.compile(r"(^|\s)$")


def parse_html(html: str) -> _Node:
    builder = _DomBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


def html_to_text_py(html: str | None) -> str:
    """Byte-identical port target of cheerio.ts:44-87 (see module docstring)."""
    if not html:
        return ""
    return _text_from_root(parse_html(html))


def _text_from_root(root: _Node) -> str:
    # output accumulated as chunks; joined once at the end
    out: list[str] = []

    def ends_with_ws() -> bool:
        return not out or _ENDS_WS_RE.search(out[-1][-1:] if out[-1] else "") is not None

    def ends_with(ch: str) -> bool:
        for chunk in reversed(out):
            if chunk:
                return chunk.endswith(ch)
        return True  # empty text counts as "beginning"

    def is_empty() -> bool:
        return not any(out)

    def process(elems: list[_Node]):
        for elem in elems:
            if elem.is_text:
                if elem.parent is not None and elem.parent.tag == "pre":
                    compr = elem.data
                else:
                    compr = _WS_RE.sub(" ", elem.data)
                if compr.startswith(" ") and (is_empty() or ends_with_ws()):
                    compr = compr[1:]
                if compr:
                    out.append(compr)
            elif elem.tag in SKIP_TAGS:
                continue
            elif elem.tag == "br":
                out.append("\n")
            elif elem.tag == "td":
                process(elem.children)
                out.append("\t")
            else:
                is_block = elem.tag in BLOCK_TAGS
                if is_block and not (is_empty() or ends_with("\n")):
                    out.append("\n")
                process(elem.children)
                if is_block and not (is_empty() or ends_with("\n")):
                    out.append("\n")

    body = _find_first(root, "body")
    if body is not None:
        process(body.children)
    else:
        # a document parse always has an (implied) body; approximate it by
        # excluding head-only subtrees when no explicit <body> exists
        head = _find_first(root, "head")
        top = _find_first(root, "html") or root
        children = [c for c in top.children if c is not head and not (not c.is_text and c.tag in {"head", "title"})]
        process(children)

    return "".join(out).strip()


_ABSOLUTE_HREF_RE = re.compile(r"^[a-z][a-z0-9+.-]*:")


def _try_absolute_url(href: str, base: str) -> str | None:
    """``tryAbsoluteURL``: WHATWG new URL(href, base) → str, None on failure."""
    try:
        absolute = urljoin(base, href) if base else href
        # must end up absolute with a scheme
        if not _ABSOLUTE_HREF_RE.match(absolute):
            return None
        return absolute
    except ValueError:
        return None


def _collect_tags(node: _Node, tag: str, acc: list[_Node]):
    for child in node.children:
        if not child.is_text:
            if child.tag == tag:
                acc.append(child)
            _collect_tags(child, tag, acc)


def extract_links_py(html: str | None, base_url: str | None = "", selector: str = "a") -> list[str]:
    """``extractUrlsFromCheerio`` (cheerio.ts:98-122): href of matched elements,
    ``<base href>`` honored, relative hrefs resolved, unresolvable dropped.

    Selector support: a bare tag name, or ``tag[href]`` (the engine only ever
    needs link-ish selectors; the reference defaults to ``'a'``).
    """
    if not html:
        return []
    return _links_from_root(parse_html(html), base_url, selector)


def _links_from_root(root: _Node, base_url: str | None = "", selector: str = "a") -> list[str]:
    base_url = base_url or ""
    tag = selector.split("[", 1)[0].strip() or "a"

    base_el = _find_first(root, "base")
    if base_el is not None:
        base_href = base_el.attrs.get("href")
        if base_href:
            resolved = _try_absolute_url(base_href, base_url)
            if resolved:
                base_url = resolved

    elems: list[_Node] = []
    _collect_tags(root, tag, elems)

    urls: list[str] = []
    for el in elems:
        href = el.attrs.get("href")
        if not href:
            continue
        if not _ABSOLUTE_HREF_RE.match(href) and not base_url:
            # reference throws here; in a set-oriented engine we drop + count
            continue
        resolved = _try_absolute_url(href, base_url) if base_url else href
        if resolved:
            urls.append(resolved)
    return urls


# ---------------------------------------------------------------------------
# E9: blocked-detection selector probe (mini CSS matcher)
# ---------------------------------------------------------------------------

# simple selector: tag?, #id?, [attr op "value"]* — the subset
# RETRY_CSS_SELECTORS needs (ops: = ^= *=); descendant combinator = space
_SIMPLE_SEL_RE = re.compile(
    r"^(?P<tag>[a-zA-Z][a-zA-Z0-9]*)?"
    r"(?:#(?P<id>[\w-]+))?"
    r"(?P<attrs>(?:\[[\w-]+[*^$]?=\"[^\"]*\"\])*)$"
)
_ATTR_RE = re.compile(r"\[([\w-]+)([*^$]?=)\"([^\"]*)\"\]")


def _parse_selector(sel: str) -> list[tuple]:
    """Parse a descendant-combinator CSS selector into simple parts."""
    parts = []
    for token in sel.split():
        m = _SIMPLE_SEL_RE.match(token)
        if not m:
            raise ValueError(f"unsupported selector: {token!r}")
        attrs = _ATTR_RE.findall(m.group("attrs") or "")
        parts.append((m.group("tag"), m.group("id"), attrs))
    return parts


def _match_simple(node: _Node, part: tuple) -> bool:
    tag, id_, attrs = part
    if node.is_text:
        return False
    if tag and node.tag != tag:
        return False
    if id_ and node.attrs.get("id") != id_:
        return False
    for name, op, val in attrs:
        actual = node.attrs.get(name)
        if actual is None:
            return False
        if op == "=" and actual != val:
            return False
        if op == "^=" and not actual.startswith(val):
            return False
        if op == "*=" and val not in actual:
            return False
        if op == "$=" and not actual.endswith(val):
            return False
    return True


def _any_descendant_match(node: _Node, parts: list[tuple]) -> bool:
    """True iff some element under ``node`` matches parts[0] and contains a
    descendant chain matching the rest."""
    head, rest = parts[0], parts[1:]
    for child in node.children:
        if child.is_text:
            continue
        if _match_simple(child, head) and (
            not rest or _any_descendant_match(child, rest)
        ):
            return True
        if _any_descendant_match(child, parts):
            return True
    return False


def matched_blocked_selectors(root: _Node) -> list[str]:
    """RETRY_CSS_SELECTORS present in the DOM (isRequestBlocked's
    ``foundSelectors``, http-crawler.ts:603-608)."""
    return [s for s in RETRY_CSS_SELECTORS if _any_descendant_match(root, _parse_selector(s))]


def blocked_selectors_py(html: str | None) -> list[str]:
    if not html:
        return []
    return matched_blocked_selectors(parse_html(html))


# ---------------------------------------------------------------------------
# fused single-parse extraction: text + links + blocked probe (+ E6 charset)
# ---------------------------------------------------------------------------

EXTRACT_PAGE_SCHEMA = StructType(
    [
        StructField("text", StringType()),
        StructField("links", ArrayType(StringType())),
        StructField("blocked", ArrayType(StringType())),
    ]
)


def extract_page_py(html: str | None, base_url: str | None) -> tuple:
    """One DOM parse serving E2 (htmlToText), E1 (extractUrlsFromCheerio) and
    E9 (blocked probe) — the engine's hot path parses each page exactly once
    instead of once per concern."""
    if not html:
        return ("", [], [])
    root = parse_html(html)
    return (
        _text_from_root(root),
        _links_from_root(root, base_url),
        matched_blocked_selectors(root),
    )


# ---------------------------------------------------------------------------
# Arrow-batched pandas UDFs
# ---------------------------------------------------------------------------


def _as_str(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, (bytes, bytearray)):
        return v.decode("utf-8", errors="replace")
    return v


@pandas_udf(StringType())
def html_to_text_udf(html: pd.Series) -> pd.Series:
    """Vectorized htmlToText over a string or binary html column."""
    return html.map(lambda h: html_to_text_py(_as_str(h)))


def _decode(v, charset) -> str | None:
    """E6 charset handling (http-crawler.ts:843-885): decode with the
    response charset, falling back to utf-8 for unknown/broken encodings
    (the reference iconv-normalizes unsupported charsets the same way)."""
    if v is None:
        return None
    if not isinstance(v, (bytes, bytearray)):
        return v
    enc = (charset or "utf-8").strip().lower()
    try:
        return bytes(v).decode(enc, errors="replace")
    except LookupError:
        return bytes(v).decode("utf-8", errors="replace")


@pandas_udf(StringType())
def html_to_text_charset_udf(html: pd.Series, charset: pd.Series) -> pd.Series:
    """htmlToText with per-row charset decode (E6)."""
    return pd.Series(
        [html_to_text_py(_decode(h, c)) for h, c in zip(html, charset)],
        index=html.index,
    )


@pandas_udf(ArrayType(StringType()))
def extract_links_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    """Vectorized extractUrlsFromCheerio(html, 'a', base_url)."""
    return pd.Series(
        [extract_links_py(_as_str(h), b) for h, b in zip(html, base_url)],
        index=html.index,
    )


@pandas_udf(ArrayType(StringType()))
def blocked_selectors_udf(html: pd.Series) -> pd.Series:
    """Vectorized RETRY_CSS_SELECTORS probe (E9)."""
    return pd.Series([blocked_selectors_py(_as_str(h)) for h in html], index=html.index)


@pandas_udf(EXTRACT_PAGE_SCHEMA)
def extract_page_udf(html: pd.Series, base_url: pd.Series, charset: pd.Series) -> pd.DataFrame:
    """Fused single-parse extraction with per-row charset decode (E6):
    struct(text, links, blocked). The charset comes from the Content-Type
    header / forceResponseEncoding (http-crawler.ts:843-885); unknown
    encodings fall back to utf-8 the way the reference iconv path does."""
    rows = [
        extract_page_py(_decode(h, c), b)
        for h, b, c in zip(html, base_url, charset)
    ]
    return pd.DataFrame(rows, columns=["text", "links", "blocked"], index=html.index)
