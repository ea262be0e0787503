"""Sitemap ingestion: XML/TXT sitemaps + nested index recursion → DataFrame.

Reference semantics (packages/utils/src/internals/sitemap.ts):

- TXT parser (sitemap.ts:37-79): one URL per non-empty trimmed line.
- XML parser (sitemap.ts:81-179): ``<urlset><url>`` entries yield
  {loc (required, trimmed), lastmod (valid dates only), changefreq
  (whitelisted values only), priority (numeric)}; ``<sitemapindex>``
  ``<loc>`` entries are child sitemaps.
- ``parseSitemap`` (sitemap.ts:219-432) follows nested sitemap indexes and
  dedups visited sitemap URLs; here that recursion is an iterative driver
  loop over a small ``sitemap sources`` frame — child counts are tiny
  relative to URL counts, so the loop depth (≤ max_depth) costs one job per
  level while URL extraction stays fully distributed.
- ``Sitemap.tryCommonNames`` (sitemap.ts:443-461): probe ``/sitemap.xml``
  then ``/sitemap.txt`` at the origin.

Parsing is regex Column expressions over whole-file text (sitemaps are a
rigid machine-generated subset of XML — loc/lastmod/changefreq/priority
inside ``<url>`` blocks — so a streaming SAX parse and a block-regex scan
agree). Tag text is entity-decoded exactly like sax's text events
(``xml_unescape_col``: the five XML named entities + numeric character
references, single left-to-right pass, CDATA verbatim) — the sitemap spec
REQUIRES ``&`` → ``&amp;`` escaping in ``<loc>``, so multi-parameter URLs
are the common case, not an edge case. No Python runs per row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHANGEFREQ_VALUES = ("always", "hourly", "daily", "weekly", "monthly", "yearly", "never")

SITEMAP_URL_SCHEMA = (
    "loc string, lastmod timestamp, changefreq string, priority double, origin_sitemap_url string"
)


@F.pandas_udf(T.StringType())
def gunzip_body_udf(body: pd.Series) -> pd.Series:
    """Gunzip-or-decode a sitemap body fetched as bytes.

    Mirrors sitemap.ts:303-322: the reference sniffs the stream with
    fileTypeStream (magic bytes override the Content-Type header) and pipes
    through createGunzip() when gzipped. Here the gzip magic ``1f 8b``
    decides; plain bodies are utf-8-decoded as-is. A corrupt gzip body falls
    through to a raw decode, where the XML/TXT parsers then yield zero rows
    (the reference surfaces a parser error and likewise emits no items)."""
    import gzip
    import zlib

    def one(x):
        if x is None:
            return None
        if isinstance(x, str):
            return x
        bb = bytes(x)
        if bb[:2] == b"\x1f\x8b":
            try:
                bb = gzip.decompress(bb)
            # gzip.decompress raises EOFError on truncated streams and
            # zlib.error on corrupt deflate data, not just OSError/BadGzipFile
            except (OSError, EOFError, zlib.error):
                pass
        return bb.decode("utf-8", "replace")

    return body.apply(one)


def decompress_sitemap_bodies(df: DataFrame, *, body_col: str = "body") -> DataFrame:
    """Normalize a sitemap-content frame's body column to decoded text:
    BINARY bodies go through the gunzip/utf-8 kernel (``.gz`` sitemaps —
    most large real-world sitemaps are gzipped), STRING bodies pass
    through untouched."""
    if isinstance(df.schema[body_col].dataType, T.BinaryType):
        return df.withColumn(body_col, gunzip_body_udf(F.col(body_col)))
    return df


def _chr_col(cp: Column) -> Column:
    """Unicode codepoint (int Column) → single-character string, pure Column.

    Spark's ``char()`` is byte-modulo-256, so build the UTF-16 code units by
    hand instead: BMP codepoints decode directly as one UTF-16BE unit;
    supplementary planes (> 0xFFFF) decode as a surrogate pair. Codepoints
    outside Unicode (> 0x10FFFF) or in the surrogate gap return NULL (the
    caller leaves the reference verbatim, mirroring a parser that refuses
    the entity rather than emitting garbage)."""
    bmp = F.decode(F.unhex(F.lpad(F.hex(cp), 4, "0")), "UTF-16BE")
    off = cp - F.lit(0x10000)
    hi = F.lit(0xD800) + F.shiftright(off, 10)
    lo = F.lit(0xDC00) + off.bitwiseAND(F.lit(0x3FF))
    pair = F.decode(
        F.unhex(F.concat(F.lpad(F.hex(hi), 4, "0"), F.lpad(F.hex(lo), 4, "0"))),
        "UTF-16BE",
    )
    return (
        F.when((cp >= 0xD800) & (cp <= 0xDFFF), F.lit(None).cast("string"))
        .when(cp <= 0xFFFF, bmp)
        .when(cp <= 0x10FFFF, pair)
    )


_NAMED_ENTITIES = (("amp", "&"), ("lt", "<"), ("gt", ">"), ("quot", '"'), ("apos", "'"))


def xml_unescape_col(c: Column) -> Column:
    """Decode XML character references in a text Column, one left-to-right
    pass — exactly the text a SAX parser's ``ontext`` events would carry
    (sitemap.ts:83 ``new sax.SAXParser(true)``; strict sax decodes the five
    XML named entities plus ``&#NNN;``/``&#xHH;`` via String.fromCodePoint).

    Single-pass semantics matter: ``&amp;lt;`` must yield the literal text
    ``&lt;``, never ``<``. A naive regexp_replace chain gets the easy cases
    right but re-scans its own output; instead split on a zero-width
    lookahead before every ``&`` (each segment then starts with at most one
    reference) and decode only the segment's leading reference. Unknown or
    malformed references pass through verbatim. Pure Column expressions —
    no Python per row."""
    parts = F.split(c, r"(?=&)")

    def decode_one(p: Column) -> Column:
        expr = None
        for name, ch in _NAMED_ENTITIES:
            cond = p.startswith(f"&{name};")
            rep = F.concat(F.lit(ch), F.substring(p, len(name) + 3, 2_000_000_000))
            expr = F.when(cond, rep) if expr is None else expr.when(cond, rep)
        dec_digits = F.regexp_extract(p, r"^&#([0-9]{1,7});", 1)
        dec_char = _chr_col(dec_digits.cast("int"))
        expr = expr.when(
            (dec_digits != "") & dec_char.isNotNull(),
            F.concat(dec_char, F.regexp_replace(p, r"^&#[0-9]{1,7};", "")),
        )
        hex_digits = F.regexp_extract(p, r"^&#[xX]([0-9a-fA-F]{1,6});", 1)
        hex_char = _chr_col(F.conv(hex_digits, 16, 10).cast("int"))
        expr = expr.when(
            (hex_digits != "") & hex_char.isNotNull(),
            F.concat(hex_char, F.regexp_replace(p, r"^&#[xX][0-9a-fA-F]{1,6};", "")),
        )
        return expr.otherwise(p)

    return F.array_join(F.transform(parts, decode_one), "")


def _tag_text(block: Column, tag: str) -> Column:
    """Trimmed, entity-decoded text content of the first <tag>...</tag> in an
    XML block. Entity decoding mirrors the reference's SAX text events
    (sitemap.ts:81-103): the sitemap protocol REQUIRES ``&`` → ``&amp;``
    escaping in ``<loc>``, so every multi-query-parameter URL arrives
    escaped and must be decoded before keying."""
    full = F.regexp_extract(block, rf"(?is)<{tag}[^>]*>(.*?)</{tag}>", 1)
    decoded = _decode_tag_value(full)
    return F.when(decoded != "", decoded)


def _decode_tag_value(full: Column) -> Column:
    """Raw inner text of a tag (possibly CDATA-wrapped, untrimmed) → the text
    a SAX parse would deliver, trimmed. CDATA text reaches sax's oncdata
    verbatim — character references are NOT decoded inside CDATA, only in
    plain text events. Content may MIX CDATA sections with adjacent plain
    text (``<![CDATA[a]]>tail`` → ``atail``): sax concatenates its cdata and
    text events, so tokenize into CDATA sections vs plain runs, decode only
    the plain runs, and join — never drop a loc because the whole value
    isn't one anchored CDATA block."""
    trimmed = F.trim(full)
    toks = F.regexp_extract_all(
        trimmed, F.lit(r"(?s)(<!\[CDATA\[.*?\]\]>|(?:(?!<!\[CDATA\[).)+)"), 1
    )

    def dec(t: Column) -> Column:
        inner = F.regexp_extract(t, r"(?s)^<!\[CDATA\[(.*?)\]\]>$", 1)
        return F.when(t.startswith("<![CDATA["), inner).otherwise(xml_unescape_col(t))

    return F.trim(F.array_join(F.transform(toks, dec), ""))


def parse_sitemap_txt(df: DataFrame, text_col: str = "value", origin_col: str | None = None) -> DataFrame:
    """TXT sitemap lines → url rows (sitemap.ts:37-79 semantics)."""
    origin = F.col(origin_col) if origin_col else F.lit(None).cast("string")
    lines = df.select(
        origin.alias("origin_sitemap_url"),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    )
    return lines.select(
        F.trim("line").alias("loc"),
        F.lit(None).cast("timestamp").alias("lastmod"),
        F.lit(None).cast("string").alias("changefreq"),
        F.lit(None).cast("double").alias("priority"),
        "origin_sitemap_url",
    ).filter(F.col("loc") != "")


def parse_sitemap_xml(
    df: DataFrame, xml_col: str = "value", origin_col: str | None = None
) -> DataFrame:
    """``<urlset>`` XML → (loc, lastmod, changefreq, priority, origin) rows.

    Field rules match the reference: loc required (rows without it are
    dropped, sitemap.ts:140-145); lastmod kept only when parseable
    (``try_to_timestamp``); changefreq only when whitelisted; priority
    numeric (``try_cast``)."""
    origin = F.col(origin_col) if origin_col else F.lit(None).cast("string")
    blocks = df.select(
        origin.alias("origin_sitemap_url"),
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(r"(?is)<url\b[^>]*>(.*?)</url>"), F.lit(1))
        ).alias("block"),
    )
    loc = _tag_text(F.col("block"), "loc")
    lastmod = F.try_to_timestamp(_tag_text(F.col("block"), "lastmod"))
    changefreq = _tag_text(F.col("block"), "changefreq")
    priority = _tag_text(F.col("block"), "priority").try_cast("double")
    return blocks.select(
        loc.alias("loc"),
        lastmod.alias("lastmod"),
        F.when(changefreq.isin(*CHANGEFREQ_VALUES), changefreq).alias("changefreq"),
        priority.alias("priority"),
        "origin_sitemap_url",
    ).filter(F.col("loc").isNotNull())


def parse_sitemap_index(df: DataFrame, xml_col: str = "value") -> DataFrame:
    """``<sitemapindex>`` XML → child sitemap URLs (column ``sitemap_url``)."""
    only_index = df.filter(F.col(xml_col).rlike(r"(?is)<sitemapindex[\s>]"))
    return (
        only_index.select(
            F.explode(
                F.regexp_extract_all(
                    F.col(xml_col),
                    F.lit(r"(?is)<sitemap\b[^>]*>.*?<loc[^>]*>(.*?)</loc>.*?</sitemap>"),
                    F.lit(1),
                )
            ).alias("raw_loc")
        )
        .select(_decode_tag_value(F.col("raw_loc")).alias("sitemap_url"))
        .filter(F.col("sitemap_url").isNotNull() & (F.col("sitemap_url") != ""))
    )


def parse_sitemaps(
    contents: DataFrame,
    *,
    url_col: str = "sitemap_url",
    body_col: str = "body",
    fetch_children,
    max_depth: int = 5,
) -> DataFrame:
    """S4/S5: follow nested sitemap indexes, dedup visited, emit all URLs.

    ``contents``: (sitemap_url, body) for the initial sitemaps.
    ``fetch_children(urls_df) -> DataFrame(sitemap_url, body)`` supplies the
    bodies of child sitemaps discovered in index files (in tests a join
    against a fixture table; in production an HTTP-fetch stage).

    The driver loop runs once per nesting level (sitemap indexes are
    shallow); each level's URL extraction is one distributed pass. Visited
    dedup is a LEFT ANTI join against a ``seen`` DataFrame that never leaves
    the cluster — no driver-side URL set (a 10^6-sitemap index would hold
    ~100 MB on the driver) and never an ``isin`` literal list. Bodies may be
    BINARY (gzipped sitemaps, sitemap.ts:303-322): they are gunzipped /
    decoded before parsing, and ``.txt.gz`` paths parse as TXT."""
    out: DataFrame | None = None
    frontier: DataFrame | None = decompress_sitemap_bodies(contents, body_col=body_col)
    seen: DataFrame | None = None  # (url_col) rows — a frame, not driver state

    for _ in range(max_depth + 1):
        if frontier is None:
            break
        if seen is not None:
            # defensive re-check: children are pre-filtered below, but
            # fetch_children may return extra rows
            frontier = frontier.join(seen, url_col, "left_anti")
        # pin: this level's bodies feed BOTH the URL extraction and the
        # child-index scan (and the decompress kernel should run once)
        frontier = frontier.localCheckpoint(eager=True)
        if frontier.isEmpty():
            break
        level_ids = frontier.select(url_col).distinct()
        seen = (
            level_ids
            if seen is None
            else seen.unionByName(level_ids).localCheckpoint(eager=True)
        )
        is_txt = F.col(url_col).rlike(r"\.txt(\.gz)?$") | ~F.col(body_col).rlike(
            r"(?is)<(urlset|sitemapindex)[\s>]"
        )
        xml_part = frontier.filter(~is_txt)
        txt_part = frontier.filter(is_txt)
        level_urls = parse_sitemap_xml(xml_part, xml_col=body_col, origin_col=url_col).unionByName(
            parse_sitemap_txt(txt_part, text_col=body_col, origin_col=url_col)
        )
        out = level_urls if out is None else out.unionByName(level_urls)
        children = parse_sitemap_index(xml_part, xml_col=body_col).join(
            seen.withColumnRenamed(url_col, "sitemap_url"), "sitemap_url", "left_anti"
        )
        if children.isEmpty():
            break
        frontier = decompress_sitemap_bodies(fetch_children(children), body_col=body_col)
    if out is None:
        raise ValueError("no sitemap contents supplied")
    return out


def common_sitemap_candidates_col(url: Column | str) -> Column:
    """S6 tryCommonNames: ['{origin}/sitemap.xml', '{origin}/sitemap.txt']."""
    c = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    netloc = F.lower(F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    origin = F.concat(scheme, F.lit("://"), netloc)
    return F.array(
        F.concat(origin, F.lit("/sitemap.xml")), F.concat(origin, F.lit("/sitemap.txt"))
    )
