"""Social-handle + Open Graph extraction as Column expressions.

Reference: ``packages/utils/src/internals/social.ts`` (public regex API:
EMAIL/PHONE/LINKEDIN/TWITTER/INSTAGRAM/FACEBOOK/YOUTUBE/TIKTOK/PINTEREST/
DISCORD *_REGEX_GLOBAL, social.ts:9-632) and ``parseHandlesFromHtml``
(social.ts:665-725): match each global regex against the raw HTML, then
deduplicate and sort. ``phonesFromText`` (social.ts:127-146) post-filters
matches to ≥7 digits and drops date-like strings; ``emailsFromUrls`` /
``phonesFromUrls`` (social.ts:46-57, 153-165) strip ``mailto:`` / ``tel:``
prefixes from link hrefs and re-validate.

Open Graph: ``packages/utils/src/internals/open_graph_parser.ts`` walks
``meta[property=og:*]`` tags; here that is one ``regexp_extract_all`` over
the raw HTML into a ``map<property, content>`` (first occurrence wins, as
cheerio's ``attr()`` takes the first element).

All patterns are ported JS→Java regex (lookbehinds are fixed-width
alternations, which Java accepts); everything runs JVM-side via
``regexp_extract_all`` — no Python in the extraction path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- email (social.ts:9-22) -------------------------------------------------
EMAIL_REGEX = (
    r"(?i)(?:[a-z0-9!#$%&'*+/=?^_`{|}~-]{1,64}(?:\.[a-z0-9!#$%&'*+/=?^_`{|}~-]{1,64}){0,32})"
    r"@(?:(?:[a-z0-9](?:[a-z0-9-]{0,62}[a-z0-9])?\.)+[a-z0-9](?:[a-z0-9-]{0,62}[a-z0-9])?)"
)
MAILTO_PREFIX = r"(?i)^mailto:"

# --- phones (social.ts:62-117) ----------------------------------------------
_PHONE_PATTERNS = [
    "[0-9]{6,15}",
    r"([0-9]{1,4}( )?)?\([0-9]{2,4}\)( )?[0-9]{2,4}(( )?(-|.))?( )?[0-9]{2,6}",
    r"\([0-9]{2}\)( )?[0-9]{4,5}-[0-9]{4}",
    r"([0-9]{1,4}( )?)?\([0-9]{2,4}\)( )?[0-9]{2,4}(( )?(-|.))?( )?[0-9]{2,6}",
    "[0-9]{2,4}-[0-9]{2,4}-[0-9]{2,4}-[0-9]{2,6}",
    "[0-9]{2,4}-[0-9]{2,4}-[0-9]{2,6}",
    "[0-9]{2,4}-[0-9]{2,6}",
    r"[0-9]{2,4}\.[0-9]{2,4}\.[0-9]{2,4}\.[0-9]{2,6}",
    r"[0-9]{2,4}\.[0-9]{2,4}\.[0-9]{2,6}",
    r"[0-9]{2,4}\.[0-9]{2,6}",
    "[0-9]{2,4} [0-9]{2,4} [0-9]{2,4} [0-9]{2,6}",
    "[0-9]{2,4} [0-9]{2,4} [0-9]{2,6}",
    "[0-9]{2,4} [0-9]{3,8}",
]
PHONE_REGEX = "(?i)(" + "|".join(f"(00|\\+)?{p}" for p in _PHONE_PATTERNS) + ")"
PHONE_MIN_DIGITS = 7  # social.ts:106
SKIP_PHONE_REGEX = "^[0-9]{4}-[0-9]{2}-[0-9]{2}$"  # date-like, social.ts:110-113
TEL_PREFIX = r"(?i)^(tel|phone|telephone|callto):(/)?(/)?"

# --- social profile URLs (social.ts:172-207, JS→Java) -----------------------
LINKEDIN_REGEX = (
    r"(?i)(?<!\w)(?:(?:http(?:s)?://)?(?:(?:(?:[a-z]+\.)?linkedin\.com/(?:in|company)/)"
    r"([a-z0-9\-_%=]{2,60})(?![a-z0-9\-_%=])))(?:/)?"
)
INSTAGRAM_REGEX = (
    r"(?i)(?<!\w)(?:http(?:s)?://)?(?:(?:www\.)?(?:instagram\.com|instagr\.am)/)"
    r"(?!explore|_n|_u)([a-z0-9_.]{2,30})(?![a-z0-9_.])(?:/)?"
)
_TWITTER_RESERVED = (
    r"oauth|account|tos|privacy|signup|home|hashtag|search|login|widgets|i|settings|start|"
    r"share|intent|oct|messages|explore|notifications|jobs|compose/post"
)
_X_SUBDOMAINS = "business|help|about|blog|careers|developer|ads"
TWITTER_REGEX = (
    rf"(?i)(?<!\w)(?:http(?:s)?://)?(?:www.)?(?<!(?:{_X_SUBDOMAINS})\.)(?:x|twitter)(?:.com)/"
    rf"(?!(?:{_TWITTER_RESERVED})(?:['\"?./]|$))(?:@)?([a-z0-9_]{{1,15}})(?![a-z0-9_])(?:/)?"
)
_FACEBOOK_RESERVED = (
    r"rsrc\.php|apps|groups|events|l\.php|friends|images|photo.php|chat|ajax|dyi|common|"
    r"policies|login|recover|reg|help|security|messages|marketplace|pages/(?:create|merge|search)|"
    r"live|bookmarks|games|fundraisers|saved|gaming|salesgroups|jobs|people|ads|ad_campaign|"
    r"weather|offers|recommendations|crisisresponse|onthisday|developers|settings|connect|"
    r"business|plugins|intern|sharer"
)
FACEBOOK_REGEX = (
    rf"(?i)(?<!\w)(?:http(?:s)?://)?(?:www.)?(?:facebook.com|fb.com)/"
    rf"(?!(?:{_FACEBOOK_RESERVED})(?:['\"?./]|$))(profile\.php\?id=[0-9]{{3,20}}|"
    rf"pages/[a-z0-9-_][a-z0-9-_./]{{0,150}}|(?!pages|profile\.php)[a-z0-9-.]{{5,51}}"
    rf"(?![a-z0-9.]))(?:/)?"
)
YOUTUBE_REGEX = (
    r"(?i)(?<!\w)(?:https?://)?(?:youtu\.be/|(?:www\.|m\.)?youtube\.com"
    r"(?:(?:(?:/(?:watch|v|embed|user|c(?:hannel)?)(?:\.php)?)?(?:\?[^ ]*v=|/))|(?:(?:/c)?/@)))"
    r"([a-zA-Z0-9\-_]{2,100})"
)
TIKTOK_REGEX = (
    r"(?i)(?<!\w)(?:http(?:s)?://)?(?:(?:www|m)\.)?(?:tiktok\.com)/"
    r"(((?:(?:v|embed|trending)(?:\?shareId=|/))[0-9]{2,50}(?![0-9]))|"
    r"(?:@)[a-z0-9\-_.]+((?:/video/)[0-9]{2,50}(?![0-9]))?)(?:/)?"
)
PINTEREST_REGEX = (
    r"(?i)(?<!\w)(?:http(?:s)?://)?(?:(?:(?:(?:www\.)?pinterest(?:\.com|(?:\.[a-z]{2}){1,2}))|"
    r"(?:[a-z]{2})\.pinterest\.com)(?:/))((pin/[0-9]{2,50})|((?!pin)[a-z0-9\-_.]+(/[a-z0-9\-_.]+)?))(?:/)?"
)
DISCORD_REGEX = (
    r"(?i)(?<!\w)(?:https?://)?(?:www\.)?((?:(?:(?:canary|ptb).)?(?:discord|discordapp)\.com/"
    r"channels(?:/)[0-9]{2,50}(/[0-9]{2,50})*)|(?:(?:(?:canary|ptb).)?"
    r"(?:discord\.(?:com|me|li|gg|io)|discordapp\.com)(?:/invite)?)/(?!channels)[a-z0-9\-_]{2,50})(?:/)?"
)

SOCIAL_REGEXES = {
    "linkedIns": LINKEDIN_REGEX,
    "twitters": TWITTER_REGEX,
    "instagrams": INSTAGRAM_REGEX,
    "facebooks": FACEBOOK_REGEX,
    "youtubes": YOUTUBE_REGEX,
    "tiktoks": TIKTOK_REGEX,
    "pinterests": PINTEREST_REGEX,
    "discords": DISCORD_REGEX,
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _sorted_distinct(arr: Column) -> Column:
    """Reference post-processing: dedupe + sort (social.ts:717-721)."""
    return F.array_sort(F.array_distinct(arr))


def emails_from_text_col(text: Column | str) -> Column:
    return _sorted_distinct(F.regexp_extract_all(_c(text), F.lit(EMAIL_REGEX), F.lit(0)))


def emails_from_urls_col(urls: Column | str) -> Column:
    """mailto: hrefs → validated emails (social.ts:46-57). ``urls`` is an
    array<string> column (e.g. extracted link hrefs)."""
    stripped = F.transform(
        F.filter(_c(urls), lambda u: u.rlike(MAILTO_PREFIX)),
        lambda u: F.trim(F.regexp_replace(u, MAILTO_PREFIX, "")),
    )
    return _sorted_distinct(F.filter(stripped, lambda e: e.rlike("^" + EMAIL_REGEX + "$")))


def phones_from_text_col(text: Column | str) -> Column:
    """phonesFromText (social.ts:127-146): regex matches filtered to ≥7
    digits and non-date-like."""
    raw = F.regexp_extract_all(_c(text), F.lit(PHONE_REGEX), F.lit(0))
    kept = F.filter(
        raw,
        lambda p: (F.length(F.regexp_replace(p, "[^0-9]", "")) >= PHONE_MIN_DIGITS)
        & ~p.rlike(SKIP_PHONE_REGEX),
    )
    return _sorted_distinct(kept)


def phones_from_urls_col(urls: Column | str) -> Column:
    """tel:/callto: hrefs → validated phones (social.ts:153-165)."""
    stripped = F.transform(
        F.filter(_c(urls), lambda u: u.rlike(TEL_PREFIX)),
        lambda u: F.trim(F.regexp_replace(u, TEL_PREFIX, "")),
    )
    return _sorted_distinct(
        F.filter(stripped, lambda p: p.rlike("^" + PHONE_REGEX.replace("(?i)(", "(?i)(", 1) + "$"))
    )


def social_handles_cols(html: Column | str) -> dict[str, Column]:
    """parseHandlesFromHtml's per-network extraction: each global regex runs
    over the raw HTML (social.ts:706-714), full match kept, dedup + sort."""
    h = _c(html)
    return {
        name: _sorted_distinct(F.regexp_extract_all(h, F.lit(rx), F.lit(0)))
        for name, rx in SOCIAL_REGEXES.items()
    }


def parse_social_handles(df, html_col: str = "html", text_col: str | None = None):
    """Add the SocialHandles columns (social.ts:210-217 shape) to ``df``.

    ``emails``/``phonesUncertain`` come from the text column when given
    (the reference extracts from htmlToText output), else from the raw HTML.
    """
    h = F.col(html_col)
    if df.schema[html_col].dataType.simpleString() == "binary":
        h = h.cast("string")
    text = F.col(text_col) if text_col else h
    out = df.withColumn("emails", emails_from_text_col(text)).withColumn(
        "phonesUncertain", phones_from_text_col(text)
    )
    for name, col in social_handles_cols(h).items():
        out = out.withColumn(name, col)
    return out


# --- Open Graph (open_graph_parser.ts) ---------------------------------------

_OG_META_REGEX = (
    r'(?is)<meta\s+[^>]*?property\s*=\s*["\x27]((?:og|article|video|music|book|profile)'
    r':[a-z:_]+)["\x27][^>]*?content\s*=\s*["\x27]([^"\x27]*)["\x27]'
)


def open_graph_map_col(html: Column | str) -> Column:
    """``map<og property, content>`` from meta tags; first occurrence wins
    (cheerio ``attr()`` semantics in parseOpenGraphProperty,
    open_graph_parser.ts:358-392)."""
    h = _c(html)
    props = F.regexp_extract_all(h, F.lit(_OG_META_REGEX), F.lit(1))
    contents = F.regexp_extract_all(h, F.lit(_OG_META_REGEX), F.lit(2))
    pairs = F.zip_with(props, contents, lambda p, c: F.struct(p.alias("k"), c.alias("v")))
    # first-wins: keep the first struct per key
    dedup = F.aggregate(
        pairs,
        F.array().cast("array<struct<k:string,v:string>>"),
        lambda acc, x: F.when(
            F.exists(acc, lambda y: y["k"] == x["k"]), acc
        ).otherwise(F.array_append(acc, x)),
    )
    return F.map_from_entries(dedup)
