"""enqueueLinks gating as DataFrame predicates.

Reference pipeline (packages/core/src/enqueue_links/enqueue_links.ts:235-469 +
packages/utils/src/internals/url.ts:26-119):

candidates → URL-validity (F9) → strategy scope (F1) → include globs/regexps,
exclude globs/regexps (F3) → depth gate (F7) → robots gate (F5) → transform
hook (F4) → budget (F6) → dedup + enqueue (frontier.add_requests).

Rejections are a side-output ``skipped(url, reason)`` frame with the
reference's skip reasons {robotsTxt, limit, enqueueLimit, filters, redirect,
depth} (shared.ts:50-52, basic-crawler.ts:1212-1229).

Strategy semantics (url.ts:89-119):
- all: any http(s) URL;
- same-hostname (default, enqueue_links.ts:322-324): target hostname ==
  origin hostname (trailing dot stripped);
- same-domain: registrable domains equal (public-suffix aware); origin with
  no registrable domain (IP) falls back to origin equality;
- same-origin: scheme + hostname + port equal.
Non-http(s) schemes are always rejected (url.ts:63, 131-134).

Globs are pre-compiled to regexes on the driver (minimatch nocase subset:
``*`` within a segment, ``**`` across segments, ``?`` one char) so matching
stays JVM-side via ``regexp_like`` — no Python in the filter path.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F

from crawlee_spark.functions.keying import host_col, registrable_domain_col, scheme_col
from crawlee_spark.functions.robots import robots_allowed_udf

HTTP_SCHEMES = ("http", "https")


def glob_to_regex(glob: str, nocase: bool = True) -> str:
    """Compile a minimatch-style URL glob to a Java-regex string.

    Supports ``**`` (any chars incl. ``/``), ``*`` (any chars except ``/``),
    ``?`` (one char except ``/``), ``{a,b}`` alternation — the subset the
    reference's enqueueLinks glob usage exercises
    (enqueue_links.test.ts:93-576)."""
    out = []
    i = 0
    while i < len(glob):
        ch = glob[i]
        if ch == "*":
            if i + 1 < len(glob) and glob[i + 1] == "*":
                out.append(".*")
                i += 2
                continue
            out.append("[^/]*")
        elif ch == "?":
            out.append("[^/]")
        elif ch == "{":
            j = glob.find("}", i)
            if j > i:
                alts = glob[i + 1 : j].split(",")
                out.append("(" + "|".join(re.escape(a) for a in alts) + ")")
                i = j + 1
                continue
            out.append(re.escape(ch))
        else:
            out.append(re.escape(ch))
        i += 1
    body = "".join(out)
    return ("(?i)" if nocase else "") + "^" + body + "$"


@dataclass(frozen=True)
class EnqueueOptions:
    """Mirror of enqueueLinks options that gate candidates."""

    strategy: str = "same-hostname"  # default: enqueue_links.ts:322-324
    globs: tuple[str, ...] = ()
    exclude_globs: tuple[str, ...] = ()
    regexps: tuple[str, ...] = ()
    exclude_regexps: tuple[str, ...] = ()
    max_crawl_depth: int | None = None
    limit: int | None = None


def strategy_predicate(strategy: str, url: Column, origin_url: Column) -> Column:
    """F1 scope filter vs the *source page* URL (vectorized, no UDF)."""
    t_host = host_col(url)
    o_host = host_col(origin_url)
    if strategy == "all":
        return F.lit(True)
    if strategy == "same-hostname":
        return t_host == o_host
    if strategy == "same-domain":
        t_dom = registrable_domain_col(t_host)
        o_dom = registrable_domain_col(o_host)
        # IP-origin fallback to origin equality (url.ts:100-106)
        o_is_ip = o_host.rlike(r"^[0-9.]+$")
        return F.when(o_is_ip, t_host == o_host).otherwise(t_dom == o_dom)
    if strategy == "same-origin":
        t_port = F.coalesce(F.try_parse_url(url, F.lit("HOST")), F.lit(""))
        o_port = F.coalesce(F.try_parse_url(origin_url, F.lit("HOST")), F.lit(""))
        # compare scheme + full lowercased netloc (host:port)
        t_netloc = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
        o_netloc = F.lower(F.regexp_extract(origin_url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
        return (scheme_col(url) == scheme_col(origin_url)) & (t_netloc == o_netloc)
    raise ValueError(f"unknown enqueue strategy: {strategy}")


def matches_enqueue_strategy_col(
    url: Column | str, loaded_url: Column | str, strategy: Column | str
) -> Column:
    """F2 ``requestMatchesEnqueueStrategy`` (basic-crawler.ts:2124-2168):
    after load, does ``loaded_url`` still satisfy the strategy recorded at
    enqueue time vs the original ``url``? NULL strategy or NULL loaded_url
    ⇒ matches (the reference assumes a match in both cases)."""
    u = F.col(url) if isinstance(url, str) else url
    lu = F.col(loaded_url) if isinstance(loaded_url, str) else loaded_url
    s = F.col(strategy) if isinstance(strategy, str) else strategy
    per_strategy = (
        F.when(s == "same-hostname", strategy_predicate("same-hostname", lu, u))
        .when(s == "same-domain", strategy_predicate("same-domain", lu, u))
        .when(s == "same-origin", strategy_predicate("same-origin", lu, u))
        .when(s == "all", scheme_col(u).isin(*HTTP_SCHEMES))
        .otherwise(F.lit(True))
    )
    return F.when(s.isNull() | lu.isNull(), F.lit(True)).otherwise(per_strategy)


def gate_candidates(
    links: DataFrame,
    options: EnqueueOptions,
    *,
    url_col: str = "url",
    origin_col_name: str = "origin_url",
    depth_col: str = "crawl_depth",
    robots_txt_col: str | None = None,
    transform=None,
) -> tuple[DataFrame, DataFrame]:
    """Apply F1/F3/F5/F7 gates; returns (accepted, skipped(url, reason)).

    ``links`` must carry the candidate URL, its source page URL
    (``origin_url``) and its depth; when ``robots_txt_col`` is given the
    robots gate runs too (rules already joined on host by the caller).

    ``transform`` is the F4 ``transformRequestFunction`` hook
    (shared.ts:299-305): a ``DataFrame → DataFrame`` callable applied to the
    accepted set — it may mutate columns or drop rows (the reference's
    falsy-return drop); transform-dropped rows are silent, matching the
    reference (no skip reason is defined for them)."""
    url = F.col(url_col)
    origin = F.col(origin_col_name)

    checks: list[tuple[str, Column]] = []
    # scheme validity (always): non-http(s) rejected with reason 'filters'
    checks.append(("filters", scheme_col(url).isin(*HTTP_SCHEMES) & host_col(url).isNotNull()))
    checks.append(("filters", strategy_predicate(options.strategy, url, origin)))

    if options.globs or options.regexps:
        pats = [glob_to_regex(g) for g in options.globs] + list(options.regexps)
        inc = F.lit(False)
        for p in pats:
            inc = inc | url.rlike(p)
        checks.append(("filters", inc))
    for g in options.exclude_globs:
        checks.append(("filters", ~url.rlike(glob_to_regex(g))))
    for r in options.exclude_regexps:
        checks.append(("filters", ~url.rlike(r)))

    if options.max_crawl_depth is not None:
        checks.append(("depth", F.col(depth_col) <= options.max_crawl_depth))

    if robots_txt_col is not None:
        checks.append(("robotsTxt", robots_allowed_udf(url, F.col(robots_txt_col))))

    # first failing gate names the skip reason (reference applies them in order)
    reason = F.lit(None).cast("string")
    for name, pred in reversed(checks):
        reason = F.when(~pred, F.lit(name)).otherwise(reason)

    tagged = links.withColumn("_skip_reason", reason)
    accepted = tagged.filter(F.col("_skip_reason").isNull()).drop("_skip_reason")
    if transform is not None:
        accepted = transform(accepted)
    skipped = (
        tagged.filter(F.col("_skip_reason").isNotNull())
        .select(url.alias("url"), F.col("_skip_reason").alias("reason"))
    )
    return accepted, skipped
