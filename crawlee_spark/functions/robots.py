"""robots.txt parsing + matching, re-expressed for set-oriented gating.

Reference behavior (packages/utils/src/internals/robots.ts):

- ``RobotsTxtFile.find(url)`` fetches ``{origin}/robots.txt``; a 404 means
  allow-all (robots.ts:99-112). In this engine there is no network: robots
  rules live in a ``robots(host, robots_txt)`` table joined (broadcast) on
  host; a missing host row ⇒ allow-all.
- ``isAllowed(url, userAgent='*')`` delegates to the public ``robots-parser``
  npm package; ``undefined`` (no rule matches) ⇒ allowed (robots.ts:122-124).

The matcher below implements the Google/RFC 9309 longest-match algorithm that
``robots-parser`` uses: group selection by most-specific user-agent prefix,
rule matching with ``*`` wildcards and ``$`` end anchors, longest-rule-wins,
Allow wins ties. Rules are parsed once per distinct robots.txt (cached) and
applied in an Arrow-batched pandas UDF.
"""

from __future__ import annotations

import re
from functools import lru_cache
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType


def _rule_regex(pattern: str) -> re.Pattern:
    """Compile a robots path pattern (* wildcard, $ anchor) to a regex."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    body = ".*".join(parts)
    return re.compile("^" + body + ("$" if anchored else ""))


class RobotsRules:
    """Parsed robots.txt: per-user-agent rule groups."""

    __slots__ = ("groups",)

    def __init__(self, content: str):
        # groups: {ua_lower: [(is_allow, pattern, regex, specificity)]}
        self.groups: dict[str, list[tuple[bool, str, re.Pattern, int]]] = {}
        current_uas: list[str] = []
        last_was_ua = False
        for raw_line in content.splitlines():
            line = raw_line.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            field, _, value = line.partition(":")
            field = field.strip().lower()
            value = value.strip()
            if field == "user-agent":
                if not last_was_ua:
                    current_uas = []
                current_uas.append(value.lower())
                self.groups.setdefault(value.lower(), [])
                last_was_ua = True
            elif field in ("allow", "disallow"):
                last_was_ua = False
                if not current_uas:
                    continue
                if not value:
                    # empty Disallow ⇒ allow everything (no rule recorded)
                    continue
                rule = (field == "allow", value, _rule_regex(value), len(value))
                for ua in current_uas:
                    self.groups[ua].append(rule)
            else:
                last_was_ua = False

    def _select_group(self, user_agent: str):
        """Most specific matching user-agent group; '*' as fallback."""
        ua = user_agent.lower()
        best = None
        best_len = -1
        for group_ua in self.groups:
            if group_ua != "*" and group_ua in ua and len(group_ua) > best_len:
                best = group_ua
                best_len = len(group_ua)
        if best is None and "*" in self.groups:
            best = "*"
        return self.groups.get(best) if best is not None else None

    def is_allowed(self, url: str, user_agent: str = "*") -> bool:
        """Longest-match wins; Allow wins length ties; no rule ⇒ allowed."""
        try:
            parts = urlsplit(url)
        except ValueError:
            return True
        path = parts.path or "/"
        if parts.query:
            path += "?" + parts.query
        rules = self._select_group(user_agent)
        if not rules:
            return True
        best_allow: bool | None = None
        best_spec = -1
        for is_allow, _pat, regex, spec in rules:
            if regex.match(path):
                if spec > best_spec or (spec == best_spec and is_allow and best_allow is False):
                    best_spec = spec
                    best_allow = is_allow
        return True if best_allow is None else best_allow


@lru_cache(maxsize=4096)
def _parse_cached(content: str) -> RobotsRules:
    return RobotsRules(content)


def is_allowed_py(url: str | None, robots_txt: str | None, user_agent: str = "*") -> bool:
    """Gate one URL; missing/empty robots.txt ⇒ allow-all (the 404 path)."""
    if url is None:
        return False
    if not robots_txt:
        return True
    return _parse_cached(robots_txt).is_allowed(url, user_agent)


def sitemap_urls_col(robots_txt):
    """``RobotsTxtFile.getSitemaps`` (robots.ts:127-137): the ``Sitemap:``
    directives of a robots.txt, as an array column — pure regex, no UDF.

    Directive parsing is line-anchored and case-insensitive, comments
    stripped, values trimmed (RFC 9309 §2.3 'sitemap' extension)."""
    from pyspark.sql import functions as F

    c = F.col(robots_txt) if isinstance(robots_txt, str) else robots_txt
    no_comments = F.regexp_replace(c, r"(?m)#.*$", "")
    return F.transform(
        F.regexp_extract_all(no_comments, F.lit(r"(?im)^\s*sitemap\s*:\s*(\S+)\s*$"), F.lit(1)),
        lambda s: F.trim(s),
    )


@pandas_udf(BooleanType())
def robots_allowed_udf(url: pd.Series, robots_txt: pd.Series) -> pd.Series:
    """Vectorized robots gate over (url, robots_txt) columns.

    Distinct robots.txt contents are parsed once per Arrow batch (and cached
    across batches); per-row work is just the longest-match."""
    return pd.Series(
        [is_allowed_py(u, r) for u, r in zip(url, robots_txt)],
        index=url.index,
        dtype=bool,
    )
