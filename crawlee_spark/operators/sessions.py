"""Session pool: identity reputation as a set-oriented state table.

Reference: ``packages/core/src/session_pool/session.ts`` (defaults at
session.ts:170-183: maxAgeSecs=3000, maxErrorScore=3, errorScoreDecrement=
0.5, maxUsageCount=50) and ``session_pool.ts`` (pool of ≤1000 sessions —
consts.ts:3 — rotated randomly, replenished when sessions retire).

Lifecycle re-expressed set-wise (one aggregation per round instead of
per-request mutation):

- ``markGood`` (session.ts:242-250): usage+1, errorScore −= decrement
  (floored at 0);
- ``markBad`` (session.ts:291-296): usage+1, errorScore += 1;
- ``retire`` (session.ts:278-286): usage+1, errorScore += maxErrorScore
  (forces blocked);
- usable = NOT (blocked ∨ expired ∨ max-usage) (session.ts:209-236); here
  expiry is in rounds (no wall clock) — ``created_round + max_age_rounds``.

Assignment is the rotation: a deterministic pseudo-random pick over the
usable pool via ``xxhash64(request_id, round)`` — the reference picks a
random usable session per request (session_pool.ts:129-134); hashing the
request id reproduces "uniformly random per request" without RNG state.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SESSION_SCHEMA = (
    "session_id string, created_round int, usage_count long, error_score double, "
    "retired boolean, cookies map<string,string>"
)

_COOKIE_MAP_T = "map<string,string>"


@dataclass(frozen=True)
class SessionPolicy:
    max_pool_size: int = 1000  # consts.ts:3
    max_error_score: float = 3.0  # session.ts:176
    error_score_decrement: float = 0.5  # session.ts:177
    max_usage_count: int = 50  # session.ts:181
    max_age_rounds: int = 300  # stand-in for maxAgeSecs=3000 at 10 s/round


def make_pool(spark: SparkSession, size: int, round_id: int = 0) -> DataFrame:
    """Create ``size`` fresh sessions (ids are deterministic; cookie jars
    start empty — session.ts:173 ``cookieJar = new CookieJar()``)."""
    return spark.range(size).select(
        F.concat(F.lit(f"session_r{round_id}_"), F.col("id").cast("string")).alias("session_id"),
        F.lit(round_id).cast("int").alias("created_round"),
        F.lit(0).cast("long").alias("usage_count"),
        F.lit(0.0).alias("error_score"),
        F.lit(False).alias("retired"),
        F.create_map().cast(_COOKIE_MAP_T).alias("cookies"),
    )


def parse_set_cookie_entries(col) -> "F.Column":
    """``array<raw Set-Cookie header>`` → ``array<struct<name,value>>``.

    The reference parses response Set-Cookie headers into its tough-cookie
    jar (session.ts:341-345 ``setCookiesFromResponse`` →
    ``getCookiesFromResponse``); here the name=value pair before the first
    ``;`` is kept (attributes like Path/Expires are jar bookkeeping the
    batch model does not replay) and malformed headers are dropped."""
    c = F.col(col) if isinstance(col, str) else col

    def entry(h):
        return F.struct(
            F.regexp_extract(h, r"^\s*([^=;\s]+)=", 1).alias("name"),
            F.trim(F.regexp_extract(h, r"^\s*[^=;\s]+=([^;]*)", 1)).alias("value"),
        )

    return F.filter(F.transform(c, entry), lambda e: e["name"] != "")


def merge_cookie_maps(old, new) -> "F.Column":
    """Jar semantics for a round of updates: keys in ``new`` overwrite, the
    rest of ``old`` carries over (tough-cookie setCookieSync upsert)."""
    o = F.coalesce(F.col(old) if isinstance(old, str) else old, F.create_map().cast(_COOKIE_MAP_T))
    n = F.coalesce(F.col(new) if isinstance(new, str) else new, F.create_map().cast(_COOKIE_MAP_T))
    return F.map_zip_with(o, n, lambda _, a, b: F.coalesce(b, a))


def usable_sessions(pool: DataFrame, round_id: int, policy: SessionPolicy) -> DataFrame:
    """isUsable (session.ts:234-236): not blocked, not expired, not worn out."""
    return pool.filter(
        ~F.col("retired")
        & (F.col("error_score") < policy.max_error_score)
        & (F.col("usage_count") < policy.max_usage_count)
        & (F.col("created_round") + policy.max_age_rounds > round_id)
    )


def assign_sessions(
    claims: DataFrame, pool: DataFrame, round_id: int, policy: SessionPolicy
) -> DataFrame:
    """Attach a ``session_id`` to each claimed request.

    Deterministic rotation: rank the usable pool once (tiny — ≤1000 rows,
    broadcast), pick index ``xxhash64(request_id, round) mod |usable|``.
    When the pool carries cookie jars, the assigned session's jar rides
    along as ``session_cookies`` (the ``session.getCookies`` surface a
    fetch stage would turn into a Cookie header)."""
    cols = ["session_id"] + (
        [F.col("cookies").alias("session_cookies")] if "cookies" in pool.columns else []
    )
    usable = usable_sessions(pool, round_id, policy).select(*cols)
    indexed = usable.withColumn(
        "_idx", F.row_number().over(Window.orderBy("session_id")) - 1
    )
    n = indexed.count()
    if n == 0:
        return claims.withColumn("session_id", F.lit(None).cast("string"))
    pick = F.pmod(F.xxhash64(F.col("request_id"), F.lit(round_id)), F.lit(n))
    return claims.withColumn("_idx", pick.cast("int")).join(
        F.broadcast(indexed), "_idx", "left"
    ).drop("_idx")


def update_pool(
    pool: DataFrame,
    outcomes: DataFrame,
    policy: SessionPolicy,
    *,
    session_col: str = "session_id",
    outcome_col: str = "outcome",
    cookie_col: str | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Apply one round of outcomes to the pool (set-wise markGood/markBad/retire).

    ``outcomes``: one row per handled request with its session and outcome ∈
    {success, retry, fail, session_retry}. ``session_retry`` (a blocked
    status code) maps to ``retire`` — errorScore += maxErrorScore
    (session.ts:325-335 retireOnBlockedStatusCodes → retire); ``retry``/
    ``fail`` map to markBad; ``success`` to markGood.

    When ``cookie_col`` names an ``array<string>`` of raw Set-Cookie headers,
    each session's jar absorbs them (session.ts:341-345
    ``setCookiesFromResponse``): per (session, cookie-name) the LAST value in
    ``order_col`` order wins — the set-wise analog of the reference's
    sequential per-response upserts — and merged maps persist with the pool."""
    per_session = outcomes.groupBy(F.col(session_col).alias("session_id")).agg(
        F.count("*").alias("_uses"),
        F.sum(F.when(F.col(outcome_col) == "success", 1).otherwise(0)).alias("_good"),
        F.sum(F.when(F.col(outcome_col).isin("retry", "fail"), 1).otherwise(0)).alias("_bad"),
        F.sum(F.when(F.col(outcome_col) == "session_retry", 1).otherwise(0)).alias("_retired"),
    )
    joined = pool.join(per_session, "session_id", "left").fillna(
        {"_uses": 0, "_good": 0, "_bad": 0, "_retired": 0}
    )
    has_cookies = "cookies" in pool.columns
    cookies_out = []
    if cookie_col is not None and cookie_col in outcomes.columns:
        order = F.col(order_col) if order_col else F.lit(0).cast("long")
        ent = outcomes.select(
            F.col(session_col).alias("session_id"),
            order.alias("_ord"),
            F.posexplode(parse_set_cookie_entries(cookie_col)).alias("_pos", "_e"),
        )
        latest = ent.groupBy("session_id", F.col("_e.name").alias("_n")).agg(
            F.max_by(F.col("_e.value"), F.struct(F.col("_ord"), F.col("_pos"))).alias("_v")
        )
        # sort_array keeps the map's entry order deterministic (one entry per
        # name, so sorting the (name, value) structs is a total order)
        new_maps = latest.groupBy("session_id").agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct(F.col("_n"), F.col("_v"))))
            ).alias("_new_cookies")
        )
        joined = joined.join(new_maps, "session_id", "left")
        cookies_out = [
            merge_cookie_maps("cookies" if has_cookies else F.lit(None).cast(_COOKIE_MAP_T),
                              "_new_cookies").alias("cookies")
        ]
    elif has_cookies:
        cookies_out = [F.col("cookies")]
    new_score = F.greatest(
        F.lit(0.0),
        F.col("error_score")
        + F.col("_bad")
        + F.col("_retired") * policy.max_error_score
        - F.col("_good") * policy.error_score_decrement,
    )
    return joined.select(
        "session_id",
        "created_round",
        (F.col("usage_count") + F.col("_uses")).alias("usage_count"),
        new_score.alias("error_score"),
        (F.col("retired") | (F.col("_retired") > 0)).alias("retired"),
        *cookies_out,
    )


def replenish_pool(
    spark: SparkSession, pool: DataFrame, round_id: int, policy: SessionPolicy
) -> DataFrame:
    """Top the pool back up to ``max_pool_size`` usable sessions (the
    SessionPool recreates sessions as retired ones fall out)."""
    usable_n = usable_sessions(pool, round_id, policy).count()
    missing = policy.max_pool_size - usable_n
    if missing <= 0:
        return pool
    return pool.unionByName(make_pool(spark, missing, round_id))
