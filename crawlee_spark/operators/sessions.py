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
    "session_id string, created_round int, usage_count long, error_score double, retired boolean"
)


@dataclass(frozen=True)
class SessionPolicy:
    max_pool_size: int = 1000  # consts.ts:3
    max_error_score: float = 3.0  # session.ts:176
    error_score_decrement: float = 0.5  # session.ts:177
    max_usage_count: int = 50  # session.ts:181
    max_age_rounds: int = 300  # stand-in for maxAgeSecs=3000 at 10 s/round


def make_pool(spark: SparkSession, size: int, round_id: int = 0) -> DataFrame:
    """Create ``size`` fresh sessions (ids are deterministic)."""
    return spark.range(size).select(
        F.concat(F.lit(f"session_r{round_id}_"), F.col("id").cast("string")).alias("session_id"),
        F.lit(round_id).cast("int").alias("created_round"),
        F.lit(0).cast("long").alias("usage_count"),
        F.lit(0.0).alias("error_score"),
        F.lit(False).alias("retired"),
    )


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
    broadcast), pick index ``xxhash64(request_id, round) mod |usable|``."""
    usable = usable_sessions(pool, round_id, policy).select("session_id")
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
) -> DataFrame:
    """Apply one round of outcomes to the pool (set-wise markGood/markBad/retire).

    ``outcomes``: one row per handled request with its session and outcome ∈
    {success, retry, fail, session_retry}. ``session_retry`` (a blocked
    status code) maps to ``retire`` — errorScore += maxErrorScore
    (session.ts:325-335 retireOnBlockedStatusCodes → retire); ``retry``/
    ``fail`` map to markBad; ``success`` to markGood."""
    per_session = outcomes.groupBy(F.col(session_col).alias("session_id")).agg(
        F.count("*").alias("_uses"),
        F.sum(F.when(F.col(outcome_col) == "success", 1).otherwise(0)).alias("_good"),
        F.sum(F.when(F.col(outcome_col).isin("retry", "fail"), 1).otherwise(0)).alias("_bad"),
        F.sum(F.when(F.col(outcome_col) == "session_retry", 1).otherwise(0)).alias("_retired"),
    )
    joined = pool.join(per_session, "session_id", "left").fillna(
        {"_uses": 0, "_good": 0, "_bad": 0, "_retired": 0}
    )
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
