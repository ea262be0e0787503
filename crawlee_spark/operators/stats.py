"""Statistics: per-request outcome log → Crawlee-compatible aggregates.

Reference: ``Statistics`` (packages/core/src/crawlers/statistics.ts:217-393,
state schema 511-528) tracks per-request durations, finished/failed counters,
a retry histogram (array indexed by retry count, statistics.ts:315-319) and
per-status-code counts; ``FinalStatistics`` derives averages and rates
(packages/core/src/autoscaling/system_status.ts:101-112).

Here the source of truth is an append-only ``outcomes`` log (one row per
request *attempt*); every statistic is a groupBy aggregation over it — no
mutable counters. Histogram = groupBy(retry_count).count() collected into a
dense array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

OUTCOME_SCHEMA = T.StructType(
    [
        T.StructField("request_id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("round_id", T.IntegerType(), False),
        T.StructField("attempt", T.IntegerType(), False),  # retry_count at attempt time
        T.StructField("outcome", T.StringType(), False),  # success|retry|fail|session_retry
        T.StructField("status_code", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), False),
        T.StructField("error_message", T.StringType(), True),
        T.StructField("session_id", T.StringType(), True),  # C6 (null: pool off)
    ]
)


def final_statistics(outcomes: DataFrame, runtime_millis: int | None = None) -> dict:
    """Compute FinalStatistics fields from the outcome log.

    Terminal attempts only (success|fail) define finished/failed; the retry
    histogram counts terminal requests by how many retries they consumed —
    exactly `statistics.ts:315-319` (`retryHistogram[retryCount] += 1` at
    job-finish/fail time).
    """
    terminal = outcomes.filter(F.col("outcome").isin("success", "fail"))
    agg = terminal.agg(
        F.sum(F.when(F.col("outcome") == "success", 1).otherwise(0)).alias("finished"),
        F.sum(F.when(F.col("outcome") == "fail", 1).otherwise(0)).alias("failed"),
        F.sum(F.when(F.col("outcome") == "success", F.col("duration_ms")).otherwise(0)).alias("fin_dur"),
        F.sum(F.when(F.col("outcome") == "fail", F.col("duration_ms")).otherwise(0)).alias("fail_dur"),
        F.min(F.when(F.col("outcome") == "success", F.col("duration_ms"))).alias("min_dur"),
        F.max(F.when(F.col("outcome") == "success", F.col("duration_ms"))).alias("max_dur"),
    ).collect()[0]

    retries_row = outcomes.filter(F.col("outcome") == "retry").count()

    hist_rows = (
        terminal.groupBy("attempt").count().orderBy("attempt").collect()
    )
    histogram: list[int] = []
    for row in hist_rows:
        while len(histogram) < row["attempt"]:
            histogram.append(0)
        histogram.append(row["count"])

    status_rows = (
        outcomes.filter(F.col("status_code").isNotNull())
        .groupBy("status_code")
        .count()
        .collect()
    )

    finished = int(agg["finished"] or 0)
    failed = int(agg["failed"] or 0)
    out = {
        "requestsFinished": finished,
        "requestsFailed": failed,
        "retryHistogram": histogram,
        "requestAvgFailedDurationMillis": (agg["fail_dur"] / failed) if failed else None,
        "requestAvgFinishedDurationMillis": (agg["fin_dur"] / finished) if finished else None,
        "requestTotalDurationMillis": int((agg["fin_dur"] or 0) + (agg["fail_dur"] or 0)),
        "requestsTotal": finished + failed,
        "requestMinDurationMillis": agg["min_dur"],
        "requestMaxDurationMillis": agg["max_dur"],
        "requestsRetries": retries_row,
        "requestsWithStatusCode": {str(r["status_code"]): r["count"] for r in status_rows},
    }
    if runtime_millis is not None:
        out["crawlerRuntimeMillis"] = runtime_millis
        minutes = runtime_millis / 60_000 if runtime_millis else None
        out["requestsFinishedPerMinute"] = round(finished / minutes) if minutes else 0
        out["requestsFailedPerMinute"] = round(failed / minutes) if minutes else 0
    return out


def error_summary(outcomes: DataFrame) -> DataFrame:
    """ErrorTracker analog (packages/core/src/crawlers/error_tracker.ts):
    group failures by a GENERALIZED message — digit runs collapsed to ``#``,
    the tracker's number-wildcard idea — so 'status 503 (attempt 2)' and
    'status 503 (attempt 3)' land in one group. One aggregation over the
    outcome log; no mutable tracker state.

    Output: (error_group, occurrences, requests, first_round, example)."""
    errs = outcomes.filter(F.col("error_message").isNotNull())
    norm = F.regexp_replace(F.col("error_message"), r"\d+", "#")
    return errs.groupBy(norm.alias("error_group")).agg(
        F.count("*").alias("occurrences"),
        F.countDistinct("request_id").alias("requests"),
        F.min("round_id").alias("first_round"),
        F.min("error_message").alias("example"),
    )


STATISTICS_STATE_KEY = "SDK_CRAWLER_STATISTICS_0"  # statistics.ts:135 key family


def persist_run_statistics(kv, run_millis: int, final: dict, key: str = STATISTICS_STATE_KEY) -> dict:
    """persistState/_maybeLoadStatistics semantics (statistics.ts:325-393):
    ``crawlerRuntimeMillis`` ACCUMULATES across resumes (each run adds its own
    wall time on top of the persisted total — the reference derives this from
    crawlerLastStartTimestamp; here each run passes its measured duration),
    while the request counters reflect the full outcome log, which already
    spans resumes. Returns the merged state that was persisted."""
    state = kv.get_value(key, None) or {}
    state["crawlerRuntimeMillis"] = int(state.get("crawlerRuntimeMillis", 0)) + int(run_millis)
    state["crawlerResumeCount"] = int(state.get("crawlerResumeCount", -1)) + 1
    for k in (
        "requestsFinished",
        "requestsFailed",
        "requestsRetries",
        "retryHistogram",
        "requestTotalDurationMillis",
        "requestMinDurationMillis",
        "requestMaxDurationMillis",
    ):
        if k in final:
            state[k] = final[k]
    kv.set_value(key, state)
    return state
