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
