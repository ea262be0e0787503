"""FinalStatistics parity over a fixed synthetic outcome table
(statistics.ts:315-393, system_status.ts:101-112 semantics)."""

from crawlee_spark.operators.stats import OUTCOME_SCHEMA, final_statistics


def outcome(rid, rnd, attempt, outcome_, status, dur):
    return (rid, f"https://x.com/{rid}", rnd, attempt, outcome_, status, dur, None, None)


def test_final_statistics(spark):
    rows = [
        # r1: success first try, 100ms
        outcome("r1", 1, 0, "success", 200, 100),
        # r2: two retries then success (consumed 2 retries), durations 50/60/70
        outcome("r2", 1, 0, "retry", 500, 50),
        outcome("r2", 2, 1, "retry", 500, 60),
        outcome("r2", 3, 2, "success", 200, 70),
        # r3: one retry then final fail, 80/90
        outcome("r3", 1, 0, "retry", 503, 80),
        outcome("r3", 2, 1, "fail", 503, 90),
        # r4: immediate non-retryable fail
        outcome("r4", 1, 0, "fail", 404, 40),
    ]
    df = spark.createDataFrame(rows, OUTCOME_SCHEMA)
    stats = final_statistics(df, runtime_millis=60_000)

    assert stats["requestsFinished"] == 2
    assert stats["requestsFailed"] == 2
    assert stats["requestsTotal"] == 4
    assert stats["requestsRetries"] == 3
    # histogram indexed by retries consumed: r1,r4 at 0; r3 at 1; r2 at 2
    assert stats["retryHistogram"] == [2, 1, 1]
    assert stats["requestAvgFinishedDurationMillis"] == (100 + 70) / 2
    assert stats["requestAvgFailedDurationMillis"] == (90 + 40) / 2
    assert stats["requestTotalDurationMillis"] == 100 + 70 + 90 + 40
    assert stats["requestMinDurationMillis"] == 70
    assert stats["requestMaxDurationMillis"] == 100
    assert stats["requestsWithStatusCode"]["500"] == 2
    assert stats["requestsWithStatusCode"]["200"] == 2
    assert stats["requestsFinishedPerMinute"] == 2
    assert stats["requestsFailedPerMinute"] == 2


def test_empty_outcomes(spark):
    df = spark.createDataFrame([], OUTCOME_SCHEMA)
    stats = final_statistics(df)
    assert stats["requestsFinished"] == 0
    assert stats["requestsFailed"] == 0
    assert stats["retryHistogram"] == []
    assert stats["requestAvgFinishedDurationMillis"] is None
