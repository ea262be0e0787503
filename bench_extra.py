"""Extra measurement harness for the optimization rounds.

``bench.py`` is FROZEN for the driver's measurement; this file holds the
noop-sink isolation benches (guide §1.4), the frontier piecewise breakdown,
and the ``.explain("formatted")`` dumps cited in OPTIMIZATION_r06.md.

Usage:
    python bench_extra.py pieces              # frontier sub-stage breakdown
    python bench_extra.py queries [names...]  # noop-timed entry queries
    python bench_extra.py plans TAG [names..] # dump plans/r06/<q>_<TAG>.txt

Environment: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0),
SPARK_GRAFT_CPUS (default 32) — same contract as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import _frontier_pipeline, synth_urls  # noqa: E402
from crawlee_spark.operators.frontier import candidates_to_requests  # noqa: E402
from crawlee_spark.operators.scheduler import PolitenessPolicy, claim_round  # noqa: E402

DEFAULT_QUERIES = [
    "url_keying",
    "scheduler_claim",
    "extract_text",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "agg_pricing_summary",
    "events_sessionize",
]


def _spark():
    from crawlee_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("crawlee-spark-bench-extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _time(label, fn, repeats=2):
    best = None
    for _ in range(repeats):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def bench_pieces(spark, sf: float) -> dict:
    """Frontier enqueue broken into cumulative noop-isolated pieces:
    keying → in-batch dedup → seen anti-join → request shaping → parquet
    write (the full timed enqueue), plus the claim round."""
    import tempfile

    n_urls = int(os.environ.get("SPARK_GRAFT_FRONTIER_URLS", str(int(10_000_000 * sf))))
    seen_dir = tempfile.mkdtemp(prefix="bx-seen-", dir=os.environ.get("SPARK_GRAFT_LOCAL_DIR"))
    (
        candidates_to_requests(synth_urls(spark, n_urls // 2, "page"))
        .select("request_id")
        .repartition(int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")), "request_id")
        .write.mode("overwrite")
        .parquet(seen_dir)
    )
    seen = spark.read.parquet(seen_dir)

    from crawlee_spark.functions.keying import keying_udf

    def keyed():
        return (
            synth_urls(spark, n_urls, "page")
            .withColumn("_k", keying_udf("url"))
            .select(
                "url", "_arrival",
                F.col("_k.unique_key").alias("unique_key"),
                F.col("_k.request_id").alias("request_id"),
            )
        )

    def deduped():
        return (
            keyed()
            .groupBy("request_id")
            .agg(F.min_by(F.struct("url", "_arrival", "unique_key"), F.col("_arrival")).alias("_row"))
            .select("request_id", "_row.*")
        )

    def anti():
        return deduped().join(seen, "request_id", "left_anti")

    def full():
        return _frontier_pipeline(spark, seen, n_urls, "page")

    out_dir = tempfile.mkdtemp(prefix="bx-out-", dir=os.environ.get("SPARK_GRAFT_LOCAL_DIR"))
    times = {}
    sc = spark.sparkContext
    # warm up codegen + python workers on a small run first
    sc.setJobDescription("warmup")
    _noop(_frontier_pipeline(spark, seen, max(10_000, n_urls // 20), "page"))

    for label, fn in [
        ("synth_only", lambda: _noop(synth_urls(spark, n_urls, "page"))),
        ("keying", lambda: _noop(keyed())),
        ("dedup", lambda: _noop(deduped())),
        ("antijoin", lambda: _noop(anti())),
        ("shaped", lambda: _noop(full())),
        ("write_parquet", lambda: full().write.mode("overwrite").parquet(out_dir)),
    ]:
        sc.setJobDescription(f"pieces:{label}")
        times[label] = _time(label, fn)

    fresh = spark.read.parquet(out_dir)
    policy = PolitenessPolicy(max_concurrency=2_000, per_host_cap=200, salt_buckets=16)
    claimable = fresh.withColumn("lease_until", F.lit(None).cast("long")).withColumn(
        "handled_at", F.lit(None).cast("timestamp")
    )
    sc.setJobDescription("pieces:claim")
    times["claim"] = _time("claim", lambda: claim_round(claimable, 1, policy).count())
    times["n_urls"] = n_urls
    return times


def bench_queries(spark, sf_dir: str, names: list[str]) -> dict:
    import __spark_entry__ as entry

    qs = entry.queries()
    times = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"q:{name}")
        times[name] = _time(name, lambda: _noop(qs[name](spark, sf_dir)))
    return times


def dump_plans(spark, sf_dir: str, tag: str, names: list[str]) -> None:
    import __spark_entry__ as entry

    qs = entry.queries()
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(out, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote plans/r06/{name}_{tag}.txt")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 1.0)
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    spark = _spark()
    if mode == "pieces":
        print(json.dumps({"pieces": bench_pieces(spark, sf), "sf": sf}))
    elif mode == "queries":
        names = sys.argv[2:] or DEFAULT_QUERIES
        print(json.dumps({"queries": bench_queries(spark, sf_dir, names), "sf": sf}))
    elif mode == "plans":
        tag = sys.argv[2]
        names = sys.argv[3:] or DEFAULT_QUERIES
        dump_plans(spark, sf_dir, tag, names)
    else:
        raise SystemExit(f"unknown mode {mode}")
    spark.stop()


if __name__ == "__main__":
    main()
