"""Scaling-efficiency evidence for the BASELINE north rule.

The rule demands throughput scaling efficiency ≥ 0.8 from N to 4N executors.
No real cluster exists in this sandbox, so the sanctioned surrogate is the
same job at two parallelism levels: local[8] (N) vs local[32] (4N) on the
same input. One JVM per master → each run is a subprocess of bench.py with
SPARK_GRAFT_CPUS set; the frontier component (URLs scheduled+deduped/sec)
is the scaling metric.

    python bench_scaling.py [--urls 4000000] [--out BENCH.md]

Prints one JSON line and (optionally) appends a markdown section.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def run_once(cpus: int, urls: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_FRONTIER_URLS=str(urls),
        SPARK_GRAFT_SHUFFLE_PARTITIONS="64",  # identical plan at both sizes
        SPARK_GRAFT_BENCH_FRONTIER_ONLY="1",
        SPARK_GRAFT_DRIVER_MEM="24g",
        # single-box surrogate for a cluster's per-node disks: tmpfs scratch,
        # so shuffle/snapshot I/O doesn't serialize both runs on one disk
        SPARK_GRAFT_LOCAL_DIR=os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-bench"),
    )
    os.makedirs(env["SPARK_GRAFT_LOCAL_DIR"], exist_ok=True)
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--urls", type=int, default=8_000_000)
    ap.add_argument("--n", type=int, default=4, help="cores for the N run")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    lo = run_once(args.n, args.urls)
    hi = run_once(args.n * 4, args.urls)

    r_lo = lo["frontier_urls_per_sec"]
    r_hi = hi["frontier_urls_per_sec"]
    speedup = r_hi / r_lo
    efficiency = speedup / 4.0
    result = {
        "metric": f"frontier throughput scaling N→4N (local[{args.n}]→local[{args.n*4}])",
        "urls": args.urls,
        "cores_n": args.n, "cores_4n": args.n * 4,
        "urls_per_sec_n": r_lo,
        "urls_per_sec_4n": r_hi,
        "sec_n": lo["queries"]["frontier"],
        "sec_4n": hi["queries"]["frontier"],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "target": 0.8,
        "pass": efficiency >= 0.8,
    }
    print(json.dumps(result))

    if args.out:
        with open(args.out, "a") as f:
            f.write(
                f"""
## Scaling run ({args.urls:,} URLs, same input, two parallelism levels)

| cores | frontier sec | URLs/sec |
|---|---|---|
| local[{args.n}] (N) | {result['sec_n']} | {r_lo:,.0f} |
| local[{args.n * 4}] (4N) | {result['sec_4n']} | {r_hi:,.0f} |

speedup = {result['speedup']}x, scaling efficiency = {result['scaling_efficiency']}
(target >= 0.8: {"PASS" if result['pass'] else "FAIL"})
"""
            )


if __name__ == "__main__":
    main()
