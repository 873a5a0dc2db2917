"""Round-9 profiling harness: time individual queries with the noop sink
(bench.py methodology) and dump .explain("formatted") to plans/r09/.

Usage: python tools/profile_r09.py [--passes N] [--explain tag] [--sf DIR] q [q ...]

Prints per-pass wall-clock per query; with --explain the formatted plan is
written to plans/r09/<query>_<tag>.txt. Core count comes from
$SPARK_GRAFT_CPUS like bench.py, so the same script measures the 8-core
scaling twin.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--explain", default=None, help="tag: write plans/r09/<q>_<tag>.txt")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as e
    from aws_glue_cdc_metrics_job_spark.session import get_spark

    scratch = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".spark_scratch")
    os.makedirs(scratch, exist_ok=True)
    spark = get_spark(app_name="profile_r09", extra_conf={"spark.local.dir": scratch})
    qs = e.queries()
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r09")
    if args.explain:
        os.makedirs(plans_dir, exist_ok=True)
    for name in args.queries:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        if args.explain:
            df = qs[name](spark, args.sf)
            with open(os.path.join(plans_dir, f"{name}_{args.explain}.txt"), "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        if not args.no_warm:
            spark.sparkContext.setJobDescription(f"warm {name}")
            qs[name](spark, args.sf).write.mode("overwrite").format("noop").save()
        times = []
        for p in range(args.passes):
            spark.sparkContext.setJobDescription(f"{name} pass {p}")
            t0 = time.monotonic()
            qs[name](spark, args.sf).write.mode("overwrite").format("noop").save()
            times.append(round(time.monotonic() - t0, 3))
        print(f"{name}: {times} (min {min(times):.2f}s)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
