"""Per-query isolation bench (guide §1.4): times individual declared
queries with the noop sink and captures .explain("formatted") plans.

This file is NOT the driver's bench (bench.py is frozen); it exists so
optimization work can measure one query at a time without paying for the
whole 300-query sweep, and so before/after plans land in plans/r06/.

Usage:
  python bench_extra.py [--reps N] [--plans before|after|none] query [query ...]
  python bench_extra.py --all            # every declared query, 1 rep

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
Prints one JSON line: {"queries": {name: best_sec, ...}, "reps": N}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default="none", choices=["before", "after", "none"])
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--json", default=None, help="also write results to this path")
    ap.add_argument(
        "--compare",
        default=None,
        help="print a >1.5x regression table vs this committed bench JSON "
        "(e.g. BENCH_FULL_latest.json)",
    )
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from temporalscope_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(
        "bench-extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    qs = entry_mod.queries()
    names = list(qs) if args.all else args.queries
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    plan_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(plan_dir, exist_ok=True)
    times: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        best = float("inf")
        for _ in range(args.reps):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        times[name] = round(best, 3)
        if args.plans != "none":
            df = qs[name](spark, SF_DIR)
            with open(
                os.path.join(plan_dir, f"{name}_{args.plans}.txt"), "w"
            ) as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: {times[name]}s", file=sys.stderr)
    line = json.dumps({"queries": times, "reps": args.reps, "sf_dir": SF_DIR})
    if args.json:
        with open(args.json, "w") as fh:
            fh.write(line + "\n")
    print(line)
    if args.compare:
        _print_regressions(times, args.compare)


def _print_regressions(times: dict, baseline_path: str) -> None:
    """Per-query regression table against a committed bench artifact
    (VERDICT r5 #4, hosted here because bench.py is frozen): queries
    >1.5x their baseline are flagged with the box load so a noisy sample
    is distinguishable from a real regression."""
    with open(baseline_path) as fh:
        base = json.load(fh)
    base_q = base.get("queries") or (base.get("parsed") or {}).get("queries") or {}
    load1, load5, _ = os.getloadavg()
    rows = []
    for name, sec in times.items():
        b = base_q.get(name)
        if b and b > 0 and sec / b > 1.5:
            rows.append((sec / b, name, sec, b))
    print(
        f"# regression check vs {baseline_path} "
        f"(load {load1:.2f}/{load5:.2f}): {len(rows)} over 1.5x",
        file=sys.stderr,
    )
    for r, name, sec, b in sorted(rows, reverse=True):
        print(f"#   {name}: {sec:.2f}s vs {b:.2f}s ({r:.2f}x)", file=sys.stderr)


if __name__ == "__main__":
    main()
