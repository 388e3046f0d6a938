"""Scaling stress runner (SCALING.md method): time catalog queries at
sf0.1 and at an inflated dataset (scripts/inflate_testdata.py), print the
ratio table row-ready.

Usage:
  python scripts/stress.py [--base DIR] [--scaled DIR] [--reps N] q1 q2 ...

Timing method matches bench.py: noop sink (consumes every output column,
so Catalyst can't prune the measured work), min-of-N warm repeats.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--scaled", default="/tmp/scale10x")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from knowledgebot_spark.registry import load
    from knowledgebot_spark.session import get_session

    spark = get_session("stress")
    spark.sparkContext.setLogLevel("ERROR")
    catalog = load()

    def run(name: str, sf_dir: str) -> float:
        fn = catalog[name].fn
        best = None
        for _ in range(args.reps):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        return best

    for name in args.queries:
        if name not in catalog:
            print(f"{name}: NOT IN CATALOG", flush=True)
            continue
        a = run(name, args.base)
        b = run(name, args.scaled)
        print(
            f"| {name} | {a:.2f} | {b:.2f} | {b / a:.1f}× | |",
            flush=True,
        )


if __name__ == "__main__":
    main()
