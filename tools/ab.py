"""Same-session A/B timing harness (NOTES.md protocol): run the named
suite queries N reps each, INTERLEAVED (q1 rep0, q2 rep0, ..., q1 rep1,
...) so co-tenant noise hits all queries alike, and print per-query
medians. Only medians from one session are trustworthy for optimization
decisions — bench.py totals are for the driver record.

Usage: python tools/ab.py [sf_dir] q1 q2 ...   (reps via AB_REPS, default 3)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    reps = int(os.environ.get("AB_REPS", "3"))

    from sparkswift.session import get_spark
    from sparkswift.suite import queries, raw_queries

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # raw twins take precedence: A/B is a THROUGHPUT protocol, and the
    # re-pointed registry names serve verdict frames (bench.py rule)
    qs = dict(queries())
    qs.update(raw_queries())
    names = args or sorted(qs)
    missing = [n for n in names if n not in qs]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    # warm the session (scan caches, codegen) with one throwaway pass
    times: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(reps + 1):
        for n in names:
            t0 = time.perf_counter()
            qs[n](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            if rep > 0:  # rep 0 is the warmup, discarded
                times[n].append(dt)
    for n in names:
        med = statistics.median(times[n])
        print(f"{n}: median {med:.3f}s  reps {[round(t, 3) for t in times[n]]}")


if __name__ == "__main__":
    main()
