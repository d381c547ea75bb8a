"""Per-query A/B timing harness (optimization rounds).

Times the RAW operator callables (same view bench.py times) with the
noop sink, N repetitions each, and prints the median — the same
methodology as bench.py but isolated to the queries under study so a
change can be measured without a full 229-row sweep.

Usage: python tools/qtime.py [--sf DIR] [--reps N] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from sparkswift.session import get_spark
    from sparkswift import suite

    spark = get_spark("qtime")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(suite.queries())
    qs.update(suite.raw_queries())

    # same warmup discipline as bench.py
    import os

    spark.read.parquet(os.path.join(args.sf, "region.parquet")).count()
    spark.range(1_000_000).selectExpr("sum(id * 2)").collect()
    qs["q1_pricing_summary"](spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()

    def drop_persistent_blocks() -> None:
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()

    drop_persistent_blocks()
    out: dict[str, dict] = {}
    for name in args.queries:
        fn = qs[name]
        times = []
        for r in range(args.reps):
            spark.sparkContext.setJobDescription(f"qtime:{name}#{r}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            drop_persistent_blocks()
        out[name] = {
            "median": round(statistics.median(times), 3),
            "times": times,
        }
        print(f"{name}: median {out[name]['median']}  {times}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
