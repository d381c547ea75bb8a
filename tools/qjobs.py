"""Job-anatomy profiler: run ONE query with the noop sink and print
every Spark job it issued (duration, description, stages, task counts)
from the UI REST API — pinpoints where a multi-job query (store
builds, iterative loops, micro-batches) spends its wall clock.

Usage: SPARK_GRAFT_UI=1 python tools/qjobs.py [--sf DIR] query [query...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

os.environ["SPARK_GRAFT_UI"] = "1"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from sparkswift.session import get_spark
    from sparkswift import suite

    spark = get_spark("qjobs")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(suite.queries())
    qs.update(suite.raw_queries())

    spark.read.parquet(os.path.join(args.sf, "region.parquet")).count()
    spark.range(1_000_000).selectExpr("sum(id * 2)").collect()
    qs["q1_pricing_summary"](spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def jobs_after(first_job: int) -> list[dict]:
        url = f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"
        with urllib.request.urlopen(url) as r:
            rows = json.load(r)
        out = [j for j in rows if j["jobId"] >= first_job]
        out.sort(key=lambda j: j["jobId"])
        return out

    def drop_persistent_blocks() -> None:
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()

    drop_persistent_blocks()
    for name in args.queries:
        tracker = spark.sparkContext.statusTracker()
        ids = tracker.getJobIdsForGroup(None)
        first = (max(ids) + 1) if ids else 0
        spark.sparkContext.setJobDescription(f"qjobs:{name}")
        t0 = time.time()
        qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        time.sleep(0.5)
        rows = jobs_after(first)
        print(f"\n=== {name}: wall {wall:.2f}s, {len(rows)} jobs ===")
        total = 0.0
        for j in rows:
            t_sub = j.get("submissionTime")
            t_end = j.get("completionTime")
            dur = "?"
            if t_sub and t_end:
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                d = (
                    datetime.strptime(t_end, fmt) - datetime.strptime(t_sub, fmt)
                ).total_seconds()
                total += d
                dur = f"{d:6.2f}s"
            desc = (j.get("name") or j.get("description") or "")[:140]
            print(
                f"  job {j['jobId']:>4} {dur} tasks={j['numTasks']:>5} "
                f"stages={len(j['stageIds'])} {desc}"
            )
        print(f"  sum(job durations) {total:.2f}s (gaps = driver time)")
        drop_persistent_blocks()


if __name__ == "__main__":
    main()
