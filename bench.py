"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Execution is forced with the noop sink (full computation, no driver
collect) — the honest distributed measure.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# representative set: one per operator family / route
HEADLINE = [
    "q1_pricing_summary",    # native expr + hash agg (flagship)
    "o1_apply_native",       # O1 vectorized route
    "o1_apply_udf",          # O1 Arrow route
    "o2_apply_rows",         # O2 mapInPandas
    "o3_applymap",           # O3 per-column exprs
    "o4_groupby_apply",      # O4 applyInPandas
    "o5_rolling_sum_rows",   # O5 native window
    "o5_rolling_udf",        # O5 per-entity pandas rolling
    "o6_resample_hourly",    # O6 window groupBy
    "j1_revenue_by_nation",  # broadcast star join
    "j4_asof_join",          # as-of join (union + window)
    "j5_range_join",         # interval join vs broadcast bands
    "w1_rank_lag",           # ranking windows
    "t1_text_quality",       # text metrics (native exprs)
    "t4_token_count",        # ws + BPE-ish token counting
    "d1_dedup_exact",        # exact dedup
    "d2_ngram_jaccard",      # inverted-index near-dup
    "d3_minhash_lsh",        # MinHash LSH
    "d5_embedding_neardup",  # embedding-cosine near-dup
    "d7_dedup_clusters",     # pairs -> connected components -> survivors
    "e1_cosine_topk",        # brute-force cosine top-k
    "e2_cosine_topk_lsh",    # LSH cosine top-k
    "st1_stream_resample",   # streaming resample (availableNow)
    "o5_rolling_weighted",   # O5 win_type taper (native lag-sum)
    "t5_repetition",         # dup-ngram fraction (native arrays)
    "p2_hash_split",         # deterministic split (md5 bucket exprs)
    "p3_decontaminate",      # benchmark ngram broadcast semi-join
]


def main() -> None:
    from sparkswift.session import get_spark
    from sparkswift import suite

    spark = get_spark("sparkswift-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = suite.queries()

    # warm the JVM / codegen / parquet footer cache so per-query times
    # measure steady-state plan cost, not first-query startup
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    spark.range(1_000_000).selectExpr("sum(id * 2)").collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None
    out = {
        "metric": "headline_query_wall_time_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
