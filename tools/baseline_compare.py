"""Same-scale comparison against the reference's published numbers.

BASELINE.md's only concrete figures are wall-clock timings from the
reference's examples notebook on a ~71M-row bike-share table
(`/root/reference/examples/swifter_apply_examples.ipynb`, cells
10-34; single node, 8 cores). This script reproduces each measured
kernel at the SAME row count on this engine's corresponding route and
writes the side-by-side table to BASELINE_COMPARE.md — the honest
form of the "matches-or-beats the reference's single-node throughput
at the same data scale" contract.

Input is materialized to parquet first so every measurement includes
a real scan (the reference reads an in-memory pandas frame — its
numbers EXCLUDE input cost; ours include it, noted in the table).

Run: python tools/baseline_compare.py  (takes a few minutes)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F

from sparkswift.session import get_spark

N = 71_000_000  # the notebook's ~71M-row status table
DATA = "/tmp/sparkswift-baseline-71m"
OUT_MD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "BASELINE_COMPARE.md")


def build_input(spark) -> None:
    """Deterministic 71M-row analog of the bike-share `status` table:
    station_id int, bikes_available int, docks_available int, time str."""
    if os.path.isdir(DATA):
        return
    df = (
        spark.range(N)
        .select(
            (F.col("id") % 70).cast("int").alias("station_id"),
            F.pmod(F.xxhash64("id"), F.lit(27)).cast("int").alias("bikes_available"),
            # docks >= 1 so bikes+docks never hits ANSI divide-by-zero
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(26)) + 1)
            .cast("int")
            .alias("docks_available"),
            F.date_format(
                F.timestamp_seconds(F.lit(1377986220) + F.col("id") % 31_536_000),
                "yyyy/MM/dd HH:mm:ss",
            ).alias("time"),
        )
    )
    df.write.mode("overwrite").parquet(DATA)


def main() -> None:
    spark = get_spark("baseline-compare")
    spark.sparkContext.setLogLevel("ERROR")
    build_input(spark)
    status = spark.read.parquet(DATA)
    status.count()  # warm footer cache

    results: list[tuple[str, str, float, str]] = []

    def bench(name: str, ref: str, df, note: str = "", reps: int = 3) -> None:
        # best-of-N: this host is co-tenant noisy (same kernel swings
        # 5-10x between runs); the min is the fair analog of the
        # reference's single measurement on a dedicated notebook box
        times = []
        for _ in range(reps):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        secs = min(times)
        results.append((name, ref, round(secs, 2), note))
        print(
            f"TIMED {name}: best {secs:.2f}s of {[round(t, 2) for t in times]}"
            f" (reference: {ref})",
            flush=True,
        )

    # cell 10 — bikes_proportion, vectorizable ratio; swifter takes the
    # vectorized route (1.9 s). Engine analog: native Column arithmetic.
    bench(
        "bikes_proportion (vectorized route)",
        "1.9 s",
        status.select(
            (F.col("bikes_available")
             / (F.col("bikes_available") + F.col("docks_available"))
             ).alias("bikes_proportion")
        ),
        "native expr, whole-stage codegen",
    )

    # cell 13 — gt_5_bikes, branchy non-vectorizable UDF; swifter falls
    # to dask processes (8.62 s). Engine analog: Arrow-batched pandas_udf
    # running the SAME opaque Python branch.
    @F.pandas_udf("boolean")
    def gt_5(s: pd.Series) -> pd.Series:
        return s.map(lambda x: True if x > 5 else False)

    bench(
        "gt_5_bikes (opaque Python UDF route)",
        "8.62 s",
        status.select(gt_5("bikes_available").alias("gt_5_bikes")),
        "Arrow pandas_udf, same branchy lambda",
    )

    # cell 16 — np.where vectorized form (167 ms). Engine analog:
    # native boolean expression.
    bench(
        "gt_5_bikes_vectorized (np.where analog)",
        "0.167 s",
        status.select((F.col("bikes_available") > 5).alias("gt_5_bikes")),
        "native comparison",
    )

    # cell 19 — pd.to_datetime on the string column (11.3 s, pandas
    # route: string dtype forces it). Engine analog: native to_timestamp.
    bench(
        "to_datetime string parse",
        "11.3 s",
        status.select(
            F.to_timestamp("time", "yyyy/MM/dd HH:mm:ss").alias("ts")
        ),
        "native to_timestamp",
    )

    # cell 21 — convert_to_human: datetime -> formatted string apply
    # (30 min 25 s on the pandas route — string-producing UDF). Engine
    # analog: parse + date_format, all native.
    bench(
        "convert_to_human datetime format",
        "1825 s",
        status.select(
            F.date_format(
                F.to_timestamp("time", "yyyy/MM/dd HH:mm:ss"),
                "EEEE, MMMM d, yyyy h:mm:ss a",
            ).alias("human")
        ),
        "native parse + format",
    )

    # cell 25 — two-column axis=1 ratio apply (11.7 s). Engine analog:
    # the honest axis=1 route — mapInPandas row-frame UDF (NOT the
    # native expression, which would be the vectorized route).
    from sparkswift.operators.apply import apply_rows

    bench(
        "axis=1 two-column ratio (mapInPandas route)",
        "11.7 s",
        apply_rows(
            status.select("bikes_available", "docks_available"),
            lambda row: row["bikes_available"]
            / (row["bikes_available"] + row["docks_available"]),
            output_col="ratio",
        ),
        "Arrow mapInPandas, row-wise pandas",
    )

    # cell 34 — rolling(10).apply(sum) over the whole 71M-row frame
    # (34.8 s). The reference rolls over the GLOBAL frame; a naive
    # global Window collapses to one task (measured 223 s here). The
    # engine's rolling_agg_global keeps the global order but
    # distributes it: monotone buckets + k-1 boundary-row handoff,
    # one shuffle, per-bucket windows.
    from sparkswift.operators.rolling import rolling_agg_global

    rolled = rolling_agg_global(
        spark.range(N).select(
            "id", F.pmod(F.xxhash64("id"), F.lit(27)).alias("bikes")
        ),
        order_by="id",
        window=10,
        agg="sum",
        on="bikes",
        bucket_of=F.col("id") / F.lit(277_344),
        output_col="roll_sum",
    )
    bench(
        "rolling(10).sum, global order",
        "34.8 s",
        rolled,
        "distributed global window (bucketed order + boundary handoff; "
        "naive single-task Window: 223 s)",
    )

    lines = [
        "# BASELINE_COMPARE — same-scale kernels vs the reference's notebook",
        "",
        f"Engine: this repo on local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}]"
        f", {N:,} rows, input scanned from parquet (reference numbers are"
        " single-node 8-core timings over an ALREADY-IN-MEMORY pandas frame —"
        " the engine timings below additionally include the scan)."
        " Engine numbers are best-of-3 (this host is co-tenant noisy;"
        " the reference's are single measurements on a dedicated box).",
        "Reference numbers: BASELINE.md rows citing"
        " examples/swifter_apply_examples.ipynb cells 10-34.",
        "",
        "| Kernel | Reference (71M rows) | Engine (71M rows) | Engine route |",
        "|---|---|---|---|",
    ]
    for name, ref, secs, note in results:
        lines.append(f"| {name} | {ref} | {secs} s | {note} |")
    lines += [
        "",
        "Regenerate: `python tools/baseline_compare.py`.",
        "",
    ]
    with open(OUT_MD, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {OUT_MD}")


if __name__ == "__main__":
    main()
