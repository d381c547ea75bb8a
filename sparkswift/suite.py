"""The operator showcase suite — every implemented operator exposed as
a (spark, sf_dir) -> DataFrame callable plus, where SQL-expressible, a
DuckDB oracle string. This is what `__spark_entry__.queries()` /
`oracle_sql()` serve to the driver (CORRECTNESS gate) and what
`bench.py` times.

Float determinism policy (cross-engine hash safety):
* money sums  -> CAST to DECIMAL(18,4) before SUM (exact, associative,
  partition-order independent), final CAST to DOUBLE — bit-identical
  in Spark and DuckDB.
* means/ratios -> derived from exact sums / counts (double ÷ long is
  deterministic given identical inputs).
* genuinely float-accumulated stats (variance, UDF results) -> ROUND
  to 6 decimals on BOTH sides.
* counts -> BIGINT on both sides.
Aliases match exactly between Spark and SQL (driver sorts columns by
name before hashing).
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkswift.accessor import swift
from sparkswift.operators.apply import apply_rows, apply_series, applymap
from sparkswift.operators.groupby import groupby_apply
from sparkswift.sources import load_table

# each entry: name -> (query_fn, oracle_sql | None)
_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: _REGISTRY[n][0] for n in _ordered_names()}


def oracles() -> dict[str, str]:
    return {
        n: _REGISTRY[n][1] for n in _ordered_names() if _REGISTRY[n][1] is not None
    }


D = "DECIMAL(18,4)"


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary. Exercises the vectorized
# fast path (native Column arithmetic — the engine analog of swifter's
# vectorized route, reference swifter.py:309-317) feeding a hash
# aggregate with map-side partial aggregation.
# Scale: scan-pruned to 7 columns, single shuffle on a 4-value key.
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    f"""
    -- DECIMAL→DOUBLE goes through VARCHAR: DuckDB's direct decimal→
    -- double conversion is not correctly rounded once the sum needs
    -- >53 mantissa bits (1-ulp drift vs Spark's BigDecimal.doubleValue
    -- at sf0.1), while its string→double parse IS correctly rounded —
    -- so both engines converge on the nearest double of the identical
    -- exact DECIMAL sum. Canonical big-sum pattern; see NOTES.md.
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS {D})) AS VARCHAR) AS DOUBLE)
               AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS {D})) AS VARCHAR) AS DOUBLE)
               AS sum_base_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS {D}) * (1 - CAST(l_discount AS {D}))) AS VARCHAR) AS DOUBLE)
               AS sum_disc_price,
           CAST(CAST(SUM(CAST(l_quantity AS {D})) AS VARCHAR) AS DOUBLE) / COUNT(*)
               AS avg_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS {D})) AS VARCHAR) AS DOUBLE) / COUNT(*)
               AS avg_price,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty_d = F.col("l_quantity").cast(D)
    price_d = F.col("l_extendedprice").cast(D)
    disc_price = price_d * (F.lit(1) - F.col("l_discount").cast(D))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty_d).cast("double").alias("sum_qty"),
            F.sum(price_d).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            (F.sum(qty_d).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(price_d).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).cast("bigint").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# O1 — elementwise apply, native route: the UDF is Column-expressible,
# so it compiles to a Catalyst expression (zero Python at runtime).
# ---------------------------------------------------------------------------
@register(
    "o1_apply_native",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    """,
)
def o1_apply_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    out = apply_series(
        li.withColumn("__disc", F.col("l_discount")),
        "l_extendedprice",
        lambda x: x * (1 - F.col("__disc")),
        output_col="revenue",
    )
    return out.select("l_orderkey", "l_linenumber", "revenue")


# ---------------------------------------------------------------------------
# O1 — elementwise apply, forced Arrow route: same semantics through a
# scalar pandas_udf (the reference's force_parallel knob,
# swifter.py:131-138). Oracle is identical SQL — route equivalence is
# exactly what swifter's sample gate asserts (swifter.py:313-316).
# ---------------------------------------------------------------------------
@register(
    "o1_apply_udf",
    """
    SELECT l_orderkey, l_linenumber,
           l_quantity * 2.0 + 1.0 AS qty2
    FROM lineitem
    """,
)
def o1_apply_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    out = apply_series(
        li, "l_quantity", lambda x: x * 2.0 + 1.0, output_col="qty2", force_udf=True
    )
    return out.select("l_orderkey", "l_linenumber", "qty2")


# ---------------------------------------------------------------------------
# O2 — row-wise apply (axis=1) via mapInPandas; scalar result column.
# ---------------------------------------------------------------------------
@register(
    "o2_apply_rows",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / l_quantity AS unit_price
    FROM lineitem
    """,
)
def o2_apply_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"
    )
    out = apply_rows(
        li,
        lambda row: row["l_extendedprice"] / row["l_quantity"],
        output_col="unit_price",
    )
    return out.select("l_orderkey", "l_linenumber", "unit_price")


# ---------------------------------------------------------------------------
# O2 — result_type='expand': row UDF returns a Series -> multiple
# output columns (reference passthrough swifter.py:352-365).
# ---------------------------------------------------------------------------
@register(
    "o2_apply_rows_expand",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS gross
    FROM lineitem
    """,
)
def o2_apply_rows_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax"
    )

    def net_gross(row):
        net = row["l_extendedprice"] * (1 - row["l_discount"])
        return pd.Series({"net": net, "gross": net * (1 + row["l_tax"])})

    out = apply_rows(li, net_gross)
    return out.select("l_orderkey", "l_linenumber", "net", "gross")


# ---------------------------------------------------------------------------
# O2 — raw=True: the row UDF receives a bare ndarray (pandas C-loop
# dispatch; reference signature swifter.py:400). Oracle: GREATEST over
# the same numeric columns.
# ---------------------------------------------------------------------------
@register(
    "o2_apply_rows_raw",
    """
    SELECT l_orderkey, l_linenumber,
           GREATEST(l_quantity, l_discount * 100.0, l_tax * 100.0) AS mx
    FROM lineitem
    """,
)
def o2_apply_rows_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        (F.col("l_discount") * 100.0).alias("d100"),
        (F.col("l_tax") * 100.0).alias("t100"),
    )

    def row_max(a):  # a: ndarray of the 3 numeric cols (positions 2..4)
        return float(max(a[2], a[3], a[4]))

    out = apply_rows(li, row_max, raw=True, output_col="mx")
    return out.select("l_orderkey", "l_linenumber", "mx")


# ---------------------------------------------------------------------------
# O3 — applymap: one scalar function over every cell (native route
# compiles per-column expressions).
# ---------------------------------------------------------------------------
@register(
    "o3_applymap",
    """
    SELECT l_quantity * l_quantity AS l_quantity,
           l_discount * l_discount AS l_discount,
           l_tax * l_tax          AS l_tax,
           l_orderkey, l_linenumber
    FROM lineitem
    """,
)
def o3_applymap(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount", "l_tax", "l_orderkey", "l_linenumber"
    )
    return applymap(li, lambda x: x * x, cols=["l_quantity", "l_discount", "l_tax"])


# ---------------------------------------------------------------------------
# O4 — groupby().apply via applyInPandas: per-group pandas UDF
# producing one row per group (mean/min computed inside pandas).
# Rounded on both sides: the UDF result is float-accumulated.
# ---------------------------------------------------------------------------
@register(
    "o4_groupby_apply",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6)
               AS mean_qty,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def o4_groupby_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def stats(g: pd.DataFrame) -> pd.DataFrame:
        q = g["l_quantity"]
        import decimal

        exact = sum(decimal.Decimal(str(round(v, 4))) for v in q)
        return pd.DataFrame(
            {
                "mean_qty": [round(float(exact) / len(q), 6)],
                "min_qty": [float(q.min())],
                "max_qty": [float(q.max())],
                "n": [int(len(q))],
            }
        )

    return groupby_apply(
        li,
        ["l_returnflag", "l_linestatus"],
        stats,
        subset=["l_quantity"],
        schema=(
            "l_returnflag string, l_linestatus string, mean_qty double, "
            "min_qty double, max_qty double, n bigint"
        ),
    )


def get(name: str):
    return _REGISTRY[name]


# ---------------------------------------------------------------------------
# O4 — scalar-per-group reducer through GROUPED_AGG pandas_udf (the
# cheap path for group→scalar shapes: partial agg machinery, tiny
# result). Exact decimal accumulation inside the UDF so the value is
# partition-order independent and matches the decimal-sum oracle.
# ---------------------------------------------------------------------------
@register(
    "o4_groupby_agg_udf",
    """
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(value) AS mean_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    """,
)
def o4_groupby_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def mean_exact(s: pd.Series) -> float:
        import decimal

        tot = sum(decimal.Decimal(str(round(v, 4))) for v in s)
        return float(tot) / len(s)

    def n_vals(s: pd.Series) -> int:
        return len(s)

    # Spark disallows mixing GROUPED_AGG pandas UDFs with native
    # aggregates in one agg — both reducers go through pandas here.
    # Type-hint form (Series -> scalar == GROUPED_AGG).
    mean_udf = F.pandas_udf(mean_exact, "double")
    n_udf = F.pandas_udf(n_vals, "long")
    return ev.groupBy("event_type").agg(
        mean_udf(F.col("value")).alias("mean_value"),
        n_udf(F.col("value")).alias("n"),
    )


# ---------------------------------------------------------------------------
# O5 — rolling count-window with a built-in reducer: pure native
# Window frame (whole-stage codegen, zero Python). Partitioned by
# entity (user_id) — the 100 TB-safe shape: the sort is per-user, the
# shuffle is one hash exchange. Decimal cast makes the sliding sum
# algorithm-independent (Spark recomputes frames; DuckDB uses segment
# trees — float low bits would differ).
# min_periods follows pandas (= window): first 4 rows per user -> NULL.
# ---------------------------------------------------------------------------
@register(
    "o5_rolling_sum_rows",
    """
    SELECT event_id, user_id,
           CASE WHEN COUNT(value) OVER w >= 5
                THEN CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
           END AS roll_sum
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def o5_rolling_sum_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkswift.operators.rolling import rolling_agg

    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast(D)
    )
    out = rolling_agg(
        ev,
        order_by=["ts", "event_id"],
        window=5,
        agg="sum",
        on="value_dec",
        output_col="roll_sum_dec",
        partition_by=["user_id"],
    )
    return out.select(
        "event_id", "user_id", F.col("roll_sum_dec").cast("double").alias("roll_sum")
    )


# ---------------------------------------------------------------------------
# O5 — rolling time-window (pandas rolling("1h") analog): RANGE frame
# over exact epoch-microseconds, right-closed (t-1h, t]. Range frames
# include all peers, so ties in ts are deterministic by construction.
# ---------------------------------------------------------------------------
@register(
    "o5_rolling_sum_time",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS roll_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
    """,
)
def o5_rolling_sum_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkswift.operators.rolling import rolling_agg

    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast(D)
    )
    out = rolling_agg(
        ev,
        order_by="ts",
        window="1 hour",
        agg="sum",
        on="value_dec",
        output_col="roll_dec",
        partition_by=["user_id"],
        min_periods=1,
    )
    return out.select(
        "event_id", "user_id", F.col("roll_dec").cast("double").alias("roll_1h")
    )


# ---------------------------------------------------------------------------
# O5 — arbitrary rolling UDF (range = max-min: exact, no float
# accumulation) via per-entity applyInPandas running real
# pandas.rolling — semantics identical to the reference's
# rolling().apply (swifter.py:710-763), parallel across users.
# ---------------------------------------------------------------------------
@register(
    "o5_rolling_udf",
    """
    SELECT event_id, user_id,
           CAST(MAX(value) OVER w - MIN(value) OVER w AS DOUBLE) AS roll_range
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    """,
)
def o5_rolling_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkswift.operators.rolling import rolling_apply_udf

    ev = load_table(spark, sf_dir, "events")
    out = rolling_apply_udf(
        ev,
        order_by=["ts", "event_id"],
        window=10,
        func=lambda s: s.max() - s.min(),
        on="value",
        output_col="roll_range",
        partition_by=["user_id"],
        min_periods=1,
    )
    return out.select("event_id", "user_id", "roll_range")


# ---------------------------------------------------------------------------
# O5 — weighted rolling window (`rolling(5, win_type='triang').mean()`,
# the win_type leg of the reference signature swifter.py:140-172).
# Spark-first: the weighted sum unrolls to 5 lag terms — one native
# per-row expression in whole-stage codegen, zero Python. The oracle
# shares the SAME weight doubles as literals, and per-row IEEE
# arithmetic in identical association order is bit-identical across
# engines, so this hash-matches without rounding.
# ---------------------------------------------------------------------------
def _triang5_oracle() -> str:
    from sparkswift.operators.rolling import window_weights

    w = window_weights("triang", 5)
    terms = " + ".join(
        (f"LAG(value, {4 - i}) OVER w" if i < 4 else "value") + f" * {float(w[i])!r}"
        for i in range(5)
    )
    return f"""
    SELECT event_id, user_id, ({terms}) / {float(w.sum())!r} AS wroll
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


@register("o5_rolling_weighted", _triang5_oracle())
def o5_rolling_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkswift.operators.rolling import rolling_weighted

    ev = load_table(spark, sf_dir, "events")
    out = rolling_weighted(
        ev,
        order_by=["ts", "event_id"],
        window=5,
        on="value",
        win_type="triang",
        agg="mean",
        partition_by=["user_id"],
        output_col="wroll",
    )
    return out.select("event_id", "user_id", "wroll")


# ---------------------------------------------------------------------------
# O5 — GLOBAL-order rolling, distributed (the reference notebook's
# rolling(10).sum over the whole frame, BASELINE.md cell 34): naive
# Window.orderBy collapses to one task; rolling_agg_global keeps the
# global order via monotone buckets + k-1 boundary-row handoff.
# Oracle: plain SQL global window (DuckDB sorts single-node — fine at
# oracle scale) with the pandas leading-null rule.
# ---------------------------------------------------------------------------
@register(
    "o5b_rolling_global",
    """
    SELECT event_id,
           CASE WHEN ROW_NUMBER() OVER (ORDER BY event_id) >= 10
                THEN SUM(value) OVER (ORDER BY event_id
                                      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
           END AS rs
    FROM events
    """,
)
def o5b_rolling_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkswift.operators.rolling import rolling_agg_global

    ev = load_table(spark, sf_dir, "events")
    out = rolling_agg_global(
        ev.select("event_id", "value"),
        order_by="event_id",
        window=10,
        agg="sum",
        on="value",
        # event_id is dense → integer-div buckets are monotone ranges
        bucket_of=F.col("event_id") / F.lit(997),
        output_col="rs",
    )
    return out.select("event_id", "rs")


# ---------------------------------------------------------------------------
# O5 — GLOBAL time-window rolling, distributed: the range twin of
# o5b (fixed time-slice buckets + trailing-duration helper handoff —
# a plain filter, no ranking). DECIMAL accumulation so the float sum
# is order-independent and hash-exact vs the oracle.
# ---------------------------------------------------------------------------
@register(
    "o5c_rolling_global_time",
    """
    SELECT event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
                  ORDER BY ts
                  RANGE BETWEEN INTERVAL '1799999999 microseconds' PRECEDING
                            AND CURRENT ROW)
                AS DOUBLE) AS rs
    FROM events
    """,
)
def o5c_rolling_global_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkswift.operators.rolling import rolling_agg_global_time

    ev = load_table(spark, sf_dir, "events")
    out = rolling_agg_global_time(
        ev.select("event_id", "ts", F.col("value").cast(D).alias("value_dec")),
        ts_col="ts",
        window="30 minutes",
        agg="sum",
        on="value_dec",
        bucket_width="2 hours",
        output_col="rs_dec",
    )
    return out.select("event_id", F.col("rs_dec").cast("double").alias("rs"))


# ---------------------------------------------------------------------------
# O6 — resample (tumbling window) with native reducers:
# groupBy(F.window(ts, '1 hour')) == pandas resample('1h').agg.
# Bucket key = window.start (pandas label='left'); 1-hour buckets align
# with date_trunc in any engine. Shuffle volume = O(buckets×types).
# ---------------------------------------------------------------------------
@register(
    "o6_resample_hourly",
    """
    SELECT date_trunc('hour', ts) AS bucket_ts, event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def o6_resample_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkswift.operators.resample import resample_agg

    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast(D)
    )
    out = resample_agg(
        ev,
        ts_col="ts",
        rule="1 hour",
        aggs={
            "sum_value": F.sum("value_dec").cast("double"),
            "n": F.count(F.lit(1)).cast("bigint"),
        },
        extra_keys=["event_type"],
    )
    return out


# ---------------------------------------------------------------------------
# O6 — resample with an arbitrary per-bucket pandas UDF (median:
# exact order statistic, no accumulation → cross-engine safe).
# applyInPandas per (bucket): each bucket is one task's pandas frame.
# ---------------------------------------------------------------------------
@register(
    "o6_resample_udf_median",
    """
    SELECT date_trunc('hour', ts) AS bucket_ts,
           CAST(MEDIAN(value) AS DOUBLE) AS med,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1
    """,
)
def o6_resample_udf_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkswift.operators.resample import resample_apply_udf

    ev = load_table(spark, sf_dir, "events")

    def bucket_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"med": [float(pdf["value"].median())], "n": [int(len(pdf))]}
        )

    return resample_apply_udf(
        ev.select("ts", "value"),
        ts_col="ts",
        rule="1 hour",
        func=bucket_stats,
        schema="bucket_ts timestamp, med double, n bigint",
    )


# ---------------------------------------------------------------------------
# O6 — resample edge rules: closed='right' ((t0, t0+1h] buckets — a
# boundary event belongs to the EARLIER bucket), offset='15 minutes'
# (bucket phase), label='right' (bucket end as the emitted key).
# pandas semantics per reference swifter.py:174-220; implemented as a
# 1 µs event-time nudge + window startTime phase — pure native window,
# same single-shuffle plan as plain resample. Oracle mirrors it with
# exact floor-division µs arithmetic.
# ---------------------------------------------------------------------------
@register(
    "o6_resample_closed_right",
    """
    SELECT make_timestamp(
             ((epoch_us(ts) - 1 - 900000000) // 3600000000) * 3600000000
             + 900000000 + 3600000000) AS bucket_ts,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1
    """,
)
def o6_resample_closed_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkswift.operators.resample import resample_agg

    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast(D)
    )
    return resample_agg(
        ev,
        ts_col="ts",
        rule="1 hour",
        aggs={
            "sum_value": F.sum("value_dec").cast("double"),
            "n": F.count(F.lit(1)).cast("bigint"),
        },
        label="right",
        closed="right",
        offset="15 minutes",
    )


# sub-suites register themselves on import (bottom import is deliberate:
# they need `register` defined above)
from sparkswift import suite_relational  # noqa: E402,F401
from sparkswift import suite_llm  # noqa: E402,F401
from sparkswift import suite_streaming  # noqa: E402,F401
from sparkswift import suite_gates  # noqa: E402,F401  (wraps oracles above)


# ---------------------------------------------------------------------------
# O2 axis=0 — column-wise reduction (the route the reference could
# never parallelize: dask requires axis==1, swifter.py:434). Exact
# integer-grid accumulation for cross-engine determinism.
# ---------------------------------------------------------------------------
@register(
    "o2_apply_columns",
    """
    SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
               AS l_quantity,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
               AS l_discount,
           CAST(SUM(CAST(l_tax AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
               AS l_tax
    FROM lineitem
    """,
)
def o2_apply_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkswift.operators.apply import apply_columns

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount", "l_tax"
    )

    def mean_exact(s: pd.Series) -> float:
        import numpy as np

        total_q = int(np.round(s.to_numpy() * 10000).astype("int64").sum())
        return (total_q / 10000.0) / len(s)

    return apply_columns(li, mean_exact)


# ---------------------------------------------------------------------------
# O1 per-partition route — dd.map_partitions analog (swifter.py:
# 239-244): the UDF sees each whole partition as one pandas frame.
# Row-local func, so the oracle is plain SQL.
# ---------------------------------------------------------------------------
@register(
    "o1_apply_partitions",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price
    FROM lineitem
    """,
)
def o1_apply_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkswift.operators.apply import apply_partitions

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )

    def per_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["l_orderkey", "l_linenumber"]].copy()
        out["disc_price"] = pdf["l_extendedprice"] * (1 - pdf["l_discount"])
        return out

    return apply_partitions(li, per_partition)


# ---------------------------------------------------------------------------
# O7 — distributed-pandas passthrough (reference: modin accessor,
# parallel_accessor.py:81-168). pandas API on Spark plays modin's
# role; ps_apply vectorize-tries the UDF over the whole object then
# falls back to elementwise apply. x*2+1 stays IEEE-exact per row, so
# the oracle compares exactly.
# ---------------------------------------------------------------------------
@register(
    "o7_ps_apply",
    """
    SELECT l_orderkey, l_linenumber, l_quantity * 2 + 1 AS qx
    FROM lineitem
    """,
)
def o7_ps_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkswift.operators.pandas_api import ps_apply

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    psdf = li.pandas_api()
    psdf["qx"] = ps_apply(psdf["l_quantity"], lambda s: s * 2 + 1)
    return psdf.to_spark().select("l_orderkey", "l_linenumber", "qx")


# ---------------------------------------------------------------------------
# Registry finalization (VERDICT r12 #1): every REGISTERED name must
# carry a SQL oracle, so ANY driver sample of 50 entries is
# structurally rows+schema+hash green. The 33 sketch/ANN/fixed-point
# operators whose raw output is not SQL-expressible (banded LSH
# candidate pairs, IVF probe lists, trained-tokenizer ids, packed
# bins, ...) are therefore registered through their certifying
# verdict frame — the former *_gate computation, which RUNS the full
# operator and checks its laws (exact-twin subset + recall floors,
# pigeonhole completeness, round-trip/conservation, estimator error
# bounds) against SQL-computable ground truth. Nothing is lost:
# the raw-output callables remain public API on their operator
# modules, stay pinned by pytest, and keep carrying the THROUGHPUT
# signal via raw_queries() (bench times the raw operator — the
# verdict frame re-runs the exact twin too, so it has no clean
# timing meaning). r1-r12 precedent: these names' correctness
# evidence always lived in the gate twins; this makes the gate THE
# registered entry instead of a shadow, so the driver's hard channel
# can never again sample an unoracleable row (13 err:no_oracle slots
# in CORRECTNESS_r12.json — none wrong, all unverifiable).
# ---------------------------------------------------------------------------
_REPOINT = {
    "agg2_approx_distinct": "agg2_gate",
    "agg9_percentile_approx": "agg9_gate",
    "agg11_sketch_union": "agg11_gate",
    "d3_minhash_lsh": "d3_gate",
    "d4_simhash": "d4_gate",
    "d6_embedding_neardup_lsh": "d6_gate",
    "d8_neardup_pipeline": "d8_gate",
    "d12_semdedup": "d12_gate",
    "d14_neardup_incremental": "d14_gate",
    "d15_substring_dedup": "d15_gate",
    "d16_semdedup_incremental": "d16_gate",
    "e2_cosine_topk_lsh": "e2_gate",
    "e3_cosine_topk_ivf": "e3_gate",
    "e4_cosine_topk_ivf_persisted": "e4_gate",
    "e5_cosine_topk_pq": "e5_gate",
    "e6_cosine_topk_ivfpq": "e6_gate",
    "e7_cosine_topk_ivfpq_persisted": "e7_gate",
    "e10_cosine_topk_opq": "e10_gate",
    "e11_cosine_topk_sq": "e11_gate",
    "e14_cosine_range_ivf": "e14_gate",
    "g1_pagerank": "g1_gate",
    "g2_personalized_pagerank": "g2_gate",
    "g5_kcore": "g5_gate",
    "p5_decontaminate_bloom": "p5_gate",
    "p16_quality_bins_global": "p16_gate",
    "p22_pack_bins": "p22_gate",
    "p23_token_shards": "p23_gate",
    "p24_token_chunks": "p24_gate",
    "p31_sft_export": "p31_gate",
    "st10_stream_neardup": "st10_gate",
    "t16_bpe_trained": "t16_gate",
    "t21_unigram_tokens": "t21_gate",
    "t22_wordpiece_tokens": "t22_gate",
}

#: raw rows-only callables for the re-pointed names (populated by
#: _finalize) — the bench / public-API view of each operator.
RAW_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

_FINALIZED = False


def _finalize() -> None:
    """Apply _REPOINT once, lazily (same reason _ordered_names is
    lazy: a sub-suite module imported first triggers this module's
    import mid-way through its own registrations)."""
    global _FINALIZED
    if _FINALIZED:
        return
    for name, gate in _REPOINT.items():
        RAW_QUERIES[name] = _REGISTRY[name][0]
        assert _REGISTRY[gate][1] is not None, gate
        _REGISTRY[name] = _REGISTRY[gate]
        del _REGISTRY[gate]
    _FINALIZED = True


def raw_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Raw-output callables for the verdict-registered operators
    (bench.py times these; the registry serves the oracled frames)."""
    _finalize()
    return dict(RAW_QUERIES)


# ---------------------------------------------------------------------------
# Registration order. The correctness driver verifies the first 50
# registrations, so the window below holds the 50 entries with the
# highest evidence value THIS round (round 14). Rotation policy
# (tools/ledger.py): oldest driver evidence first, new/changed code
# always earns rows in its own round. Composition:
#
# r15 rotation = PURE STALENESS (VERDICT r14 #7: every registered
# name now has a historical driver row, so the window is simply the
# 50 names whose most-recent green driver row is OLDEST, computed
# from the CORRECTNESS_r*.json ledger; ties break alphabetically):
# 1. This round's fifteen NEW entries (no driver row yet): the five
#    ranged-ingest queries (mm26b/mm26c/mm28b/mm29b + the mm32 mixed
#    triage), the trained lang-id gate (t26), the dual-alpha carry
#    chain (w12b), the three closed TIFF gates (mm30 CCITT, mm31
#    JPEG-in-TIFF, mm33 deep grayscale), the streaming triage twin
#    (st38), the deep-audio decodes (mm34 AU float, mm35 WAV
#    24-bit/float), and the WebP + Ogg/Vorbis header censuses
#    (mm36, mm37).
# 2. The entire remaining round-7 cohort (last driver row 8 rounds
#    ago): agg13-agg16.
# 3. 30 of the 41-strong round-8 cohort (7 rounds stale) fills the
#    window; o7_ps_apply, p2_hash_split, p4_stratified_sample,
#    q1_pricing_summary,
#    q5_local_supplier_volume,
#    q10_returned_items, q17_small_quantity_revenue, st1_stream_resample,
#    st2_stateful_totals, st3_stream_sliding, st4_stream_join,
#    st5_stream_dedup, st6_stream_sessions, sw1_session_window,
#    t17_bpe_ids_gate, t2_lang_id and t6_pii_redact wait for r16.
#
# st2b_stateful_totals_tws remains unregistered: the container lacks
# protobuf so transformWithState cannot import (NOTES.md, re-checked
# 2026-08-14). EVERY entry - window and tail - is still checked vs
# DuckDB locally by `python tools/check.py` and by pytest; the window
# only decides which rows the driver re-verifies. The cross-round
# evidence ledger (query -> rounds green) lives in NOTES.md "Rotation
# ledger" and `tools/ledger.py --markdown`.
# ---------------------------------------------------------------------------
_WINDOW = [
    # --- (1) new this round (r15), never driver-verified ---
    "mm26b_mp3_census_ranged",
    "mm26c_mp3_census_prefix",
    "mm28b_video_census_ranged",
    "mm29b_mp4_census_ranged",
    "t26_langid_trained_gate",
    "w12b_ewm_crossover_global",
    "mm30_tiff_ccitt_decode_real",
    "mm31_tiff_jpeg_decode_real",
    "mm32_media_triage_ranged",
    "mm33_tiff_deep_decode_real",
    "st38_stream_media_triage",
    "mm34_au_float_decode_real",
    "mm35_wav_deep_decode_real",
    "mm36_webp_header_census",
    "mm37_ogg_vorbis_census",
    "mm38_wav_adpcm_decode_real",
    "mm39_wav_ms_adpcm_decode_real",
    "mm40_matroska_census",
    "mm40b_matroska_census_ranged",
    "st39_stream_adpcm_decode",
    "mm41_aiff_decode_real",
    "mm42_id3_tags_census",
    # --- (2) round-7 cohort (stalest driver evidence, 8 behind) ---
    "agg13_bool_aggs",
    "agg14_skew_report",
    "agg15_histogram",
    "agg16_heavy_hitters_gate",
    # --- (3) round-8 cohort (7 behind; fills the window to 50) ---
    "agg4_cube",
    "d1_dedup_exact",
    "d5_embedding_neardup",
    "j1_revenue_by_nation",
    "j4_asof_join",
    "j5_range_join",
    "mm1_decode",
    "mm2_frame_sample",
    "mm5_audio_decode_real",
    "o1_apply_partitions",
    "o1_apply_udf",
    "o2_apply_columns",
    "o2_apply_rows",
    "o2_apply_rows_expand",
    "o3_applymap",
    "o4_groupby_agg_udf",
    "o4_groupby_apply",
    "o4_skew_giant_group",
    "o5_rolling_sum_rows",
    "o5_rolling_sum_time",
    "o5_rolling_udf",
    "o5_rolling_weighted",
    "o6_resample_hourly",
    "o6_resample_udf_median",
]


def _ordered_names() -> list[str]:
    # applied LAZILY (not at import time): a sub-suite module imported
    # first triggers this module's import mid-way through its own —
    # at that point its registrations haven't run yet. By the time any
    # caller asks for queries(), every module has finished importing.
    _finalize()
    missing = [n for n in _WINDOW if n not in _REGISTRY]
    assert not missing, f"window names not registered: {missing}"
    assert len(_WINDOW) == len(set(_WINDOW)) == 50, len(_WINDOW)
    tail = [n for n in _REGISTRY if n not in set(_WINDOW)]
    return [*_WINDOW, *tail]


# ---------------------------------------------------------------------------
# O6 — gap-filling resample (upsample + ffill): every bucket between a
# group's first and last observation exists, empty buckets carry the
# previous value forward — pandas resample().agg().ffill(). Dense
# spine generated per group (sequence+explode), not shuffled.
# ---------------------------------------------------------------------------
@register(
    "o6b_resample_ffill",
    f"""
    WITH agg AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
             CAST(SUM(CAST(value AS {D})) AS DOUBLE) AS v,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, min(bucket_ts) AS lo, max(bucket_ts) AS hi
      FROM agg GROUP BY 1
    ),
    spine AS (
      SELECT event_type,
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
      FROM bounds
    ),
    j AS (
      SELECT s.event_type, s.bucket_ts, a.v, a.n
      FROM spine s LEFT JOIN agg a USING (event_type, bucket_ts)
    )
    SELECT event_type, bucket_ts,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY bucket_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v,
           last_value(n IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY bucket_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n
    FROM j
    """,
)
def o6b_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkswift.operators.resample import resample_fill

    ev = load_table(spark, sf_dir, "events")
    return resample_fill(
        ev,
        ts_col="ts",
        rule="1 hour",
        values={
            "v": F.sum(F.col("value").cast(D)).cast("double"),
            "n": F.count(F.lit(1)).cast("bigint"),
        },
        method="ffill",
        extra_keys=["event_type"],
    ).select("event_type", "bucket_ts", "v", "n")


# ---------------------------------------------------------------------------
# O6 — linear-interpolation upsample (pandas resample().mean()
# .interpolate('linear')): 5-minute buckets are ~97% empty on the
# events fixture, so nearly every output row exercises the
# two-window prev/next struct carry + the per-row linear blend. The
# spine bounds come from observed buckets, so no head/tail
# extrapolation cases exist; per-row IEEE arithmetic hash-matches
# the identical SQL expression.
# ---------------------------------------------------------------------------
@register(
    "o6c_resample_interpolate",
    f"""
    WITH agg AS (
      SELECT event_type,
             CAST(to_timestamp((epoch_us(ts) // 300000000) * 300000000
                               / 1000000) AS TIMESTAMP) AS bucket_ts,
             CAST(SUM(CAST(value AS {D})) AS DOUBLE) / COUNT(*) AS v
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, min(bucket_ts) AS lo, max(bucket_ts) AS hi
      FROM agg GROUP BY 1
    ),
    spine AS (
      SELECT event_type,
             unnest(generate_series(lo, hi, INTERVAL 5 MINUTE)) AS bucket_ts
      FROM bounds
    ),
    j AS (
      SELECT s.event_type, s.bucket_ts, a.v
      FROM spine s LEFT JOIN agg a USING (event_type, bucket_ts)
    ),
    fills AS (
      SELECT event_type, bucket_ts, v,
             CAST(epoch_us(bucket_ts) AS DOUBLE) AS t,
             last_value(CASE WHEN v IS NOT NULL THEN
                 struct_pack(t := CAST(epoch_us(bucket_ts) AS DOUBLE), v := v)
               END IGNORE NULLS) OVER (
                 PARTITION BY event_type ORDER BY bucket_ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
             first_value(CASE WHEN v IS NOT NULL THEN
                 struct_pack(t := CAST(epoch_us(bucket_ts) AS DOUBLE), v := v)
               END IGNORE NULLS) OVER (
                 PARTITION BY event_type ORDER BY bucket_ts
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n
      FROM j
    )
    SELECT event_type, bucket_ts,
           CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
                ELSE p.v + (n.v - p.v) * ((t - p.t) / (n.t - p.t)) END AS v
    FROM fills
    """,
)
def o6c_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkswift.operators.resample import resample_fill

    ev = load_table(spark, sf_dir, "events")
    return resample_fill(
        ev,
        ts_col="ts",
        rule="5 minutes",
        values={
            "v": F.sum(F.col("value").cast(D)).cast("double") / F.count(F.lit(1)),
        },
        method="interpolate",
        extra_keys=["event_type"],
    ).select("event_type", "bucket_ts", "v")


# ---------------------------------------------------------------------------
# O8 — COGROUPED two-frame apply: per-user as-of alignment of clicks
# against purchases with pandas merge_asof INSIDE the UDF, via
# groupBy().cogroup().applyInPandas (the cogrouped-map Arrow entry
# point — the last of Spark's pandas-UDF surfaces, now covered). Both
# frames shuffle once on user_id; each executor-side group runs the
# alignment locally. Result semantics are IDENTICAL to j4's native
# asof_join (a route-equivalence pytest asserts it); DuckDB's ASOF
# JOIN is the oracle. Fixture purchases are unique per (user_id, ts)
# — the determinism precondition both routes share.
# ---------------------------------------------------------------------------
@register(
    "o8_cogroup_asof",
    """
    SELECT l.event_id, l.user_id, l.ts, r.value AS last_purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def o8_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkswift.operators.groupby import cogroup_apply

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )

    def align(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        # numpy searchsorted instead of pd.merge_asof: identical
        # backward/ties-allowed semantics (side="right" − 1), ~50 µs
        # per group vs merge_asof's ~4 ms call overhead — measured
        # 13 s → ~7 s on the sf0.1 headline (1500 tiny groups; the
        # route-equivalence pytest pins the semantics to merge_asof)
        import numpy as np

        rt = r["ts"].to_numpy()
        if rt.size == 0:
            # one-sided key (clicks, no purchases): cogroup delivers an
            # EMPTY right frame — vals[clip(j,0)] would index a size-0
            # array (np.where evaluates both branches)
            matched = np.full(len(l), np.nan)
        else:
            order = np.argsort(rt, kind="stable")
            rt = rt[order]
            vals = r["value"].to_numpy()[order]
            j = np.searchsorted(rt, l["ts"].to_numpy(), side="right") - 1
            matched = np.where(j >= 0, vals[np.clip(j, 0, None)], np.nan)
        return pd.DataFrame(
            {
                "event_id": l["event_id"].to_numpy(),
                "ts": l["ts"],
                "last_purchase_value": matched,
            }
        )

    return cogroup_apply(
        clicks,
        purchases,
        keys="user_id",
        func=align,
        schema=(
            "user_id bigint, event_id bigint, ts timestamp, "
            "last_purchase_value double"
        ),
    ).select("event_id", "user_id", "ts", "last_purchase_value")
