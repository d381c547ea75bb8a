"""Event-sequence analytics (north-star extension): funnel analysis
over the events stream table — the product-analytics staple every
warehouse engine ships (funnel / conversion steps), expressed as
chained keyed aggregates Catalyst can plan as ONE partitioning.

Scale shape: step k is ``min(ts) where type = step_k and ts > t_{k-1}``
— each step is a hash aggregate + an equi-join on the SAME user key,
so AQE reuses one exchange silhouette; no window over full event
history, no per-user sort, no UDF. Event rows shuffle once per step
on the user key (3 steps = 3 small aggs over an ever-shrinking keyed
frame), which beats the collect-sort-per-user shape at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """STRICTLY-ORDERED funnel: per user, ``t1`` = earliest event of
    ``steps[0]``; ``t_k`` = earliest event of ``steps[k-1]`` with
    ``ts > t_{k-1}`` (strict — a same-timestamp later step does not
    count, the unambiguous cross-engine rule). Returns one row per
    user who reached step 1, with nullable epoch-microsecond columns
    ``t1_us..tK_us`` and ``depth`` = number of steps reached.

    The per-step frames shrink monotonically (only users who reached
    step k-1 are probed for step k), so each join's right side is at
    most the previous step's survivors.
    """
    if not steps:
        raise ValueError("funnel_steps: need at least one step")
    ev = df.select(
        F.col(user_col).alias("__u"),
        F.unix_micros(F.col(ts_col)).alias("__t"),
        F.col(type_col).alias("__ty"),
    )
    reached = (
        ev.filter(F.col("__ty") == steps[0])
        .groupBy("__u")
        .agg(F.min("__t").alias("t1_us"))
    )
    for k in range(2, len(steps) + 1):
        nxt = (
            ev.filter(F.col("__ty") == steps[k - 1])
            .join(reached.select("__u", F.col(f"t{k - 1}_us")), "__u")
            .filter(F.col("__t") > F.col(f"t{k - 1}_us"))
            .groupBy("__u")
            .agg(F.min("__t").alias(f"t{k}_us"))
        )
        reached = reached.join(nxt, "__u", "left")
    depth = F.lit(0)
    for k in range(1, len(steps) + 1):
        depth = depth + F.when(F.col(f"t{k}_us").isNotNull(), 1).otherwise(0)
    return reached.select(
        F.col("__u").alias(user_col),
        *[F.col(f"t{k}_us") for k in range(1, len(steps) + 1)],
        depth.cast("int").alias("depth"),
    )


def retention_cohorts(
    df: DataFrame,
    cohort_type: str = "signup",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Cohort RETENTION: users cohorted by the DAY of their first
    ``cohort_type`` event; a cohort member is retained on day-offset
    k if ANY event of theirs falls k days after the cohort day.
    Returns ``(cohort_day_us, day_offset, n_active)`` — the classic
    retention triangle, fully relational: one keyed min-aggregate,
    one user-key join, one distinct-count aggregate. Day arithmetic
    is integer floor-division of epoch micros (identical across
    engines — no calendar/timezone surface).
    """
    day_us = 86_400_000_000
    ev = df.select(
        F.col(user_col).alias("__u"),
        F.unix_micros(F.col(ts_col)).alias("__t"),
        F.col(type_col).alias("__ty"),
    )
    # FLOOR division in exact integer arithmetic: Spark's `div`
    # truncates toward zero, but the oracle's BIGINT `//` FLOORS —
    # they diverge for pre-1970 (negative-epoch) timestamps, so the
    # floor is spelled as (x − pmod(x, d)) div d (pmod is always
    # non-negative, making the subtraction land on the floor multiple)
    def floor_day(c: str) -> Column:
        return F.expr(f"({c} - pmod({c}, {day_us})) div {day_us}")

    cohort = (
        ev.filter(F.col("__ty") == cohort_type)
        .groupBy("__u")
        .agg(F.min("__t").alias("__t1"))
        .select(
            "__u",
            (floor_day("__t1") * day_us).cast("bigint").alias("cohort_day_us"),
        )
    )
    return (
        ev.join(cohort, "__u")
        .select(
            "__u",
            "cohort_day_us",
            (floor_day("__t") - floor_day("cohort_day_us")).alias(
                "day_offset"
            ),
        )
        .filter(F.col("day_offset") >= 0)  # pre-cohort activity excluded
        .groupBy("cohort_day_us", "day_offset")
        .agg(F.countDistinct("__u").cast("bigint").alias("n_active"))
    )


def scd2_intervals(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    attr_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Slowly-Changing-Dimension type 2 build: collapse a change log
    into validity intervals — per key, consecutive runs of the same
    ``attr_col`` value become one row with ``[from_us, to_us)`` bounds
    (``to_us`` NULL on the current value). The warehouse-dimension
    staple (Kimball SCD2), expressed as two window passes over ONE
    key partitioning: lag() marks change points, lead() over the
    change rows closes each interval.

    Ordering inside a key is (ts, tiebreak) — the explicit tiebreak
    makes same-timestamp logs deterministic across engines. Scale:
    one hash shuffle on the key + per-partition sorts; no self-join,
    no collect.
    """
    from pyspark.sql import Window as W

    # NULL-SAFE change detection (IS DISTINCT FROM, like the w5
    # oracle): a plain `lag != attr` is NULL-swallowed (misses
    # non-null→NULL transitions) and `lag.isNull()` conflates "first
    # row" with "previous attr is NULL" (splits a NULL run per row) —
    # so the first row is marked by row_number and the rest by
    # ~eqNullSafe.
    w0 = W.partitionBy("__k").orderBy(F.col("__t"), F.col("__tb"))
    marked = df.select(
        F.col(key_col).alias("__k"),
        F.unix_micros(F.col(ts_col)).alias("__t"),
        F.col(tiebreak_col).alias("__tb"),
        F.col(attr_col).alias("__a"),
    ).withColumn(
        "__chg",
        F.when(
            (F.row_number().over(w0) == 1)
            | ~F.lag("__a").over(w0).eqNullSafe(F.col("__a")),
            1,
        ).otherwise(0),
    )
    changes = marked.filter(F.col("__chg") == 1)
    w2 = W.partitionBy("__k").orderBy(F.col("__t"), F.col("__tb"))
    return changes.select(
        F.col("__k").alias(key_col),
        F.col("__a").alias(attr_col),
        F.col("__t").alias("from_us"),
        F.lead("__t").over(w2).alias("to_us"),
    )


def ohlc_bars(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    key_col: str = "event_type",
    tiebreak_col: str = "event_id",
    rule: str = "hour",
) -> DataFrame:
    """OHLC candle bars (the market-data / metering resample staple
    the plain o6 sum/count resample does not cover): per (key, time
    bucket) the OPENing value (at the bucket's first event), HIGH,
    LOW, and CLOSE (last event), plus the event count. Open/close are
    ARG-min/max selections on the (ts, tiebreak) total order — the
    explicit tiebreak makes same-timestamp buckets deterministic
    across engines (the scd2 discipline); high/low are plain min/max
    (stored doubles compare bit-identically).

    Plan: ONE hash shuffle on (key, bucket) — first/last ride an
    ordered window over that partitioning and the final aggregate
    reuses it (no second exchange). Returns ``(key, bucket_ts, open,
    high, low, close, n_events)``.
    """
    from pyspark.sql import Window as W

    bucket = F.date_trunc(rule, F.col(ts_col)).alias("bucket_ts")
    base = df.select(
        F.col(key_col),
        bucket,
        F.col(ts_col).alias("__t"),
        F.col(tiebreak_col).alias("__tb"),
        F.col(value_col).alias("__v"),
    )
    w = W.partitionBy(key_col, "bucket_ts").orderBy("__t", "__tb")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    seq = base.withColumn("__open", F.first("__v").over(wfull)).withColumn(
        "__close", F.last("__v").over(wfull)
    )
    return seq.groupBy(key_col, "bucket_ts").agg(
        F.min("__open").cast("double").alias("open"),
        F.max("__v").cast("double").alias("high"),
        F.min("__v").cast("double").alias("low"),
        F.min("__close").cast("double").alias("close"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


def ohlc_partials(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    key_col: str = "event_type",
    tiebreak_col: str = "event_id",
    rule: str = "hour",
) -> DataFrame:
    """Mergeable OHLC partial per (key, bucket) — the streaming-ingest
    half of :func:`ohlc_bars` (the st18/st20 integer-summary class,
    extended to arg-selections): open/close carry their FULL selection
    key (ts, tiebreak, value) as a struct so partials merge by plain
    struct min/max — associative, commutative, and therefore BIT-exact
    under any batch chop (certified stream==batch in st29). One hash
    aggregate, summary-sized output."""
    bucket = F.date_trunc(rule, F.col(ts_col)).alias("bucket_ts")
    sel = F.struct(
        F.col(ts_col).alias("t"),
        F.col(tiebreak_col).alias("tb"),
        F.col(value_col).alias("v"),
    )
    return df.select(F.col(key_col), bucket, sel.alias("__s"), F.col(value_col).alias("__v")).groupBy(
        key_col, "bucket_ts"
    ).agg(
        F.min("__s").alias("o_sel"),
        F.max("__s").alias("c_sel"),
        F.max("__v").cast("double").alias("high"),
        F.min("__v").cast("double").alias("low"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


def ohlc_merge(partials: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Merge :func:`ohlc_partials` rows (any grouping of the data into
    batches) into the final candles — same output contract as
    :func:`ohlc_bars`."""
    merged = partials.groupBy(key_col, "bucket_ts").agg(
        F.min("o_sel").alias("o_sel"),
        F.max("c_sel").alias("c_sel"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.sum("n_events").cast("bigint").alias("n_events"),
    )
    return merged.select(
        key_col,
        "bucket_ts",
        F.col("o_sel.v").cast("double").alias("open"),
        "high",
        "low",
        F.col("c_sel.v").cast("double").alias("close"),
        "n_events",
    )


def max_drawdown(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    key_col: str = "user_id",
    tiebreak_col: str = "event_id",
    scale: int = 1000,
) -> DataFrame:
    """Maximum drawdown per key over the time-ordered value series —
    the risk/monitoring staple (price series, SLO burn, battery/quota
    level): drawdown at time t is ``running_peak - value``, and the
    report is each key's worst one. Values are quantized once to
    integers (``floor(value * scale)``, exact on doubles) so the
    running peak, the subtraction, and the maxima are all EXACT
    integer arithmetic — the w6/w7 cross-engine discipline. The
    (ts, tiebreak) total order makes same-timestamp sequences
    deterministic.

    Plan: ONE hash shuffle on ``key_col`` — the running peak rides an
    ordered window over that partitioning and the final aggregate
    reuses it (per-key history sorts inside its hash partition; no
    range exchange — the agg23 shape). Returns ``(key, n_events,
    peak_scaled, max_drawdown_scaled, final_scaled)``.
    """
    from pyspark.sql import Window as W

    base = df.select(
        F.col(key_col),
        F.col(ts_col).alias("__t"),
        F.col(tiebreak_col).alias("__tb"),
        F.floor(F.col(value_col) * scale).cast("bigint").alias("__v"),
    )
    w = W.partitionBy(key_col).orderBy("__t", "__tb")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    seq = base.withColumn("__peak", F.max("__v").over(run)).withColumn(
        "__final", F.last("__v").over(full)
    )
    return seq.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max("__peak").cast("bigint").alias("peak_scaled"),
        F.max(F.col("__peak") - F.col("__v")).cast("bigint").alias(
            "max_drawdown_scaled"
        ),
        F.min("__final").cast("bigint").alias("final_scaled"),
    )


def bollinger_bands(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    key_col: str = "user_id",
    tiebreak_col: str = "event_id",
    periods: int = 20,
    n_sigma: float = 2.0,
    scale: int = 1000,
) -> DataFrame:
    """Bollinger bands over the time-ordered value series (the
    rolling mean ± n·σ envelope — monitoring/trading's anomaly
    corridor): per row, the trailing ``periods``-row population mean
    and stddev, and the row's band position. Cross-engine-exact by
    the agg26 trick applied to ROLLING windows: the window aggregates
    are integer SUM and SUM-OF-SQUARES over milli-quantized values
    (exact, order-free), and mean/σ/bands derive from those integers
    through one shared expression tree (+ − * / sqrt only — all
    IEEE-correctly-rounded). Rows earlier than a full window emit
    NULL bands (the unambiguous warm-up rule).

    Overflow budget: |v_milli| ≤ V needs periods·V² ≤ 2⁶³ — V = 10⁹
    (values up to a million units) holds for any sane window.

    Plan: ONE hash shuffle on the key; both window sums ride the same
    ordered window frame. Returns ``(key, tiebreak, ts, v_scaled,
    mean, sigma, upper, lower, above_upper)``.
    """
    from pyspark.sql import Window as W

    base = df.select(
        F.col(key_col),
        F.col(ts_col).alias("__t"),
        F.col(tiebreak_col).alias("__tb"),
        F.floor(F.col(value_col) * scale).cast("bigint").alias("v_scaled"),
    )
    w = (
        W.partitionBy(key_col)
        .orderBy("__t", "__tb")
        .rowsBetween(-(periods - 1), W.currentRow)
    )
    wn = W.partitionBy(key_col).orderBy("__t", "__tb")
    s = (
        base.withColumn("__s1", F.sum("v_scaled").over(w))
        .withColumn("__s2", F.sum(F.expr("v_scaled * v_scaled")).over(w))
        .withColumn("__rn", F.row_number().over(wn))
    )
    # literals rendered as CAST(... AS DOUBLE): a bare `20.0` parses
    # as DECIMAL in both engines and the decimal→double promotion
    # rules need not agree — the explicit cast pins binary64 on both
    p = f"CAST({periods} AS DOUBLE)"
    ns = f"CAST({n_sigma} AS DOUBLE)"
    mean = f"(CAST(__s1 AS DOUBLE) / {p})"
    var = f"(CAST(__s2 AS DOUBLE) / {p} - {mean} * {mean})"
    # clamp tiny negative var from cancellation: GREATEST is exact on
    # both engines and keeps sqrt's domain safe
    sig = f"SQRT(GREATEST({var}, CAST(0 AS DOUBLE)))"
    upper = f"({mean} + {ns} * {sig})"
    lower = f"({mean} - {ns} * {sig})"
    full = F.col("__rn") >= periods
    return s.select(
        key_col,
        F.col("__tb").alias(tiebreak_col),
        F.col("__t").alias(ts_col),
        "v_scaled",
        F.when(full, F.expr(mean)).alias("mean"),
        F.when(full, F.expr(sig)).alias("sigma"),
        F.when(full, F.expr(upper)).alias("upper"),
        F.when(full, F.expr(lower)).alias("lower"),
        # warm-up rows say FALSE, not NULL: "no band yet ⇒ not above
        # it" is the unambiguous rule, and nullable BOOLEANS are a
        # cross-engine hash trap (None vs NaN stringify differently;
        # NULL doubles are fine — both sides are NaN)
        F.when(full, F.col("v_scaled") > F.expr(upper))
        .otherwise(F.lit(False))
        .alias("above_upper"),
    )
