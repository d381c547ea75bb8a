"""asof_join vs pandas merge_asof as oracle (differential testing per
SURVEY.md §5), plus the O7 pandas-on-Spark passthrough."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkswift.operators.joins import asof_join
from sparkswift.sources import load_table


@pytest.fixture(scope="module")
def ev(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _pandas_asof(ev_pdf, tolerance=None, direction="backward", allow_exact=True):
    left = (
        ev_pdf[ev_pdf.event_type == "click"][["event_id", "user_id", "ts"]]
        .sort_values("ts")
        .reset_index(drop=True)
    )
    right = (
        ev_pdf[ev_pdf.event_type == "purchase"][["user_id", "ts", "value"]]
        .sort_values("ts")
        .reset_index(drop=True)
    )
    kw = {"tolerance": pd.Timedelta(tolerance)} if tolerance else {}
    return pd.merge_asof(
        left, right, on="ts", by="user_id", direction=direction,
        allow_exact_matches=allow_exact, **kw
    )


def _spark_asof(ev, tolerance=None, direction="backward", allow_exact=True):
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="ts",
        right_cols=["value"], tolerance=tolerance, direction=direction,
        allow_exact_matches=allow_exact,
    )


def test_asof_join_matches_merge_asof(ev):
    got = (
        _spark_asof(ev).toPandas().sort_values("event_id").reset_index(drop=True)
    )
    want = _pandas_asof(ev.toPandas()).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["event_id", "user_id", "value"]], want[["event_id", "user_id", "value"]]
    )


def test_asof_join_tolerance(ev):
    got = (
        _spark_asof(ev, tolerance="30 minutes")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = (
        _pandas_asof(ev.toPandas(), tolerance="30 minutes")
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["event_id", "user_id", "value"]], want[["event_id", "user_id", "value"]]
    )
    # the tolerance must actually null something out
    full = _spark_asof(ev).toPandas()
    assert got["value"].isna().sum() > full["value"].isna().sum()


@pytest.mark.parametrize("direction", ["forward", "nearest"])
@pytest.mark.parametrize("tolerance", [None, "30 minutes"])
def test_asof_join_directions_match_merge_asof(ev, direction, tolerance):
    got = (
        _spark_asof(ev, tolerance=tolerance, direction=direction)
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    want = (
        _pandas_asof(ev.toPandas(), tolerance=tolerance, direction=direction)
        .sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["event_id", "user_id", "value"]], want[["event_id", "user_id", "value"]]
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_strict_inequality(ev, direction):
    got = (
        _spark_asof(ev, direction=direction, allow_exact=False)
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    want = (
        _pandas_asof(ev.toPandas(), direction=direction, allow_exact=False)
        .sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["event_id", "user_id", "value"]], want[["event_id", "user_id", "value"]]
    )


def test_asof_nearest_tolerance_one_sided_match(spark):
    """Regression (ADVICE r4): direction='nearest' + tolerance with a
    row that has an in-tolerance BACKWARD match but no forward match
    at all. The missing forward timestamp is NULL; the tolerance
    predicate must evaluate FALSE (not SQL NULL) or both when-branches
    skip and the backward value is wrongly nulled."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 12:00:00")],
        "event_id int, ts string",
    ).select("event_id", F.lit("u1").alias("user_id"), F.col("ts").cast("timestamp"))
    # single right row BEFORE both left rows → forward match never exists
    right = spark.createDataFrame(
        [("u1", "2024-01-01 09:50:00", 42.0)], "user_id string, ts string, value double"
    ).select("user_id", F.col("ts").cast("timestamp"), "value")
    got = (
        asof_join(
            left, right, key="user_id", left_ts="ts", right_ts="ts",
            right_cols=["value"], tolerance="30 minutes", direction="nearest",
        )
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    lp = left.toPandas().sort_values("ts").reset_index(drop=True)
    rp = right.toPandas().sort_values("ts").reset_index(drop=True)
    want = pd.merge_asof(
        lp, rp, on="ts", by="user_id", direction="nearest",
        tolerance=pd.Timedelta("30 minutes"),
    ).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["event_id", "value"]], want[["event_id", "value"]]
    )
    # the in-tolerance one-sided match must actually carry the value
    assert got.loc[got.event_id == 1, "value"].iloc[0] == 42.0
    # and the out-of-tolerance row must be null
    assert pd.isna(got.loc[got.event_id == 2, "value"].iloc[0])


def test_asof_join_rejects_bad_direction(ev):
    with pytest.raises(ValueError):
        _spark_asof(ev, direction="sideways")


def test_ps_apply_vectorized_and_fallback(spark, sf_dir):
    from sparkswift.operators.pandas_api import ps_apply

    li = load_table(spark, sf_dir, "lineitem").select("l_quantity").limit(100)
    psser = li.pandas_api()["l_quantity"]

    vec = ps_apply(psser, lambda s: s * 2 + 1).to_pandas().reset_index(drop=True)

    def scalar_only(x):
        if hasattr(x, "__len__"):  # reject whole-series call → fallback route
            raise TypeError("scalar only")
        return x * 2 + 1

    fb = ps_apply(psser, scalar_only).to_pandas().reset_index(drop=True)
    pd.testing.assert_series_equal(vec, fb, check_names=False)


def test_salted_join_equals_plain_join(spark, sf_dir):
    from sparkswift.operators.joins import salted_join

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    plain = li.join(orders, "o_orderkey").groupBy("o_orderkey").count()
    salted = salted_join(li, orders, "o_orderkey", salt=4).groupBy("o_orderkey").count()
    a = plain.toPandas().sort_values("o_orderkey").reset_index(drop=True)
    b = salted.toPandas().sort_values("o_orderkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_aqe_skew_join_splits_hot_key(spark):
    """The AQE leg of the skew story (salted_join is the manual leg):
    with skew thresholds scaled to fixture size, a 90%-hot-key join
    gets its straggler partition split at runtime (SMJ marked
    skew=true) and still returns exact results."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

        left = spark.range(200_000).select(
            F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("pl"),
        )
        right = spark.range(1_000).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        j = left.join(right, "k")
        n = j.count()
        assert n == 180_000 + 100  # hot key 0 matches + distinct keys %10==0 under 1000
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_rejects_right_preserving(spark):
    """how='right'/'full' would duplicate unmatched right rows salt
    times (ADVICE item) — the operator must refuse."""
    import pytest

    from sparkswift.operators.joins import salted_join

    df = spark.range(10).withColumnRenamed("id", "k")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="left-preserving"):
            salted_join(df, df, "k", how=how)


def test_range_join_buckets_equals_naive_and_avoids_nested_loop(spark):
    """Bucketized large×large range join: pairs equal the naive
    cross-filter on small data, and the plan is a hash equi-join —
    no BroadcastNestedLoop, no CartesianProduct."""
    from sparkswift.operators.joins import range_join_buckets

    points = spark.range(200).select(
        F.col("id").alias("pid"), (F.col("id") * 7.3).alias("price")
    )
    intervals = spark.range(50).select(
        F.col("id").alias("iid"),
        (F.col("id") * 31.0).alias("lo"),
        (F.col("id") * 31.0 + 40.0).alias("hi"),
    )
    got = range_join_buckets(points, intervals, "price", "lo", "hi", 40.0)
    got_pairs = {(r.pid, r.iid) for r in got.collect()}
    naive = (
        points.crossJoin(intervals)
        .filter((F.col("price") >= F.col("lo")) & (F.col("price") <= F.col("hi")))
    )
    want_pairs = {(r.pid, r.iid) for r in naive.collect()}
    assert got_pairs == want_pairs and want_pairs
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    with pytest.raises(ValueError):
        range_join_buckets(points, intervals, "price", "lo", "hi", 0)


def test_register_parallel_ps_accessor(spark, sf_dir):
    """register_parallel() (register_modin analog) exposes .swifter on
    pandas-on-Spark objects: vectorized + fallback series apply, frame
    apply delegation, reference-parity warnings and refusals."""
    import warnings

    import sparkswift

    sparkswift.register_parallel()
    li = load_table(spark, sf_dir, "lineitem").select("l_quantity", "l_tax").limit(80)
    psdf = li.pandas_api()

    vec = psdf["l_quantity"].swifter.apply(lambda s: s * 2 + 1).to_pandas()
    want = li.toPandas()["l_quantity"] * 2 + 1
    assert sorted(vec.to_numpy()) == sorted(want.to_numpy())

    def scalar_only(x):
        if hasattr(x, "__len__"):
            raise TypeError("scalar only")
        return x * 2 + 1

    fb = psdf["l_quantity"].swifter.apply(scalar_only).to_pandas()
    assert sorted(fb.to_numpy()) == sorted(want.to_numpy())

    # frame apply delegates; knobs chain with warnings; Rolling refuses
    col_sums = psdf.swifter.apply(lambda c: c.sum()).to_pandas()
    assert len(col_sums) == 2
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        acc = psdf.swifter.set_dask_threshold(2).allow_dask_on_strings()
        assert len(w) == 2
    with pytest.raises(NotImplementedError):
        acc.rolling(3)
    with pytest.raises(NotImplementedError):
        psdf.swifter.apply(lambda r: r, axis=1, raw=True)


# --- range_join_intervals ---------------------------------------------------


def test_interval_overlap_exactly_once_vs_bruteforce(spark):
    """Random intervals spanning MANY buckets: every overlapping pair
    appears exactly once (the canonical-bucket filter), matching a
    brute-force nested loop."""
    from sparkswift.operators.joins import range_join_intervals

    la = [(i, float((i * 7) % 50), float((i * 7) % 50 + (i * 13) % 40)) for i in range(80)]
    rb = [(j, float((j * 11) % 60), float((j * 11) % 60 + (j * 5) % 35)) for j in range(80)]
    a = spark.createDataFrame(la, "a_id long, a_lo double, a_hi double")
    b = spark.createDataFrame(rb, "b_id long, b_lo double, b_hi double")
    got = (
        range_join_intervals(a, b, "a_lo", "a_hi", "b_lo", "b_hi", bucket_width=8.0)
        .select("a_id", "b_id")
        .toPandas()
    )
    expect = {
        (i, j)
        for i, alo, ahi in la
        for j, blo, bhi in rb
        if alo <= bhi and blo <= ahi
    }
    pairs = list(zip(got["a_id"], got["b_id"]))
    assert len(pairs) == len(set(pairs)), "duplicated pairs"
    assert set(pairs) == expect


def test_interval_overlap_plan_is_equi_join(spark):
    from pyspark.sql import functions as F

    from sparkswift.operators.joins import range_join_intervals

    a = spark.range(100).select(
        F.col("id").alias("a_id"),
        (F.col("id") * 1.0).alias("a_lo"),
        (F.col("id") * 1.0 + 5).alias("a_hi"),
    )
    b = spark.range(100).select(
        F.col("id").alias("b_id"),
        (F.col("id") * 1.0 + 2).alias("b_lo"),
        (F.col("id") * 1.0 + 7).alias("b_hi"),
    )
    out = range_join_intervals(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 4.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


def test_scd2_pointintime_asof_equals_containment(ev):
    """j12's reduction law: because SCD2 intervals tile
    [first_change, inf) per key, a backward as-of join on the interval
    START equals the interval-containment join (from_us <= t < to_us),
    boundary rows included."""
    from sparkswift.operators.events import scd2_intervals

    dim = scd2_intervals(ev)
    facts = ev.select(
        "event_id",
        "user_id",
        (F.unix_micros("ts") - F.lit(1_800_000_000)).alias("probe_us"),
        (F.col("ts") - F.expr("INTERVAL 30 minutes")).alias("probe_ts"),
    )
    via_asof = asof_join(
        facts,
        dim.select(
            "user_id",
            F.timestamp_micros(F.col("from_us")).alias("from_ts"),
            F.col("event_type").alias("state"),
        ),
        key="user_id",
        left_ts="probe_ts",
        right_ts="from_ts",
        right_cols=["state"],
    ).select("event_id", "probe_us", "state")
    d = dim.select(
        F.col("user_id").alias("d_uid"), "from_us", "to_us",
        F.col("event_type").alias("state"),
    )
    via_containment = facts.join(
        d,
        (facts.user_id == d.d_uid)
        & (d.from_us <= facts.probe_us)
        & (d.to_us.isNull() | (facts.probe_us < d.to_us)),
        "left",
    ).select("event_id", "probe_us", "state")
    a = via_asof.toPandas().sort_values("event_id").reset_index(drop=True)
    b = via_containment.toPandas().sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # non-vacuous: some probes precede the user's first change point
    assert a["state"].isna().sum() > 0


def test_spatial_join_exhaustive_vs_bruteforce(spark):
    """j13: the grid 3x3 reduction finds EXACTLY the brute-force pair
    set on random clouds (negative coords, cell-boundary straddles)
    and each pair exactly once."""
    import random

    from sparkswift.operators.joins import spatial_join

    rng = random.Random(41)
    for trial in range(4):
        n = 120
        r = [0.05, 0.1, 0.25, 1.0][trial]
        pts = [
            (i, rng.uniform(-1, 1), rng.uniform(-1, 1)) for i in range(n)
        ]
        # plant exact-boundary and same-cell-edge cases
        pts += [(n, 0.0, 0.0), (n + 1, r, 0.0), (n + 2, -r / 2, -r / 2)]
        want = set()
        for i, xi, yi in pts:
            for j, xj, yj in pts:
                if i < j and (xi - xj) ** 2 + (yi - yj) ** 2 <= r * r:
                    want.add((i, j))
        df = spark.createDataFrame(pts, "vec_id long, x double, y double")
        rows = spatial_join(df, id_col="vec_id", radius=r).collect()
        got = [(r_.id_l, r_.id_r) for r_ in rows]
        assert len(got) == len(set(got)), "duplicate pair emitted"
        assert set(got) == want, (trial, len(got), len(want))
        for r_ in rows:
            assert r_.dist_sq <= r * r + 1e-15
    # the planted boundary pair (0,0)-(r,0) sits at dist == r exactly
    assert (n, n + 1) in want


def test_spatial_join_distinct_build_emits_all_matches(spark):
    """ADVICE r12: with a genuinely different build set, NO pair may
    be dropped by the self-join's id_l < id_r canonicalization — a
    probe point must find every in-radius build site regardless of id
    order (brute-force cross-set reference)."""
    import random

    from sparkswift.operators.joins import spatial_join

    rng = random.Random(7)
    r = 0.15
    probes = [(i, rng.uniform(-1, 1), rng.uniform(-1, 1)) for i in range(60)]
    # build ids deliberately INTERLEAVE and COLLIDE with probe ids so
    # id-order filtering would visibly drop matches
    sites = [(i // 2, rng.uniform(-1, 1), rng.uniform(-1, 1)) for i in range(80)]
    want = set()
    for i, xi, yi in probes:
        for j, xj, yj in sites:
            if (xi - xj) ** 2 + (yi - yj) ** 2 <= r * r:
                want.add((i, j))
    pdf = spark.createDataFrame(probes, "vec_id long, x double, y double")
    bdf = spark.createDataFrame(sites, "vec_id long, x double, y double")
    got = [
        (r_.id_l, r_.id_r)
        for r_ in spatial_join(pdf, id_col="vec_id", radius=r, build=bdf).collect()
    ]
    # sites list holds duplicate ids (j // 2) — multiplicity preserved
    assert set(got) == want
    assert any(a >= b for a, b in got), "fixture must exercise id_l >= id_r"
