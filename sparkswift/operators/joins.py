"""Join extensions beyond Spark's built-ins: as-of join (the classic
time-series "latest right row at or before left's timestamp").

Spark has no native ASOF JOIN; the scalable formulation is the
union + last-non-null window trick:

  1. tag left/right rows, union them on (key, ts) with right's
     payload columns nulled on left rows and vice versa;
  2. one hash shuffle on the key, sort by (ts, tag) inside each
     partition (right sorts before left on ties → ties match, the
     ``>=`` convention DuckDB's ASOF JOIN uses);
  3. ``last(col, ignorenulls=True)`` over an unbounded-preceding
     frame carries the most recent right payload forward;
  4. keep the left rows.

Cost: ONE shuffle + per-partition sort — same as a sort-merge join,
no range explosion, no per-row probing. This survives 100 TB as long
as single keys fit a task (salt hot keys if not).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance: str | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """pandas ``merge_asof`` semantics, one shuffle, no join operator:
    for each left row, the columns of the matched right row on the
    same key — latest ``right_ts <= left_ts`` (``backward``, default),
    earliest ``right_ts >= left_ts`` (``forward``), or whichever is
    closer (``nearest``, ties to backward — pandas' rule). Right must
    be unique per (key, right_ts) for a deterministic result —
    pre-aggregate if not.

    ``tolerance`` (e.g. '7 days'): matches farther than the tolerance
    are nulled. ``allow_exact_matches=False`` makes the comparison
    strict (< / >) — both mirroring the pandas kwargs.

    Mechanics: union both sides tagged by source, one hash shuffle on
    the key, then running ``last(ignorenulls)`` fills over a
    timestamp-ordered window carry each left row its match — backward
    fills over the ascending order, forward over the descending one.
    ``nearest`` evaluates both windows over the SAME exchange (two
    sorts, one shuffle) and picks per-row by distance. Tie order of
    left vs right rows at equal timestamps implements
    allow_exact_matches without any extra pass.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    keys = [key] if isinstance(key, str) else list(key)
    lcols = left.columns

    l_tagged = left.select(
        *lcols,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__src"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_cols],
        F.lit(None).cast("timestamp").alias("__rt"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c) if c not in keys else F.col(c) for c in lcols],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__src"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(right_ts).cast("timestamp").alias("__rt"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # at equal __t: right rows (src 0) BEFORE left rows in the fill
    # order when exact matches count, AFTER them when they don't
    src_tie = F.col("__src").asc() if allow_exact_matches else F.col("__src").desc()
    w_back = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), src_tie)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").desc(), src_tie)
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    def fills(w, tag: str):
        return [
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__{tag}_{c}")
            for c in right_cols
        ] + [F.last("__rt", ignorenulls=True).over(w).alias(f"__{tag}t")]

    use_back = direction in ("backward", "nearest")
    use_fwd = direction in ("forward", "nearest")
    filled = unioned.select(
        *lcols,
        "__src",
        "__t",
        *(fills(w_back, "b") if use_back else []),
        *(fills(w_fwd, "f") if use_fwd else []),
    ).filter(F.col("__src") == 1)

    def in_tol(ts_col: str) -> Column:
        if tolerance is None:
            return F.col(ts_col).isNotNull()
        delta = F.expr(f"INTERVAL {tolerance}")
        # isNotNull() first: a missing match (NULL ts) must read as
        # FALSE, not SQL NULL — otherwise `nearest`'s pick_b becomes
        # NULL when one direction has no match and BOTH when-branches
        # are skipped, nulling an in-tolerance one-sided match.
        # FALSE AND NULL = FALSE makes the conjunction null-safe.
        return (
            F.col(ts_col).isNotNull()
            & (F.col(ts_col) >= F.col("__t") - delta)
            & (F.col(ts_col) <= F.col("__t") + delta)
        )

    if direction == "backward":
        proj = [F.when(in_tol("__bt"), F.col(f"__b_{c}")).alias(c) for c in right_cols]
    elif direction == "forward":
        proj = [F.when(in_tol("__ft"), F.col(f"__f_{c}")).alias(c) for c in right_cols]
    else:
        b_ok, f_ok = in_tol("__bt"), in_tol("__ft")
        b_dist = F.unix_micros(F.col("__t").cast("timestamp")) - F.unix_micros(
            F.col("__bt")
        )
        f_dist = F.unix_micros(F.col("__ft")) - F.unix_micros(
            F.col("__t").cast("timestamp")
        )
        # backward wins ties (pandas rule); a direction missing or out
        # of tolerance cedes to the other
        pick_b = b_ok & (~f_ok | (b_dist <= f_dist))
        proj = [
            F.when(pick_b, F.col(f"__b_{c}"))
            .when(f_ok, F.col(f"__f_{c}"))
            .alias(c)
            for c in right_cols
        ]
    return filled.select(*lcols, *proj)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Skew-salted equi-join: the manual remedy for a hot key that a
    single task can't hold (the case AQE's skew-join splitting can't
    fix when the right side must also shuffle).

    The large/skewed ``left`` gets a deterministic salt derived by
    hashing its whole row (xxhash64 — stable across runs/executors,
    no RNG state); the smaller ``right`` is exploded ``salt`` ways so
    every (key, salt) bucket can still match. The hot key's rows then
    spread over ``salt`` tasks instead of one. Shuffle volume cost:
    right side × salt — keep ``right`` the smaller input.

    ``how`` is restricted to left-preserving joins: with the right side
    exploded ``salt`` ways, an UNMATCHED right row would survive a
    right/full outer join once per salt bucket (``salt`` phantom
    rows). Swap the inputs (and the join direction) to salt the other
    side.
    """
    allowed = ("inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti")
    if how not in allowed:
        raise ValueError(
            f"salted_join supports left-preserving joins {allowed}; "
            f"got how={how!r} — unmatched right rows would be duplicated "
            f"{salt}×. Swap the inputs to salt the other side."
        )
    l_salted = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    )
    r_salted = right.withColumn(
        "__salt",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.lit(salt - 1).cast("bigint"))
        ),
    )
    out = l_salted.join(r_salted, [key, "__salt"], how)
    return out.drop("__salt")


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Point-in-interval join for TWO LARGE sides — the shape where
    Spark's only native plan is BroadcastNestedLoop (small side) or a
    cartesian filter (both large): bucketize the value domain instead.

    Each interval explodes to the buckets it overlaps
    (floor(lo/w)..floor(hi/w)); each point lands in exactly ONE bucket
    (floor(p/w)); the join becomes a plain hash equi-join on the
    bucket id plus the exact BETWEEN filter. Because a point has one
    bucket, every qualifying (point, interval) pair matches in exactly
    one bucket — no dedup pass. Shuffle volume: points × 1 +
    intervals × ceil(span/w); pick ``bucket_width`` AT OR BELOW the
    typical interval width: per-point candidates scale with
    ``(bucket_width + interval_width)``, so an oversized bucket
    multiplies candidate pairs while an undersized one only grows the
    (cheap, linear) interval explode — measured on j8: width/5 of the
    typical interval beat width×4 by 3.7×. Skewed hot
    buckets fall to AQE skew-join handling like any equi-join.

    Returns the matched pairs: all columns of ``points`` then all of
    ``intervals`` (callers project/aggregate as needed).
    """
    w = float(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")
    p_b = points.withColumn("__bkt", F.floor(F.col(point_col) / F.lit(w)))
    i_b = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(w)),
                F.floor(F.col(hi_col) / F.lit(w)),
            )
        ),
    )
    return (
        p_b.join(i_b, "__bkt")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("__bkt")
    )


def range_join_intervals(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Interval-OVERLAP join for TWO LARGE interval sets (overlap iff
    ``l.lo <= r.hi AND r.lo <= l.hi``) — the two-sided sibling of
    :func:`range_join_buckets`, same reason: Spark's only native plan
    for an inequality-only join is a nested loop.

    Both sides explode to the value-domain buckets they span. Unlike
    the point case, an overlapping pair can now share SEVERAL buckets;
    instead of a dedup pass, each pair is counted only in its
    CANONICAL bucket — ``floor(max(l.lo, r.lo) / w)``, the first
    bucket where both intervals are live. That bucket always is a
    shared bucket (max(lo) <= min(hi) for overlapping pairs), so the
    equi-join on the bucket id + the overlap predicate + the canonical
    filter yields every qualifying pair EXACTLY once with zero
    post-join deduplication — dedup would be another shuffle of the
    full result.

    Cost: each side shuffles ceil(span/w) copies; pick ``bucket_width``
    near the typical interval length so the explode factor stays O(1).
    Skewed hot buckets are ordinary equi-join skew (AQE handles, or
    pre-split long intervals). Returns all columns of ``left`` then
    ``right``.
    """
    w = float(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")
    l_b = left.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(left_lo) / F.lit(w)),
                F.floor(F.col(left_hi) / F.lit(w)),
            )
        ),
    )
    r_b = right.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / F.lit(w)),
                F.floor(F.col(right_hi) / F.lit(w)),
            )
        ),
    )
    return (
        l_b.join(r_b, "__bkt")
        .filter(
            (F.col(left_lo) <= F.col(right_hi))
            & (F.col(right_lo) <= F.col(left_hi))
        )
        .filter(
            F.col("__bkt")
            == F.floor(F.greatest(F.col(left_lo), F.col(right_lo)) / F.lit(w))
        )
        .drop("__bkt")
    )


def spatial_join(
    points: DataFrame,
    id_col: str = "vec_id",
    x_col: str = "x",
    y_col: str = "y",
    radius: float = 0.02,
    build: DataFrame | None = None,
) -> DataFrame:
    """2-D fixed-radius SPATIAL self-join (all point pairs within
    ``radius`` — geo near-neighbors, collision/dedup sweeps, cluster
    seeding) via the standard GRID reduction: hash every point into a
    radius-sized cell, probe each point against the 3×3 neighborhood
    of its home cell, and verify the true distance. Any qualifying
    pair's cells differ by ≤ 1 in each axis (|Δx| ≤ r ⇒
    |floor(x₁/r) − floor(x₂/r)| ≤ 1), so the neighborhood probe is
    EXHAUSTIVE — exact results, never all-pairs. Each unordered pair
    is emitted exactly once: the probe side explodes its 9 neighbor
    keys, the build side sits in its unique home cell, and
    ``id_l < id_r`` keeps one direction.

    Scale shape: ONE equi-join on the cell key (explode ×9 on the
    probe side only — 24-byte rows), candidate volume bounded by
    local density × 9 cells, never n². Skew = a dense cell; salt the
    cell key or shrink ``radius`` (cells scale with it). Distances
    compare as exact doubles (float coords widen losslessly; the
    squared form avoids sqrt entirely).

    ``build`` (default: ``points`` itself — the self-join) supplies a
    separate build side; the probe side may then be a STREAM (the
    grid keys and distance verify are stateless exprs, so the same
    plan runs as a stream-static join — certified in st33).

    Pair-direction semantics (ADVICE r12): the ``id_l < id_r``
    dedup applies ONLY to the self-join — with a distinct ``build``
    set ("which known sites is this new point near?") every
    (probe, build) match is a distinct pair, so ALL matches are
    emitted, including same-id ones if the id spaces overlap. A
    caller passing ``build=points`` (same rows via a second scan)
    gets each unordered pair twice plus self-matches — use
    ``build=None`` for the self-join semantics.

    Returns ``(id_l, id_r, dist_sq)``.
    """
    if radius <= 0:
        raise ValueError("radius must be positive")
    r = float(radius)

    def prep(df):
        return df.select(
            F.col(id_col).alias("__id"),
            F.col(x_col).cast("double").alias("__x"),
            F.col(y_col).cast("double").alias("__y"),
            F.floor(F.col(x_col).cast("double") / r)
            .cast("bigint")
            .alias("__cx"),
            F.floor(F.col(y_col).cast("double") / r)
            .cast("bigint")
            .alias("__cy"),
        )

    pts = prep(points)
    bld = pts if build is None else prep(build)
    probe = (
        pts.withColumn("__dx", F.expr("explode(array(-1, 0, 1))"))
        .withColumn("__dy", F.expr("explode(array(-1, 0, 1))"))
        .select(
            F.col("__id").alias("id_l"),
            F.col("__x").alias("xl"),
            F.col("__y").alias("yl"),
            (F.col("__cx") + F.col("__dx")).alias("cx"),
            (F.col("__cy") + F.col("__dy")).alias("cy"),
        )
    )
    bside = bld.select(
        F.col("__id").alias("id_r"),
        F.col("__x").alias("xr"),
        F.col("__y").alias("yr"),
        F.col("__cx").alias("cx"),
        F.col("__cy").alias("cy"),
    )
    dist = "(xl - xr) * (xl - xr) + (yl - yr) * (yl - yr)"
    thresh = f"CAST({r} AS DOUBLE) * CAST({r} AS DOUBLE)"
    joined = probe.join(bside, ["cx", "cy"])
    if build is None:
        # self-join: keep one direction of each unordered pair
        joined = joined.filter(F.col("id_l") < F.col("id_r"))
    return joined.filter(F.expr(f"{dist} <= {thresh}")).select(
        "id_l", "id_r", F.expr(dist).alias("dist_sq")
    )
