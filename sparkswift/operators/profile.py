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

from pyspark.sql import Column, DataFrame
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


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Snapshot diff between two dataset versions — the audit a corpus
    release publishes next to its data card: which ids were added,
    removed, changed (same id, different content fingerprint), or
    unchanged.

    Spark-first shape: each side reduces to ``(id, md5(content))`` at
    scan time — the full-outer join and the CASE run over 40-byte
    rows, never the payload; one hash shuffle per side. Deterministic
    (md5), so the SQL oracle hash-matches row-for-row.

    Returns ``(id_col, status)`` with status ∈ ``added | removed |
    changed | unchanged``; aggregate downstream for the summary
    counts.
    """
    o = old.select(
        F.col(id_col), F.md5(F.col(content_col).cast("binary")).alias("__old_fp")
    )
    n = new.select(
        F.col(id_col), F.md5(F.col(content_col).cast("binary")).alias("__new_fp")
    )
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("__old_fp").isNull(), F.lit("added"))
        .when(F.col("__new_fp").isNull(), F.lit("removed"))
        .when(F.col("__old_fp") == F.col("__new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col(id_col), status.alias("status"))


def skew_report(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
) -> DataFrame:
    """Join/aggregate-key skew diagnostic — run this BEFORE picking a
    join strategy at scale: per hot key its row count and share, plus
    the skew ratio (hot count / mean count per key). A ratio ≫ 1 on a
    planned shuffle key says "salt this join" (see joins.salted_join)
    or "let AQE skew-split".

    One aggregation by the key, a global-stat single row broadcast
    back, TakeOrdered for the top-N — nothing driver-sized. Exact
    integer counts; ratios are single divisions (SQL-oracle-able).

    Returns top-N rows ``(key, n_rows, share, skew_ratio)`` ordered by
    count desc (key asc tiebreak).
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").cast("bigint").alias("__total"),
        F.count(F.lit(1)).cast("bigint").alias("__nkeys"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "key",
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("__total")).alias("share"),
            (
                F.col("n_rows").cast("double")
                * F.col("__nkeys").cast("double")
                / F.col("__total")
            ).alias("skew_ratio"),
        )
        .orderBy(F.col("n_rows").desc(), F.col("key"))
        .limit(top_n)
    )


def histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 20,
) -> DataFrame:
    """Fixed-bin histogram — the data-card distribution plot's
    backing table. One scan-stage bucket assignment + one small
    aggregate; bin 0 and ``n_bins+1`` catch underflow/overflow
    (``width_bucket`` semantics, spelled as one explicit expression —
    ``floor((v-lo)·n/(hi-lo))+1`` — so any engine evaluating the same
    arithmetic bins identically; DuckDB has no width_bucket). Exact
    integer counts.

    Returns ``(bin, lo_edge, hi_edge, n_rows)`` for OCCUPIED bins.
    """
    v = F.col(value_col)
    b = (
        F.when(v < lo, F.lit(0))
        .when(v >= hi, F.lit(n_bins + 1))
        .otherwise(
            F.floor((v - F.lit(lo)) * F.lit(float(n_bins)) / F.lit(hi - lo)) + 1
        )
    )
    w = (hi - lo) / n_bins
    return (
        df.select(b.cast("int").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .select(
            "bin",
            (F.lit(lo) + (F.col("bin") - 1) * F.lit(w)).alias("lo_edge"),
            (F.lit(lo) + F.col("bin") * F.lit(w)).alias("hi_edge"),
            "n_rows",
        )
    )


def heavy_hitters(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """Mergeable Misra-Gries heavy hitters (Misra & Gries 1982;
    mergeability per Agarwal et al. 2012, "Mergeable Summaries" —
    both public): the top-frequency items of a column with BOUNDED
    state — ≤ k counters per partition, ≤ P·k rows shuffled — instead
    of a full distinct-key groupBy. The 100 TB use: hot-token /
    hot-domain / hot-key discovery where the distinct-key cardinality
    itself is the problem.

    Guarantees (hold under ANY partition layout): every item with
    true frequency > n/(k+1) appears in the output; estimates never
    exceed the true count and undercount by at most n/(k+1). The
    exact ESTIMATE values depend on partition layout (decrement
    timing) — consume the output as a candidate set + lower bounds,
    or verify candidates with one exact semi-join pass (the gate
    pattern, suite agg16).

    Shape: one mapInPandas pass emitting ≤ k (item, weight) rows per
    partition (batched MG: merge batch value_counts, then subtract
    the (k+1)-th largest and drop ≤ 0 — same error budget as per-row
    decrements), one ≤ P·k-row shuffle to sum partials, and the
    standard merge prune (subtract the (k+1)-th largest total). The
    single-partition window runs over ≤ P·k rows — summary-sized,
    never data-sized.

    Returns ``(item, est)`` with ≤ k rows, est descending.
    """
    from pyspark.sql import Window

    import pandas as pd

    item_type = df.schema[col].dataType.simpleString()

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                thr = sorted(counters.values(), reverse=True)[k]
                counters = {
                    key: c - thr for key, c in counters.items() if c > thr
                }
        yield pd.DataFrame(
            {"item": list(counters.keys()), "cnt": list(counters.values())}
        )

    summ = df.select(F.col(col).alias(col)).mapInPandas(
        summarize, f"item {item_type}, cnt long"
    )
    return _mg_merge_prune(summ.withColumnRenamed("cnt", "est"), k)


def _mg_merge_prune(partials: DataFrame, k: int) -> DataFrame:
    """Merge ``(item, est)`` Misra-Gries partials: sum per-item, then
    the standard merge prune — subtract the (k+1)-th largest total and
    drop non-positives. The single-partition window runs over the
    summed summary (≤ sources·k rows), never the data."""
    from pyspark.sql import Window

    tot = partials.groupBy("item").agg(
        F.sum("est").cast("bigint").alias("cnt")
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("item"))
    ranked = tot.withColumn("__rn", F.row_number().over(w))
    thr = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("__rn") == k + 1, F.col("cnt"))), F.lit(0)
        ).alias("__thr")
    )
    return (
        ranked.filter(F.col("__rn") <= k)
        .crossJoin(F.broadcast(thr))
        .select("item", (F.col("cnt") - F.col("__thr")).alias("est"))
        .filter(F.col("est") > 0)
        .orderBy(F.col("est").desc(), F.col("item"))
    )


def merge_heavy_hitters(summaries: DataFrame, k: int = 64) -> DataFrame:
    """Merge ``heavy_hitters`` outputs from disjoint slices of one
    dataset into a single ≤ k-row summary (mergeability per Agarwal
    et al. 2012, "Mergeable Summaries"): the merged estimates keep the
    global MG contract — every item with total frequency > n/(k+1)
    present, est ≤ true ≤ est + n/(k+1) — no matter how the data was
    chopped. The 100 TB use: per-micro-batch summaries accumulated by
    a streaming ingest loop (suite st17) or per-shard summaries from
    an incremental corpus build, merged without ever re-touching the
    rows that produced them.

    Input: ``(item, est)`` rows — the union of per-slice summaries.
    Returns ``(item, est)`` with ≤ k rows, est descending.
    """
    return _mg_merge_prune(summaries.select("item", "est"), k)


def quantile_summary(df: DataFrame, col: str, k: int = 128) -> DataFrame:
    """Mergeable rank sketch for quantiles with a PROVABLE, summary-
    carried error bound (the equi-spaced-rank compaction underlying
    classic mergeable quantile summaries — Greenwald-Khanna 2001 /
    Agarwal et al. 2012 "Mergeable Summaries", both public): every
    Arrow batch of every partition ("unit") is sorted locally and
    collapsed to at most ``k`` contiguous rank-chunks; each chunk
    emits its MAX value and its exact chunk size as ``weight``. One
    extra bookkeeping field per unit (``err`` on the unit's first
    chunk row, 0 elsewhere) records that unit's max chunk size
    ceil(n_unit/k), so the union of any set of summaries carries its
    own global rank-error certificate E = SUM(err).

    Guarantees (hold under ANY partitioning and ANY chop of the data
    into summaries — exact, not probabilistic): for the weighted CDF
    F(v) = SUM(weight WHERE value <= v) over the union of summaries,

        C(v) - E  <=  F(v)  <=  C(v)        (C = true count of x <= v)

    because chunks never overcount (a chunk counts into F(v) only
    when its max <= v, i.e. every element it represents is <= v) and
    at most ONE chunk per unit straddles any threshold v (chunks are
    contiguous in sorted order), undercounting by less than that
    unit's max chunk size. Consequently the estimator
    v*(phi) = min value with F(v) >= phi*n satisfies

        count(x <= v*) >= phi*n    and    count(x < v*) < phi*n + E

    — the two laws the st19 verdict checks exactly. SUM(weight) == n
    additionally attests every row was summarized exactly once.

    Scale shape: one mapInPandas pass (Arrow-batched, never a global
    sort; per-unit sort is over one Arrow batch, ~10k rows), at most
    units*k 17-byte rows emitted, and downstream work is summary-
    sized forever. The 100 TB use: per-micro-batch or per-shard
    summaries folded into a store (suite st19) whose quantile reads
    never re-touch the rows.

    Returns ``(value double, weight long, err long)`` summary rows.
    """
    import math

    import pandas as pd

    if k < 2:
        raise ValueError("k must be >= 2")

    def summarize(batches):
        import numpy as np

        for pdf in batches:
            # np.sort (copy) — the Series buffer may be a zero-copy
            # Arrow view; an in-place sort would mutate or raise
            vals = np.sort(pdf[col].dropna().to_numpy())
            n_u = len(vals)
            if n_u == 0:
                continue
            q = math.ceil(n_u / k)
            maxes = [float(vals[min((j + 1) * q, n_u) - 1]) for j in range(math.ceil(n_u / q))]
            weights = [min((j + 1) * q, n_u) - j * q for j in range(len(maxes))]
            errs = [q] + [0] * (len(maxes) - 1)
            yield pd.DataFrame({"value": maxes, "weight": weights, "err": errs})

    return df.select(F.col(col).cast("double").alias(col)).mapInPandas(
        summarize, "value double, weight long, err long"
    )


def merge_quantile_summaries(
    summaries: DataFrame, probs: list[float]
) -> DataFrame:
    """Estimate quantiles from a union of ``quantile_summary`` rows
    (possibly from many batches/shards — the summary is mergeable by
    plain UNION). For each phi in ``probs`` returns the smallest
    summary value whose cumulative weight reaches phi*n, plus the
    self-carried certificate: ``n_rows`` (= SUM(weight), exactly-once
    row accounting) and ``e_bound`` (= SUM(err), the rank-error bound
    E such that count(x <= v*) >= phi*n and count(x < v*) < phi*n + E
    for every returned estimate — see ``quantile_summary``).

    All work is summary-sized: the single-partition cumulative window
    runs over at most units*k rows, never the data (the
    ``_mg_merge_prune`` pattern).

    Returns one row per phi: ``(phi double, est double,
    n_rows long, e_bound long)``, phi ascending.
    """
    from pyspark.sql import Window

    if not probs or not all(0.0 < p <= 1.0 for p in probs):
        raise ValueError("probs must be within (0, 1]")
    tot = summaries.agg(
        F.sum("weight").cast("bigint").alias("n_rows"),
        F.sum("err").cast("bigint").alias("e_bound"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        summaries.groupBy("value")
        .agg(F.sum("weight").alias("__w"))
        .withColumn("__cum", F.sum("__w").over(w))
        .crossJoin(F.broadcast(tot))
    )
    per_phi = [
        F.min(
            F.when(
                F.col("__cum") >= F.lit(p) * F.col("n_rows"), F.col("value")
            )
        ).alias(f"__q{i}")
        for i, p in enumerate(probs)
    ]
    one = cum.groupBy("n_rows", "e_bound").agg(*per_phi)
    # per_phi aliases were built in input order — emit ascending phi
    order = sorted(range(len(probs)), key=lambda i: probs[i])
    rows = F.array(
        *[
            F.struct(
                F.lit(float(probs[i])).alias("phi"),
                F.col(f"__q{i}").alias("est"),
            )
            for i in order
        ]
    )
    return (
        one.select(F.explode(rows).alias("r"), "n_rows", "e_bound")
        .select("r.phi", "r.est", "n_rows", "e_bound")
    )


def drift_report(
    df_a: DataFrame,
    df_b: DataFrame,
    dims: list[str],
    eps: float = 1e-6,
) -> DataFrame:
    """Distribution-drift report between two corpus snapshots — the
    release-gate check a continuously-crawled corpus runs before a
    training cut (the Population Stability Index of credit-scoring
    practice, applied per categorical dimension; PSI > 0.25 is the
    conventional "significant shift" flag). For every bucket of every
    dimension: both snapshots' counts and shares, and the bucket's
    PSI term (share_a - share_b)·ln(share_a/share_b) with shares
    clamped to ``eps`` so one-sided buckets stay finite. SUM(psi)
    per dimension is the headline drift number.

    Determinism: shares are single exact-integer divisions; the PSI
    term is one per-row IEEE expression quantized to INTEGER
    nano-units (the t15 micro-nat pattern), so the report is
    SQL-oracle-exact.

    Scale shape: one scan per snapshot (each row explodes to
    ``len(dims)`` 2-field structs — counts only, text never moves),
    ONE hash aggregation on (dim, bucket), and window totals over the
    bucket-sized result. No joins, no UDFs; a 100 TB snapshot pair
    costs two scans and one dimension-cardinality shuffle.

    Returns ``(dim, bucket, cnt_a, cnt_b, share_a, share_b,
    psi_nano)`` — psi_nano is the PSI term in 1e-9 units (BIGINT).
    """
    if not dims:
        raise ValueError("dims must be non-empty")
    return drift_from_counts(drift_counts(df_a, df_b, dims), eps)


def drift_counts(
    df_a: DataFrame, df_b: DataFrame, dims: list[str]
) -> DataFrame:
    """The integer-mergeable half of :func:`drift_report`: per
    (dim, bucket) counts for both snapshots. Counts are plain integer
    sums — associative and order-free — so per-batch count frames can
    be accumulated by a streaming ingest loop and merged with one
    groupBy-sum (suite st20), after which :func:`drift_from_counts`
    yields the BIT-identical report the batch path computes.

    Returns ``(dim, bucket, cnt_a, cnt_b)``.
    """
    if not dims:
        raise ValueError("dims must be non-empty")

    def explode_side(df: DataFrame, side: int) -> DataFrame:
        entries = F.array(
            *[
                F.struct(
                    F.lit(d).alias("dim"),
                    F.coalesce(F.col(d).cast("string"), F.lit("__null__")).alias(
                        "bucket"
                    ),
                )
                for d in dims
            ]
        )
        return df.select(F.explode(entries).alias("e")).select(
            "e.dim", "e.bucket", F.lit(side).alias("__side")
        )

    return (
        explode_side(df_a, 0)
        .unionByName(explode_side(df_b, 1))
        .groupBy("dim", "bucket")
        .agg(
            F.sum(F.when(F.col("__side") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("cnt_a"),
            F.sum(F.when(F.col("__side") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("cnt_b"),
        )
    )


def drift_from_counts(counts: DataFrame, eps: float = 1e-6) -> DataFrame:
    """Shares + PSI terms from a ``(dim, bucket, cnt_a, cnt_b)`` count
    frame (see :func:`drift_report` for the semantics and determinism
    contract). Window totals over the bucket-sized frame — no joins.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("dim")
    shared = counts.select(
        "dim",
        "bucket",
        "cnt_a",
        "cnt_b",
        (
            F.col("cnt_a").cast("double") / F.sum("cnt_a").over(w).cast("double")
        ).alias("share_a"),
        (
            F.col("cnt_b").cast("double") / F.sum("cnt_b").over(w).cast("double")
        ).alias("share_b"),
    )
    sa = F.greatest(F.col("share_a"), F.lit(eps))
    sb = F.greatest(F.col("share_b"), F.lit(eps))
    return shared.withColumn(
        "psi_nano",
        F.round((sa - sb) * F.log(sa / sb) * 1_000_000_000).cast("bigint"),
    )


def merge_drift_counts(counts: DataFrame) -> DataFrame:
    """Merge per-slice :func:`drift_counts` frames (integer sums —
    exact under any chop): one groupBy-sum over summary-sized rows."""
    return counts.groupBy("dim", "bucket").agg(
        F.sum("cnt_a").cast("bigint").alias("cnt_a"),
        F.sum("cnt_b").cast("bigint").alias("cnt_b"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005, public): point-
# frequency estimates from a bounded depth×width integer matrix.
# Cells are PURE INTEGER SUMS, so per-batch sketches merge BIT-EXACTLY
# by cell addition (the st18/st20 summary class — contrast MG/quantile
# envelopes and HLL's estimator asymmetry). Hashing is md5-based and
# identical in Spark and DuckDB, so the ENTIRE sketch — not just its
# laws — is SQL-re-derivable: the oracle rebuilds every cell.
# ---------------------------------------------------------------------------
def _cm_bucket(key_col: str | Column, r: int, width: int, seed: int) -> Column:
    """Row-r bucket of a key: first 8 md5 hex chars of
    'seed:r:key' as an integer, mod width — every piece (concat_ws,
    md5, hex→int, mod) evaluates identically in Spark and DuckDB.
    Built on the fleet-shared md5-bucket idiom (sampling.
    hash_bucket_hex) so the DuckDB-oracle transcription has ONE
    source: the composite seed 'seed:r' concat-chains to the same
    string as concat_ws(':', seed, r, key)."""
    from sparkswift.operators.sampling import hash_bucket_hex

    h = F.conv(hash_bucket_hex(key_col, f"{seed}:{r}"), 16, 10).cast("bigint")
    return F.pmod(h, F.lit(width))


def countmin_sketch(
    df: DataFrame,
    key_col: str,
    width: int = 256,
    depth: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Build the CM sketch of a key column as SPARSE cells
    ``(row, bucket, c)`` — at most depth×width rows regardless of
    input size. One explode (depth structs per input row, scan-stage)
    and one hash aggregation with map-side partial agg; nothing else
    moves. Estimates are one-sided: est ≥ true always, and
    est ≤ true + εN with ε = e/width at standard depth.
    """
    if width <= 0 or depth <= 0:
        raise ValueError("countmin_sketch: width and depth must be positive")
    rb = F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("row"),
                _cm_bucket(key_col, r, width, seed).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(rb).alias("rb"))
        .select("rb.row", "rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def countmin_merge(sketches: DataFrame) -> DataFrame:
    """Merge per-batch CM sketches: cell-wise integer sum — BIT-EXACT
    equal to the sketch of the concatenated input (addition commutes),
    under ANY batching. One groupBy over summary-sized rows."""
    return sketches.groupBy("row", "bucket").agg(
        F.sum("c").cast("bigint").alias("c")
    )


def countmin_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 256,
    depth: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Point-frequency estimates for a key frame: min over the sketch
    rows of each key's cell (an absent cell reads 0). Two bounded
    joins — the sketch side is ≤ depth×width rows, broadcast by AQE."""
    kb = keys.select(
        F.col(key_col),
        *[
            _cm_bucket(key_col, r, width, seed).alias(f"__b{r}")
            for r in range(depth)
        ],
    )
    est = kb
    for r in range(depth):
        cells_r = sketch.filter(F.col("row") == r).select(
            F.col("bucket").alias(f"__b{r}"), F.col("c").alias(f"__c{r}")
        )
        est = est.join(F.broadcast(cells_r), f"__b{r}", "left")
    min_c = F.least(
        *[F.coalesce(F.col(f"__c{r}"), F.lit(0)) for r in range(depth)]
    )
    return est.select(F.col(key_col), min_c.cast("bigint").alias("est"))


# Derived-moment formulas shared VERBATIM between the Spark query
# (F.expr) and the DuckDB oracle (interpolated into the SQL string):
# identical expression trees over identical exact-integer inputs
# (n, s1..s4 are bigint power sums) evaluate bit-identically, because
# every operation used is IEEE-754 correctly rounded (+ - * / sqrt —
# note NO pow(), whose libm implementations differ between engines;
# x^1.5 is spelled sqrt(x)*sqrt(x)*sqrt(x)). Guarded by m2 > 0 so a
# constant group yields NULL skew/kurtosis on both engines instead of
# a division-by-zero ±inf/NaN surface.
_MU = "(CAST(s1 AS DOUBLE) / n)"
_M2 = f"(CAST(s2 AS DOUBLE) / n - {_MU} * {_MU})"
_M3 = f"(CAST(s3 AS DOUBLE) / n - 3 * {_MU} * (CAST(s2 AS DOUBLE) / n) + 2 * {_MU} * {_MU} * {_MU})"
_M4 = (
    f"(CAST(s4 AS DOUBLE) / n - 4 * {_MU} * (CAST(s3 AS DOUBLE) / n)"
    f" + 6 * {_MU} * {_MU} * (CAST(s2 AS DOUBLE) / n)"
    f" - 3 * {_MU} * {_MU} * {_MU} * {_MU})"
)
MOMENT_EXPRS: dict[str, str] = {
    "mean": _MU,
    "var_pop": _M2,
    "skewness": (
        f"CASE WHEN {_M2} > 0 THEN "
        f"{_M3} / (SQRT({_M2}) * SQRT({_M2}) * SQRT({_M2})) END"
    ),
    "kurtosis_excess": (
        f"CASE WHEN {_M2} > 0 THEN {_M4} / ({_M2} * {_M2}) - 3 END"
    ),
}


def group_moments(
    df: DataFrame,
    value_col: str,
    key_col: str,
    quantize: Column | None = None,
) -> DataFrame:
    """EXACT per-group distribution moments (mean, population variance,
    skewness, excess kurtosis) — the profiling depth beyond
    :func:`profile_table`'s counts (drift triage: a mean can hold
    while the tails move). Strategy: quantize the value ONCE to an
    exact integer (default ``floor(value)``; exact on doubles), then
    accumulate the four RAW power sums ``s1..s4`` as bigint aggregates
    — order-independent exact integers, so map-side partial
    aggregation is safe and the cross-engine hash is exact — and
    derive the central moments with the shared :data:`MOMENT_EXPRS`
    formulas (bit-deterministic; see the comment above).

    Overflow budget: |v| ≤ V allows n·V⁴ ≤ 2⁶³ — e.g. V = 10³ holds
    to ~9 trillion rows per group; larger V should pre-scale (the
    caller owns ``quantize``) or split s4 into a DECIMAL(38) sum.

    Plan: ONE hash aggregate (no window, no sort). Returns ``(key, n,
    s1..s4, mean, var_pop, skewness, kurtosis_excess)``.
    """
    v = (
        quantize
        if quantize is not None
        else F.floor(F.col(value_col)).cast("bigint")
    )
    sums = df.select(F.col(key_col), v.alias("__v")).groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__v").cast("bigint").alias("s1"),
        F.sum(F.expr("__v * __v")).cast("bigint").alias("s2"),
        F.sum(F.expr("__v * __v * __v")).cast("bigint").alias("s3"),
        F.sum(F.expr("__v * __v * __v * __v")).cast("bigint").alias("s4"),
    )
    return sums.select(
        key_col,
        "n",
        "s1",
        "s2",
        "s3",
        "s4",
        *[F.expr(sql).alias(name) for name, sql in MOMENT_EXPRS.items()],
    )
