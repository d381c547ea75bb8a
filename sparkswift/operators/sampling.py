"""Deterministic sampling & splitting for training-data pipelines.

Random samplers (``df.sample``, ``sampleBy``) are non-reproducible
across runs/cluster layouts — useless for a 100 TB corpus where the
sample IS the dataset card. These operators derive keep/split
decisions from a cryptographic hash of a stable id: the same row
lands in the same split on every run, every engine, any partitioning,
and adding data never reshuffles existing assignments (the property
random splits lack).

Mechanics: ``md5(seed ':' id)`` → first 8 hex nibbles compared
against a hex threshold. Hex-string comparison on fixed-width
lowercase hex ≡ numeric comparison in [0, 16⁸), granularity ~6e-10.
Pure whole-stage-codegen expressions: no shuffle, no UDF; the filter
runs in the scan stage (fused by codegen, though an md5-derived
predicate can't become a parquet PushedFilter).

Cross-engine note: ``md5`` yields identical lowercase hex in Spark
and DuckDB, so every operator here is exactly SQL-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NIBBLES = 8


def hex_threshold(p: float, nibbles: int = _NIBBLES) -> str:
    """Fixed-width lowercase hex literal t such that a uniform hex
    string h of the same width satisfies h < t with probability p."""
    if not 0.0 <= p <= 1.0:
        raise ValueError("p must be in [0, 1]")
    space = 16**nibbles
    return format(min(int(p * space), space - 1), f"0{nibbles}x")


def hash_bucket_hex(id_col: str | Column, seed: int = 0) -> Column:
    """First 8 hex nibbles of md5(seed ':' id) — the uniform bucket."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(
        F.md5(F.concat_ws(":", F.lit(str(seed)), c.cast("string"))), 1, _NIBBLES
    )


def deterministic_sample(
    df: DataFrame, id_col: str, rate: float, seed: int = 0
) -> DataFrame:
    """Keep a ``rate`` fraction of rows, decided per-id by hash: stable
    under reruns, repartitioning, and data growth."""
    return df.filter(hash_bucket_hex(id_col, seed) < F.lit(hex_threshold(rate)))


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    seed: int = 0,
    output_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test by default)
    by hash-bucket ranges proportional to ``weights``. Deterministic
    and disjoint-exhaustive; a row's split never changes when the
    corpus grows."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    names = list(weights)
    bucket = hash_bucket_hex(id_col, seed)
    expr: Column | None = None
    acc = 0.0
    cases = []
    for name in names[:-1]:
        acc += weights[name] / total
        cases.append((hex_threshold(acc), name))
    expr = F.lit(names[-1])
    for thr, name in reversed(cases):
        expr = F.when(bucket < F.lit(thr), F.lit(name)).otherwise(expr)
    return df.withColumn(output_col, expr)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """``sampleBy`` analog with deterministic hash decisions: keep a
    per-stratum fraction of rows (e.g. downsample web text, keep all
    code). Same reproducibility guarantees as
    :func:`deterministic_sample`; one codegen CASE, no shuffle."""
    bucket = hash_bucket_hex(id_col, seed)
    thr = F.lit(hex_threshold(default_rate))
    for value, rate in rates.items():
        thr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(hex_threshold(rate))
        ).otherwise(thr)
    return df.filter(bucket < thr)


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    seed: int = 0,
    output_col: str = "shuffle_pos",
    bucket_nibbles: int = 2,
) -> DataFrame:
    """Globally-shuffled, reproducible training order: every row gets
    a 0-based position in the order of ``md5(seed ':' id)`` (ties by
    id — total order, so positions are unique and identical on every
    run and any partitioning). This is the "shuffle the corpus once,
    stream it in order" step before sequence packing / sharded
    training.

    Scale shape — NO global sort, NO single-task window: the hash's
    first ``bucket_nibbles`` hex chars define 16^nibbles ordered
    buckets (256 by default). One tiny aggregation collects per-bucket
    counts to the driver (256 longs), cumulative offsets broadcast
    back as a CASE expression, and positions are per-bucket
    ``row_number() + offset`` — a hash-partitioned window, fully
    parallel. Writing ``sortWithinPartitions(output_col)`` after
    ``repartitionByRange`` on it yields globally-ordered shards.
    """
    full = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    work = df.withColumn("__h", full).withColumn(
        "__b", F.substring(F.col("__h"), 1, bucket_nibbles)
    )
    counts = {
        r["__b"]: r["n"]
        for r in work.groupBy("__b").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    acc = 0
    rows = []
    for b in sorted(counts):
        rows.append((b, acc))
        acc += counts[b]
    offsets = df.sparkSession.createDataFrame(rows, "__b string, __off bigint")
    from pyspark.sql import Window

    w = Window.partitionBy("__b").orderBy("__h", id_col)
    return (
        work.join(F.broadcast(offsets), "__b")
        .withColumn(
            output_col,
            (F.row_number().over(w).cast("bigint") - 1) + F.col("__off"),
        )
        .drop("__h", "__b", "__off")
    )


def split_sql_case(
    id_sql: str, weights: dict[str, float] | None = None, seed: int = 0
) -> str:
    """The ANSI-SQL CASE expression computing the same split — shared
    by the DuckDB oracles so thresholds cannot drift between engines."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    names = list(weights)
    bucket = f"substr(md5(concat_ws(':', '{seed}', CAST({id_sql} AS VARCHAR))), 1, {_NIBBLES})"
    acc = 0.0
    parts = []
    for name in names[:-1]:
        acc += weights[name] / total
        parts.append(f"WHEN {bucket} < '{hex_threshold(acc)}' THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{names[-1]}' END"
