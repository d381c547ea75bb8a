"""Parquet loaders for the TESTDATA star schema.

The reference has zero I/O code of its own (SURVEY.md §2.2 — notebooks
call ``pd.read_csv`` outside the library); here scans are first-class:
``spark.read.parquet`` gives Catalyst predicate pushdown + column
pruning for free, which is what makes a 100 TB scan viable (only the
columns/row-groups a query touches are read).

Scale note: at 100 TB each "table" is a directory of many parquet
files, ideally partitioned by a high-level key (e.g. date). These
loaders accept either a single file or a directory, so the same code
path works unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# The events fixture stores TIMESTAMP(NANOS); with
# spark.sql.legacy.parquet.nanosAsLong=true it scans as a long,
# converted here to a proper TimestampType column (micro precision —
# same visible values as DuckDB's TIMESTAMP view of it).
_NANOS_TS_COLS = {"events": ("ts",)}


def ensure_nanos_readable(spark: SparkSession) -> None:
    """Make TIMESTAMP(NANOS) parquet readable on ANY session.

    nanosAsLong is a runtime SQL conf, so setting it here (rather than
    only at builder time in session.py) means callers that hand us a
    virgin SparkSession — like the correctness driver — can still scan
    the events fixture. Without it the scan throws PARQUET_TYPE_ILLEGAL.
    Also pins the session timezone to UTC so NTZ→LTZ normalization (see
    normalize_timestamps) preserves wall-clock values exactly as the
    DuckDB oracle sees them.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    _pin_utc(spark)


def _pin_utc(spark: SparkSession) -> None:
    """Pin ``spark.sql.session.timeZone`` to UTC — a SESSION-GLOBAL
    side effect (ADVICE r4): timestamp parsing/formatting semantics
    change for any other code sharing the session. Required for
    NTZ→LTZ normalization to be a pure re-tag that hash-matches the
    DuckDB oracle. Warns once when overriding an explicit non-UTC
    session timezone so the mutation is never silent.
    """
    current = spark.conf.get("spark.sql.session.timeZone", None)
    if current not in (None, "UTC", "Etc/UTC", "GMT", "Z"):
        import warnings

        warnings.warn(
            f"sparkswift.load_table: overriding session timezone "
            f"{current!r} with UTC for oracle-exact timestamp "
            f"semantics; set it back after loading if other code in "
            f"this session depends on {current!r}",
            stacklevel=3,
        )
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def normalize_timestamps(df: DataFrame) -> DataFrame:
    """Normalize every TIMESTAMP_NTZ column to plain TIMESTAMP (LTZ).

    Parquet ``timestamp[us]`` without timezone metadata scans as
    TIMESTAMP_NTZ on Spark 4, which (a) ``withWatermark`` rejects and
    (b) micros/epoch functions reject. With the session timezone pinned
    to UTC the cast is a pure re-tag — identical wall-clock values,
    identical oracle hashes — and every downstream operator (windows,
    watermarks, unix_micros arithmetic) works on both fixture vintages
    (ns-long and us-NTZ).
    """
    from pyspark.sql.types import TimestampNTZType

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name in _NANOS_TS_COLS:
        ensure_nanos_readable(spark)
    else:
        _pin_utc(spark)
    df = spark.read.parquet(path)
    for col in _NANOS_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            # integer div — ns longs exceed double's 53-bit mantissa, so
            # float division here would corrupt microseconds
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return normalize_timestamps(df)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view so ``spark.sql`` works too."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def load_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    modality: str = "image",
    mime: str = "application/octet-stream",
) -> DataFrame:
    """Multimodal ingestion source: read raw media files as rows via
    Spark's ``binaryFile`` format — (path, modificationTime, length,
    content) — and shape them into the engine's multimodal contract
    (``payload`` binary + typed ``media_meta`` struct) that
    operators/multimodal.py consumes.

    Scale notes: binaryFile parallelizes over files (one row per file,
    splittable listing); filters on ``path``/``length`` prune at the
    file-listing level before any byte is read. Set
    ``spark.sql.files.maxPartitionBytes`` so a partition of large
    media files still fits executor memory.
    """
    from pyspark.sql import functions as F

    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    raw = r.load(path)
    return raw.select(
        F.col("path"),
        F.col("length").cast("bigint").alias("byte_len"),
        F.col("content").alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("media_meta"),
    )
