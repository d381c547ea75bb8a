"""Sinks — parquet/csv/json/orc writers with the partitioning and
bucketing controls that matter at 100 TB.

The reference has zero sink code (SURVEY.md §2.2 — users call pandas
``to_*`` outside the library); here sinks are first-class because at
scale HOW you lay data down decides every later scan:

* ``partition_by`` → hive-style directory partitioning: later reads
  with a filter on the partition column do partition PRUNING (skip
  whole directories, no file listing cost for them).
* ``bucket_by`` → pre-shuffled, sorted-by-key table: later equi-joins
  and groupBys on the bucket key skip their shuffle entirely
  (bucketed tables require ``saveAsTable`` — Spark keeps bucket
  metadata in the catalog, not the files).
* ``max_records_per_file`` caps file size so a 100 TB write produces
  a healthy file count instead of multi-GB stragglers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


FORMATS = ("parquet", "csv", "json", "orc")


def write_table(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    **options,
) -> None:
    """Path-based sink. CSV defaults to header=true so a csv roundtrip
    preserves column names."""
    if format not in FORMATS:
        raise ValueError(f"format must be one of {FORMATS}")
    if format == "csv":
        options.setdefault("header", "true")
    w = df.write.mode(mode).format(format).options(**options)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    format: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Catalog-based bucketed sink: rows are hash-distributed into
    ``num_buckets`` files per partition by ``bucket_cols`` (and sorted
    within each bucket by ``sort_cols``). A join or aggregate on the
    bucket key then reads shuffle-free — the write pays the shuffle
    once, every downstream query skips it."""
    w = (
        df.write.mode(mode)
        .format(format)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_table(
    spark: SparkSession, path: str, format: str = "parquet", schema=None, **options
) -> DataFrame:
    """Path-based source for any supported format. CSV/JSON take an
    explicit schema when given — schema inference costs a full extra
    pass over the data, unacceptable at scale."""
    if format == "csv":
        options.setdefault("header", "true")
    r = spark.read.format(format).options(**options)
    if schema is not None:
        r = r.schema(schema)
    elif format == "csv":
        options.setdefault("inferSchema", "true")
        r = r.options(inferSchema="true")
    return r.load(path)


def export_shards(
    df: DataFrame,
    path: str,
    pos_col: str = "shuffle_pos",
    n_shards: int = 8,
    token_col: str | None = None,
    format: str = "parquet",
) -> DataFrame:
    """Materialize the final training artifact: a globally-ordered,
    deterministically sharded dataset — the step after
    ``deterministic_shuffle`` (dense positions) and token accounting.

    Shard assignment is PURE INTEGER ARITHMETIC on the dense position
    column (``pos·n div N``), not sampling: identical shards on every
    run and any cluster layout (``repartitionByRange`` samples its
    boundaries, so two runs can split differently — useless when the
    shard layout is part of the dataset card). Rows land in
    ``shard=K/`` directories, sorted by position within each shard;
    the returned (and persisted) manifest records per-shard row
    counts, position ranges, and token totals — what a training job
    reads to plan its data loading.

    Scale: one count aggregate, one hash shuffle on the shard id, one
    per-shard sort. N/n rows per task — pick n_shards so a shard fits
    a task comfortably.

    ``format``: data-file format — ``parquet`` (default) or ``json``
    (newline-delimited JSON, the shard format most training loaders
    ingest directly; same layout, ordering, and manifest either way —
    the manifest itself stays parquet).
    """
    from pyspark.sql import functions as F

    total = df.count()
    if total == 0:
        raise ValueError("export_shards on an empty frame")
    shard = F.expr(f"CAST(({pos_col} * {int(n_shards)}) DIV {total} AS INT)")
    out = (
        df.withColumn("shard", shard)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", pos_col)
    )
    write_table(out, f"{path}/data", format=format, partition_by=["shard"])
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min(pos_col).cast("bigint").alias("min_pos"),
        F.max(pos_col).cast("bigint").alias("max_pos"),
    ]
    if token_col:
        aggs.append(F.sum(token_col).cast("bigint").alias("token_sum"))
    manifest = (
        df.withColumn("shard", shard).groupBy("shard").agg(*aggs)
    )
    write_table(manifest.coalesce(1), f"{path}/manifest")
    return manifest


def compact_bucketed_table(spark: SparkSession, table: str) -> dict:
    """Small-file compaction for BUCKETED catalog tables — the
    maintenance pass the incremental dedup/near-dup stores need:
    every ``mode="append"`` adds up to one file per bucket per task,
    so a store ingesting N crawl batches accumulates O(N·buckets)
    files whose open/footer cost eventually dominates the probe scan.

    Rewrites the table to ONE file per bucket while PRESERVING the
    bucket spec (read from the catalog — callers don't restate it):
    the rewrite runs over a FORCED bucketed scan, so task i reads
    exactly bucket i's files and the bucketed write emits exactly one
    file per task — zero shuffle end to end. The staging table is
    swapped in via two catalog renames — a mid-job failure leaves the
    original table intact. Same reader-quiescence contract
    as INSERT OVERWRITE. Downstream shuffle-free joins are untouched:
    the bucket spec (and therefore the plan) is identical before and
    after.

    Returns a summary dict (files before/after, num_buckets).
    """

    def _table_info() -> tuple[list[str], list[str], int, str]:
        rows = spark.sql(f"DESCRIBE FORMATTED {table}").collect()
        info = {r.col_name.strip(): (r.data_type or "").strip() for r in rows}

        def _cols(key: str) -> list[str]:
            raw = info.get(key, "[]").strip("[]")
            return [c.strip().strip("`") for c in raw.split(",") if c.strip()]

        return (
            _cols("Bucket Columns"),
            _cols("Sort Columns"),
            int(info["Num Buckets"]),
            info["Location"],
        )

    bucket_cols, sort_cols, num_buckets, location = _table_info()
    if not bucket_cols:
        raise ValueError(f"{table} is not a bucketed table")

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()

    def _nfiles(p: str) -> int:
        fs = jvm.org.apache.hadoop.fs.Path(p).getFileSystem(hconf)
        it = fs.listFiles(jvm.org.apache.hadoop.fs.Path(p), True)
        n = 0
        while it.hasNext():
            if not it.next().getPath().getName().startswith(("_", ".")):
                n += 1
        return n

    files_before = _nfiles(location)
    staging, backup = f"{table}__compact__", f"{table}__precompact__"
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    spark.sql(f"DROP TABLE IF EXISTS {backup}")
    # Force the BUCKETED scan for the rewrite: the planner would
    # otherwise remove a user repartition (the bucket spec already
    # satisfies it) and then disable the bucketed scan as unbeneficial,
    # leaving file-based partitioning — many tasks × many bucket files
    # again. With the bucketed scan forced, task i reads exactly
    # bucket i's files and writes exactly one file — the whole
    # compaction is ZERO-shuffle.
    auto_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    saved = spark.conf.get(auto_key, None)
    try:
        spark.conf.set(auto_key, "false")
        write_bucketed(
            spark.table(table), staging, bucket_cols,
            num_buckets=num_buckets, sort_cols=sort_cols or None,
            mode="overwrite",
        )
    finally:
        if saved is None:
            spark.conf.unset(auto_key)
        else:
            spark.conf.set(auto_key, saved)
    spark.sql(f"ALTER TABLE {table} RENAME TO {backup}")
    try:
        spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")
    except Exception:  # put the original back before propagating
        spark.sql(f"ALTER TABLE {backup} RENAME TO {table}")
        raise
    spark.sql(f"DROP TABLE {backup}")
    _, _, _, new_location = _table_info()
    return {
        "files_before": files_before,
        "files_after": _nfiles(new_location),
        "num_buckets": num_buckets,
    }


def compact_dataset(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 256 * 1024 * 1024,
    format: str = "parquet",
    partition_by: list[str] | None = None,
) -> dict:
    """Small-file compaction — the maintenance pass every long-lived
    dataset needs: streaming sinks, incremental appends, and
    per-partition writers leave thousands of KB-sized files whose
    open/footer cost eventually dominates scans. Rewrites the dataset
    with file count = ceil(current_bytes / target_file_bytes).

    Safety: the rewrite goes to ``<path>.__compact__`` first and is
    swapped in only after it succeeds (rename, not delete-then-write),
    so a mid-job failure leaves the original intact. Stats and the
    swap go through the Hadoop FileSystem API (ADVICE r5), so the
    operator works on whatever filesystem the path lives on — local,
    HDFS, S3A — not just the driver's local disk. The rename pair is
    atomic per-rename on HDFS/local but NOT on object stores (S3
    renames are copies), and concurrent readers must be quiesced
    during the swap on any filesystem — same contract as Hive's
    INSERT OVERWRITE. The whole job is one read + one round-robin
    repartition — no data-dependent shuffle key, so it scales
    linearly and never skews.

    Returns a summary dict (files/bytes before and after).
    """
    import math

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()

    def _hpath(p: str):
        return jvm.org.apache.hadoop.fs.Path(p)

    fs = _hpath(path).getFileSystem(hconf)

    def _stats(p: str) -> tuple[int, int]:
        n = b = 0
        it = fs.listFiles(_hpath(p), True)
        while it.hasNext():
            st = it.next()
            if st.getPath().getName().startswith(("_", ".")):
                continue
            n += 1
            b += st.getLen()
        return n, b

    files_before, bytes_before = _stats(path)
    if files_before == 0:
        raise ValueError(f"no data files under {path}")
    n_out = max(1, math.ceil(bytes_before / target_file_bytes))

    tmp = path.rstrip("/") + ".__compact__"
    bak = path.rstrip("/") + ".__precompact__"
    df = spark.read.format(format).load(path)
    w = df.repartition(n_out).write.mode("overwrite").format(format)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(tmp)

    def _rename(src: str, dst: str) -> None:
        if not fs.rename(_hpath(src), _hpath(dst)):
            raise IOError(f"rename {src} -> {dst} failed")

    _rename(path, bak)
    try:
        _rename(tmp, path)
    except Exception:  # put the original back before propagating
        _rename(bak, path)
        raise
    fs.delete(_hpath(bak), True)

    files_after, bytes_after = _stats(path)
    return {
        "files_before": files_before,
        "bytes_before": bytes_before,
        "files_after": files_after,
        "bytes_after": bytes_after,
        "target_file_bytes": target_file_bytes,
    }


# ---------------------------------------------------------------------------
# Megatron-layout binary token shards (.bin/.idx)
# ---------------------------------------------------------------------------
_MMIDX_MAGIC = b"MMIDIDX\x00\x00"
# public dtype codes from NVIDIA/Megatron-LM indexed_dataset
_MMIDX_CODES = {"uint16": 8, "int32": 4}


def _mmidx_bytes(sizes, dtype: str) -> bytes:
    """Serialize the .idx sidecar: the public Megatron-LM mmap index
    layout — magic, version u64, dtype code u8, u64 sequence count,
    u64 document count, int32 sizes[], int64 byte pointers[], int64
    doc_idx[] (here each sequence IS one packed bin, so doc_idx is
    0..n). Little-endian throughout, as numpy writes it."""
    import numpy as np

    sizes = np.asarray(sizes, dtype="<i4")
    itemsize = np.dtype(dtype).itemsize
    pointers = np.zeros(len(sizes), dtype="<i8")
    if len(sizes) > 1:
        pointers[1:] = np.cumsum(sizes[:-1].astype("<i8")) * itemsize
    doc_idx = np.arange(len(sizes) + 1, dtype="<i8")
    import struct as _struct

    head = (
        _MMIDX_MAGIC
        + _struct.pack("<Q", 1)
        + _struct.pack("<B", _MMIDX_CODES[dtype])
        + _struct.pack("<Q", len(sizes))
        + _struct.pack("<Q", len(doc_idx))
    )
    return head + sizes.tobytes() + pointers.tobytes() + doc_idx.tobytes()


def _mmidx_parse(buf: bytes) -> tuple[str, "object"]:
    """Inverse of :func:`_mmidx_bytes` — returns (dtype, sizes array)."""
    import struct as _struct

    import numpy as np

    if buf[:9] != _MMIDX_MAGIC:
        raise ValueError("not an MMIDIDX index file")
    code = buf[17]
    dtype = {v: k for k, v in _MMIDX_CODES.items()}[code]
    n_seq = _struct.unpack("<Q", buf[18:26])[0]
    sizes = np.frombuffer(buf, dtype="<i4", count=n_seq, offset=34)
    return dtype, sizes


def write_token_shards(
    bins: DataFrame,
    path: str,
    n_shards: int = 8,
    mask_col: str | None = None,
) -> DataFrame:
    """Materialize :func:`~sparkswift.operators.packing.pack_token_bins`
    output as MODEL-CONSUMABLE binary shards in the public Megatron-LM
    indexed-dataset layout: ``shard_K.bin`` is the little-endian
    concatenation of the shard's bins' token ids (uint16 when every id
    fits, else int32 — auto-selected corpus-wide so all shards agree),
    ``shard_K.idx`` the MMIDIDX sidecar (one sequence per bin), plus a
    ``boundaries`` parquet sidecar carrying each bin's doc_ids /
    doc_offsets (the T5-style intra-bin boundaries the .idx format
    does not model) and a one-file ``manifest`` parquet.

    Determinism: shard assignment is ``bin_id % n_shards`` and bins are
    written in bin_id order within a shard, so shard BYTES are a pure
    function of the bins frame — rerun-stable, any partitioning.

    Scale: one hash shuffle on the shard id; each shard is assembled
    and written by ONE task via ``applyInPandas`` doing plain file IO
    to the (shared) filesystem — the exact shape of public Megatron
    preprocessing, where per-rank writers emit .bin/.idx pairs. Size
    ``n_shards`` so a shard's ids fit a task (a 2 GiB uint16 shard is
    ~1 G tokens; thousands of shards at 100 TB).

    ``mask_col`` (p31): name of an ``array<int>`` 0/1 column aligned
    1:1 with ``token_ids`` (e.g. ``sft_pack_bins``'s ``loss_mask``);
    when given, each shard also writes ``shard_K.msk`` — the raw
    uint8 concatenation of the shard's masks in the same bin order
    and length as the .bin ids (the loss-mask sidecar an SFT trainer
    mmaps alongside the Megatron pair) — and the manifest gains
    ``mask_sum``. A bin whose mask length differs from its id length
    fails the write loudly.

    Returns the manifest: ``(shard, n_bins, n_docs, n_tokens,
    token_sum, dtype[, mask_sum])`` — ``token_sum`` is the Σ of all
    token ids in the shard (int64), the conservation checksum the p23
    gate re-derives from the written bytes.
    """
    import pandas as pd

    from pyspark.sql import functions as F

    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    os.makedirs(path, exist_ok=True)
    # corpus-wide dtype choice: one tiny aggregate (min too — a
    # negative or >int32 id would silently WRAP in the astype below,
    # corrupting the .bin bytes in a way only a readback diff catches)
    empty = F.array().cast("array<int>")
    id_range = bins.agg(
        F.max(F.array_max(F.coalesce("token_ids", empty))).alias("mx"),
        F.min(F.array_min(F.coalesce("token_ids", empty))).alias("mn"),
    ).collect()[0]
    max_id, min_id = id_range["mx"], id_range["mn"]
    if min_id is not None and int(min_id) < 0:
        raise ValueError(
            f"write_token_shards: negative token id {min_id} cannot be "
            "encoded (uint16/int32 shard dtypes are unsigned/non-negative "
            "by contract)"
        )
    if max_id is not None and int(max_id) > 2**31 - 1:
        raise ValueError(
            f"write_token_shards: token id {max_id} exceeds int32 — no "
            "supported shard dtype can hold it"
        )
    dtype = "uint16" if (max_id is None or max_id < 65536) else "int32"

    tagged = bins.withColumn(
        "shard", F.pmod(F.col("bin_id"), F.lit(n_shards)).cast("int")
    )

    out_schema = (
        "shard int, n_bins bigint, n_docs bigint, n_tokens bigint, "
        "token_sum bigint, dtype string"
    )
    if mask_col is not None:
        out_schema += ", mask_sum bigint"

    def _write(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("bin_id").reset_index(drop=True)
        shard = int(pdf["shard"].iloc[0])
        arrs = [
            np.asarray(ids, dtype=np.int64) for ids in pdf["token_ids"]
        ]
        flat = (
            np.concatenate(arrs) if arrs else np.empty(0, dtype=np.int64)
        )
        sizes = [len(a) for a in arrs]
        np_dtype = "<u2" if dtype == "uint16" else "<i4"
        with open(f"{path}/shard_{shard}.bin", "wb") as f:
            f.write(flat.astype(np_dtype).tobytes())
        with open(f"{path}/shard_{shard}.idx", "wb") as f:
            f.write(_mmidx_bytes(sizes, dtype))
        row = {
            "shard": [shard],
            "n_bins": [len(pdf)],
            "n_docs": [int(pdf["n_docs"].sum())],
            "n_tokens": [int(flat.size)],
            "token_sum": [int(flat.sum())],
            "dtype": [dtype],
        }
        if mask_col is not None:
            marrs = [
                np.asarray(m, dtype=np.int64) for m in pdf[mask_col]
            ]
            for b, (a, m) in enumerate(zip(arrs, marrs)):
                if len(a) != len(m):
                    raise ValueError(
                        f"shard {shard} bin {b}: mask length {len(m)} != "
                        f"token length {len(a)}"
                    )
                if m.size and (m.min() < 0 or m.max() > 1):
                    raise ValueError(
                        f"shard {shard} bin {b}: mask values outside 0/1"
                    )
            mflat = (
                np.concatenate(marrs)
                if marrs
                else np.empty(0, dtype=np.int64)
            )
            with open(f"{path}/shard_{shard}.msk", "wb") as f:
                f.write(mflat.astype(np.uint8).tobytes())
            row["mask_sum"] = [int(mflat.sum())]
        return pd.DataFrame(row)

    manifest = tagged.groupBy("shard").applyInPandas(_write, out_schema)
    manifest = manifest.localCheckpoint()  # run the writes exactly once
    write_table(
        tagged.select("shard", "bin_id", "doc_ids", "doc_offsets"),
        f"{path}/boundaries",
    )
    write_table(manifest.coalesce(1), f"{path}/manifest")
    return manifest


def read_token_shards(
    spark: SparkSession, path: str, masks: bool = False
) -> DataFrame:
    """Read back :func:`write_token_shards` output as one row per
    sequence (bin): ``(shard, seq, n_tokens, token_sum)`` — decoded
    from the BYTES of the .bin/.idx pairs, not the parquet sidecars,
    so comparing against the manifest certifies the binary layout
    end-to-end (the p23 gate's readback law). ``masks=True`` also
    decodes each shard's ``.msk`` loss-mask sidecar (p31) and adds a
    per-sequence ``mask_sum`` column, failing loudly if the sidecar's
    byte length disagrees with the .idx token count. Distributed:
    each shard's files are decoded by the task that reads them via
    ``binaryFile`` + ``mapInPandas``."""
    import pandas as pd

    from pyspark.sql import functions as F

    glob = f"{path}/shard_*" if masks else f"{path}/shard_*.[bi]*"
    files = (
        spark.read.format("binaryFile")
        .load(glob)
        .select(
            F.regexp_extract(F.col("path"), r"shard_(\d+)\.", 1)
            .cast("int")
            .alias("shard"),
            F.element_at(F.split(F.col("path"), r"\."), -1).alias("ext"),
            F.col("content"),
        )
    )

    def _decode(it):
        import numpy as np

        # a shard's .bin and .idx can arrive in DIFFERENT Arrow batches
        # of the same partition — buffer the whole partition (its files
        # must fit task memory to decode anyway) before pairing.
        by_shard: dict[int, dict[str, bytes]] = {}
        for pdf in it:
            for _, r in pdf.iterrows():
                by_shard.setdefault(int(r["shard"]), {})[r["ext"]] = r[
                    "content"
                ]
        if by_shard:
            for shard, parts in sorted(by_shard.items()):
                if "idx" not in parts or "bin" not in parts:
                    raise ValueError(
                        f"shard {shard}: half-written pair "
                        f"(have {sorted(parts)})"
                    )
                dtype, sizes = _mmidx_parse(parts["idx"])
                np_dtype = "<u2" if dtype == "uint16" else "<i4"
                ids = np.frombuffer(parts["bin"], dtype=np_dtype)
                if ids.size != int(sizes.sum()):
                    raise ValueError(
                        f"shard {shard}: .bin holds {ids.size} ids, "
                        f".idx claims {int(sizes.sum())}"
                    )
                offs = np.zeros(len(sizes) + 1, dtype=np.int64)
                np.cumsum(sizes, out=offs[1:])
                out = {
                    "shard": shard,
                    "seq": np.arange(len(sizes), dtype=np.int64),
                    "n_tokens": sizes.astype(np.int64),
                    "token_sum": [
                        int(ids[offs[i]:offs[i + 1]].astype(np.int64).sum())
                        for i in range(len(sizes))
                    ],
                }
                if masks:
                    if "msk" not in parts:
                        raise ValueError(
                            f"shard {shard}: .msk sidecar missing"
                        )
                    mk = np.frombuffer(parts["msk"], dtype=np.uint8)
                    if mk.size != ids.size:
                        raise ValueError(
                            f"shard {shard}: .msk holds {mk.size} bytes, "
                            f".bin holds {ids.size} ids"
                        )
                    out["mask_sum"] = [
                        int(mk[offs[i]:offs[i + 1]].astype(np.int64).sum())
                        for i in range(len(sizes))
                    ]
                yield pd.DataFrame(out)

    schema = "shard int, seq bigint, n_tokens bigint, token_sum bigint"
    if masks:
        schema += ", mask_sum bigint"
    # both files of a pair must land in ONE group: repartition by shard
    return files.repartition("shard").mapInPandas(_decode, schema)


def write_webdataset_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    member_cols: dict[str, str],
    n_shards: int = 8,
) -> DataFrame:
    """Materialize samples as WebDataset-layout tar shards (public
    format: github.com/webdataset/webdataset — the standard container
    for multimodal training data): ``shard_K.tar`` holds each
    sample's members as ``{key:012d}.{ext}`` files, samples in key
    order, so a training loader streams sequential tar reads with no
    index. ``member_cols`` maps extension → column (``string`` is
    UTF-8 encoded, ``binary`` written as-is — images/audio ride
    alongside text transparently).

    Determinism: shard = ``pmod(key, n_shards)`` (integer arithmetic,
    SQL-re-derivable), members in sorted-extension order within a
    sample, and tar metadata pinned (USTAR, mtime=0, uid/gid=0,
    mode 644) — shard BYTES are a pure function of the input frame,
    any partitioning, certified by the manifest sha256.

    Scale: one hash shuffle on the shard id; each shard is assembled
    and written by ONE task (the Megatron-writer shape of
    write_token_shards). Size n_shards so a shard fits a task —
    WebDataset's own guidance is shards of 100 MB–1 GB, thousands of
    shards at 100 TB.

    Returns (and persists) the manifest: ``(shard, n_samples,
    n_bytes, sha256)``.
    """
    import hashlib
    import io
    import tarfile

    import pandas as pd

    from pyspark.sql import functions as F

    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    os.makedirs(path, exist_ok=True)
    exts = sorted(member_cols)
    str_cols = {
        e: df.schema[member_cols[e]].dataType.simpleString() == "string"
        for e in exts
    }
    tagged = df.select(
        F.pmod(F.col(key_col), F.lit(n_shards)).cast("int").alias("shard"),
        F.col(key_col).cast("long").alias("__key"),
        *[F.col(member_cols[e]).alias(f"__m_{e}") for e in exts],
    )

    def _write(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__key").reset_index(drop=True)
        shard = int(pdf["shard"].iloc[0])
        buf = io.BytesIO()
        with tarfile.open(
            fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
        ) as tar:
            for _, row in pdf.iterrows():
                for e in exts:
                    v = row[f"__m_{e}"]
                    # NULL members of either type become empty entries
                    # (mirrors the binary branch — a None string would
                    # AttributeError in the executor otherwise)
                    data = (
                        (v if v is not None else "").encode("utf-8")
                        if str_cols[e]
                        else bytes(v if v is not None else b"")
                    )
                    info = tarfile.TarInfo(name=f"{int(row['__key']):012d}.{e}")
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.mode = 0o644
                    tar.addfile(info, io.BytesIO(data))
        blob = buf.getvalue()
        with open(f"{path}/shard_{shard}.tar", "wb") as f:
            f.write(blob)
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_samples": [len(pdf)],
                "n_bytes": [len(blob)],
                "sha256": [hashlib.sha256(blob).hexdigest()],
            }
        )

    manifest = tagged.groupBy("shard").applyInPandas(
        _write, "shard int, n_samples bigint, n_bytes bigint, sha256 string"
    )
    manifest = manifest.localCheckpoint()  # run the writes exactly once
    write_table(manifest.coalesce(1), f"{path}/manifest")
    return manifest


def read_webdataset_shards(spark: SparkSession, path: str) -> DataFrame:
    """Read :func:`write_webdataset_shards` output back from the tar
    BYTES (not any sidecar): one row per member —
    ``(shard, key, ext, n_bytes, content)``. binaryFile scan → one
    tarfile pass per shard; shards decode in parallel."""
    import io
    import tarfile

    import pandas as pd

    def _read(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                shard = int(
                    row["path"].rsplit("shard_", 1)[1].split(".tar")[0]
                )
                with tarfile.open(
                    fileobj=io.BytesIO(row["content"]), mode="r"
                ) as tar:
                    out = []
                    for m in tar.getmembers():
                        key, ext = m.name.split(".", 1)
                        out.append(
                            (
                                shard,
                                int(key),
                                ext,
                                m.size,
                                tar.extractfile(m).read(),
                            )
                        )
                if out:
                    yield pd.DataFrame(
                        out,
                        columns=["shard", "key", "ext", "n_bytes", "content"],
                    )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "shard_*.tar")
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(
        _read, "shard int, key long, ext string, n_bytes bigint, content binary"
    )


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str] | str,
    partition_col: str,
    when_matched: str = "update",
) -> dict:
    """MERGE INTO for a hive-partitioned parquet dataset — the
    warehouse upsert (Delta/Iceberg ``MERGE``) as explicit
    copy-on-write: matched target rows are replaced (``update``) or
    removed (``delete``), unmatched update rows insert. ONLY the
    partitions the update batch touches are read and rewritten —
    Spark's dynamic partition overwrite swaps exactly those directory
    trees, so a merge touching 0.1% of partitions costs 0.1% of the
    table, never a full rewrite.

    Contract: the target holds ONE row per key (dimension-style), the
    update batch is unique per key (enforced — duplicate update keys
    raise), and ``partition_col`` is immutable per key — a key that
    "moves" partitions would leave its old row behind (the standard
    hive-upsert caveat; a transaction log is what fixes it, and that
    is a table FORMAT, not an engine, concern).

    Emptied partitions: dynamic partition overwrite only replaces
    partitions PRESENT in the written data, so an affected partition
    with zero surviving rows (e.g. a delete batch that matches every
    row of a tenant's partition) would otherwise survive untouched — a
    silent no-op on the canonical drop-a-tenant merge. Those
    directories are detected before the write (their physical paths
    captured from the scan, so no hive-escaping logic) and removed via
    the Hadoop FS API after it.

    Returns ``{"partitions_rewritten": int, "partitions_emptied": int,
    "rows_matched": int, "rows_inserted": int}`` —
    ``partitions_rewritten`` counts partitions actually present in the
    written data; emptied ones are counted separately.
    """
    from pyspark.sql import functions as F

    if when_matched not in ("update", "delete"):
        raise ValueError("when_matched must be 'update' or 'delete'")
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    dup = (
        updates.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).collect()
    )
    if dup:
        raise ValueError(f"merge_upsert: duplicate update keys, e.g. {dup[0]}")
    upd = updates.localCheckpoint()  # pin: read twice below

    parts = [r[0] for r in upd.select(partition_col).distinct().collect()]
    if any(p is None for p in parts):
        # SQL `IN (NULL, …)` never matches the target's null-partition
        # rows, so they would be excluded from `keep` while dynamic
        # overwrite still replaces __HIVE_DEFAULT_PARTITION__ —
        # silently DELETING every pre-existing row there. Refuse.
        raise ValueError(
            "merge_upsert: update rows with a NULL partition value are "
            "not supported (a null partition cannot be merged safely); "
            "coalesce the partition column first"
        )
    target = spark.read.parquet(path)
    affected = target.filter(F.col(partition_col).isin(parts))

    matched = affected.join(
        upd.select(*keys), keys, "left_semi"
    ).count()
    keep = affected.join(upd.select(*keys), keys, "left_anti")
    if when_matched == "update":
        merged = keep.unionByName(upd.select(*affected.columns))
        inserted = upd.count() - matched
    else:  # delete: unmatched update rows still insert (MERGE semantics)
        not_in_target = upd.join(affected.select(*keys), keys, "left_anti")
        merged = keep.unionByName(not_in_target.select(*affected.columns))
        inserted = not_in_target.count()

    # Pin BEFORE inspecting/writing: merged reads the target files the
    # overwrite below replaces, and the partition census must see the
    # same rows the write emits.
    merged = merged.localCheckpoint()
    present = {
        r[0] for r in merged.select(partition_col).distinct().collect()
    }
    emptied = [p for p in parts if p not in present]
    emptied_dirs: list[str] = []
    if emptied:
        # Dynamic overwrite cannot replace a partition absent from the
        # written data — capture the emptied partitions' physical
        # directories from the pre-overwrite scan (real paths, so no
        # hive partition-value escaping logic) and delete them after.
        files = [
            r[0]
            for r in target.filter(F.col(partition_col).isin(emptied))
            .select(F.input_file_name())
            .distinct()
            .collect()
        ]
        emptied_dirs = sorted({f.rsplit("/", 1)[0] for f in files})

    (
        merged.repartition(max(len(present), 1), F.col(partition_col))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    if emptied_dirs:
        sc = spark.sparkContext
        jvm = sc._jvm
        hconf = sc._jsc.hadoopConfiguration()
        for d in emptied_dirs:
            hp = jvm.org.apache.hadoop.fs.Path(d)
            hp.getFileSystem(hconf).delete(hp, True)
    return {
        "partitions_rewritten": len(present),
        "partitions_emptied": len(emptied),
        "rows_matched": int(matched),
        "rows_inserted": int(inserted),
    }
