"""Sink/source roundtrips + the scale properties they exist for:
partition pruning on partitioned writes, shuffle-free joins on
bucketed tables."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkswift.sources import load_table, read_table, write_bucketed, write_table


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders")


def _sorted_pdf(df):
    pdf = df.toPandas()
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip_formats(spark, orders, tmp_path_factory, fmt):
    path = str(tmp_path_factory.mktemp("sink") / f"orders_{fmt}")
    df = orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    write_table(df, path, format=fmt)
    back = read_table(spark, path, format=fmt, schema=df.schema)
    pd.testing.assert_frame_equal(_sorted_pdf(back), _sorted_pdf(df))


def test_partitioned_write_prunes(spark, orders, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sink") / "orders_part")
    write_table(orders, path, partition_by=["o_orderstatus"])
    back = read_table(spark, path).filter(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter must reach the scan, not survive as a row filter
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan
    assert back.count() == orders.filter(F.col("o_orderstatus") == "F").count()


def test_bucketed_join_skips_shuffle(spark, orders):
    # warehouse dir is set to /tmp/sparkswift-warehouse in session.py
    # (static config — can't be changed per-test)
    try:
        write_bucketed(
            orders, "orders_bkt", bucket_cols=["o_custkey"], num_buckets=8,
            sort_cols=["o_custkey"],
        )
        t = spark.table("orders_bkt")
        agg = t.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("s"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed groupBy must not shuffle"
        # values still correct
        want = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("s"))
        assert _sorted_pdf(agg).shape == _sorted_pdf(want).shape
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_bkt")


def test_compact_bucketed_table_one_file_per_bucket(spark, orders):
    from sparkswift.sources import compact_bucketed_table

    tbl = "orders_bkt_compact_test"
    try:
        # 4 appends × multi-task writes → many small files per bucket
        for i in range(4):
            write_bucketed(
                orders.filter(F.col("o_orderkey") % 4 == i).repartition(4),
                tbl, bucket_cols=["o_custkey"], num_buckets=8,
                sort_cols=["o_custkey"],
                mode="overwrite" if i == 0 else "append",
            )
        before_rows = spark.table(tbl).count()
        summary = compact_bucketed_table(spark, tbl)
        assert summary["files_before"] > 8
        assert summary["files_after"] == 8  # one file per bucket
        # rows intact, bucket spec preserved → still shuffle-free
        assert spark.table(tbl).count() == before_rows
        agg = spark.table(tbl).groupBy("o_custkey").count()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        for t in (tbl, f"{tbl}__compact__", f"{tbl}__precompact__"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_binary_file_source_feeds_multimodal(spark, tmp_path_factory):
    """binaryFile ingestion → multimodal contract → decode plumbing:
    the end-to-end path real media files would take."""
    from sparkswift.operators.multimodal import decode_image
    from sparkswift.sources.loaders import load_binary_files

    d = tmp_path_factory.mktemp("media")
    payloads = {f"img_{i}.bin": bytes([i]) * (10 + i) for i in range(5)}
    for name, data in payloads.items():
        (d / name).write_bytes(data)
    (d / "ignore.txt").write_text("not media")

    df = load_binary_files(spark, str(d), glob="*.bin", modality="image")
    rows = df.collect()
    assert len(rows) == 5  # glob pruned the .txt at listing time
    got = {r.path.rsplit("/", 1)[-1]: bytes(r.payload) for r in rows}
    assert got == payloads
    assert all(r.byte_len == len(bytes(r.payload)) for r in rows)
    assert rows[0].media_meta.modality == "image"

    decoded = decode_image(
        df.withColumn("doc_id", F.monotonically_increasing_id()), "doc_id", "payload"
    )
    out = decoded.collect()
    assert len(out) == 5
    by_len = {r.byte_len: r.sha256 for r in out}
    import hashlib

    assert by_len[10] == hashlib.sha256(bytes([0]) * 10).hexdigest()


def test_table_as_directory_of_files(spark, sf_dir, tmp_path_factory):
    """The 100 TB layout: a 'table' is a DIRECTORY of many parquet
    files. load_table and every operator must treat it identically to
    the single-file fixture (same rows, multi-partition scan)."""
    from sparkswift.sources import load_table

    d = tmp_path_factory.mktemp("multi") / "events.parquet"
    single = load_table(spark, sf_dir, "events")
    single.repartition(8).write.mode("overwrite").parquet(str(d))

    multi = load_table(spark, str(d.parent), "events")
    assert len(list(d.glob("part-*"))) == 8
    assert multi.count() == single.count()
    assert dict(multi.dtypes) == dict(single.dtypes)
    # timestamp normalization applied on this path too (no NTZ leaks)
    assert dict(multi.dtypes)["ts"] == "timestamp"
    a = multi.agg(F.sum(F.col("value").cast("decimal(18,4)"))).first()[0]
    b = single.agg(F.sum(F.col("value").cast("decimal(18,4)"))).first()[0]
    assert a == b


def test_export_shards_layout_and_determinism(spark, sf_dir, tmp_path):
    """Shard dirs exist, rows are position-sorted within each shard,
    manifest matches the data, and two runs produce identical shards."""
    import pyspark.sql.functions as F

    from sparkswift.operators.sampling import deterministic_shuffle
    from sparkswift.sources import load_table
    from sparkswift.sources.writers import export_shards

    docs = load_table(spark, sf_dir, "documents")
    shuffled = deterministic_shuffle(docs, "doc_id").select("doc_id", "shuffle_pos")
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = export_shards(shuffled, p1, n_shards=4).toPandas().sort_values("shard")
    m2 = export_shards(shuffled, p2, n_shards=4).toPandas().sort_values("shard")
    assert m1.reset_index(drop=True).equals(m2.reset_index(drop=True))
    data = spark.read.parquet(f"{p1}/data")
    assert data.count() == docs.count()
    assert {r.shard for r in data.select("shard").distinct().collect()} == {0, 1, 2, 3}
    # manifest agrees with the written data
    got = {
        (r.shard, r["count"])
        for r in data.groupBy("shard").count().collect()
    }
    want = {(r.shard, r.n_rows) for r in m1.itertuples(index=False)}
    assert {(s, n) for s, n in got} == want
    # shards partition the position space contiguously
    rows = sorted(m1.itertuples(index=False), key=lambda r: r.shard)
    for a, b in zip(rows, rows[1:]):
        assert a.max_pos < b.min_pos
    import pytest as _pt

    with _pt.raises(ValueError):
        export_shards(shuffled.filter("doc_id < 0"), str(tmp_path / "c"))

    # JSONL export: same layout and manifest, newline-delimited data
    pj = str(tmp_path / "j")
    mj = export_shards(shuffled, pj, n_shards=4, format="json").toPandas()
    assert mj.sort_values("shard").reset_index(drop=True).equals(
        m1.reset_index(drop=True)
    )
    jdata = spark.read.json(f"{pj}/data")
    assert jdata.count() == docs.count()
    import glob as _glob

    files = _glob.glob(f"{pj}/data/shard=0/part-*.json")
    assert files
    with open(files[0]) as fh:
        first = fh.readline()
    assert first.startswith("{") and first.rstrip().endswith("}")


# --- z-order layout ---------------------------------------------------------


def test_zorder_key_matches_python_reference(spark):
    from sparkswift.operators.layout import zorder_key

    rows = [(i, (7 * i) % 100, (13 * i) % 100) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    out = (
        df.select("id", "a", "b", zorder_key(["a", "b"], bits=8).alias("z"))
        .toPandas()
        .set_index("id")
    )

    def morton(a: int, b: int, bits: int = 8) -> int:
        z = 0
        for j in range(bits):
            z |= ((a >> j) & 1) << (2 * j)
            z |= ((b >> j) & 1) << (2 * j + 1)
        return z

    for i, a, b in rows:
        assert out.loc[i, "z"] == morton(a, b), (i, a, b)


def test_zorder_key_validates_args(spark):
    import pytest as _pytest

    from sparkswift.operators.layout import zorder_key

    with _pytest.raises(ValueError):
        zorder_key(["a"], bits=8)
    with _pytest.raises(ValueError):
        zorder_key(["a", "b"], bits=32)


def test_write_zordered_files_cover_disjoint_z_ranges(spark, tmp_path):
    """The whole point of the layout: each output file's (min z, max z)
    interval must not overlap any other file's — that's what lets
    row-group stats prune a 2-D range predicate."""
    import pyspark.sql.functions as F

    from sparkswift.operators.layout import write_zordered, zorder_key

    rows = [(i, (i * 37) % 256, (i * 91) % 256) for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    path = str(tmp_path / "zo")
    write_zordered(df, path, ["a", "b"], bits=8, num_files=8)

    back = spark.read.parquet(path).withColumn(
        "f", F.input_file_name()
    ).withColumn("z", zorder_key(["a", "b"], bits=8))
    ranges = (
        back.groupBy("f").agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
        .toPandas()
        .sort_values("lo")
        .reset_index(drop=True)
    )
    assert len(ranges) > 1
    for k in range(1, len(ranges)):
        assert ranges.loc[k, "lo"] > ranges.loc[k - 1, "hi"]
    # round-trip integrity
    assert back.count() == 4000


def test_compact_dataset_reduces_file_count(spark, sf_dir, tmp_path):
    from sparkswift.sources import load_table
    from sparkswift.sources.writers import compact_dataset

    path = str(tmp_path / "frag")
    docs = load_table(spark, sf_dir, "documents")
    docs.repartition(64).write.parquet(path)  # 64 tiny files
    before = docs.count()
    summary = compact_dataset(spark, path, target_file_bytes=10**9)
    assert summary["files_before"] >= 64
    assert summary["files_after"] == 1
    after = spark.read.parquet(path)
    assert after.count() == before
    assert set(after.columns) == set(docs.columns)
    # no temp/backup leftovers
    import os
    assert not os.path.exists(path + ".__compact__")
    assert not os.path.exists(path + ".__precompact__")


def test_compact_dataset_errors_on_empty_dir(spark, tmp_path):
    import pytest as _pytest

    from sparkswift.sources.writers import compact_dataset

    empty = tmp_path / "empty"
    empty.mkdir()
    with _pytest.raises(ValueError, match="no data files"):
        compact_dataset(spark, str(empty))


def test_webdataset_shards_deterministic_and_binary_roundtrip(spark, tmp_path):
    """Shard BYTES are a pure function of the frame (identical
    manifest sha256 under different partition layouts), and binary
    members (the multimodal path) round-trip byte-exact."""
    import pandas as pd

    from sparkswift.sources.writers import (
        read_webdataset_shards,
        write_webdataset_shards,
    )

    pdf = pd.DataFrame(
        {
            "k": list(range(40)),
            "txt": [f"doc {i} text" for i in range(40)],
            "payload": [bytes([i % 251, 7, i % 13]) * (i + 1) for i in range(40)],
        }
    )
    manis = []
    for run, parts in enumerate((3, 11)):
        base = str(tmp_path / f"wds{run}")
        df = spark.createDataFrame(pdf).repartition(parts)
        m = (
            write_webdataset_shards(
                df, base, "k", {"txt": "txt", "bin": "payload"}, n_shards=4
            )
            .toPandas()
            .sort_values("shard")
            .reset_index(drop=True)
        )
        manis.append(m)
    assert manis[0].equals(manis[1])  # layout-independent bytes

    back = read_webdataset_shards(spark, str(tmp_path / "wds0")).toPandas()
    assert len(back) == 80
    got = {
        (r.key, r.ext): bytes(r.content) for r in back.itertuples()
    }
    for i in range(40):
        assert got[(i, "txt")] == f"doc {i} text".encode()
        assert got[(i, "bin")] == bytes([i % 251, 7, i % 13]) * (i + 1)
        assert (i % 4) == int(
            back[back.key == i]["shard"].iloc[0]
        )  # pmod assignment


def test_webdataset_null_string_member(spark, tmp_path):
    """ADVICE r9: a NULL string member used to crash v.encode() in the
    executor; it must write an empty member like the binary branch."""
    from sparkswift.sources.writers import (
        read_webdataset_shards,
        write_webdataset_shards,
    )

    df = spark.createDataFrame(
        [(0, "hello", b"\x01"), (1, None, None)],
        "k long, txt string, payload binary",
    )
    base = str(tmp_path / "wds_null")
    man = write_webdataset_shards(
        df, base, "k", {"txt": "txt", "bin": "payload"}, n_shards=1
    ).collect()
    assert man[0]["n_samples"] == 2
    got = {
        (r["key"], r["ext"]): bytes(r["content"])
        for r in read_webdataset_shards(spark, base).collect()
    }
    assert got[(1, "txt")] == b"" and got[(1, "bin")] == b""
    assert got[(0, "txt")] == b"hello"


def test_merge_upsert_touches_only_affected_partitions(spark, tmp_path):
    """Copy-on-write discipline: a merge whose batch lands in ONE
    partition must leave every other partition's files byte-untouched
    (same paths, same mtimes); update/insert/delete semantics and the
    duplicate-key guard."""
    import os

    import pytest as _pytest

    from sparkswift.sources.writers import merge_upsert, write_table

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(i, i % 4, float(i)) for i in range(40)], "k long, p int, v double"
    )
    write_table(base, path, partition_by=["p"])

    def files_of(p):
        d = f"{path}/p={p}"
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if not f.startswith((".", "_"))
        }

    before = {p: files_of(p) for p in range(4)}
    upd = spark.createDataFrame(
        [(0, 0, 100.0), (4, 0, 100.0), (1000, 0, 1.0)], "k long, p int, v double"
    )
    stats = merge_upsert(spark, path, upd, "k", "p")
    assert stats == {
        "partitions_rewritten": 1,
        "partitions_emptied": 0,
        "rows_matched": 2,
        "rows_inserted": 1,
    }
    for p in (1, 2, 3):  # untouched partitions: identical files
        assert files_of(p) == before[p], p
    got = {
        r["k"]: r["v"] for r in spark.read.parquet(path).collect()
    }
    assert got[0] == 100.0 and got[4] == 100.0 and got[1000] == 1.0
    assert len(got) == 41

    # delete: matched keys vanish, unmatched still insert
    dele = spark.createDataFrame(
        [(8, 0, 0.0), (2000, 0, 5.0)], "k long, p int, v double"
    )
    stats = merge_upsert(spark, path, dele, "k", "p", when_matched="delete")
    assert stats["rows_matched"] == 1 and stats["rows_inserted"] == 1
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert 8 not in got and got[2000] == 5.0

    with _pytest.raises(ValueError, match="duplicate update keys"):
        merge_upsert(
            spark,
            path,
            spark.createDataFrame(
                [(1, 1, 0.0), (1, 1, 2.0)], "k long, p int, v double"
            ),
            "k",
            "p",
        )


def test_merge_upsert_delete_empties_partition(spark, tmp_path):
    """ADVICE r10 (high): a delete batch matching EVERY remaining row
    of a partition must actually remove it — dynamic overwrite alone
    cannot (the partition is absent from the written data), so the
    emptied directory is deleted explicitly. The canonical case:
    dropping one tenant when partition_col is the tenant."""
    import os

    from sparkswift.sources.writers import merge_upsert, write_table

    path = str(tmp_path / "et")
    base = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(12)], "k long, p int, v double"
    )
    write_table(base, path, partition_by=["p"])

    # delete every key of partition p=1 (keys 1,4,7,10), nothing else
    dele = spark.createDataFrame(
        [(k, 1, 0.0) for k in (1, 4, 7, 10)], "k long, p int, v double"
    )
    stats = merge_upsert(spark, path, dele, "k", "p", when_matched="delete")
    assert stats == {
        "partitions_rewritten": 0,
        "partitions_emptied": 1,
        "rows_matched": 4,
        "rows_inserted": 0,
    }
    assert not os.path.exists(f"{path}/p=1")
    got = {r["k"] for r in spark.read.parquet(path).collect()}
    assert got == {i for i in range(12) if i % 3 != 1}

    # delete ALL partitions of a two-partition table: merged is fully
    # empty — the write is a no-op and both directories are removed.
    path2 = str(tmp_path / "et2")
    write_table(
        spark.createDataFrame(
            [(1, 0, 1.0), (2, 1, 2.0)], "k long, p int, v double"
        ),
        path2,
        partition_by=["p"],
    )
    stats = merge_upsert(
        spark,
        path2,
        spark.createDataFrame(
            [(1, 0, 0.0), (2, 1, 0.0)], "k long, p int, v double"
        ),
        "k",
        "p",
        when_matched="delete",
    )
    assert stats["partitions_emptied"] == 2 and stats["rows_matched"] == 2
    assert not os.path.exists(f"{path2}/p=0")
    assert not os.path.exists(f"{path2}/p=1")


def test_merge_upsert_null_partition_refused(spark, tmp_path):
    """Review r10: a NULL partition value in the update batch must
    raise — IN(NULL,...) would silently delete the null partition."""
    import pytest as _pytest

    from sparkswift.sources.writers import merge_upsert, write_table

    path = str(tmp_path / "nt")
    write_table(
        spark.createDataFrame([(1, 0, 1.0)], "k long, p int, v double"),
        path,
        partition_by=["p"],
    )
    upd = spark.createDataFrame([(2, None, 2.0)], "k long, p int, v double")
    with _pytest.raises(ValueError, match="NULL partition"):
        merge_upsert(spark, path, upd, "k", "p")


def test_store_tiny_path_member_overwrites(spark, tmp_path):
    """Review r10: a tiny marker member of a PATH store must OVERWRITE
    on rewrite, not append stale generations."""
    from sparkswift.sources.store import Member, Store

    st = Store(
        spark,
        str(tmp_path / "ps"),
        [Member("centers", tiny=True), Member("vecs")],
        catalog=False,
    )
    st.write_members(
        {
            "vecs": spark.createDataFrame([(1,)], "k int"),
            "centers": spark.createDataFrame([(0, 1.0)], "c int, y double"),
        }
    )
    st.append("centers", spark.createDataFrame([(0, 2.0)], "c int, y double"))
    rows = st.read("centers").collect()
    assert len(rows) == 1 and rows[0]["y"] == 2.0


# --- bounded-read media-header ingest (sources/media_headers.py) -----------


def test_ranged_census_equals_inmemory_on_fixture(spark, tmp_path):
    """THE equality law for the bounded-read ingest: for the same
    synth corpora, the ranged loaders (file listing + ranged header
    reads, never a full payload) produce row-identical censuses to
    the certified in-memory mapInPandas path — across every fixture
    branch (MP3 ID3v2/footer/ID3v1/CBR, AVI codec/fps/index, MP4
    track/codec variants)."""
    from pyspark.sql import functions as F

    from sparkswift.operators import multimodal as mm
    from sparkswift.sources import media_headers as mh

    ids = spark.createDataFrame(
        [(i,) for i in range(0, 60)], "doc_id long"
    ).repartition(4)

    cases = [
        (
            "mp3", mm.synth_mp3_payload,
            lambda df: mm.mp3_frame_census(df, "doc_id", "payload"),
            lambda d: mh.load_mp3_headers(spark, d, glob="*.mp3").drop(
                "truncated"
            ),
        ),
        (
            "avi", mm.synth_avi_stub_payload,
            lambda df: mm.avi_container_census(df, "doc_id", "payload"),
            lambda d: mh.load_avi_headers(spark, d, glob="*.avi"),
        ),
        (
            "mp4", mm.synth_mp4_stub_payload,
            lambda df: mm.mp4_container_census(df, "doc_id", "payload"),
            lambda d: mh.load_mp4_headers(spark, d, glob="*.mp4"),
        ),
    ]
    for ext, synth, mem_census, ranged_load in cases:
        d = str(tmp_path / ext)
        n = mh.write_payload_files(synth(ids, "doc_id"), d, ext=ext)
        assert n == 60
        mem = {r["id"]: r.asDict() for r in mem_census(synth(ids, "doc_id")).collect()}
        got = ranged_load(d).withColumn(
            "id",
            F.regexp_extract("path", r"doc_(\d+)\." + ext, 1).cast("bigint"),
        )
        rows = got.collect()
        assert len(rows) == 60
        for r in rows:
            rd = r.asDict()
            rid = rd.pop("id")
            fb = rd.pop("file_bytes")
            hb = rd.pop("header_bytes_read")
            rd.pop("path")
            expect = dict(mem[rid])
            expect.pop("id")
            assert rd == expect, (ext, rid, rd, expect)
            assert 0 < hb and fb > 0


def test_ranged_mp4_reads_tiny_fraction_of_big_mdat(tmp_path):
    """The 100 TB point of the ranged ingest, measured: an MP4 whose
    mdat dwarfs its headers censuses from a few KB of ranged reads —
    bytes_fetched stays bounded by the header blocks while the
    in-memory path would pay the full file."""
    from sparkswift.operators.multimodal import (
        _parse_mp4_container,
        encode_mp4_stub,
    )
    from sparkswift.sources import media_headers as mh

    payload = encode_mp4_stub(
        7200, 600, [(b"vide", b"avc1"), (b"soun", b"mp4a")],
        mdat_bytes=4_000_000,
    )
    p = tmp_path / "big.mp4"
    p.write_bytes(payload)

    r = mh.open_ranged(str(p), block_bytes=4096)
    c = mh.census_mp4_ranged(r)
    ref = _parse_mp4_container(payload)
    assert c == ref
    assert c["mdat_bytes"] == 4_000_000
    # headers fit in a handful of 4 KB blocks; the 4 MB body is
    # never fetched (seeked past via the mdat size field alone)
    assert r.bytes_fetched < 32_768, r.bytes_fetched
    assert r.bytes_fetched < len(payload) // 100


def test_ranged_avi_skips_chunk_bodies(tmp_path):
    """AVI's win is smaller (8 bytes per frame header) but real:
    large opaque frame bodies are seeked past, so bytes_fetched stays
    near the header size, not the video size."""
    from sparkswift.operators.multimodal import (
        _parse_avi_container,
        encode_avi_stub,
    )
    from sparkswift.sources import media_headers as mh

    payload = encode_avi_stub(
        [200_000] * 20, codec=b"H264", fps=30, with_index=True
    )
    p = tmp_path / "big.avi"
    p.write_bytes(payload)
    r = mh.open_ranged(str(p), block_bytes=4096)
    c = mh.census_avi_ranged(r)
    ref = _parse_avi_container(payload)
    assert c == ref and c["video_bytes"] == 4_000_000
    assert r.bytes_fetched < len(payload) // 20, r.bytes_fetched


def test_ranged_mp3_prefix_mode_and_gates(tmp_path):
    """max_frames triage: the prefix census equals the full walk's
    first-N sums with truncated=1 iff frames remain; corrupt and
    unrecognized files fail loudly through the ranged path too."""
    import pytest as _pytest

    from sparkswift.operators.multimodal import encode_mp3_stream
    from sparkswift.sources import media_headers as mh

    specs = [(1, 0), (5, 1), (9, 0), (14, 1), (3, 0)]
    payload = encode_mp3_stream(specs, id3v2_bytes=33, id3v1=True)
    p = tmp_path / "a.mp3"
    p.write_bytes(payload)

    full = mh.census_mp3_ranged(mh.open_ranged(str(p)))
    assert full["n_frames"] == 5 and full["truncated"] == 0
    pre = mh.census_mp3_ranged(mh.open_ranged(str(p)), max_frames=3)
    assert pre["n_frames"] == 3 and pre["truncated"] == 1
    assert pre["total_samples"] == 3 * 1152
    assert pre["stream_bytes"] < full["stream_bytes"]
    # prefix at exactly n frames is NOT truncated
    exact = mh.census_mp3_ranged(mh.open_ranged(str(p)), max_frames=5)
    assert exact == full

    # sniff + loud gates
    assert mh.sniff_media_format(mh.open_ranged(str(p))) == "mp3"
    bad = tmp_path / "bad.mp4"
    bad.write_bytes(b"\x00\x00\x00\x30ftypisom" + b"\x01" * 8)
    with _pytest.raises(ValueError, match="corrupt ISO-BMFF"):
        mh.census_mp4_ranged(mh.open_ranged(str(bad)))
    junk = tmp_path / "junk.bin"
    junk.write_bytes(b"\x01\x02\x03\x04" * 8)
    with _pytest.raises(ValueError, match="unrecognized media"):
        mh.sniff_media_format(mh.open_ranged(str(junk)))


def test_media_triage_sniff_dispatch(spark, tmp_path):
    """mm32's loader: one directory of mixed containers triages in a
    single listing pass — sniff dispatch matches extensions, the
    normalized fields match each format's dedicated loader, and an
    unrecognized file fails loudly (triage must not be lossy)."""
    from pyspark.sql import functions as F

    from sparkswift.operators import multimodal as mm
    from sparkswift.sources import media_headers as mh

    ids = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    d = str(tmp_path / "mixed")
    mh.write_payload_files(
        mm.synth_mp3_payload(ids.filter("doc_id % 3 = 0")), d, ext="mp3")
    mh.write_payload_files(
        mm.synth_avi_stub_payload(ids.filter("doc_id % 3 = 1")), d, ext="avi")
    mh.write_payload_files(
        mm.synth_mp4_stub_payload(ids.filter("doc_id % 3 = 2")), d, ext="mp4")
    rows = mh.load_media_triage(spark, d).collect()
    assert len(rows) == 12
    for r in rows:
        ext = r["path"].rsplit(".", 1)[1]
        assert r["media_format"] == ext, r
        assert r["duration_us"] > 0 and r["n_units"] > 0
        assert 0 < r["header_bytes_read"]

    junk = tmp_path / "mixed" / "doc_99999999.bin"
    junk.write_bytes(b"\x01\x02\x03\x04" * 10)
    import pytest as _pytest

    with _pytest.raises(Exception, match="unrecognized media"):
        mh.load_media_triage(spark, d).collect()


def test_ranged_ogg_and_webp_census_equal_inmemory():
    """The two r15-late ranged censuses against their certified
    in-memory parsers on authored containers, with bounded
    bytes_fetched; Ogg's ranged path skips CRC verification by
    documented design (needs full-page bytes), but still enforces
    framing sync / truncation / id-header checks."""
    import pytest as _pytest

    from sparkswift.operators.multimodal import (
        _parse_ogg_vorbis,
        _parse_webp_header,
        encode_ogg_vorbis_stub,
        encode_webp_stub,
    )
    from sparkswift.sources.media_headers import (
        RangedReader,
        census_ogg_ranged,
        census_webp_ranged,
    )

    class MemReader(RangedReader):
        def __init__(self, b):
            class _F:
                def __init__(s2, bb):
                    s2.b = bb

                def read_at(s2, n, off):
                    return s2.b[off : off + n]

            super().__init__(_F(b), len(b), 512)

    for args in ((16, 12, "lossy", False, False),
                 (300, 40, "extended", True, True)):
        w, h, v, a, an = args
        b = encode_webp_stub(w, h, v, alpha=a, anim=an, payload_bytes=20000)
        rr = MemReader(b)
        assert census_webp_ranged(rr) == _parse_webp_header(b)
        assert rr.bytes_fetched < len(b) // 4

    b = encode_ogg_vorbis_stub(8000, 1, [5000, 5000, 123], 999)
    rr = MemReader(b)
    assert census_ogg_ranged(rr) == _parse_ogg_vorbis(b)
    assert rr.bytes_fetched < len(b) // 3

    with _pytest.raises(ValueError, match="truncated Ogg"):
        census_ogg_ranged(MemReader(b[:-50]))


def test_matroska_census_and_ranged_equal_inmemory():
    """mm40/mm40b: EBML vint encode/decode laws at length boundaries;
    the census across every fixture branch; ranged == in-memory rows
    with Cluster bodies never fetched; loud gates (unknown-size vint,
    overrun child, truncation, non-EBML)."""
    import pytest as _pytest

    from sparkswift.operators.multimodal import (
        _ebml_vint_size,
        _parse_matroska,
        _read_ebml_id,
        _read_ebml_size,
        encode_matroska_stub,
    )
    from sparkswift.sources.media_headers import (
        RangedReader,
        census_mkv_ranged,
        sniff_media_format,
    )

    class MemReader(RangedReader):
        def __init__(self, b):
            class _F:
                def __init__(s2, bb):
                    s2.b = bb

                def read_at(s2, n, off):
                    return s2.b[off : off + n]

            super().__init__(_F(b), len(b), 512)

    # vint round-trip at every length boundary (RFC 8794 §4)
    for n in (0, 126, 127, 128, 16382, 16383, 16384, 2**21 - 2, 2**21):
        enc = _ebml_vint_size(n)
        val, pos = _read_ebml_size(enc, 0)
        assert val == n and pos == len(enc)
    # 0x7F as a 1-byte size is the reserved unknown-size pattern —
    # the encoder must widen to 2 bytes, the reader must reject 0xFF
    assert len(_ebml_vint_size(127)) == 2
    with _pytest.raises(NotImplementedError, match="unknown-size"):
        _read_ebml_size(b"\xff", 0)
    # IDs keep their marker bits (spec-table form)
    eid, _ = _read_ebml_id(b"\x1a\x45\xdf\xa3", 0)
    assert eid == 0x1A45DFA3

    # census across fixture branches: audio/no-audio, both scales,
    # multi-cluster; ranged row == in-memory row; clusters not fetched
    cases = [
        ("webm", 1000000, 600, "V_VP9", 320, 240, None, 48000.0, 1, [4000]),
        ("matroska", 500000, 637, "V_VP8", 336, 248, "A_OPUS",
         44100.0, 2, [4000, 5000, 43]),
        ("webm", 1000000, 1200, "V_AV1", 432, 272, "A_VORBIS",
         48000.0, 1, [9000, 9000]),
    ]
    for args in cases:
        b = encode_matroska_stub(*args)
        mem = _parse_matroska(b)
        rr = MemReader(b)
        assert census_mkv_ranged(rr) == mem
        assert mem["cluster_bytes"] == sum(args[9])
        assert mem["n_audio"] == (0 if args[6] is None else 1)
        # ranged read cost is bounded by headers, not clusters
        assert rr.bytes_fetched < len(b)
        assert sniff_media_format(MemReader(b)) == "mkv"

    # gates
    with _pytest.raises(ValueError, match="EBML"):
        _parse_matroska(b"\x00\x00\x00\x00")
    with _pytest.raises(ValueError, match="not an EBML"):
        _parse_matroska(b"\x42\x86\x81\x01")
    b = encode_matroska_stub(*cases[1])
    with _pytest.raises(ValueError, match="truncated|overruns"):
        _parse_matroska(b[:-30])
    with _pytest.raises(ValueError, match="truncated|overruns"):
        census_mkv_ranged(MemReader(b[:-30]))


def test_aiff_ranged_census_and_sniff():
    """AIFF joins the triage sniff: ranged census fetches COMM (and
    the 80-bit rate field through the certified decoder) while SSND
    bodies are accounted from size fields; sowt/AIFC flagged."""
    import numpy as np
    import pytest as _pytest

    from sparkswift.operators.multimodal import encode_aiff
    from sparkswift.sources.media_headers import (
        RangedReader,
        census_aiff_ranged,
        sniff_media_format,
    )

    class MemReader(RangedReader):
        def __init__(self, b, bs=512):
            class _F:
                def __init__(s2, bb):
                    s2.b = bb

                def read_at(s2, n, off):
                    return s2.b[off : off + n]

            super().__init__(_F(b), len(b), bs)

    v = (np.arange(8000, dtype=np.int64) % 200 - 100) * 256
    b = encode_aiff(v, 8000, 16)
    rr = MemReader(b, bs=256)
    c = census_aiff_ranged(rr)
    assert c == {
        "n_channels": 1, "n_frames": 8000, "bits": 16,
        "sample_rate": 8000, "duration_us": 1_000_000,
        "audio_bytes": 16000, "compression": "NONE",
    }
    # SSND body (16 KB) not fetched: headers fit in a few blocks
    assert rr.bytes_fetched < len(b) // 8
    assert sniff_media_format(MemReader(b)) == "aiff"
    c2 = census_aiff_ranged(MemReader(encode_aiff(v, 44100, 24, True)))
    assert c2["compression"] == "sowt" and c2["bits"] == 24
    with _pytest.raises(ValueError, match="truncated AIFF"):
        census_aiff_ranged(MemReader(b[:-9]))
