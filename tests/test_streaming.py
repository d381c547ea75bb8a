"""Structured Streaming: stream/batch parity and cross-micro-batch
state persistence."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkswift.sources import load_table
from sparkswift.streaming.ops import (
    events_stream,
    run_stream_to_batch,
    sessionize,
    stateful_running_totals,
    stream_resample,
)


def test_stream_resample_equals_batch(spark, sf_dir):
    src = events_stream(spark, sf_dir)
    streamed = run_stream_to_batch(
        stream_resample(src, rule="1 hour", extra_keys=["event_type"]),
        mode="complete",
    ).toPandas()
    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(F.col("w.start").alias("bucket_ts"), "event_type", "n")
        .toPandas()
    )
    key = ["bucket_ts", "event_type"]
    pd.testing.assert_frame_equal(
        streamed.sort_values(key).reset_index(drop=True),
        batch.sort_values(key).reset_index(drop=True),
    )


def test_stateful_totals_accumulate_across_microbatches(spark, sf_dir, tmp_path):
    """Two files + maxFilesPerTrigger=1 → two micro-batches; the final
    emitted state per key must equal the global aggregate, proving the
    GroupState survived the batch boundary."""
    ev = load_table(spark, sf_dir, "events")
    half_a = ev.filter(F.col("event_id") % 2 == 0)
    half_b = ev.filter(F.col("event_id") % 2 == 1)
    src_dir = str(tmp_path / "stream_src")
    half_a.coalesce(1).write.parquet(src_dir)
    half_b.coalesce(1).write.mode("append").parquet(src_dir)

    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    out = run_stream_to_batch(stateful_running_totals(stream), mode="update").toPandas()
    # update mode emits one row per key per touched batch; keep last
    final = (
        out.sort_values("events_seen").groupby("user_id").last().reset_index()
    )
    expected = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
        .rename(columns={"n": "expected_n"})
    )
    merged = final.merge(expected, on="user_id")
    assert (merged.events_seen == merged.expected_n).all()
    # at least one key must have been emitted twice (two micro-batches)
    assert (out.groupby("user_id").size() > 1).any()


def test_sessionize_gap_semantics(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 00:05:00", 1.0),   # within 10 min → same session
        (1, "2024-01-01 00:30:00", 1.0),   # 25 min gap → new session
        (2, "2024-01-01 00:00:00", 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, value double").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = sessionize(df, gap="10 minutes", keys=["user_id"]).toPandas()
    assert len(out[out.user_id == 1]) == 2
    assert len(out[out.user_id == 2]) == 1
    s1 = out[(out.user_id == 1)].sort_values("session_start").iloc[0]
    assert str(s1.session_end) == "2024-01-01 00:15:00"  # last ts + gap


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode watermark semantics across micro-batches: a row
    older than the watermark established by the previous batch is
    dropped; closed windows emit, open ones are withheld."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "stream"
    d.mkdir()

    def write(path, ts_list):
        t = pa.table(
            {
                "ts": pa.array(pd.to_datetime(ts_list), type=pa.timestamp("us")),
                "v": pa.array([1.0] * len(ts_list)),
            }
        )
        pq.write_table(t, path)

    p1, p2, p3 = str(d / "0.parquet"), str(d / "1.parquet"), str(d / "2.parquet")
    # batch 0 → max event time 11:00, so the watermark becomes 10:50
    write(p1, ["2024-01-01 10:00", "2024-01-01 10:05", "2024-01-01 11:00"])
    # batch 1 runs WITH watermark 10:50 → window [10:00,10:10) is
    # emitted and its state evicted; watermark advances to 11:50
    write(p2, ["2024-01-01 12:00"])
    # batch 2: 10:03 targets an already-evicted window — the
    # guaranteed drop path (append mode can never re-emit a window)
    write(p3, ["2024-01-01 10:03"])
    os.utime(p1, (1000, 1000))
    os.utime(p2, (2000, 2000))
    os.utime(p3, (3000, 3000))

    schema = spark.read.parquet(str(d)).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d))
        # parquet ts without tz scans as TIMESTAMP_NTZ; event time
        # (watermark) requires TIMESTAMP — session tz is UTC so the
        # cast is value-preserving
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        src.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("window.start", "HH:mm").alias("ws"),
            F.col("n").cast("int").alias("n"),
        )
    )
    out = run_stream_to_batch(agg, mode="append")
    got = {(r.ws, r.n) for r in out.collect()}
    # late 10:03 dropped (its window was closed); [12:00,12:10) still
    # open at the final watermark, so append withholds it
    assert got == {("10:00", 2), ("11:00", 1)}


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Streaming dedup semantics across micro-batches: a duplicate key
    arriving within the watermark delay is suppressed; both variants
    equal batch DISTINCT on a single pass; re-emission beyond the
    delay is the documented within-watermark trade."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparkswift.streaming.ops import run_stream_to_batch, stream_dedup

    d = tmp_path / "dstream"
    d.mkdir()

    def write(path, rows):
        t = pa.table(
            {
                "ts": pa.array(
                    pd.to_datetime([r[0] for r in rows]), type=pa.timestamp("us")
                ),
                "k": pa.array([r[1] for r in rows]),
            }
        )
        pq.write_table(t, path)

    p1, p2 = str(d / "0.parquet"), str(d / "1.parquet")
    # batch 0: key 'a' twice (in-batch dup), key 'b' once
    write(p1, [("2024-01-01 10:00", "a"), ("2024-01-01 10:01", "a"),
               ("2024-01-01 10:30", "b")])
    # batch 1: 'a' again within the 2h delay → suppressed; 'c' is new
    write(p2, [("2024-01-01 11:00", "a"), ("2024-01-01 11:10", "c")])
    os.utime(p1, (1000, 1000))
    os.utime(p2, (2000, 2000))

    schema = spark.read.parquet(str(d)).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = run_stream_to_batch(
        stream_dedup(src, keys=["k"], ts_col="ts", watermark="2 hours"),
        mode="append",
    )
    assert sorted(r.k for r in out.select("k").collect()) == ["a", "b", "c"]

    # exact-dedup variant on the same source: identical answer
    out2 = run_stream_to_batch(
        stream_dedup(src, keys=["k"], ts_col="ts", within_watermark=False),
        mode="append",
    )
    assert sorted(r.k for r in out2.select("k").collect()) == ["a", "b", "c"]


def test_stream_to_parquet_equals_batch_write(spark, sf_dir, tmp_path):
    """File-sink streaming write lands the same rows as a batch write,
    hive-partitioned; a restart over the same checkpoint is a no-op
    (exactly-once via the sink log)."""
    from sparkswift.sources import load_table
    from sparkswift.streaming.ops import events_stream, stream_to_parquet

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src = events_stream(spark, sf_dir).select("event_id", "user_id", "event_type")
    stream_to_parquet(src, out, ckpt, partition_by=["event_type"])

    got = spark.read.parquet(out)
    want = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    assert got.count() == want.count()
    assert {r.event_id for r in got.collect()} == {r.event_id for r in want.collect()}
    # partition pruning is available to downstream scans
    import os

    assert any(d.startswith("event_type=") for d in os.listdir(out))
    # idempotent restart: no new files, no duplicate rows
    stream_to_parquet(src, out, ckpt, partition_by=["event_type"])
    assert spark.read.parquet(out).count() == want.count()


def test_stream_to_parquet_foreachbatch_merge(spark, sf_dir, tmp_path):
    """foreachBatch shape: the hook sees every micro-batch exactly
    once under AvailableNow on a fresh checkpoint."""
    from sparkswift.streaming.ops import events_stream, stream_to_parquet

    out = str(tmp_path / "m_out")
    ckpt = str(tmp_path / "m_ckpt")
    seen = []

    def merge(batch_df, epoch_id):
        seen.append((epoch_id, batch_df.count()))
        batch_df.write.mode("append").parquet(out)

    src = events_stream(spark, sf_dir).select("event_id", "value")
    stream_to_parquet(src, None, ckpt, merge_fn=merge)
    assert seen and sum(n for _, n in seen) == spark.read.parquet(out).count()


# --- stream_neardup ---------------------------------------------------------


def test_stream_neardup_matches_batch_twin_and_drops_planted_dups(
    spark, sf_dir, tmp_path
):
    """The surviving signature-key SET must equal the batch
    `distinct(sig_key)` regardless of arrival order, and planted
    exact-duplicate texts must collapse to one key."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparkswift.streaming.ops import run_stream_to_batch, stream_neardup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pdf = docs.toPandas()
    # plant exact duplicates of the first 5 docs under new ids
    dup = pdf.head(5).copy()
    dup["doc_id"] = dup["doc_id"] + 1_000_000
    full = pd.concat([pdf, dup], ignore_index=True)
    d = str(tmp_path / "docs_dir")
    os.makedirs(d)
    pq.write_table(pa.Table.from_pandas(full), os.path.join(d, "d.parquet"))

    schema = spark.read.parquet(os.path.join(d, "d.parquet")).schema
    src = spark.readStream.schema(schema).parquet(d)
    out = run_stream_to_batch(
        stream_neardup(src, "text", k=3, num_hashes=8).select("sig_key"),
        mode="append",
    ).toPandas()

    batch = spark.read.parquet(os.path.join(d, "d.parquet"))
    twin = (
        stream_neardup(batch, "text", k=3, num_hashes=8)
        .select("sig_key")
        .toPandas()
    )
    assert set(out["sig_key"]) == set(twin["sig_key"])
    assert out["sig_key"].is_unique
    # the 5 planted exact dups add ZERO new keys
    base_twin = (
        stream_neardup(docs, "text", k=3, num_hashes=8).select("sig_key").toPandas()
    )
    assert set(out["sig_key"]) == set(base_twin["sig_key"])


def test_stream_session_udf_matches_batch_and_is_chop_invariant(
    spark, sf_dir, tmp_path
):
    """stream_session_udf (arbitrary-UDF session aggregation) must
    emit, for every session closed by the final watermark, exactly the
    gaps-and-islands batch sessions with their exact medians — and the
    emitted set must not depend on how the stream was chopped into
    micro-batches (state + event-time timers carry open sessions
    across boundaries)."""
    import numpy as np

    from sparkswift.streaming.ops import stream_session_udf

    ev = load_table(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    import datetime

    bound_us = int(
        (max_ts - datetime.timedelta(hours=2, minutes=1))
        .replace(tzinfo=datetime.timezone.utc)
        .timestamp()
        * 1_000_000
    )

    def run(src):
        sess = stream_session_udf(
            src.withWatermark("ts", "2 hours"), gap_minutes=10
        )
        out = run_stream_to_batch(sess, mode="append").toPandas()
        out = out[out["session_end_us"] <= bound_us]
        return out.sort_values(["user_id", "session_start_us"]).reset_index(
            drop=True
        )

    # chopped: three files in TIME order (a real stream arrives
    # roughly ordered; an arbitrary id-stripe chop would put 2/3 of
    # the data behind the watermark, which correctly DROPS it — that
    # is watermark semantics, not a chop-invariance failure)
    src_dir = str(tmp_path / "sess_src")
    us = ev.select(F.unix_micros("ts").cast("double").alias("u"))
    q1, q2 = us.approxQuantile("u", [0.33, 0.66], 0.0)
    tertiles = [
        ev.filter(F.unix_micros("ts") <= q1),
        ev.filter((F.unix_micros("ts") > q1) & (F.unix_micros("ts") <= q2)),
        ev.filter(F.unix_micros("ts") > q2),
    ]
    for part in tertiles:
        part.coalesce(1).write.mode("append").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    chopped = run(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    whole = run(spark.readStream.schema(schema).parquet(src_dir))
    pd.testing.assert_frame_equal(chopped, whole)

    # batch reference: pandas gaps-and-islands + exact median
    pdf = ev.select("user_id", "ts", "value").toPandas()
    pdf["ts_ns"] = pdf["ts"].astype("int64")
    pdf["vq"] = np.round(pdf["value"].to_numpy() * 10000).astype("int64")
    rows = []
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values("ts_ns")
        ts = g["ts_ns"].to_numpy()
        vq = g["vq"].to_numpy()
        breaks = np.flatnonzero(np.diff(ts) >= 600 * 1_000_000_000) + 1
        for s, e in zip(
            np.concatenate(([0], breaks)), np.concatenate((breaks, [len(ts)]))
        ):
            end_us = ts[e - 1] // 1000 + 600 * 1_000_000
            if end_us <= bound_us:
                rows.append(
                    (
                        uid,
                        ts[s] // 1000,
                        end_us,
                        e - s,
                        float(np.median(vq[s:e]) / 10000.0),
                    )
                )
    want = (
        pd.DataFrame(
            rows,
            columns=[
                "user_id", "session_start_us", "session_end_us", "n",
                "med_value",
            ],
        )
        .astype(chopped.dtypes.to_dict())
        .sort_values(["user_id", "session_start_us"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(chopped, want)


def test_stream_asof_enrich_matches_batch_and_is_chop_invariant(
    spark, sf_dir, tmp_path
):
    """stream_asof_enrich (stream-stream as-of) must emit, for every
    click the final watermark closes, exactly the batch merge_asof
    match — independent pandas reference, not the engine's own
    asof_join — and the emitted set must not depend on how the stream
    was chopped into time-ordered micro-batches."""
    import datetime

    from sparkswift.streaming.ops import stream_asof_enrich

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    bound_us = int(
        (max_ts - datetime.timedelta(hours=2, minutes=1))
        .replace(tzinfo=datetime.timezone.utc)
        .timestamp()
        * 1_000_000
    )

    def run(make_src):
        out = run_stream_to_batch(
            stream_asof_enrich(
                make_src().filter(F.col("event_type") == "click"),
                make_src().filter(F.col("event_type") == "purchase"),
                watermark="2 hours",
            ),
            mode="append",
        ).toPandas()
        out = out[out["left_ts_us"] <= bound_us]
        return out.sort_values("event_id").reset_index(drop=True)

    src_dir = str(tmp_path / "asof_src")
    us = ev.select(F.unix_micros("ts").cast("double").alias("u"))
    q1, q2 = us.approxQuantile("u", [0.33, 0.66], 0.0)
    tertiles = [
        ev.filter(F.unix_micros("ts") <= q1),
        ev.filter((F.unix_micros("ts") > q1) & (F.unix_micros("ts") <= q2)),
        ev.filter(F.unix_micros("ts") > q2),
    ]
    for part in tertiles:
        part.coalesce(1).write.mode("append").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    chopped = run(
        lambda: spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    whole = run(lambda: spark.readStream.schema(schema).parquet(src_dir))
    pd.testing.assert_frame_equal(chopped, whole)

    # independent batch reference: pandas merge_asof per user
    pdf = ev.toPandas()
    clicks = (
        pdf[pdf.event_type == "click"][["event_id", "user_id", "ts"]]
        .sort_values("ts")
        .reset_index(drop=True)
    )
    purch = (
        pdf[pdf.event_type == "purchase"][["user_id", "ts", "value"]]
        .sort_values("ts")
        .reset_index(drop=True)
    )
    ref = pd.merge_asof(
        clicks, purch, on="ts", by="user_id", direction="backward"
    )
    ref["left_ts_us"] = ref["ts"].astype("int64") // 1000
    ref = (
        ref[ref["left_ts_us"] <= bound_us][
            ["event_id", "user_id", "left_ts_us", "value"]
        ]
        .rename(columns={"value": "matched_value"})
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    got = chopped[list(ref.columns)].astype(ref.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, ref)


def test_stream_funnel_matches_batch_and_is_chop_invariant(
    spark, sf_dir, tmp_path
):
    """stream_funnel must emit, for every funnel the final watermark
    closes, exactly the deadline-funnel a pure-python reference
    derives — once per user (tombstone law) — and the emitted set
    must not depend on the time-ordered chop."""
    import datetime

    from sparkswift.streaming.ops import stream_funnel

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    win_us = 7_200_000_000
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    bound_us = int(
        (max_ts - datetime.timedelta(hours=2, minutes=1))
        .replace(tzinfo=datetime.timezone.utc)
        .timestamp()
        * 1_000_000
    )

    def run(src):
        out = run_stream_to_batch(
            stream_funnel(
                src, ["view", "click", "purchase"], window="2 hours",
                watermark="2 hours",
            ),
            mode="append",
        ).toPandas()
        out = out[out["t1_us"] + win_us <= bound_us]
        return out.sort_values("user_id").reset_index(drop=True)

    src_dir = str(tmp_path / "fun_src")
    us = ev.select(F.unix_micros("ts").cast("double").alias("u"))
    q1, q2 = us.approxQuantile("u", [0.33, 0.66], 0.0)
    for part in (
        ev.filter(F.unix_micros("ts") <= q1),
        ev.filter((F.unix_micros("ts") > q1) & (F.unix_micros("ts") <= q2)),
        ev.filter(F.unix_micros("ts") > q2),
    ):
        part.coalesce(1).write.mode("append").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    chopped = run(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    whole = run(spark.readStream.schema(schema).parquet(src_dir))
    pd.testing.assert_frame_equal(chopped, whole)
    assert chopped["user_id"].is_unique  # tombstone: one funnel per key

    # independent pure-python deadline-funnel reference
    rows = ev.select(
        "user_id", F.unix_micros("ts").alias("t"), "event_type"
    ).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["t"], r["event_type"]))
    want = []
    for u, evs in by_user.items():
        t1 = min((t for t, ty in evs if ty == "view"), default=None)
        if t1 is None or t1 + win_us > bound_us:
            continue
        dl = t1 + win_us
        t2 = min(
            (t for t, ty in evs if ty == "click" and t1 < t <= dl), default=None
        )
        t3 = (
            min(
                (t for t, ty in evs if ty == "purchase" and t2 < t <= dl),
                default=None,
            )
            if t2 is not None
            else None
        )
        want.append(
            (u, t1, t2, t3, 1 + (t2 is not None) + (t3 is not None))
        )
    ref = (
        pd.DataFrame(
            want, columns=["user_id", "t1_us", "t2_us", "t3_us", "depth"]
        )
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    got = chopped[list(ref.columns)].astype(ref.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, ref)


def test_stream_pit_enrich_matches_batch_j12(spark, sf_dir):
    """st27 (stateless stream-static PIT join) emits exactly the
    batch j12 result — same events, same SCD2 dimension, same
    half-open boundary semantics, NULL pre-first-change rows
    included (non-vacuity asserted)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from sparkswift.suite_relational import j12_scd2_pointintime
    from sparkswift.suite_streaming import st27_stream_pit_enrich

    cols = ["event_id", "user_id", "probe_us", "state_30m_ago"]
    batch = (
        j12_scd2_pointintime(spark, sf_dir)
        .toPandas()[cols]
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    stream = (
        st27_stream_pit_enrich(spark, sf_dir)
        .toPandas()[cols]
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(stream, batch)
    assert stream["state_30m_ago"].isna().sum() > 0


def test_stream_cusum_carry_survives_chop(spark, sf_dir):
    """st32's law at pytest scale: a planted two-batch chop where the
    statistic is mid-accumulation at the boundary — the carry MUST
    persist across micro-batches or batch 2's first rows fold from
    zero and diverge."""
    import tempfile

    from sparkswift.operators.rolling import cusum_alerts
    from sparkswift.sources import load_table
    from sparkswift.streaming.ops import (
        run_stream_to_batch,
        stamp_slice_order,
        stream_cusum,
    )

    ev = load_table(spark, sf_dir, "events")
    A, H = 30_000, 200_000  # lower bar than the headline: more carry
    batch = {
        (r.user_id, r.event_id): (r.cusum, r.alert)
        for r in cusum_alerts(ev, allowance=A, threshold=H).collect()
    }
    prepared = ev.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("event_id").cast("bigint").alias("event_id"),
        F.unix_micros("ts").alias("t_us"),
        F.floor(F.col("value") * 1000).cast("bigint").alias("v_scaled"),
        F.dayofmonth("ts").alias("__day"),
    )
    base = tempfile.mkdtemp(prefix="cusum_chop_")
    seen: set[str] = set()
    for i, cond in enumerate((F.col("__day") <= 15, F.col("__day") > 15)):
        prepared.filter(cond).drop("__day").repartition(1).write.mode(
            "append"
        ).parquet(base)
        stamp_slice_order(base, seen, i)
    src = (
        spark.readStream.schema(spark.read.parquet(base).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )
    got = {
        (r.user_id, r.event_id): (r.cusum, r.alert)
        for r in run_stream_to_batch(
            stream_cusum(src, allowance=A, threshold=H), mode="append"
        ).collect()
    }
    assert got == batch
    # non-vacuity: some user's statistic is nonzero entering batch 2
    # (otherwise this test wouldn't distinguish carry from reset)
    by_user_last_b1 = {}
    for r in prepared.filter(F.col("__day") <= 15).collect():
        k = r.user_id
        cur = by_user_last_b1.get(k)
        if cur is None or (r.t_us, r.event_id) > cur[0]:
            by_user_last_b1[k] = ((r.t_us, r.event_id), r.event_id)
    assert any(
        batch[(u, eid)][0] > 0 for u, (_, eid) in by_user_last_b1.items()
    ), "chop boundary carries no state — test is vacuous"


def test_batch_count_sentinel_contract(spark):
    """The sentinel-row store contract (streaming/ops.py): a summary
    store carrying in-band per-batch count rows splits cleanly through
    the reader helpers — summary_rows never exposes the sentinel, and
    batch_counts recovers the total ingested row count."""
    from sparkswift.streaming.ops import (
        BATCH_COUNT_SENTINEL,
        batch_counts,
        summary_rows,
    )

    store = spark.createDataFrame(
        [(3, 10), (7, 20), (BATCH_COUNT_SENTINEL, 5), (0, 9),
         (BATCH_COUNT_SENTINEL, 8)],
        "item long, est long",
    )
    rows = summary_rows(store, "item").collect()
    assert {r.item for r in rows} == {0, 3, 7}
    assert all(r.item >= 0 for r in rows)  # the external-reader law
    assert batch_counts(store, "item", "est").collect()[0].n_rows == 13


def test_ephemeral_checkpoint_checksum_scoped(spark):
    """VERDICT r15 #3/#4: the session default for streaming-checkpoint
    checksums must stay Spark's (true); the disable is scoped to the
    suite's per-run temp checkpoints via ephemeral_checkpoint_conf and
    restored on exit."""
    from sparkswift.streaming.ops import ephemeral_checkpoint_conf

    key = ephemeral_checkpoint_conf.KEY
    assert spark.conf.get(key, "true") == "true"
    with ephemeral_checkpoint_conf(spark):
        assert spark.conf.get(key) == "false"
    assert spark.conf.get(key, "true") == "true"
