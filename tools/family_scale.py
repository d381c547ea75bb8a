"""Scale rehearsal for the shuffle-heaviest pipeline families
(VERDICT r13 #5): d13 line dedup, d11 fuzzy join, o8 cogrouped as-of
— each run at 1x and at 10 DISJOINT copies of the sf0.1 fixture, with
SELF-CHECKING totals (disjoint copies leave per-copy results
untouched, so every counted total must scale exactly 10x — a wrong
copy construction or a scale-dependent operator bug fails loudly,
and the wall ratio is attributable to volume alone; the
tools/graph_scale.py methodology). Plus the st24 stream-stream
left-outer STATE probe: max state-store rows captured from streaming
progress at two watermark horizons and two input rates — state must
scale with rate x horizon, never with corpus size.

The 1x baseline applies the SAME per-copy text/key transform (r=0
only), so the measured ratio excludes the transform's own cost.

Usage: python tools/family_scale.py [sf_dir] [d13|d11|o8|st24 ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def doc_copies(docs: DataFrame, k: int, line_suffix: bool) -> DataFrame:
    """k disjoint copies of documents: ids id*16+r; every LINE (or
    every TOKEN when line_suffix=False) suffixed with the copy id so
    no line/shingle ever matches across copies."""
    c = docs.select(
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("r"),
        "doc_id",
        "text",
    )
    # both modes suffix every TOKEN with the copy id: d13's word-level
    # units and d11's k-word shingles are then copy-local (no unit
    # ever matches across copies), while within-copy equality is
    # untouched — the 1x baseline applies the same r=0 suffix.
    del line_suffix
    txt = F.regexp_replace(
        "text", r"(\S+)", F.concat(F.lit("$1_"), F.col("r"))
    )
    return c.select(
        (F.col("doc_id") * 16 + F.col("r")).alias("doc_id"),
        txt.alias("text"),
    )


def rehearse_d13(spark, sf_dir: str) -> None:
    # the fixture's documents are single-line (~55 words, 0 newlines),
    # so the LINE unit is word-level here (line_sep=" ") — ~275k
    # dedup units at 1x / 2.75M at 10x, a real shuffle; the operator
    # path (posexplode -> xxhash64-keyed first-wins -> reassembly) is
    # identical to newline corpora. Suffixing makes units copy-local.
    from sparkswift.operators.dedup import line_dedup
    from sparkswift.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for k in (0, 1, 10):  # k=0: untimed warmup at 1x
        d = doc_copies(docs, max(1, k), line_suffix=True)
        t0 = time.time()
        out = line_dedup(d, line_sep=" ").agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_lines_kept").alias("kept"),
        ).collect()[0]
        dt = time.time() - t0
        if k == 0:
            continue
        print(
            f"d13 k={k}: docs={out['docs']} words_kept={out['kept']} "
            f"wall={dt:.1f}s"
        )
        if k == 1:
            base = (out["docs"], out["kept"], dt)
    assert out["docs"] == 10 * base[0] and out["kept"] == 10 * base[1], (
        "disjoint-copy self-check failed"
    )
    print(f"d13 wall ratio x{dt / base[2]:.2f} for x10 rows — self-check OK")


def rehearse_d11(spark, sf_dir: str) -> None:
    from sparkswift.operators.dedup import fuzzy_join
    from sparkswift.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for k in (1, 10):
        d = doc_copies(docs, k, line_suffix=False)
        right = d.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
        t0 = time.time()
        n = fuzzy_join(d, right, k=3, threshold=0.8).count()
        dt = time.time() - t0
        print(f"d11 k={k}: pairs={n} wall={dt:.1f}s")
        if k == 1:
            base = (n, dt)
    assert n == 10 * base[0], "disjoint-copy self-check failed"
    print(f"d11 wall ratio x{dt / base[1]:.2f} for x10 rows — self-check OK")


def rehearse_o8(spark, sf_dir: str) -> None:
    """o8's cogrouped as-of with user/event keys multiplied into 10
    disjoint copies — groups x10 at the same per-group size, probing
    the grouped-Arrow fixed overhead's scaling (the o8 cost anatomy:
    per-group UDF invocations dominate at tiny groups)."""
    import numpy as np
    import pandas as pd

    from sparkswift.operators.groupby import cogroup_apply
    from sparkswift.sources import load_table

    ev = load_table(spark, sf_dir, "events")

    def align(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # the o8 kernel (suite.py o8_cogroup_asof), verbatim semantics
        rt = right["ts"].to_numpy()
        if rt.size == 0:
            matched = np.full(len(left), np.nan)
        else:
            order = np.argsort(rt, kind="stable")
            rt = rt[order]
            vals = right["value"].to_numpy()[order]
            j = np.searchsorted(rt, left["ts"].to_numpy(), side="right") - 1
            matched = np.where(j >= 0, vals[np.clip(j, 0, None)], np.nan)
        out = left.copy()
        out["last_purchase_value"] = matched
        return out

    for k in (1, 10):
        c = ev.select(
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("r"),
            "event_id", "user_id", "ts", "event_type", "value",
        ).select(
            (F.col("event_id") * 16 + F.col("r")).alias("event_id"),
            (F.col("user_id") * 16 + F.col("r")).alias("user_id"),
            "ts", "event_type", "value",
        )
        clicks = c.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        purchases = c.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "value"
        )
        t0 = time.time()
        out = cogroup_apply(
            clicks, purchases, ["user_id"], align,
            "event_id bigint, user_id bigint, ts timestamp, "
            "last_purchase_value double",
        )
        res = out.agg(
            F.count(F.lit(1)).alias("rows"),
            F.count("last_purchase_value").alias("matched"),
        ).collect()[0]
        dt = time.time() - t0
        print(
            f"o8 k={k}: rows={res['rows']} matched={res['matched']} "
            f"wall={dt:.1f}s"
        )
        if k == 1:
            base = (res["rows"], res["matched"], dt)
    assert res["rows"] == 10 * base[0] and res["matched"] == 10 * base[1], (
        "disjoint-copy self-check failed"
    )
    print(f"o8 wall ratio x{dt / base[2]:.2f} for x10 groups — self-check OK")


def probe_st24_state(spark, sf_dir: str) -> None:
    """Stream-stream left-outer state growth: run st24's join shape
    over 24 time-ordered slice files (maxFilesPerTrigger=1, stamped
    mtimes; the 30-day fixture => ~1.25-day slices) and record the
    MAX state rows from streaming progress at (rate 1x, delay 5d),
    (rate 1x, delay 12h) and (rate 10x, delay 5d). The law: state
    scales with rate x watermark horizon (delay + interval width,
    floored by one slice width — eviction runs at batch end, so a
    single slice's rows always transit state), never with corpus
    size — the short-horizon run must shrink state toward the slice
    floor, the rate run must scale it ~linearly."""
    import tempfile
    import uuid

    from sparkswift.sources import load_table
    from sparkswift.streaming.ops import stamp_slice_order

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )

    def run(k: int, delay: str) -> tuple[int, int]:
        c = ev.select(
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("r"),
            "event_id", "user_id", "ts", "event_type", "value",
        ).select(
            (F.col("event_id") * 16 + F.col("r")).alias("event_id"),
            (F.col("user_id") * 16 + F.col("r")).alias("user_id"),
            "ts", "event_type", "value",
        )
        base = tempfile.mkdtemp(prefix="st24_scale_")
        src_dir = f"{base}/src"
        n_slices, seen = 24, set()
        bounds = c.agg(
            F.min(F.unix_micros("ts")).alias("lo"),
            F.max(F.unix_micros("ts")).alias("hi"),
        ).collect()[0]
        lo, span = bounds["lo"], max(1, bounds["hi"] - bounds["lo"] + 1)
        for i in range(n_slices):
            c.filter(
                F.least(
                    F.lit(n_slices - 1),
                    ((F.unix_micros("ts") - F.lit(lo)) * n_slices / F.lit(span))
                    .cast("long"),
                )
                == i
            ).repartition(1).write.mode("append").parquet(src_dir)
            stamp_slice_order(src_dir, seen, i)
        schema = spark.read.parquet(src_dir).schema
        mk = lambda: (  # noqa: E731
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        clicks = (
            mk().filter(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("click_id"), "user_id",
                F.col("ts").alias("click_ts"),
            )
            .withWatermark("click_ts", delay)
        )
        purchases = (
            mk().filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user_id"),
                F.col("ts").alias("purchase_ts"),
                F.col("value").alias("purchase_value"),
            )
            .withWatermark("purchase_ts", delay)
        )
        joined = clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
            "left_outer",
        )
        name = "st24p_" + uuid.uuid4().hex[:10]
        q = (
            joined.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        max_state = max(
            (
                so["numRowsTotal"]
                for p in q.recentProgress
                for so in (p.get("stateOperators") or [])
            ),
            default=0,
        )
        n_out = spark.table(name).count()
        return max_state, n_out

    s1, n1 = run(1, "5 days")
    s2, n2 = run(1, "12 hours")
    s3, n3 = run(10, "5 days")
    print(f"st24 state: rate1x delay5d  max_state={s1} out={n1}")
    print(f"st24 state: rate1x delay12h max_state={s2} out={n2}")
    print(f"st24 state: rate10x delay5d max_state={s3} out={n3}")
    assert s2 < 0.5 * s1, "shrinking the horizon 10x must shrink state"
    assert n3 == 10 * n1, "disjoint-key self-check failed"
    print(
        f"st24 horizon ratio {s1 / max(1, s2):.2f} (delay 10x), "
        f"rate ratio {s3 / max(1, s1):.2f} (rate 10x) — "
        "state follows rate x horizon, not corpus size"
    )


def main() -> None:
    from sparkswift.session import get_spark

    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and "/" in args[0]:
        sf_dir, args = args[0], args[1:]
    fams = args or ["d13", "d11", "o8", "st24"]
    spark = get_spark("family-scale")
    spark.sparkContext.setLogLevel("ERROR")
    for fam in fams:
        {
            "d13": rehearse_d13,
            "d11": rehearse_d11,
            "o8": rehearse_o8,
            "st24": probe_st24_state,
        }[fam](spark, sf_dir)


if __name__ == "__main__":
    main()
