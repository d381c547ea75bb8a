"""Deterministic sampling/splitting, decontamination, repetition,
and PII redaction — the pipeline ops a training-data run needs."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkswift.operators import sampling as sp
from sparkswift.operators import text as tx
from sparkswift.operators.dedup import decontaminate
from sparkswift.sources import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_sample_deterministic_and_partition_invariant(docs):
    a = {r.doc_id for r in sp.deterministic_sample(docs, "doc_id", 0.2).collect()}
    b = {
        r.doc_id
        for r in sp.deterministic_sample(
            docs.repartition(13), "doc_id", 0.2
        ).collect()
    }
    assert a == b and len(a) > 0
    # nested: a 10% sample is a subset of the 20% sample (same seed) —
    # the property that lets you grow a sample without resampling
    c = {r.doc_id for r in sp.deterministic_sample(docs, "doc_id", 0.1).collect()}
    assert c <= a


def test_sample_rate_accuracy(spark):
    n = 100_000
    ids = spark.range(n).withColumnRenamed("id", "k")
    got = sp.deterministic_sample(ids, "k", 0.25).count()
    assert abs(got / n - 0.25) < 0.01


def test_hash_split_disjoint_exhaustive_stable(docs):
    out = sp.hash_split(docs, "doc_id").select("doc_id", "split").toPandas()
    assert set(out["split"]) <= {"train", "val", "test"}
    assert len(out) == out["doc_id"].nunique()  # one split per doc
    # growing the corpus must not move existing assignments
    half = docs.filter(F.col("doc_id") % 2 == 0)
    sub = sp.hash_split(half, "doc_id").select("doc_id", "split").toPandas()
    merged = sub.merge(out, on="doc_id", suffixes=("_sub", "_full"))
    assert (merged["split_sub"] == merged["split_full"]).all()


def test_hash_split_proportions(spark):
    ids = spark.range(100_000).withColumnRenamed("id", "k")
    counts = {
        r.split: r["count"]
        for r in sp.hash_split(ids, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
        .groupBy("split")
        .count()
        .collect()
    }
    assert abs(counts["train"] / 100_000 - 0.8) < 0.01
    assert abs(counts["val"] / 100_000 - 0.1) < 0.01


def test_decontaminate_flags_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words here nothing shared at all"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "we ask about the quick brown fox in this benchmark")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.contaminated for r in decontaminate(train, bench).collect()}
    assert out == {1: True, 2: False}


def test_decontaminate_broadcasts_benchmark(docs, spark):
    bench = docs.limit(20)
    plan = (
        decontaminate(docs, bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan  # corpus side must not shuffle


def test_repetition_metrics(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam"), (2, "all words are unique here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in tx.repetition_metrics(df, "text", k=2).collect()}
    assert out[1].ngrams_total == 4 and out[1].ngrams_distinct == 1
    assert out[1].dup_ngram_frac == 0.75
    assert out[2].dup_ngram_frac == 0.0


def test_pii_redact(spark):
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.io or call 555-123-4567 from 10.1.2.3 now")],
        "doc_id long, text string",
    )
    got = tx.pii_redact(df, "text").collect()[0].text
    assert got == "mail [EMAIL] or call [PHONE] from [IP] now"


def test_stratified_sample_rates(spark):
    ids = spark.range(60_000).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("g")
    )
    out = sp.stratified_sample(
        ids, "k", "g", rates={"0": 0.5, "1": 0.1}, default_rate=0.0
    )
    counts = {r.g: r["count"] for r in out.groupBy("g").count().collect()}
    assert abs(counts["0"] / 20_000 - 0.5) < 0.02
    assert abs(counts["1"] / 20_000 - 0.1) < 0.02
    assert "2" not in counts  # default_rate=0 drops the stratum


def test_bloom_decontaminate_no_false_negatives(spark, sf_dir):
    """Bloom variant must flag a SUPERSET of the exact operator's
    contaminated docs (false negatives impossible — the property that
    matters for decontamination) with a bounded FP rate."""
    from pyspark.sql import functions as F

    from sparkswift.operators import dedup as dd
    from sparkswift.operators import sampling as sp
    from sparkswift.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    thr = sp.hex_threshold(0.1)
    bucket = sp.hash_bucket_hex("doc_id", seed=1)
    bench = docs.filter(bucket < F.lit(thr))
    train = docs.filter(bucket >= F.lit(thr))
    exact = {
        r.doc_id: r.contaminated
        for r in dd.decontaminate(train, bench, "text", "doc_id").collect()
    }
    bloom = {
        r.doc_id: r.contaminated
        for r in dd.decontaminate_bloom(
            train, bench, "text", "doc_id", fpp=0.001
        ).collect()
    }
    assert set(bloom) == set(exact)
    false_neg = [k for k, v in exact.items() if v and not bloom[k]]
    assert false_neg == []
    false_pos = [k for k, v in exact.items() if not v and bloom[k]]
    clean = max(1, sum(1 for v in exact.values() if not v))
    assert len(false_pos) / clean <= 0.05


def test_bloom_sliced_build_driver_traffic(spark, monkeypatch):
    """The slice-partitioned build is bounded: ≤ build_partitions slice
    rows reach the driver — totaling exactly ONE bitmap's bytes, not
    build_partitions full bitmaps — no matter how finely the benchmark
    side is partitioned (spy on the collect)."""
    from pyspark.sql.classic.dataframe import DataFrame

    from sparkswift.operators import dedup as dd

    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta epsilon zeta "), F.col("id")).alias(
            "text"
        ),
    )
    bench = docs.repartition(37).filter(F.col("doc_id") < 8)

    slice_rows: list[list] = []
    orig_collect = DataFrame.collect

    def spy_collect(self):
        rows = orig_collect(self)
        if self.columns == ["sl", "bm"]:  # the slice-bitmap frame
            slice_rows.append(rows)
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy_collect)
    out = dd.decontaminate_bloom(docs, bench, "text", "doc_id", build_partitions=4)
    flagged = out.filter("contaminated").count()
    assert flagged >= 8  # bench docs flag themselves (no false negatives)
    assert slice_rows and len(slice_rows[0]) <= 4, [len(x) for x in slice_rows]
    # slices are disjoint equal-size segments: total driver bytes is
    # (#slices/P) of ONE bitmap, never P × bitmap
    sls = [r.sl for r in slice_rows[0]]
    assert len(sls) == len(set(sls))
    seg_lens = {len(r.bm) for r in slice_rows[0]}
    assert len(seg_lens) == 1


def test_c4_line_filter_rules(spark):
    """Line rules bite independently: word count, bad words, terminal
    punctuation; doc-level min_lines_kept drops hollow docs."""
    rows = [
        (1, "the quick brown fox jumps high today.\nshort line\n"
            "another perfectly fine long sentence here!\nbuy cheap pills now okay then"),
        (2, "tiny\nbits\nonly"),
        (3, "one single acceptable sentence stands alone."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tx.c4_line_filter(
        df,
        min_words=5,
        bad_words=("pills",),
        require_terminal_punct=True,
        min_lines_kept=1,
    ).toPandas().set_index("doc_id")
    # doc 1: line1 ok; 'short line' too few words; line3 ok; pills line dropped
    assert out.loc[1, "n_lines_kept"] == 2
    assert out.loc[1, "clean_text"].count("\n") == 1
    # doc 2: nothing survives -> dropped entirely
    assert 2 not in out.index
    assert out.loc[3, "n_lines_kept"] == 1
    # without terminal-punct rule the 5-word bad-word-free lines return
    loose = tx.c4_line_filter(
        df, min_words=5, bad_words=("pills",), require_terminal_punct=False
    ).toPandas().set_index("doc_id")
    assert loose.loc[1, "n_lines_kept"] == 2
    assert 2 not in loose.index


def test_deterministic_shuffle_is_total_permutation(docs):
    out = sp.deterministic_shuffle(docs, "doc_id").select("doc_id", "shuffle_pos")
    pdf = out.toPandas()
    n = len(pdf)
    assert sorted(pdf.shuffle_pos) == list(range(n))
    # partition-invariant: identical positions on a different layout
    again = (
        sp.deterministic_shuffle(docs.repartition(17), "doc_id")
        .select("doc_id", "shuffle_pos")
        .toPandas()
    )
    merged = pdf.merge(again, on="doc_id", suffixes=("_a", "_b"))
    assert (merged.shuffle_pos_a == merged.shuffle_pos_b).all()
    # order actually follows the md5 key (spot-check endpoints)
    import hashlib

    keyed = sorted(
        pdf.doc_id, key=lambda i: (hashlib.md5(f"0:{i}".encode()).hexdigest(), i)
    )
    want = {d: p for p, d in enumerate(keyed)}
    assert all(want[r.doc_id] == r.shuffle_pos for r in pdf.itertuples())


def test_group_split_no_leakage(docs):
    """Keying the split on `source` must put every doc of a source in
    one split — the property that stops near-dup train/test leakage."""
    out = sp.hash_split(docs, "source").select("source", "split").distinct()
    per_source = out.groupBy("source").count().toPandas()
    assert (per_source["count"] == 1).all()


def test_normalize_text_unicode_forms(spark):
    """NFC composition, casefold, and whitespace collapse against the
    Python unicodedata reference on genuinely decomposed input."""
    import unicodedata

    decomposed = "Café  du   Monde"  # e + combining acute, runs of spaces
    df = spark.createDataFrame([(1, decomposed)], "doc_id long, text string")
    got = tx.normalize_text(df, "text").collect()[0].text
    want = unicodedata.normalize("NFC", "café du monde")
    assert got == want
    assert "́" not in got  # composed: é is one codepoint now
    # form passthrough: NFD re-decomposes
    nfd = tx.normalize_text(df, "text", form="NFD").collect()[0].text
    assert "́" in nfd


def test_percentile_approx_accuracy(spark, sf_dir):
    """The sketch quantiles must sit within 1% relative error of the
    exact ones at 10k accuracy on the fixture."""
    li = load_table(spark, sf_dir, "lineitem")
    approx = {
        r.l_returnflag: r.approx_price_q
        for r in li.groupBy("l_returnflag")
        .agg(F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10_000)
             .alias("approx_price_q"))
        .collect()
    }
    exact = {
        r.l_returnflag: r.q
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").alias("q"))
        .collect()
    }
    for flag, aq in approx.items():
        for a, e in zip(aq, exact[flag]):
            assert abs(a - e) / e < 0.01, (flag, a, e)


def test_mixture_sample_hits_target_proportions(spark, sf_dir):
    """Output proportions track the integer weights (hash thresholding
    is ~binomial per group: allow a loose band), never upsamples, and
    groups outside the weights vanish."""
    from sparkswift.operators.sampling import mixture_sample
    from sparkswift.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    weights = {"en": 3, "de": 1}
    out = mixture_sample(docs, "doc_id", "lang", weights)
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert set(got) <= {"en", "de"}
    avail = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert got.get("en", 0) <= avail["en"] and got.get("de", 0) <= avail["de"]
    # the binding group (smallest n/w) keeps ~everything; ratio ≈ 3:1
    ratio = got["en"] / max(1, got["de"])
    assert 1.5 < ratio < 6.0, got


def test_mixture_sample_deterministic_and_subset_stable(spark, sf_dir):
    """Same inputs → identical rows on rerun; the kept set of a group
    only grows when that group's threshold grows."""
    from sparkswift.operators.sampling import mixture_sample
    from sparkswift.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    w = {"en": 2, "de": 1}
    a = sorted(r.doc_id for r in mixture_sample(docs, "doc_id", "lang", w).collect())
    b = sorted(r.doc_id for r in mixture_sample(docs, "doc_id", "lang", w).collect())
    assert a == b and a


def test_mixture_sample_rejects_bad_weights(spark, sf_dir):
    from sparkswift.operators.sampling import mixture_sample
    from sparkswift.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        mixture_sample(docs, "doc_id", "lang", {"en": -1})


def test_dedup_incremental_batches_equal_global_dedup(spark, sf_dir, tmp_path):
    """Feeding batches sequentially through the store yields exactly
    the survivors a single global exact-dedup pass would keep."""
    from sparkswift.operators import dedup as dd
    from sparkswift.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = docs.unionByName(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    store = str(tmp_path / "fps")
    mid = 100000  # originals first, duplicates second
    got1 = dd.dedup_incremental(
        doubled.filter(F.col("doc_id") < mid), store
    ).select("doc_id").toPandas()
    got2 = dd.dedup_incremental(
        doubled.filter(F.col("doc_id") >= mid), store
    ).select("doc_id").toPandas()
    want = dd.dedup_exact(doubled, "text", "doc_id").select("doc_id").toPandas()
    got = sorted([*got1["doc_id"], *got2["doc_id"]])
    assert got == sorted(want["doc_id"])
    assert len(got2) == 0  # every batch-2 text already in the store


def test_cap_per_group_matches_pandas(docs):
    """≤ n rows per group, chosen by the order columns (deterministic
    tiebreak), equal to the pandas groupby head-after-sort."""
    from sparkswift.operators.sampling import cap_per_group

    got = (
        cap_per_group(docs, "source", 3, [F.col("n_chars").desc(), F.col("doc_id")])
        .select("doc_id").toPandas()["doc_id"].sort_values().tolist()
    )
    pdf = docs.select("doc_id", "source", "n_chars").toPandas()
    want = (
        pdf.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        .groupby("source").head(3)["doc_id"].sort_values().tolist()
    )
    assert got == want
    counts = (
        cap_per_group(docs, "source", 3, [F.col("doc_id")])
        .groupBy("source").count().toPandas()["count"]
    )
    assert (counts <= 3).all()


def test_dedup_incremental_bucketed_store_skips_store_shuffle(spark, sf_dir):
    """Bucketed-store variant: same survivors as the path store, and
    the anti-join plan has NO Exchange on the store side (the bucketed
    table pre-satisfies the join distribution)."""
    import uuid

    from sparkswift.operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tbl = f"fp_store_{uuid.uuid4().hex[:8]}"
    try:
        first = docs.filter(F.col("doc_id") < 200)
        dd.dedup_incremental(first, tbl, bucketed=True, num_buckets=8).count()
        batch2 = docs.filter(F.col("doc_id") >= 200).unionByName(
            first.select((F.col("doc_id") + 900000).alias("doc_id"), "text")
        )
        out = dd.dedup_incremental(batch2, tbl, bucketed=True, num_buckets=8,
                                   update_store=False)
        got = sorted(r.doc_id for r in out.collect())
        want = sorted(
            r.doc_id for r in docs.filter(F.col("doc_id") >= 200).collect()
        )
        assert got == want  # re-ingested copies all dropped via the store
        # the store side of the anti-join must not re-shuffle
        plan = out._jdf.queryExecution().executedPlan().toString()
        import re

        store_scans = plan.count(f"Scan parquet spark_catalog.default.{tbl}")
        assert store_scans >= 1
        # no exchange directly over the bucketed scan: bucketed side
        # feeds the SortMergeJoin without hashpartitioning on fp
        assert re.search(
            rf"Exchange hashpartitioning\(__fp[^\n]*\n[^\n]*Scan parquet spark_catalog.default.{tbl}",
            plan,
        ) is None
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_quantile_bins_matches_pandas_qcut_semantics(docs):
    """Per-group ntile bins: sizes differ by at most one within each
    group, higher bins hold higher values, deterministic across runs."""
    from sparkswift.operators.sampling import quantile_bins

    scored = docs.select("doc_id", "lang", F.col("n_chars").cast("double").alias("v"))
    out = quantile_bins(scored, "v", 4, partition_by=["lang"], tiebreak="doc_id")
    pdf = out.toPandas()
    for lang, grp in pdf.groupby("lang"):
        sizes = grp["bin"].value_counts()
        assert sizes.max() - sizes.min() <= 1
        # bin boundaries are monotone: max(v) of bin k <= min(v) of bin k+1
        # (ties broken by doc_id may interleave equal values only)
        maxes = grp.groupby("bin")["v"].max()
        mins = grp.groupby("bin")["v"].min()
        for k in range(1, 4):
            assert maxes[k] <= mins[k + 1] or maxes[k] == mins[k + 1]
    again = quantile_bins(
        scored, "v", 4, partition_by=["lang"], tiebreak="doc_id"
    ).toPandas().sort_values("doc_id")
    assert (pdf.sort_values("doc_id")["bin"].to_numpy() == again["bin"].to_numpy()).all()


# --- interleave_order -------------------------------------------------------


def test_interleave_keys_unique_and_slots_respect_weights(spark):
    from sparkswift.operators.sampling import interleave_order

    rows = [(i, "a" if i % 4 != 3 else "b") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = interleave_order(df, "doc_id", "grp", {"a": 3, "b": 1}).toPandas()
    assert out["order_key"].is_unique
    # W=4: slot = key % 4; group a owns slots 0-2, b owns slot 3
    slots = out["order_key"] % 4
    assert set(slots[out["grp"] == "a"]) <= {0, 1, 2}
    assert set(slots[out["grp"] == "b"]) == {3}
    # while both groups are alive (first 10 rounds have 30 a's and 10
    # b's available), every round is 3 a's + 1 b — keys are DENSE
    first_rounds = out[out["order_key"] < 40]
    assert len(first_rounds) == 40


def test_interleave_matches_plain_window_reference(spark):
    """The bucketed per-group index must equal a single-window
    row_number over the same (md5, id) order."""
    import hashlib

    from sparkswift.operators.sampling import interleave_order

    rows = [(i, ["x", "y", "z"][i % 3]) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    weights = {"x": 2, "y": 1, "z": 1}
    out = (
        interleave_order(df, "doc_id", "grp", weights, seed=7)
        .toPandas()
        .set_index("doc_id")
    )
    W, offs = 4, {"x": 0, "y": 2, "z": 3}
    by_grp: dict[str, list[int]] = {}
    for i, g in rows:
        by_grp.setdefault(g, []).append(i)
    for g, ids in by_grp.items():
        ordered = sorted(
            ids, key=lambda d: (hashlib.md5(f"7:{d}".encode()).hexdigest(), d)
        )
        for idx, d in enumerate(ordered):
            expect = (idx // weights[g]) * W + offs[g] + idx % weights[g]
            assert out.loc[d, "order_key"] == expect, (g, d)


def test_interleave_drops_unweighted_groups(spark):
    from sparkswift.operators.sampling import interleave_order

    df = spark.createDataFrame(
        [(1, "keep"), (2, "drop")], "doc_id long, grp string"
    )
    out = interleave_order(df, "doc_id", "grp", {"keep": 1}).toPandas()
    assert list(out["grp"]) == ["keep"]


# --- quantile_bins_global ---------------------------------------------------


def test_quantile_bins_global_properties(spark):
    """Monotone in value, equal values share a bin, populations within
    the sketch tolerance of n/n_bins."""
    import numpy as np

    from sparkswift.operators.sampling import quantile_bins_global

    vals = [(i, float((i * 37) % 1000)) for i in range(2000)]
    df = spark.createDataFrame(vals, "id long, v double")
    out = quantile_bins_global(df, "v", 4, accuracy=1e-5).toPandas()
    assert set(out["bin"]) == {1, 2, 3, 4}
    s = out.sort_values("v")
    assert (np.diff(s["bin"].to_numpy()) >= 0).all()  # monotone
    assert (out.groupby("v")["bin"].nunique() == 1).all()  # cohesion
    pops = out.groupby("bin").size()
    for b in (1, 2, 3, 4):
        assert abs(pops[b] - 500) <= 2, pops.to_dict()


def test_quantile_bins_global_no_shuffle_of_data(spark):
    """The bin assignment itself must be a scan-side projection — no
    Exchange in the plan below the CASE (the sketch agg is a separate
    tiny job inside approxQuantile, not part of this plan)."""
    from sparkswift.operators.sampling import quantile_bins_global

    df = spark.range(1000).withColumn("v", (F.col("id") % 97).cast("double"))
    out = quantile_bins_global(df, "v", 4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_dataset_diff_statuses(spark):
    import pandas as pd

    from sparkswift.operators.profile import dataset_diff

    old = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a", "b", "c"]})
    )
    new = spark.createDataFrame(
        pd.DataFrame({"doc_id": [2, 3, 4], "text": ["b", "c2", "d"]})
    )
    out = (
        dataset_diff(old, new).orderBy("doc_id").toPandas().set_index("doc_id")
    )
    assert out.loc[1, "status"] == "removed"
    assert out.loc[2, "status"] == "unchanged"
    assert out.loc[3, "status"] == "changed"
    assert out.loc[4, "status"] == "added"


def test_skew_report_flags_planted_hot_key(spark):
    import pandas as pd

    from sparkswift.operators.profile import skew_report

    rows = [{"k": 1}] * 90 + [{"k": i} for i in range(2, 12)]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = skew_report(df, "k", top_n=3).toPandas()
    assert out.loc[0, "key"] == 1
    assert out.loc[0, "n_rows"] == 90
    assert out.loc[0, "share"] == 0.9
    # 11 keys, 100 rows: mean = 100/11; ratio = 90 / (100/11) = 9.9
    assert out.loc[0, "skew_ratio"] == 90 * 11 / 100


def test_histogram_bins_and_overflow(spark):
    import pandas as pd

    from sparkswift.operators.profile import histogram

    df = spark.createDataFrame(
        pd.DataFrame({"v": [-5.0, 0.0, 4.9, 5.0, 9.9, 10.0, 25.0]})
    )
    out = histogram(df, "v", 0.0, 10.0, 2).orderBy("bin").toPandas().set_index("bin")
    assert out.loc[0, "n_rows"] == 1  # underflow (-5)
    assert out.loc[1, "n_rows"] == 2  # [0, 5): 0.0, 4.9
    assert out.loc[2, "n_rows"] == 2  # [5, 10): 5.0, 9.9
    assert out.loc[3, "n_rows"] == 2  # overflow: 10.0, 25.0
    assert out.loc[1, "lo_edge"] == 0.0 and out.loc[1, "hi_edge"] == 5.0


def test_preference_pairs_max_margin_and_no_reuse(spark):
    import pandas as pd

    from sparkswift.operators.sampling import preference_pairs

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5],
                "g": ["a"] * 5,
                "score": [10.0, 40.0, 30.0, 20.0, 30.0],
            }
        )
    )
    out = preference_pairs(df, "score", "g").orderBy("pair_rank").toPandas()
    # best(40,#2) ↔ worst(10,#1); 2nd-best(30,#5 by id-desc tiebreak)
    # ↔ 2nd-worst(20,#4); middle (30,#3) sits out
    assert len(out) == 2
    assert (out["margin"] > 0).all()
    assert out.loc[0, "chosen_id"] == 2 and out.loc[0, "rejected_id"] == 1
    assert out.loc[1, "chosen_id"] == 5 and out.loc[1, "rejected_id"] == 4
    used = set(out["chosen_id"]) | set(out["rejected_id"])
    assert len(used) == 2 * len(out)  # each doc in at most one pair


def test_preference_pairs_drop_zero_margin(spark):
    import pandas as pd

    from sparkswift.operators.sampling import preference_pairs

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "g": ["a", "a"], "score": [5.0, 5.0]})
    )
    assert preference_pairs(df, "score", "g").count() == 0


def test_heavy_hitters_guarantees_under_any_layout(spark):
    """Misra-Gries contract: under EVERY partition layout, all items
    with true freq > n/(k+1) are reported, estimates never exceed the
    truth, and undercount ≤ n/(k+1). A Zipf-ish synthetic stream with
    planted hot keys."""
    import pandas as pd

    from sparkswift.operators.profile import heavy_hitters

    rows = []
    for i in range(3000):
        rows.append(i % 7 if i % 3 else 999)  # key 999 hot (~1/3)
    pdf = pd.DataFrame({"key": rows})
    n = len(rows)
    truth = pdf["key"].value_counts().to_dict()
    k = 8
    for parts in (1, 4, 13):
        df = spark.createDataFrame(pdf).repartition(parts)
        got = {
            r.item: r.est for r in heavy_hitters(df, "key", k=k).collect()
        }
        assert len(got) <= k
        for item, true_cnt in truth.items():
            if true_cnt > n / (k + 1):
                assert item in got, (parts, item)
        for item, est in got.items():
            assert est <= truth[item]
            assert truth[item] - est <= n / (k + 1)


def test_heavy_hitters_exact_when_cardinality_below_k(spark):
    """With fewer distinct items than k, no counter is ever evicted —
    the sketch IS the exact count table."""
    import pandas as pd

    from sparkswift.operators.profile import heavy_hitters

    pdf = pd.DataFrame({"key": [i % 5 for i in range(1000)]})
    df = spark.createDataFrame(pdf).repartition(3)
    got = {r.item: r.est for r in heavy_hitters(df, "key", k=16).collect()}
    assert got == pdf["key"].value_counts().to_dict()


def test_merge_heavy_hitters_chop_invariant_guarantees(spark):
    """Mergeable-summaries contract (Agarwal et al. 2012): per-slice
    MG summaries merged with merge_heavy_hitters keep the GLOBAL
    guarantees for every way of chopping the data — all items with
    total freq > n/(k+1) survive the merge, est <= true, undercount
    <= n/(k+1) — and the merged summary stays <= k rows."""
    import pandas as pd

    from sparkswift.operators.profile import heavy_hitters, merge_heavy_hitters

    rows = [i % 7 if i % 3 else 999 for i in range(3000)]
    rows += [421] * 400  # second hot key, concentrated in the tail
    pdf = pd.DataFrame({"key": rows})
    n = len(rows)
    truth = pdf["key"].value_counts().to_dict()
    k = 8
    for n_slices in (2, 3, 5):
        summaries = None
        for s in range(n_slices):
            sl = spark.createDataFrame(pdf.iloc[s::n_slices]).repartition(3)
            part = heavy_hitters(sl, "key", k=k)
            summaries = part if summaries is None else summaries.unionByName(part)
        got = {
            r.item: r.est
            for r in merge_heavy_hitters(summaries, k=k).collect()
        }
        assert len(got) <= k, n_slices
        for item, true_cnt in truth.items():
            if true_cnt > n / (k + 1):
                assert item in got, (n_slices, item)
        for item, est in got.items():
            assert est <= truth[item], (n_slices, item)
            assert truth[item] - est <= n / (k + 1), (n_slices, item)


def test_neardup_incremental_torn_store_pair_raises(spark, sf_dir):
    """A half-written store pair (one table of the two) must raise
    loudly instead of silently re-bootstrapping — the silent path
    would orphan every earlier winner from the cross-batch probe."""
    import uuid

    import pytest as _pytest

    from sparkswift.operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    store = f"nd_torn_{uuid.uuid4().hex[:8]}"
    try:
        dd.neardup_incremental(
            docs.limit(50), store, bucketed=True, num_buckets=4
        )
        spark.sql(f"DROP TABLE {store}_sigs")  # tear the pair
        with _pytest.raises(RuntimeError, match="half-written"):
            dd.neardup_incremental(
                docs.limit(50), store, bucketed=True, num_buckets=4
            )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {store}_sigs")
        spark.sql(f"DROP TABLE IF EXISTS {store}_buckets")


def test_quantile_summary_laws_under_any_layout_and_chop(spark):
    """Mergeable rank-sketch contract: for EVERY partition layout and
    EVERY chop of the data into separately-summarized slices, the
    merged summary satisfies (a) SUM(weight) == n (exactly-once),
    (b) for each estimated phi-quantile v*: count(x <= v*) >= phi*n
    and count(x < v*) < phi*n + E with E the summary's self-carried
    SUM(err) certificate."""
    import numpy as np
    import pandas as pd

    from sparkswift.operators.profile import (
        merge_quantile_summaries,
        quantile_summary,
    )

    rng = np.random.RandomState(7)
    # heavy ties + skew: integers from a lognormal, plus a hot value
    vals = np.floor(rng.lognormal(3.0, 1.0, 4000)).astype(float)
    vals[:800] = 42.0
    pdf = pd.DataFrame({"v": vals})
    n = len(pdf)
    probs = [0.1, 0.25, 0.5, 0.9, 0.99, 1.0]
    srt = np.sort(vals)

    for parts, n_slices in ((1, 1), (4, 2), (13, 3)):
        summaries = None
        for s in range(n_slices):
            sl = spark.createDataFrame(pdf.iloc[s::n_slices]).repartition(parts)
            part = quantile_summary(sl, "v", k=16)
            summaries = part if summaries is None else summaries.unionByName(part)
        est = merge_quantile_summaries(summaries, probs).collect()
        assert len(est) == len(probs)
        assert [r.phi for r in est] == sorted(probs)
        assert est[0].n_rows == n
        e = est[0].e_bound
        assert 0 < e
        for r in est:
            cnt_le = int((srt <= r.est).sum())
            cnt_lt = int((srt < r.est).sum())
            assert cnt_le >= r.phi * n, (parts, n_slices, r)
            assert cnt_lt < r.phi * n + e, (parts, n_slices, r)
        # estimates are actual data values
        data = set(srt.tolist())
        assert all(r.est in data for r in est)


def test_quantile_summary_exact_when_k_exceeds_n(spark):
    """With k >= n every chunk is a single element: the summary IS
    the sorted data (weight 1 each) and estimates are exact order
    statistics."""
    import pandas as pd

    from sparkswift.operators.profile import (
        merge_quantile_summaries,
        quantile_summary,
    )

    pdf = pd.DataFrame({"v": [float(x) for x in (5, 1, 9, 3, 7, 2, 8, 4, 6, 10)]})
    df = spark.createDataFrame(pdf).repartition(2)
    summ = quantile_summary(df, "v", k=64)
    rows = summ.collect()
    assert sorted(r.value for r in rows) == sorted(pdf["v"].tolist())
    assert all(r.weight == 1 for r in rows)
    est = {r.phi: r.est for r in merge_quantile_summaries(summ, [0.5, 1.0]).collect()}
    assert est[0.5] == 5.0  # min v with >= 5 of 10 values <= v
    assert est[1.0] == 10.0


def test_quantile_summary_rejects_bad_args(spark):
    import pandas as pd
    import pytest as _pytest

    from sparkswift.operators.profile import (
        merge_quantile_summaries,
        quantile_summary,
    )

    df = spark.createDataFrame(pd.DataFrame({"v": [1.0, 2.0]}))
    with _pytest.raises(ValueError):
        quantile_summary(df, "v", k=1)
    with _pytest.raises(ValueError):
        merge_quantile_summaries(quantile_summary(df, "v"), [])
    with _pytest.raises(ValueError):
        merge_quantile_summaries(quantile_summary(df, "v"), [0.0, 0.5])


def test_drift_report_identical_snapshots_zero_psi(spark):
    import pandas as pd

    from sparkswift.operators.profile import drift_report

    pdf = pd.DataFrame({"src": ["web"] * 60 + ["code"] * 40})
    df = spark.createDataFrame(pdf)
    out = drift_report(df, df, ["src"]).collect()
    assert {r.bucket for r in out} == {"web", "code"}
    for r in out:
        assert r.cnt_a == r.cnt_b
        assert r.share_a == r.share_b
        assert r.psi_nano == 0


def test_drift_report_flags_planted_shift(spark):
    import math

    import pandas as pd

    from sparkswift.operators.profile import drift_report

    a = spark.createDataFrame(
        pd.DataFrame({"src": ["web"] * 80 + ["code"] * 20})
    )
    b = spark.createDataFrame(
        pd.DataFrame({"src": ["web"] * 50 + ["code"] * 50})
    )
    out = {r.bucket: r for r in drift_report(a, b, ["src"]).collect()}
    # psi term per bucket is (pa-pb)*ln(pa/pb), nonneg, nano-quantized
    exp_web = (0.8 - 0.5) * math.log(0.8 / 0.5) * 1e9
    assert abs(out["web"].psi_nano - exp_web) <= 1
    assert out["web"].psi_nano > 0 and out["code"].psi_nano > 0
    total_psi = sum(r.psi_nano for r in out.values()) / 1e9
    assert total_psi > 0.25  # the conventional "significant shift" bar


def test_drift_report_one_sided_bucket_clamped_finite(spark):
    import pandas as pd

    from sparkswift.operators.profile import drift_report

    a = spark.createDataFrame(pd.DataFrame({"src": ["web"] * 10}))
    b = spark.createDataFrame(
        pd.DataFrame({"src": ["web"] * 5 + ["only_b"] * 5})
    )
    out = {r.bucket: r for r in drift_report(a, b, ["src"]).collect()}
    r = out["only_b"]
    assert r.cnt_a == 0 and r.share_a == 0.0
    assert r.psi_nano is not None  # eps clamp keeps ln finite


def test_drift_counts_merge_chop_invariant(spark):
    """Integer mergeability: per-slice drift_counts merged with
    merge_drift_counts equal the one-pass counts for every chop, and
    the derived report is bit-identical."""
    import pandas as pd

    from sparkswift.operators.profile import (
        drift_counts,
        drift_from_counts,
        drift_report,
        merge_drift_counts,
    )

    pdf = pd.DataFrame(
        {
            "id": range(300),
            "src": [["web", "code", "wiki"][i % 3] for i in range(300)],
        }
    )
    a_pdf, b_pdf = pdf.iloc[: 180], pdf.iloc[180:]
    a, b = spark.createDataFrame(a_pdf), spark.createDataFrame(b_pdf)
    ref = {
        (r.dim, r.bucket): (r.cnt_a, r.cnt_b, r.share_a, r.share_b, r.psi_nano)
        for r in drift_report(a, b, ["src"]).collect()
    }
    for n_slices in (2, 3):
        parts = None
        for s in range(n_slices):
            sa = spark.createDataFrame(a_pdf.iloc[s::n_slices])
            sb_rows = b_pdf.iloc[s::n_slices]
            sb = spark.createDataFrame(sb_rows)
            p = drift_counts(sa, sb, ["src"])
            parts = p if parts is None else parts.unionByName(p)
        got = {
            (r.dim, r.bucket): (r.cnt_a, r.cnt_b, r.share_a, r.share_b, r.psi_nano)
            for r in drift_from_counts(merge_drift_counts(parts)).collect()
        }
        assert got == ref


def test_countmin_merge_bit_exact_and_one_sided(spark, sf_dir):
    """CM laws: (a) cell-wise merge of ANY partition of the input
    equals the whole-input sketch BIT-exactly (integer sums commute);
    (b) estimates never underestimate; (c) est ≤ true + total mass of
    the key's worst row-collision (trivially ≤ N). Independent
    reference: a pure-Python dict CM built with hashlib.md5."""
    import hashlib

    from sparkswift.operators.profile import (
        countmin_estimate,
        countmin_merge,
        countmin_sketch,
    )

    w, d, seed = 32, 3, 5
    ev = load_table(spark, sf_dir, "events").select("user_id")
    whole = {
        (r["row"], r["bucket"]): r["c"]
        for r in countmin_sketch(ev, "user_id", width=w, depth=d, seed=seed).collect()
    }

    # independent pure-python reference (no Spark expressions shared)
    ref: dict = {}
    for row in ev.collect():
        k = str(row["user_id"])
        for r in range(d):
            hx = hashlib.md5(f"{seed}:{r}:{k}".encode()).hexdigest()[:8]
            cell = (r, int(hx, 16) % w)
            ref[cell] = ref.get(cell, 0) + 1
    assert whole == ref

    # merge law under a 5-way hash chop
    parts = [
        countmin_sketch(
            ev.filter(F.abs(F.xxhash64("user_id")) % 5 == i),
            "user_id",
            width=w,
            depth=d,
            seed=seed,
        )
        for i in range(5)
    ]
    merged = {
        (r["row"], r["bucket"]): r["c"]
        for r in countmin_merge(parts[0].unionByName(parts[1]).unionByName(
            parts[2]).unionByName(parts[3]).unionByName(parts[4])).collect()
    }
    assert merged == whole

    sk = countmin_sketch(ev, "user_id", width=w, depth=d, seed=seed)
    keys = ev.distinct()
    est = {
        r["user_id"]: r["est"]
        for r in countmin_estimate(
            sk, keys, "user_id", width=w, depth=d, seed=seed
        ).collect()
    }
    true = {r["user_id"]: r["count"] for r in ev.groupBy("user_id").count().collect()}
    n = sum(true.values())
    for k, t in true.items():
        assert est[k] >= t, k
        assert est[k] <= n


def test_funnel_steps_independent_reference_and_tie_rule(spark, sf_dir):
    """Funnel vs a pure-python reference over the collected rows, plus
    the strict-`>` tie rule and missing-step depth accounting on a
    hand-built frame."""
    from sparkswift.operators.events import funnel_steps

    ev = load_table(spark, sf_dir, "events")
    got = {
        r["user_id"]: (r["t1_us"], r["t2_us"], r["t3_us"], r["depth"])
        for r in funnel_steps(ev, ["view", "click", "purchase"]).collect()
    }
    rows = ev.select(
        "user_id", F.unix_micros("ts").alias("t"), "event_type"
    ).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["t"], r["event_type"]))
    want = {}
    for u, evs in by_user.items():
        t1 = min((t for t, ty in evs if ty == "view"), default=None)
        if t1 is None:
            continue
        t2 = min((t for t, ty in evs if ty == "click" and t > t1), default=None)
        t3 = (
            min((t for t, ty in evs if ty == "purchase" and t > t2), default=None)
            if t2 is not None
            else None
        )
        want[u] = (t1, t2, t3, 1 + (t2 is not None) + (t3 is not None))
    assert got == want and len(got) > 0

    tiny = spark.createDataFrame(
        [
            (1, 100, "view"),
            (1, 100, "click"),   # same-stamp click does NOT count (strict >)
            (1, 200, "click"),
            (2, 50, "view"),     # no click: depth 1
            (3, 10, "click"),    # click before any view: not in funnel
        ],
        "user_id long, us long, event_type string",
    ).select("user_id", F.timestamp_micros(F.col("us")).alias("ts"), "event_type")
    out = {
        r["user_id"]: (r["t1_us"], r["t2_us"], r["depth"])
        for r in funnel_steps(tiny, ["view", "click"]).collect()
    }
    assert out == {1: (100, 200, 2), 2: (50, None, 1)}


def test_retention_cohorts_independent_reference(spark, sf_dir):
    """Retention triangle vs a pure-python reference; pre-cohort
    activity excluded; non-signup users absent."""
    from sparkswift.operators.events import retention_cohorts

    ev = load_table(spark, sf_dir, "events")
    got = {
        (r["cohort_day_us"], r["day_offset"]): r["n_active"]
        for r in retention_cohorts(ev, "signup").collect()
    }
    day = 86_400_000_000
    rows = ev.select("user_id", F.unix_micros("ts").alias("t"), "event_type").collect()
    first_signup: dict = {}
    for r in rows:
        if r["event_type"] == "signup":
            u = r["user_id"]
            if u not in first_signup or r["t"] < first_signup[u]:
                first_signup[u] = r["t"]
    tri: dict = {}
    for r in rows:
        u = r["user_id"]
        if u not in first_signup:
            continue
        cd = (first_signup[u] // day) * day
        off = r["t"] // day - cd // day
        if off >= 0:
            tri.setdefault((cd, off), set()).add(u)
    want = {k: len(v) for k, v in tri.items()}
    assert got == want and len(got) > 0


def test_editdistance_join_complete_and_exact(spark):
    """Deletion-variant candidates are COMPLETE for lev ≤ k (planted
    substitution/insertion/deletion/transposition cases) and the
    verify keeps the result exact vs a pure-python DP reference."""
    from sparkswift.operators.dedup import editdistance_join

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    names = [
        (1, "Customer#0001"),
        (2, "Customer#0002"),   # substitution: dist 1 to #0001
        (3, "Customer#00012"),  # insertion: dist 1 to #0001
        (4, "Custmer#0001"),    # deletion: dist 1 to #0001
        (5, "Customre#0001"),   # transposition: dist 2 (plain lev)
        (6, "Wholly Different"),
    ]
    df = spark.createDataFrame(names, "id long, name string")
    for k in (1, 2):
        got = {
            (r["id_l"], r["id_r"]): r["dist"]
            for r in editdistance_join(
                df, df, "name", "name", "id", "id", k=k
            ).collect()
        }
        want = {
            (a, b): lev(na, nb)
            for a, na in names
            for b, nb in names
            if a != b and lev(na, nb) <= k
        }
        assert got == want, (k, got, want)


def test_temperature_sample_laws(spark, sf_dir):
    """p30's temperature mixture: alpha=1 keeps EVERYTHING (rates
    proportional to counts = the corpus itself), alpha=0 levels the
    groups (uniform weights -> every group contributes ~the smallest
    group's share), and alpha=0.3 lands between; decisions are
    deterministic and never upsample."""
    from sparkswift.operators import sampling as sp
    from sparkswift.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_all = docs.filter(F.col("lang").isNotNull()).count()
    counts = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
        if r["lang"] is not None
    }

    # alpha=1: proportional target == availability -> keep-all
    assert sp.temperature_sample(docs, "doc_id", "lang", 1.0).count() == n_all

    # alpha=0: uniform weights -> the smallest group keeps everything,
    # every group's expected share ~= min count
    out0 = sp.temperature_sample(docs, "doc_id", "lang", 0.0)
    got0 = {
        r["lang"]: r["n"]
        for r in out0.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    mn = min(counts.values())
    assert got0[min(counts, key=counts.get)] == mn
    for g, n in got0.items():
        assert n <= counts[g]
        assert abs(n - mn) <= max(6, int(0.35 * mn)), (g, n, mn)

    # alpha=0.3 sits between: more level than raw, keeps the floor
    out3 = sp.temperature_sample(docs, "doc_id", "lang", 0.3)
    got3 = {
        r["lang"]: r["n"]
        for r in out3.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    hi = max(counts, key=counts.get)
    assert mn <= got3[hi] <= counts[hi]

    # determinism
    a = sorted(r.doc_id for r in out3.select("doc_id").collect())
    b = sorted(
        r.doc_id
        for r in sp.temperature_sample(docs, "doc_id", "lang", 0.3)
        .select("doc_id")
        .collect()
    )
    assert a == b

    import pytest as _pytest

    with _pytest.raises(ValueError, match="alpha"):
        sp.temperature_weights({"en": 10}, -0.5)


def test_temperature_pow_agrees_with_duckdb_on_fixture(spark, sf_dir):
    """The t15 transcendental rule applied to p30: the floor-quantized
    pow micro-weights the engine derives equal DuckDB's
    floor(scale*pow(n, alpha)) on the fixture's actual count set —
    the one place a cross-engine ulp could flip a row decision."""
    import duckdb

    from sparkswift.operators import sampling as sp
    from sparkswift.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    counts = {
        r["lang"]: int(r["n"])
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
        if r["lang"] is not None
    }
    for alpha in (0.0, 0.3, 0.5, 0.7, 1.0):
        ours = sp.temperature_weights(counts, alpha)
        con = duckdb.connect()
        for g, n in counts.items():
            (w,) = con.execute(
                f"SELECT CAST(floor(1000000 * pow({n}, {alpha!r})) AS BIGINT)"
            ).fetchone()
            assert ours[g] == w, (g, n, alpha, ours[g], w)


def test_temperature_pow_agrees_with_duckdb_densely():
    """ADVICE r11 hardening for p30: the fixture-count pin above only
    covers ~5 values; this sweeps the floor-quantized pow agreement
    over a DENSE count domain (every n <= 20k — covering any sf0.001/
    sf0.01 per-language count — plus a log-spaced tail to 10^9) for
    the headline alpha, so a libm/DuckDB ulp flip anywhere in the
    realistic domain fails here before it can flip a driver hash.
    (Rendering engine weights into the static oracle string is
    impossible — weights depend on per-sf counts — so the guarantee
    is this environment pin; the documented fallback is rows-only.)"""
    import duckdb

    from sparkswift.operators import sampling as sp

    ns = list(range(1, 20001)) + [
        int(10 ** (e / 8)) for e in range(8 * 5, 8 * 9 + 1)
    ]
    for alpha in (0.3, 0.5, 0.7):
        ours = sp.temperature_weights({n: n for n in ns}, alpha)
        con = duckdb.connect()
        rows = con.execute(
            "SELECT n, CAST(floor(1000000 * pow(n, ?)) AS BIGINT) "
            "FROM (SELECT unnest(?) AS n)",
            [alpha, ns],
        ).fetchall()
        for n, w in rows:
            assert ours[n] == w, (n, alpha, ours[n], w)


def test_group_sample_laws(spark, sf_dir):
    """p32: exactly min(k, |group|) rows per group, a SUBSET of the
    group, deterministic across reruns and repartitioning, different
    seeds pick different subsets, k<=0 refuses."""
    import pytest as _pytest

    from sparkswift.operators import sampling as sp
    from sparkswift.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    sizes = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    out = sp.group_sample(docs, "source", 8, seed=7)
    got = {}
    for r in out.select("source", "doc_id").collect():
        got.setdefault(r.source, set()).add(r.doc_id)
    for g, n in sizes.items():
        assert len(got.get(g, set())) == min(8, n), g
    again = {
        (r.source, r.doc_id)
        for r in sp.group_sample(docs.repartition(13), "source", 8, seed=7)
        .select("source", "doc_id")
        .collect()
    }
    assert again == {(g, d) for g, ds in got.items() for d in ds}
    other = {
        (r.source, r.doc_id)
        for r in sp.group_sample(docs, "source", 8, seed=8)
        .select("source", "doc_id")
        .collect()
    }
    assert other != again  # a different seed samples differently
    with _pytest.raises(ValueError, match="positive"):
        sp.group_sample(docs, "source", 0)


def test_ring_negative_samples_laws(spark, sf_dir):
    """p36: exactly k negatives per query, collision-free within a
    query, never a positive (corpus excludes queries), deterministic
    across reruns, and ring coverage is uniform-ish (no corpus doc
    takes more than a small multiple of the mean load)."""
    from sparkswift.operators.sampling import ring_negative_samples
    from sparkswift.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    queries = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    k = 4
    out = ring_negative_samples(queries, corpus, "doc_id", k=k).toPandas()
    nq = queries.count()
    assert len(out) == nq * k
    per_q = out.groupby("query_id").agg(
        n=("neg_id", "size"), uniq=("neg_id", "nunique")
    )
    assert (per_q.n == k).all() and (per_q.uniq == k).all()
    assert (out.neg_id % 10 != 0).all()  # never a query/positive
    # deterministic across reruns
    out2 = ring_negative_samples(queries, corpus, "doc_id", k=k).toPandas()
    key = ["query_id", "neg_rank"]
    assert out.sort_values(key).reset_index(drop=True).equals(
        out2.sort_values(key).reset_index(drop=True)
    )
    # load balance: consecutive-ring assignment keeps the max load
    # within a small multiple of the mean (hash starts are uniform)
    load = out.groupby("neg_id").size()
    mean = nq * k / corpus.count()
    assert load.max() <= max(8, 12 * mean), (load.max(), mean)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be"):
        ring_negative_samples(queries, corpus, "doc_id", k=0)
    neg = spark.createDataFrame([(-3,)], "doc_id long")
    with _pytest.raises(ValueError, match=r"in \[0,"):
        ring_negative_samples(neg, corpus, "doc_id", k=2)
    # ADVICE r13: ids above (2^63-1)//2654435761 would overflow the
    # Knuth-mix product (silent BIGINT wrap in non-ANSI Spark vs an
    # oracle error) — the guard must refuse, and the largest legal
    # id must pass the guard and produce k negatives.
    cap = (2**63 - 1) // 2654435761
    huge = spark.createDataFrame([(cap + 1,)], "doc_id long")
    with _pytest.raises(ValueError, match="overflow"):
        ring_negative_samples(huge, corpus, "doc_id", k=2)
    edge = spark.createDataFrame([(cap,)], "doc_id long")
    got = ring_negative_samples(edge, corpus, "doc_id", k=2).collect()
    assert len(got) == 2 and all(r.neg_id >= 0 for r in got)
