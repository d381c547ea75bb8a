"""Tests for the Gopher quality rules and overlapping chunking
(round-5 additions: operators/text.gopher_rules, packing.chunk_overlap)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkswift.operators.packing import chunk_overlap
from sparkswift.operators.text import GOPHER_STOPWORDS, gopher_rules


def _df(spark, rows):
    return spark.createDataFrame(pd.DataFrame({"doc_id": range(len(rows)), "text": rows}))


# --- gopher_rules -----------------------------------------------------------


def test_gopher_line_rules_on_multiline_text(spark):
    """Bullet-start and ellipsis-end line fractions are computed over
    newline-split lines — the rules the single-line fixture can't vary."""
    bullets = "\n".join(["- item one here", "- item two here", "plain line here"])
    ellipses = "\n".join(["to be continued...", "also trailing…", "normal line", "x"])
    out = (
        gopher_rules(_df(spark, [bullets, ellipses]), min_words=1, min_stopwords=0)
        .orderBy("doc_id")
        .toPandas()
    )
    assert out.loc[0, "bullet_ratio"] == pytest.approx(2 / 3)
    assert out.loc[0, "ok_bullets"] == 1  # 2/3 < 0.9
    assert out.loc[1, "ellipsis_ratio"] == pytest.approx(2 / 4)
    assert out.loc[1, "ok_ellipsis"] == 0  # 1/2 >= 0.3


def test_gopher_word_rules_match_python(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog with style and grace today",
        "### ### ### a b c",  # symbol-heavy, short words
        "12 34 56 78 90",  # no alphabetic words, no stopwords
    ]
    out = gopher_rules(_df(spark, texts), min_words=5, min_stopwords=2).orderBy("doc_id").toPandas()
    for i, t in enumerate(texts):
        words = t.split()
        assert out.loc[i, "n_words"] == len(words)
        assert out.loc[i, "mean_word_len"] == pytest.approx(
            sum(len(w) for w in words) / len(words)
        )
        n_sym = t.count("#") + t.count("...")
        assert out.loc[i, "symbol_ratio"] == pytest.approx(n_sym / len(words))
        n_alpha = sum(any(c.isalpha() and c.isascii() for c in w) for w in words)
        assert out.loc[i, "alpha_frac"] == pytest.approx(n_alpha / len(words))
        assert out.loc[i, "n_stop"] == sum(w in GOPHER_STOPWORDS for w in words)
    # doc 0 passes everything; doc 1 fails symbols+word-len+stopwords;
    # doc 2 fails alpha+stopwords
    assert list(out["keep"]) == [1, 0, 0]
    assert out.loc[1, "ok_symbols"] == 0
    assert out.loc[2, "ok_alpha"] == 0 and out.loc[2, "ok_stopwords"] == 0


def test_gopher_keep_is_conjunction_of_flags(spark, sf_dir):
    from sparkswift.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    out = gopher_rules(docs, min_words=20, min_stopwords=1).toPandas()
    flags = [c for c in out.columns if c.startswith("ok_")]
    assert (out["keep"] == out[flags].prod(axis=1)).all()


# --- chunk_overlap ----------------------------------------------------------


def test_chunk_overlap_covers_every_token_and_overlaps(spark):
    text = " ".join(f"w{i}" for i in range(100))
    out = (
        chunk_overlap(_df(spark, [text]), size=32, stride=24)
        .orderBy("chunk_id")
        .toPandas()
    )
    # chunks: ceil((100-32)/24)+1 = 4
    assert len(out) == 4
    toks = []
    for _, r in out.iterrows():
        chunk = r["chunk_text"].split()
        assert r["n_chunk_tokens"] == len(chunk)
        start = int(r["chunk_id"]) * 24
        assert chunk == [f"w{i}" for i in range(start, min(start + 32, 100))]
        toks.extend(chunk)
    assert set(toks) == {f"w{i}" for i in range(100)}  # full coverage
    # consecutive chunks share size - stride = 8 tokens
    c0 = out.loc[0, "chunk_text"].split()
    c1 = out.loc[1, "chunk_text"].split()
    assert c0[-8:] == c1[:8]


def test_chunk_overlap_short_doc_single_chunk(spark):
    out = chunk_overlap(_df(spark, ["only five words right here"]), size=32, stride=24).toPandas()
    assert len(out) == 1
    assert out.loc[0, "chunk_id"] == 0
    assert out.loc[0, "n_chunk_tokens"] == 5


def test_chunk_overlap_rejects_bad_stride(spark):
    with pytest.raises(ValueError):
        chunk_overlap(_df(spark, ["a"]), size=10, stride=11)
    with pytest.raises(ValueError):
        chunk_overlap(_df(spark, ["a"]), size=10, stride=0)


def test_chunk_overlap_no_shuffle_in_plan(spark, sf_dir):
    """Chunking is a scan-stage flatMap — the plan must not contain an
    Exchange."""
    from sparkswift.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = chunk_overlap(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --- line_dedup -------------------------------------------------------------


def test_line_dedup_first_occurrence_wins_globally(spark):
    from sparkswift.operators.dedup import line_dedup

    docs = _df(
        spark,
        [
            "alpha beta\nshared line\nunique one",
            "shared line\nunique two",  # 'shared line' already seen in doc 0
            "repeat me\nrepeat me",  # same-doc duplicate: second drops
        ],
    )
    out = line_dedup(docs, "doc_id", "text").orderBy("doc_id").toPandas()
    assert out.loc[0, "clean_text"] == "alpha beta\nshared line\nunique one"
    assert out.loc[0, "n_lines_dropped"] == 0
    assert out.loc[1, "clean_text"] == "unique two"
    assert out.loc[1, "n_lines_dropped"] == 1
    assert out.loc[2, "clean_text"] == "repeat me"
    assert out.loc[2, "n_lines_dropped"] == 1


def test_line_dedup_keeps_empty_docs_row_aligned(spark):
    from sparkswift.operators.dedup import line_dedup

    docs = _df(spark, ["only line", "only line"])
    out = line_dedup(docs, "doc_id", "text").orderBy("doc_id").toPandas()
    assert len(out) == 2  # fully-deduped doc 1 still present
    assert out.loc[1, "clean_text"] == ""
    assert out.loc[1, "n_lines_kept"] == 0


def test_line_dedup_regex_metachar_separator(spark):
    """line_sep is a LITERAL separator: a value containing regex
    metacharacters ('||', '. ', '\\n\\n') must split/join round-trip
    exactly (ADVICE r5 — F.split takes a Java regex, so the separator
    is escaped before splitting)."""
    from sparkswift.operators.dedup import line_dedup

    docs = _df(
        spark,
        [
            "alpha||shared seg||unique one",
            "shared seg||unique two",
        ],
    )
    out = (
        line_dedup(docs, "doc_id", "text", line_sep="||")
        .orderBy("doc_id")
        .toPandas()
    )
    assert out.loc[0, "clean_text"] == "alpha||shared seg||unique one"
    assert out.loc[0, "n_lines_dropped"] == 0
    assert out.loc[1, "clean_text"] == "unique two"
    assert out.loc[1, "n_lines_dropped"] == 1


def test_line_dedup_partition_invariant(spark, sf_dir):
    from sparkswift.operators.dedup import line_dedup
    from sparkswift.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100)
    a = line_dedup(docs, "doc_id", "text").orderBy("doc_id").toPandas()
    b = (
        line_dedup(docs.repartition(7), "doc_id", "text")
        .orderBy("doc_id")
        .toPandas()
    )
    assert (a["clean_text"] == b["clean_text"]).all()
    assert (a["n_lines_kept"] == b["n_lines_kept"]).all()


# --- unigram_logprob --------------------------------------------------------


def test_unigram_logprob_matches_numpy(spark):
    import math

    from sparkswift.operators.text import unigram_logprob

    texts = ["a a b c", "a b", "d d d a"]
    out = unigram_logprob(_df(spark, texts), "text", "doc_id").orderBy("doc_id").toPandas()
    all_toks = " ".join(texts).split()
    total = len(all_toks)
    freq = {t: all_toks.count(t) for t in set(all_toks)}
    for i, t in enumerate(texts):
        sups = [round(math.log(total / freq[w]) * 1_000_000) for w in t.split()]
        assert out.loc[i, "n_tokens"] == len(sups)
        assert out.loc[i, "sum_surprisal"] == sum(sups)
        assert out.loc[i, "avg_nll"] == pytest.approx(
            sum(sups) / (len(sups) * 1e6)
        )
    # boilerplate ('a'-heavy doc) scores lower nll than rare-token doc
    assert out.loc[2, "avg_nll"] < out.loc[1, "avg_nll"]


# --- leak_report ------------------------------------------------------------


def test_leak_report_fractions_match_python(spark):
    from sparkswift.operators.dedup import leak_report

    bench = _df(spark, ["the secret benchmark question about spark"])
    train_texts = [
        "the secret benchmark question about spark appears verbatim here",
        "totally unrelated content with different words entirely present",
    ]
    train = spark.createDataFrame(
        pd.DataFrame({"doc_id": [10, 11], "text": train_texts})
    )
    out = leak_report(train, bench, threshold=0.5).orderBy("doc_id").toPandas()

    def shingles(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    bs = shingles("the secret benchmark question about spark")
    for i, t in enumerate(train_texts):
        sh = shingles(t)
        assert out.loc[i, "n_shingles"] == len(sh)
        assert out.loc[i, "n_leaked"] == len(sh & bs)
        assert out.loc[i, "leak_frac"] == pytest.approx(len(sh & bs) / len(sh))
    assert list(out["flagged"]) == [0, 0] or out.loc[0, "n_leaked"] > 0
    # doc 10 leaks the 4 shared shingles; doc 11 leaks none
    assert out.loc[0, "n_leaked"] == 4 and out.loc[1, "n_leaked"] == 0


def test_leak_report_hashed_matches_string_route(spark, sf_dir):
    from sparkswift.operators.dedup import leak_report
    from sparkswift.operators.sampling import hash_bucket_hex, hex_threshold
    from sparkswift.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    thr = hex_threshold(0.1)
    bucket = hash_bucket_hex("doc_id", seed=1)
    bench = docs.filter(bucket < F.lit(thr))
    train = docs.filter(bucket >= F.lit(thr))
    a = leak_report(train, bench, hashed=True).orderBy("doc_id").toPandas()
    b = leak_report(train, bench, hashed=False).orderBy("doc_id").toPandas()
    assert (a["n_leaked"] == b["n_leaked"]).all()  # no collisions at this size
    assert (a["n_shingles"] == b["n_shingles"]).all()


# --- null-text semantics ----------------------------------------------------


def test_null_text_fails_gopher_emits_no_chunks_keeps_line_dedup_row(spark):
    from sparkswift.operators.dedup import line_dedup

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["hello world the end", None]})
    )
    g = gopher_rules(df, min_words=1, min_stopwords=1).orderBy("doc_id").toPandas()
    assert g.loc[1, "keep"] == 0  # NULL text FAILS the filter, not NULL
    assert all(g.loc[1, c] == 0 for c in g.columns if c.startswith("ok_"))
    assert g.loc[0, "keep"] == 1

    c = chunk_overlap(df).toPandas()
    assert set(c["doc_id"]) == {0}  # null doc: zero chunks, no phantom row
    assert len(c) == 1

    ld = line_dedup(df, "doc_id", "text").orderBy("doc_id").toPandas()
    assert len(ld) == 2  # row alignment survives null text
    assert ld.loc[1, "clean_text"] == ""


def test_empty_text_emits_zero_chunks(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": ["   "]}))
    assert chunk_overlap(df).count() == 0


# --- Python UDTF surface ----------------------------------------------------


def test_udtf_chunk_matches_native_operator(spark, sf_dir):
    """The SQL table function and the native posexplode operator
    implement the same window rule — row-for-row equal output."""
    from sparkswift.operators.udtf_fns import register_udtfs
    from sparkswift.sources import load_table, register_views

    register_udtfs(spark)
    register_views(spark, sf_dir)
    via_udtf = spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.chunk_text, c.n_chunk_tokens
        FROM documents d, LATERAL chunk_text(d.text, 32, 24) c
        """
    ).orderBy("doc_id", "chunk_id").toPandas()
    docs = load_table(spark, sf_dir, "documents")
    via_native = (
        chunk_overlap(docs, size=32, stride=24)
        .orderBy("doc_id", "chunk_id")
        .toPandas()
    )
    assert len(via_udtf) == len(via_native)
    assert (via_udtf["chunk_text"].values == via_native["chunk_text"].values).all()
    assert (
        via_udtf["n_chunk_tokens"].values == via_native["n_chunk_tokens"].values
    ).all()


def test_udtf_word_ngrams_lateral(spark):
    from sparkswift.operators.udtf_fns import register_udtfs

    register_udtfs(spark)
    out = spark.sql(
        "SELECT * FROM word_ngrams('the quick brown fox', 2)"
    ).toPandas()
    assert list(out["ngram"]) == ["the quick", "quick brown", "brown fox"]
    short = spark.sql("SELECT * FROM word_ngrams('hi', 3)").toPandas()
    assert list(short["ngram"]) == ["hi"]


# --- neardup_incremental ----------------------------------------------------


import contextlib


@contextlib.contextmanager
def _no_broadcast(spark):
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k in keys:
            spark.conf.set(k, "-1")
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_neardup_incremental_two_batches_clean(spark, tmp_path):
    from sparkswift.operators.dedup import neardup_incremental

    store = str(tmp_path / "ndstore2")
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest to hide from every hunter")
    batch1 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": [base]})
    )
    assert neardup_incremental(batch1, store).toPandas()["survived"].tolist() == [1]

    batch2 = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [10, 11],
            "text": [base.replace("lazy", "sleepy"),  # near-dup of stored doc 1
                     "fresh unrelated words about parquet row groups and "
                     "column statistics and bloom filter indexes today"],
        })
    )
    out = (
        neardup_incremental(batch2, store)
        .orderBy("doc_id")
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[10, "store_hit"] == 1 and out.loc[10, "survived"] == 0
    assert out.loc[11, "store_hit"] == 0 and out.loc[11, "survived"] == 1

    # batch 3: near-copy of the batch-2 SURVIVOR must now hit the store
    batch3 = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [20],
            "text": ["fresh unrelated words about parquet row groups and "
                     "column statistics and bloom filter indexes yesterday"],
        })
    )
    out3 = neardup_incremental(batch3, store).toPandas()
    assert out3["survived"].tolist() == [0]


def test_neardup_incremental_bucketed_store(spark, tmp_path):
    # bucketed=True must (a) reproduce path-mode decisions exactly and
    # (b) leave the STORE side of the probe join shuffle-free — the
    # whole point: the ever-growing store must never re-shuffle per
    # ingest batch (VERDICT r6/r7 #1).
    from pyspark.sql import functions as F

    from sparkswift.operators.dedup import neardup_incremental

    tbl = "nd_bkt_test_store"
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest to hide from every hunter")
    try:
        batch1 = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "text": [base]})
        )
        out1 = neardup_incremental(batch1, tbl, bucketed=True, num_buckets=8)
        assert out1.toPandas()["survived"].tolist() == [1]
        assert spark.catalog.tableExists(f"{tbl}_buckets")

        batch2 = spark.createDataFrame(
            pd.DataFrame({
                "doc_id": [10, 11],
                "text": [base.replace("lazy", "sleepy"),
                         "fresh unrelated words about parquet row groups and "
                         "column statistics and bloom filter indexes today"],
            })
        )
        out = (
            neardup_incremental(batch2, tbl, bucketed=True, num_buckets=8)
            .orderBy("doc_id")
            .toPandas()
            .set_index("doc_id")
        )
        assert out.loc[10, "store_hit"] == 1 and out.loc[10, "survived"] == 0
        assert out.loc[11, "store_hit"] == 0 and out.loc[11, "survived"] == 1

        # append preserved bucketing: both batches' survivors present
        sigs = spark.table(f"{tbl}_sigs").toPandas()
        assert sorted(sigs["store_id"].tolist()) == [1, 11]

        # plan: store side of the (band, bucket) probe join reads
        # shuffle-free — with broadcast off, the ONLY Exchange in the
        # join plan is the probe side hashing into the bucket layout
        store_buckets = spark.table(f"{tbl}_buckets")
        probe = spark.range(5).select(
            F.col("id"),
            (F.col("id") % 2).cast("int").alias("band"),
            F.col("id").alias("bucket"),
        )
        with _no_broadcast(spark):
            joined = probe.join(store_buckets, ["band", "bucket"])
            plan = joined._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
        # and a store-side groupBy on the bucket key needs no shuffle
        agg = store_buckets.groupBy("band", "bucket").count()
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in agg_plan, agg_plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}_buckets")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}_sigs")


def test_neardup_incremental_in_batch_first_wins(spark, tmp_path):
    from sparkswift.operators.dedup import neardup_incremental

    store = str(tmp_path / "ndstore3")
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi")
    batch = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [5, 6],
            "text": [base, base + " extra"],  # in-batch near-dups
        })
    )
    out = neardup_incremental(batch, store).orderBy("doc_id").toPandas()
    assert out["in_batch_survivor"].tolist() == [1, 0]  # min id wins
    assert out["survived"].tolist() == [1, 0]


def test_neardup_incremental_small_batch_short_circuit(spark, tmp_path):
    # the driver union-find path (small batch) must be BIT-IDENTICAL
    # to the distributed CC path — including transitive chains A~B~C
    # where the survivor must be the component-min, not the pair-min
    from sparkswift.operators.dedup import neardup_incremental

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi")
    batch = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [7, 8, 9, 30],
            "text": [base, base + " extra", base + " extra more",
                     "totally different content about shuffle partitions and "
                     "broadcast joins and adaptive query execution plans"],
        })
    )
    fast = (
        neardup_incremental(batch, str(tmp_path / "nd_f"), update_store=False)
        .orderBy("doc_id").toPandas()
    )
    slow = (
        neardup_incremental(batch, str(tmp_path / "nd_s"), update_store=False,
                            small_batch_threshold=0)
        .orderBy("doc_id").toPandas()
    )
    assert fast["in_batch_survivor"].tolist() == [1, 0, 0, 1]
    pd.testing.assert_frame_equal(fast, slow)


# --- trained BPE ------------------------------------------------------------


def test_bpe_encode_ids_consistent_with_count_and_roundtrip(spark, sf_dir):
    from sparkswift.operators.text import (
        _bpe_word_symbols,
        bpe_encode_count,
        bpe_encode_ids,
        bpe_train,
        bpe_vocab,
    )
    from sparkswift.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100)
    merges = bpe_train(docs, num_merges=60)
    assert merges
    ids = bpe_encode_ids(docs, merges).toPandas().set_index("doc_id")
    counts = bpe_encode_count(docs, merges).toPandas().set_index("doc_id")
    # law 1: the two implementations of the greedy decode agree
    assert (
        ids["n_bpe_tokens"].sort_index() == counts["n_bpe_tokens"].sort_index()
    ).all()
    # law 2: every id inside the merges-derived vocab; array length = count
    vs = len(bpe_vocab(merges))
    for _, r in ids.iterrows():
        assert len(r["token_ids"]) == r["n_bpe_tokens"]
        assert all(0 <= t < vs for t in r["token_ids"])
    # law 3: per-word round-trip — symbols concat back to word</w>
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("the", "analysis", "zzzz", "a"):
        assert "".join(_bpe_word_symbols(w, ranks)) == w + "</w>"


def test_bpe_encode_ids_unknown_chars_map_to_unk(spark):
    from sparkswift.operators.text import bpe_encode_ids, bpe_vocab

    merges = [("a", "b"), ("ab", "</w>")]
    df = _df(spark, ["ab Ωab"])
    out = bpe_encode_ids(df, merges).collect()[0]
    v = bpe_vocab(merges)
    # "ab" → [ab</w>]; "Ωab" → [<unk>(Ω), a, b, </w>]? no — greedy
    # merges a+b first then ab+</w>: [Ω→unk, ab</w>]
    assert list(out.token_ids) == [v["ab</w>"], v["<unk>"], v["ab</w>"]]


def test_bpe_zero_merges_counts_chars_plus_end(spark):
    from sparkswift.operators.text import bpe_encode_count

    df = _df(spark, ["ab abc"])
    out = bpe_encode_count(df, []).toPandas()
    # no merges: each word = its chars + </w>
    assert out.loc[0, "n_bpe_tokens"] == (2 + 1) + (3 + 1)


def test_bpe_merges_collapse_frequent_word_to_one_token(spark):
    from sparkswift.operators.text import bpe_encode_count, bpe_train

    df = _df(spark, ["spark spark spark spark", "spark spark spark other"])
    merges = bpe_train(df, num_merges=10)
    out = bpe_encode_count(df, merges).orderBy("doc_id").toPandas()
    # 'spark' dominates the corpus: it must end as ONE token
    assert out.loc[0, "n_bpe_tokens"] == 4


def test_bpe_token_count_monotone_in_merges(spark, sf_dir):
    from sparkswift.operators.text import bpe_encode_count, bpe_train
    from sparkswift.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100)
    merges = bpe_train(docs, num_merges=120)
    few = bpe_encode_count(docs, merges[:30]).orderBy("doc_id").toPandas()
    many = bpe_encode_count(docs, merges).orderBy("doc_id").toPandas()
    assert (many["n_bpe_tokens"] <= few["n_bpe_tokens"]).all()
    assert many["n_bpe_tokens"].sum() < few["n_bpe_tokens"].sum()


def test_bpe_deterministic_and_partition_invariant(spark, sf_dir):
    from sparkswift.operators.text import bpe_encode_count, bpe_train
    from sparkswift.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100)
    m1 = bpe_train(docs, num_merges=50)
    m2 = bpe_train(docs.repartition(13), num_merges=50)
    assert m1 == m2  # training is partition-invariant
    a = bpe_encode_count(docs, m1).orderBy("doc_id").toPandas()
    b = bpe_encode_count(docs.repartition(7), m1).orderBy("doc_id").toPandas()
    assert (a["n_bpe_tokens"].values == b["n_bpe_tokens"].values).all()


# --- dsir_logratio ----------------------------------------------------------


def test_dsir_matches_pure_python_reference(spark):
    """Exact check vs a pure-Python implementation of the same add-1
    smoothed bigram log-ratio (micro-nat quantization included)."""
    import math

    from sparkswift.operators.text import dsir_logratio

    target_rows = ["the quick brown fox", "the quick red fox"]
    raw_rows = ["the quick brown fox", "lorem ipsum dolor sit", "the slow fox"]
    target = _df(spark, target_rows)
    raw = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100, 101, 102], "text": raw_rows})
    )

    def grams(t):
        toks = t.split()
        return (
            [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
            if len(toks) >= 2
            else [" ".join(toks)]
        )

    tc, rc = {}, {}
    for t in target_rows:
        for g in grams(t):
            tc[g] = tc.get(g, 0) + 1
    for t in raw_rows:
        for g in grams(t):
            rc[g] = rc.get(g, 0) + 1
    universe = set(tc) | set(rc)
    V = len(universe)
    T = sum(tc.values())
    R = sum(rc.values())
    const = round((math.log(R + V) - math.log(T + V)) * 1e6)
    w = {
        f: round((math.log(tc.get(f, 0) + 1) - math.log(rc.get(f, 0) + 1)) * 1e6)
        for f in universe
    }
    expected = {}
    for i, t in enumerate(raw_rows):
        fs = grams(t)
        expected[100 + i] = sum(w[f] for f in fs) + len(fs) * const

    out = dsir_logratio(raw, target).orderBy("doc_id").toPandas()
    got = dict(zip(out["doc_id"], out["logratio_unats"]))
    assert got == expected
    # in-domain doc must outscore the out-of-domain one
    assert got[100] > got[101]


def test_dsir_hash_buckets_deterministic_and_bounded(spark, sf_dir):
    """The 100 TB path: features hashed into B buckets — weight table
    bounded by B, scores deterministic across partitionings, and
    bucketed scores track the exact-identity scores (same docs near
    the top: the planted in-domain docs keep positive scores)."""
    from sparkswift.operators.text import dsir_logratio
    from sparkswift.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    target = docs.filter(F.col("doc_id") % 5 == 0)
    raw = docs.filter(F.col("doc_id") % 5 != 0)
    a = (
        dsir_logratio(raw, target, hash_buckets=4096)
        .orderBy("doc_id")
        .toPandas()
    )
    b = (
        dsir_logratio(raw.repartition(7), target, hash_buckets=4096)
        .orderBy("doc_id")
        .toPandas()
    )
    assert (a["logratio_unats"].values == b["logratio_unats"].values).all()
    exact = dsir_logratio(raw, target).orderBy("doc_id").toPandas()
    # rank agreement: hashing perturbs scores but must preserve the
    # broad ordering (spearman > 0.9 on this fixture)
    rho = (
        pd.DataFrame(
            {"h": a["avg_logratio"].rank(), "e": exact["avg_logratio"].rank()}
        )
        .corr(method="pearson")
        .iloc[0, 1]
    )
    assert rho > 0.9, rho


def test_compression_ratio_matches_zlib_reference(spark, sf_dir):
    """t23: the distributed ratio equals a direct zlib reference per
    doc (byte-deterministic codec), empty text reports NULL ratio."""
    import zlib

    from sparkswift.operators import text as tx
    from sparkswift.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(80)
    got = {
        r.doc_id: (r.n_bytes, r.n_compressed, r.ratio)
        for r in tx.compression_ratio(docs).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        b = (r.text or "").encode("utf-8")
        c = len(zlib.compress(b, 6))
        assert got[r.doc_id] == (len(b), c, c / len(b)), r.doc_id

    from pyspark.sql import functions as F  # noqa: F401

    empty = spark.createDataFrame(
        [(1, ""), (2, None), (3, "spam " * 100)], "doc_id long, text string"
    )
    out = {r.doc_id: r.ratio for r in tx.compression_ratio(empty).collect()}
    assert out[1] is None and out[2] is None
    assert out[3] < 0.1  # repetition compresses hard
