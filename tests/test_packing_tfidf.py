"""Tests for sequence packing, tf-idf keyword extraction, and the
transformWithStateInPandas gate."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkswift.operators.packing import chunk_manifest, pack_sequences
from sparkswift.operators.text import bpe_token_count, tfidf_top_terms


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from sparkswift.sources import load_table

    return load_table(spark, sf_dir, "documents")


# --- pack_sequences ---------------------------------------------------------


def test_packing_offsets_are_contiguous_per_shard(docs):
    """Within a shard, sorted by start_off, each doc starts exactly
    where the previous one ended — the concat-then-chunk invariant."""
    out = pack_sequences(docs, budget=512).toPandas()
    for shard, grp in out.groupby("shard"):
        g = grp.sort_values("start_off").reset_index(drop=True)
        expected = g["tok_count"].cumsum().shift(fill_value=0)
        assert (g["start_off"] == expected).all(), shard


def test_packing_chunk_id_is_start_div_budget(docs):
    out = pack_sequences(docs, budget=512).toPandas()
    assert (out["chunk_id"] == out["start_off"] // 512).all()


def test_packing_deterministic_and_partition_invariant(docs):
    a = pack_sequences(docs, budget=512).toPandas().sort_values("doc_id")
    b = (
        pack_sequences(docs.repartition(13), budget=512)
        .toPandas()
        .sort_values("doc_id")
    )
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_packing_assignment_stable_under_growth(docs):
    """Adding documents never moves an existing doc to another shard
    (shard is a pure hash of id) — the append-only corpus property."""
    half = docs.filter(F.col("doc_id") % 2 == 0)
    full = pack_sequences(docs, budget=512).toPandas().set_index("doc_id")
    part = pack_sequences(half, budget=512).toPandas().set_index("doc_id")
    assert (part["shard"] == full.loc[part.index, "shard"]).all()


def test_chunk_manifest_totals(docs):
    packed = pack_sequences(docs, budget=512)
    man = chunk_manifest(packed, budget=512).toPandas()
    out = packed.toPandas()
    assert man["docs_started"].sum() == len(out)
    assert man["tokens_started"].sum() == out["tok_count"].sum()


# --- tfidf ------------------------------------------------------------------


def test_tfidf_matches_pandas_reference(docs):
    """Score and ranking vs a straight pandas recomputation."""
    out = tfidf_top_terms(docs, top_k=3).toPandas()
    pdf = docs.select("doc_id", "text").toPandas()
    toks = (
        pdf.assign(term=pdf["text"].str.lower().str.split())
        .explode("term")
        .dropna(subset=["term"])
    )
    toks = toks[toks["term"] != ""]
    tf = toks.groupby(["doc_id", "term"]).size().rename("tf").reset_index()
    dfreq = tf.groupby("term").size().rename("df").reset_index()
    n_docs = pdf["doc_id"].nunique()
    sc = tf.merge(dfreq, on="term")
    sc["score"] = sc["tf"] * ((n_docs - sc["df"] + 0.5) / (sc["df"] + 0.5))
    sc = sc.sort_values(
        ["doc_id", "score", "term"], ascending=[True, False, True]
    )
    sc["rnk"] = sc.groupby("doc_id").cumcount() + 1
    expected = sc[sc["rnk"] <= 3].reset_index(drop=True)
    got = out.sort_values(["doc_id", "rnk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "term", "tf", "df", "rnk"]].astype(
            {"tf": "int64", "df": "int64", "rnk": "int64"}
        ),
        expected[["doc_id", "term", "tf", "df", "rnk"]].astype(
            {"tf": "int64", "df": "int64", "rnk": "int64"}
        ),
    )


def test_tfidf_rare_term_beats_common_at_equal_tf(spark):
    df = spark.createDataFrame(
        [(1, "common rare"), (2, "common other"), (3, "common stuff")],
        ["doc_id", "text"],
    )
    out = tfidf_top_terms(df, top_k=1).toPandas().set_index("doc_id")
    # every doc's top term is its unique word, never the ubiquitous one
    assert out.loc[1, "term"] == "rare"
    assert out.loc[2, "term"] == "other"
    assert out.loc[3, "term"] == "stuff"


def test_tfidf_min_df_filters(spark):
    df = spark.createDataFrame(
        [(1, "aa bb"), (2, "aa cc")], ["doc_id", "text"]
    )
    out = tfidf_top_terms(df, top_k=5, min_df=2).toPandas()
    assert set(out["term"]) == {"aa"}


# --- transformWithStateInPandas gate ----------------------------------------


def test_tws_operator_gate(spark, sf_dir):
    """Where protobuf exists the tws operator must equal the plain
    GROUP BY; where it doesn't (this container) it must raise the
    documented ImportError, not crash mid-query."""
    from sparkswift.streaming.ops import (
        events_stream,
        run_stream_to_batch,
        stateful_running_totals_tws,
    )

    try:
        import google.protobuf  # noqa: F401

        have_protobuf = True
    except ImportError:
        have_protobuf = False

    if not have_protobuf:
        with pytest.raises(ImportError, match="protobuf"):
            stateful_running_totals_tws(events_stream(spark, sf_dir))
        return

    out = run_stream_to_batch(
        stateful_running_totals_tws(events_stream(spark, sf_dir)), mode="update"
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("events_seen").desc())
    final = (
        out.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    )
    from sparkswift.sources import load_table

    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("events_seen"))
        .toPandas()
        .set_index("user_id")["events_seen"]
    )
    got = final.toPandas().set_index("user_id")["events_seen"]
    assert (got.sort_index() == exact.sort_index()).all()


# --- bm25 -------------------------------------------------------------------


def test_bm25_matches_python_reference(spark):
    """bm25_topk vs an independent pure-Python BM25 (same rational
    idf, same k1/b) on a tiny corpus — scores to 1e-12, order exact."""
    import math

    from sparkswift.operators.text import bm25_topk

    corpus = {
        1: "spark window hash join join",
        2: "dup dup spark table",
        3: "window window window scan scan scan scan",
        4: "hash hash hash hash spark",
        5: "the a of and to",
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in corpus.items()], "doc_id long, text string"
    )
    terms = ["dup", "spark", "window", "hash"]
    out = bm25_topk(df, terms, top_k=5).toPandas()

    k1, b = 1.2, 0.75
    toks = {k: v.split() for k, v in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfreq = {t: sum(1 for d in toks.values() if t in d) for t in terms}
    expected = {}
    for d, tk in toks.items():
        s = 0.0
        for t in terms:
            tf = tk.count(t)
            if tf == 0:
                continue
            idf = (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(tk) / avgdl))
        if s > 0:
            expected[d] = s
    exp_order = sorted(expected, key=lambda d: (-expected[d], d))
    assert list(out["doc_id"]) == exp_order
    for _, r in out.iterrows():
        assert math.isclose(r["score"], expected[r["doc_id"]], rel_tol=1e-12)


def test_bm25_rare_term_doc_outranks_common_term_doc(spark):
    """A doc matching only the rare query term must outrank a doc
    matching only the common one at equal tf and length — the idf
    property BM25 exists for."""
    from sparkswift.operators.text import bm25_topk

    rows = [(1, "rare x y z"), (2, "common x y z")] + [
        (i, "common filler pad qq") for i in range(3, 23)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(df, ["rare", "common"], top_k=2).toPandas()
    assert out.iloc[0]["doc_id"] == 1


def test_bm25_length_normalization(spark):
    """Equal tf: the shorter doc scores higher (b>0 penalizes long
    docs); with b=0 the two scores tie exactly."""
    from sparkswift.operators.text import bm25_topk

    rows = [(1, "term one two"), (2, "term " + " ".join(["pad"] * 30))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    norm = bm25_topk(df, ["term"], top_k=2).toPandas().set_index("doc_id")
    assert norm.loc[1, "score"] > norm.loc[2, "score"]
    flat = bm25_topk(df, ["term"], b=0.0, top_k=2).toPandas()
    assert abs(flat["score"].iloc[0] - flat["score"].iloc[1]) < 1e-15


# --- pack_bins (FFD, document-preserving) -----------------------------------


def test_pack_bins_laws(docs, spark):
    from sparkswift.operators.packing import pack_bins

    budget, n_packers = 256, 8
    out = pack_bins(docs, budget=budget, n_packers=n_packers).toPandas()
    n_docs = docs.count()
    # every doc in exactly one bin
    assert len(out) == n_docs == out["doc_id"].nunique()
    # bin_load is consistent: per-bin sum of doc_len equals the
    # reported load on every row of that bin
    per_bin = out.groupby("bin_id")["doc_len"].sum()
    assert (out["bin_load"].values == per_bin.loc[out["bin_id"]].values).all()
    # no non-oversize bin exceeds the budget; oversize bins are
    # single-doc and flagged exactly when the doc alone exceeds it
    non_os = out[out["oversize"] == 0]
    assert (non_os.groupby("bin_id")["doc_len"].sum() <= budget).all()
    os_rows = out[out["oversize"] == 1]
    assert (os_rows["doc_len"] > budget).all()
    assert os_rows["bin_id"].is_unique  # own bin each
    assert (out[out["doc_len"] > budget]["oversize"] == 1).all()
    # greedy half-full law: at most one non-oversize bin per packer
    # ends at or below half the budget
    halfish = (
        non_os.groupby(["packer", "bin_id"])["doc_len"].sum() <= budget // 2
    ).groupby("packer").sum()
    assert (halfish <= 1).all()
    # bins never span packers
    assert ((out["bin_id"] // (1 << 32)).astype(int) == out["packer"].astype(int)).all()


def test_pack_bins_partition_invariant_and_deterministic(docs):
    from sparkswift.operators.packing import pack_bins

    a = pack_bins(docs, budget=512, n_packers=4).toPandas()
    b = pack_bins(docs.repartition(13), budget=512, n_packers=4).toPandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_pack_bins_matches_reference_ffd(spark):
    """Single-packer FFD must equal a straight Python FFD over the
    same (len desc, id asc) order — bin ids, loads, everything."""
    from sparkswift.operators.packing import pack_bins

    lens = [300, 200, 200, 150, 100, 90, 60, 10, 5, 700]
    pdf = pd.DataFrame({"doc_id": range(len(lens)), "n": lens})
    df = spark.createDataFrame(pdf)
    out = (
        pack_bins(df, id_col="doc_id", len_col="n", budget=500, n_packers=1)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # reference FFD
    order = sorted(range(len(lens)), key=lambda i: (-lens[i], i))
    bins, assign = [], {}
    for i in order:
        ln = lens[i]
        if ln > 500:
            assign[i] = len(bins)
            bins.append(ln)
            continue
        for b, load in enumerate(bins):
            if load + ln <= 500:
                assign[i] = b
                bins[b] = load + ln
                break
        else:
            assign[i] = len(bins)
            bins.append(ln)
    assert out["bin_id"].tolist() == [assign[i] for i in range(len(lens))]
    assert out["bin_load"].tolist() == [bins[assign[i]] for i in range(len(lens))]
    assert out["oversize"].tolist() == [int(l > 500) for l in lens]


def test_pack_bins_validation(spark):
    from sparkswift.operators.packing import pack_bins

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["a"]}))
    with pytest.raises(ValueError):
        pack_bins(df, budget=0)
    with pytest.raises(ValueError):
        pack_bins(df, n_packers=0)


# --- pack_token_bins / write_token_shards (p23) -----------------------------


@pytest.fixture(scope="module")
def trained_merges(docs):
    from sparkswift.operators.text import bpe_train

    return bpe_train(docs, num_merges=60)


def test_token_bins_carry_exact_id_streams(docs, spark, trained_merges):
    """Each bin's flattened token_ids must equal the doc_id-ordered
    concatenation of its member docs' bpe_encode_ids output, with
    doc_offsets the exact prefix sums."""
    from sparkswift.operators.packing import pack_token_bins
    from sparkswift.operators.text import bpe_encode_ids

    enc = {
        r["doc_id"]: list(r["token_ids"])
        for r in bpe_encode_ids(docs, trained_merges).collect()
    }
    bins = pack_token_bins(
        docs, trained_merges, budget=256, n_packers=4
    ).collect()
    seen = []
    for b in bins:
        ids = list(b["doc_ids"])
        assert ids == sorted(ids)
        seen.extend(ids)
        want = []
        offs = []
        for d in ids:
            offs.append(len(want))
            want.extend(enc[d])
        assert list(b["token_ids"]) == want
        assert list(b["doc_offsets"]) == offs
        assert b["bin_load"] == len(want)
        assert b["n_docs"] == len(ids)
    assert sorted(seen) == sorted(enc)  # every doc exactly once


def test_token_bins_partition_invariant(docs, trained_merges):
    from sparkswift.operators.packing import pack_token_bins

    a = sorted(
        (r["bin_id"], list(r["token_ids"]))
        for r in pack_token_bins(
            docs, trained_merges, budget=256, n_packers=4
        ).collect()
    )
    b = sorted(
        (r["bin_id"], list(r["token_ids"]))
        for r in pack_token_bins(
            docs.repartition(17), trained_merges, budget=256, n_packers=4
        ).collect()
    )
    assert a == b


def test_token_shards_bytes_roundtrip(docs, spark, trained_merges, tmp_path):
    """The written .bin/.idx bytes decode back to exactly the packed
    sequences — sizes, order, and every token id."""
    import numpy as np

    from sparkswift.operators.packing import pack_token_bins
    from sparkswift.sources.writers import (
        _mmidx_parse,
        read_token_shards,
        write_token_shards,
    )

    bins = pack_token_bins(docs, trained_merges, budget=256, n_packers=4)
    path = str(tmp_path / "shards")
    man = write_token_shards(bins, path, n_shards=3)
    man_pd = man.toPandas().set_index("shard").sort_index()
    assert (man_pd["dtype"] == "uint16").all()

    # direct byte-level parse of one shard
    with open(f"{path}/shard_0.idx", "rb") as f:
        dtype, sizes = _mmidx_parse(f.read())
    assert dtype == "uint16"
    raw = np.fromfile(f"{path}/shard_0.bin", dtype="<u2")
    assert raw.size == sizes.sum() == man_pd.loc[0, "n_tokens"]

    # distributed readback agrees with the manifest per shard
    rb = (
        read_token_shards(spark, path)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("token_sum").alias("token_sum"),
        )
        .toPandas()
        .set_index("shard")
        .sort_index()
    )
    assert (rb["n_bins"] == man_pd["n_bins"]).all()
    assert (rb["n_tokens"] == man_pd["n_tokens"]).all()
    assert (rb["token_sum"] == man_pd["token_sum"]).all()


def test_token_shards_int32_when_vocab_overflows_uint16(spark, tmp_path):
    """dtype auto-selection: ids >= 65536 force int32 shards."""
    import numpy as np

    from sparkswift.sources.writers import (
        _mmidx_parse,
        write_token_shards,
    )

    bins = spark.createDataFrame(
        [(0, 0, 0, 2, 4, [1, 2], [0, 2], [70000, 3, 70001, 4])],
        "bin_id long, packer int, oversize int, n_docs long, "
        "bin_load long, doc_ids array<bigint>, doc_offsets array<bigint>, "
        "token_ids array<int>",
    )
    path = str(tmp_path / "wide")
    man = write_token_shards(bins, path, n_shards=1).collect()
    assert man[0]["dtype"] == "int32"
    with open(f"{path}/shard_0.idx", "rb") as f:
        dtype, sizes = _mmidx_parse(f.read())
    assert dtype == "int32" and list(sizes) == [4]
    raw = np.fromfile(f"{path}/shard_0.bin", dtype="<i4")
    assert list(raw) == [70000, 3, 70001, 4]


def test_token_bins_null_and_empty_text(spark, trained_merges):
    """NULL/empty docs pack as zero-length members — present exactly
    once, contributing no tokens (the pack_bins NULL contract)."""
    from sparkswift.operators.packing import pack_token_bins

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "hello world")],
        "doc_id long, text string",
    )
    bins = pack_token_bins(df, trained_merges, budget=64, n_packers=2).collect()
    all_docs = sorted(d for b in bins for d in b["doc_ids"])
    assert all_docs == [1, 2, 3]
    total = sum(b["bin_load"] for b in bins)
    assert total == sum(len(b["token_ids"]) for b in bins)


# --- chunk_token_stream / bpe_decode (p24 / t18) ----------------------------


def test_chunk_token_stream_matches_python_reference(docs, spark, trained_merges):
    """Chunks must equal a pure-python concat-then-chunk over the same
    (md5 bucket, id) order and the same encoded id sequences."""
    import hashlib

    import numpy as np

    from sparkswift.operators.packing import chunk_token_stream
    from sparkswift.operators.text import bpe_encode_ids

    enc = {
        r["doc_id"]: list(r["token_ids"])
        for r in bpe_encode_ids(docs, trained_merges).collect()
    }
    B = 256
    got = {
        (r["shard"], r["chunk_id"]): (
            list(r["token_ids"]), r["n_tokens"], r["n_docs_started"]
        )
        for r in chunk_token_stream(docs, trained_merges, budget=B).collect()
    }
    # python reference
    by_shard: dict[str, list[tuple[str, int]]] = {}
    for d in enc:
        h = hashlib.md5(f"0:{d}".encode()).hexdigest()
        by_shard.setdefault(h[:1], []).append((h, d))
    want = {}
    for shard, members in by_shard.items():
        members.sort()
        stream: list[int] = []
        starts = []
        for _, d in members:
            starts.append(len(stream))
            stream.extend(enc[d])
        n_chunks = max(1, -(-len(stream) // B))
        for c in range(n_chunks):
            lo, hi = c * B, min((c + 1) * B, len(stream))
            hi_eff = hi + 1 if c == n_chunks - 1 else hi
            n_started = sum(1 for s in starts if lo <= s < hi_eff)
            want[(shard, c)] = (stream[lo:hi], hi - lo, n_started)
    assert got == want


def test_chunk_token_stream_partition_invariant(docs, trained_merges):
    from sparkswift.operators.packing import chunk_token_stream

    a = sorted(
        (r["shard"], r["chunk_id"], tuple(r["token_ids"]))
        for r in chunk_token_stream(docs, trained_merges, budget=256).collect()
    )
    b = sorted(
        (r["shard"], r["chunk_id"], tuple(r["token_ids"]))
        for r in chunk_token_stream(
            docs.repartition(11), trained_merges, budget=256
        ).collect()
    )
    assert a == b


def test_chunks_as_bins_roundtrip_through_binary_shards(
    docs, spark, trained_merges, tmp_path
):
    """GPT chunks written through write_token_shards decode back with
    the same sizes and token sums — one binary layout for both
    packing styles."""
    from sparkswift.operators.packing import chunk_token_stream, chunks_as_bins
    from sparkswift.sources.writers import read_token_shards, write_token_shards

    chunks = chunk_token_stream(docs, trained_merges, budget=256)
    bins = chunks_as_bins(chunks)
    path = str(tmp_path / "gpt_shards")
    man = write_token_shards(bins, path, n_shards=2)
    man_pd = man.toPandas()
    rb = read_token_shards(spark, path).toPandas()
    assert rb["n_tokens"].sum() == man_pd["n_tokens"].sum()
    assert rb.groupby("shard")["token_sum"].sum().to_dict() == (
        man_pd.set_index("shard")["token_sum"].to_dict()
    )


def test_bpe_decode_roundtrip_and_unk(spark, docs, trained_merges):
    from sparkswift.operators.text import (
        bpe_decode_text,
        bpe_encode_ids,
        bpe_vocab,
    )

    unk = bpe_vocab(trained_merges)["<unk>"]
    enc = bpe_encode_ids(docs, trained_merges)
    dec = bpe_decode_text(enc, trained_merges).join(
        docs.select("doc_id", "text"), "doc_id"
    )
    norm = F.array_join(
        F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != F.lit("")),
        " ",
    )
    clean = dec.filter(~F.exists("token_ids", lambda i: i == unk))
    assert clean.count() > 0
    assert clean.filter(F.col("decoded") != norm).count() == 0
    # OOV char decodes to a VISIBLE <unk>
    oov = spark.createDataFrame(
        [(1, "plain words then § here")], "doc_id long, text string"
    )
    out = bpe_decode_text(
        bpe_encode_ids(oov, trained_merges), trained_merges
    ).collect()[0]
    assert "<unk>" in out["decoded"]


def test_token_shards_reject_out_of_range_ids(spark, tmp_path):
    """ADVICE r9: negative (or >int32) ids must raise BEFORE writing —
    astype would silently wrap them into corrupt .bin bytes."""
    import pytest as _pytest

    from sparkswift.sources.writers import write_token_shards

    bins = spark.createDataFrame(
        [(0, 0, 0, 1, 2, [1], [0], [-5, 3])],
        "bin_id long, packer int, oversize int, n_docs long, "
        "bin_load long, doc_ids array<bigint>, doc_offsets array<bigint>, "
        "token_ids array<int>",
    )
    with _pytest.raises(ValueError, match="negative token id"):
        write_token_shards(bins, str(tmp_path / "neg"), n_shards=1)


def test_bpe_decode_out_of_range_id_is_visible(spark, trained_merges):
    """ADVICE r9: ids outside [0, vocab) used to decode to NULL, which
    array_join silently DROPS — they must surface as '<bad-id>'."""
    from sparkswift.operators.text import bpe_decode_text, bpe_vocab

    n = len(bpe_vocab(trained_merges))
    df = spark.createDataFrame(
        [(1, [0, n + 7]), (2, [-1])], "doc_id long, token_ids array<int>"
    )
    out = {r["doc_id"]: r["decoded"] for r in bpe_decode_text(df, trained_merges).collect()}
    assert "<bad-id>" in out[1] and "<bad-id>" in out[2]


# --- SFT chat export with loss masks (p31) -----------------------------------


@pytest.fixture(scope="module")
def chat_convs(spark):
    rows = [
        (1, [("system", "be terse"), ("user", "what is spark"),
             ("assistant", "a distributed engine")]),
        (2, [("system", "be terse"), ("user", "count to three"),
             ("assistant", "one two three"), ("user", "and backwards"),
             ("assistant", "three two one")]),
        (3, [("system", "be terse"), ("user", "say nothing"),
             ("assistant", "")]),  # empty assistant content
    ]
    return spark.createDataFrame(
        rows,
        "conv_id long, turns array<struct<role string, content string>>",
    )


def test_sft_masks_match_pure_python(chat_convs, trained_merges):
    """sft_encode_masks vs an independent pure-python render+mask
    reference: ids are the ChatML-rendered word stream's BPE ids and
    the mask is 1 exactly on assistant CONTENT token positions."""
    from sparkswift.operators.packing import (
        SFT_BOS,
        SFT_EOS,
        sft_encode_masks,
    )
    from sparkswift.operators.text import _bpe_word_symbols, bpe_vocab

    ranks = {p: i for i, p in enumerate(trained_merges)}
    vocab = bpe_vocab(trained_merges)
    unk = vocab["<unk>"]

    def ids_of(w):
        return [vocab.get(s, unk) for s in _bpe_word_symbols(w, ranks)]

    got = {
        r["conv_id"]: (list(r["token_ids"]), list(r["loss_mask"]),
                       r["n_tokens"], r["n_unmasked"])
        for r in sft_encode_masks(chat_convs, trained_merges).collect()
    }
    for r in chat_convs.collect():
        ids, mask = [], []
        for t in r["turns"]:
            for w in (SFT_BOS, t["role"]):
                i_ = ids_of(w)
                ids += i_
                mask += [0] * len(i_)
            flag = 1 if t["role"] == "assistant" else 0
            for w in t["content"].split():
                i_ = ids_of(w)
                ids += i_
                mask += [flag] * len(i_)
            i_ = ids_of(SFT_EOS)
            ids += i_
            mask += [0] * len(i_)
        g_ids, g_mask, g_n, g_u = got[r["conv_id"]]
        assert g_ids == ids and g_mask == mask
        assert g_n == len(ids) and g_u == sum(mask)
        assert len(g_ids) == len(g_mask)
    # conv 3's assistant turn is empty -> zero unmasked tokens
    assert got[3][3] == 0


def test_sft_pack_bins_alignment_and_wholeness(chat_convs, trained_merges):
    """Per bin: flattened (ids, mask) equal the conv_id-ordered concat
    of member conversations' encodings, offsets are exact prefix sums,
    n_unmasked sums the mask, and every conversation lands whole in
    exactly one bin."""
    from sparkswift.operators.packing import sft_encode_masks, sft_pack_bins

    enc = {
        r["conv_id"]: (list(r["token_ids"]), list(r["loss_mask"]))
        for r in sft_encode_masks(chat_convs, trained_merges).collect()
    }
    bins = sft_pack_bins(
        chat_convs, trained_merges, budget=64, n_packers=2
    ).collect()
    seen = []
    for b in bins:
        ids = list(b["doc_ids"])
        assert ids == sorted(ids)
        seen.extend(ids)
        want_ids, want_mask, offs = [], [], []
        for d in ids:
            offs.append(len(want_ids))
            want_ids.extend(enc[d][0])
            want_mask.extend(enc[d][1])
        assert list(b["token_ids"]) == want_ids
        assert list(b["loss_mask"]) == want_mask
        assert list(b["doc_offsets"]) == offs
        assert b["bin_load"] == len(want_ids)
        assert b["n_unmasked"] == sum(want_mask)
    assert sorted(seen) == sorted(enc)


def test_sft_shard_mask_sidecar_readback(
    chat_convs, spark, trained_merges, tmp_path
):
    """The .msk sidecar's BYTES align 1:1 with the .bin ids (direct
    parse + distributed readback == manifest), and a mask/id length
    mismatch fails the write loudly."""
    import numpy as np
    import pytest as _pytest

    from sparkswift.operators.packing import sft_pack_bins
    from sparkswift.sources.writers import (
        _mmidx_parse,
        read_token_shards,
        write_token_shards,
    )

    bins = sft_pack_bins(chat_convs, trained_merges, budget=64, n_packers=2)
    path = str(tmp_path / "sft_shards")
    man = write_token_shards(bins, path, n_shards=2, mask_col="loss_mask")
    man_pd = man.toPandas().set_index("shard").sort_index()

    import glob as _glob

    for idxf in sorted(_glob.glob(f"{path}/shard_*.idx")):
        shard = int(idxf.rsplit("_", 1)[1].split(".")[0])
        with open(idxf, "rb") as f:
            _, sizes = _mmidx_parse(f.read())
        mk = np.fromfile(f"{path}/shard_{shard}.msk", dtype=np.uint8)
        assert mk.size == int(sizes.sum())
        assert set(np.unique(mk)) <= {0, 1}
        assert int(mk.sum()) == man_pd.loc[shard, "mask_sum"]

    rb = (
        read_token_shards(spark, path, masks=True)
        .groupBy("shard")
        .agg(
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("mask_sum").alias("mask_sum"),
        )
        .toPandas()
        .set_index("shard")
        .sort_index()
    )
    assert (rb["n_tokens"] == man_pd["n_tokens"]).all()
    assert (rb["mask_sum"] == man_pd["mask_sum"]).all()

    # misaligned mask -> loud failure
    bad = spark.createDataFrame(
        [(0, 0, 0, 1, 2, [1], [0], [5, 3], [1])],
        "bin_id long, packer int, oversize int, n_docs long, "
        "bin_load long, doc_ids array<bigint>, doc_offsets array<bigint>, "
        "token_ids array<int>, loss_mask array<int>",
    )
    with _pytest.raises(Exception, match="mask length"):
        write_token_shards(
            bad, str(tmp_path / "bad"), n_shards=1, mask_col="loss_mask"
        )


def test_length_bucket_batches_laws(spark, sf_dir):
    """Bucketing laws: bucket_len is the least boundary >= ws_tokens
    (cap at the top boundary); within every (bucket, shard) the batch
    ids are contiguous from 0 with every batch full at batch_size
    except possibly the last; membership is insertion-order-free
    (determined by doc_id order)."""
    from collections import defaultdict

    from sparkswift.operators.packing import length_bucket_batches

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = length_bucket_batches(docs, batch_size=8).collect()
    bounds = (16, 32, 64, 128, 256)
    groups = defaultdict(list)
    for r in out:
        want_bucket = next((b for b in bounds if r.ws_tokens <= b), 256)
        assert r.bucket_len == want_bucket, r
        groups[(r.bucket_len, r.shard)].append((r.doc_id, r.batch_id))
    for (_, _), members in groups.items():
        members.sort()
        for i, (_, batch) in enumerate(members):
            assert batch == i // 8
