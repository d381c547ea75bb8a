"""Sequence packing for LLM pretraining pipelines (north-star
extension; nothing like it exists in the reference, whose surface
stops at per-row applies — swifter/swifter.py:287-521).

The standard pretraining data layout is concat-then-chunk: documents
are concatenated in a deterministic order and the token stream is cut
into fixed-budget training sequences. This module computes, for every
document, WHERE it lands in that layout — (shard, start_offset,
chunk_id) — as pure integer window arithmetic, so the assignment is
reproducible on any engine and any partitioning, and exactly
SQL-oracle-able.

Scale design: a single global concatenation order would mean one
totally-ordered window — a single-task sort at 100 TB. Instead the
corpus is hash-sharded first (``md5``-prefix shard key, the same
cross-engine-stable trick as operators/sampling.py) and packed WITHIN
each shard: one shard ≈ one output training file, each shard's cumsum
is an independent window partition, and the whole job is one shuffle
by shard. Shard count is the parallelism knob — pick ~10k shards at
100 TB so each sort fits a task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkswift.operators.sampling import hash_bucket_hex
from sparkswift.operators.text import bpe_token_count, token_count


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 2048,
    shard_nibbles: int = 1,
    seed: int = 0,
    tokenizer: str = "bpe",
) -> DataFrame:
    """Assign every document its place in the concat-then-chunk
    training layout.

    Output columns (all exact integers / hex strings):

    * ``shard``      — first ``shard_nibbles`` hex chars of
                       ``md5(seed ':' id)``: 16**nibbles shards.
    * ``tok_count``  — token cost of the doc (``bpe``/``ws`` tokenizer).
    * ``start_off``  — tokens preceding this doc within its shard's
                       concatenation order (deterministic: docs ordered
                       by full md5 bucket, id as tiebreak).
    * ``chunk_id``   — ``start_off div budget``: the fixed-size
                       training sequence the doc STARTS in (docs may
                       span chunk boundaries, as in real pretraining
                       packing).

    Properties: per-doc assignment is a pure function of (corpus
    membership, seed, budget) — rerunning on different cluster layouts
    or partition counts yields identical placement. Window cumsum per
    shard = one hash shuffle + per-shard sort; no global order anywhere.
    """
    tok = {"bpe": bpe_token_count, "ws": token_count}[tokenizer](text_col)
    bucket = hash_bucket_hex(id_col, seed)
    base = df.select(
        F.col(id_col),
        F.substring(bucket, 1, shard_nibbles).alias("shard"),
        bucket.alias("__ord"),
        tok.alias("tok_count"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("__ord"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        base.withColumn(
            "start_off", F.coalesce(F.sum("tok_count").over(w), F.lit(0)).cast("bigint")
        )
        .withColumn(
            "chunk_id", F.expr(f"start_off div {int(budget)}").cast("bigint")
        )
        .select(id_col, "shard", "tok_count", "start_off", "chunk_id")
    )


def chunk_manifest(
    packed: DataFrame,
    budget: int = 2048,
) -> DataFrame:
    """Roll a :func:`pack_sequences` output up to one row per training
    chunk: how many docs start in it and the token headroom of its
    shard-tail (diagnostics for packing efficiency). Pure aggregation
    over the packed assignment — shuffle on (shard, chunk_id) only."""
    return (
        packed.groupBy("shard", "chunk_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs_started"),
            F.sum("tok_count").cast("bigint").alias("tokens_started"),
            F.min("start_off").cast("bigint").alias("first_off"),
        )
        .withColumn("budget", F.lit(int(budget)).cast("bigint"))
    )


def chunk_overlap(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    size: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Overlapping fixed-size token-window chunking — the RAG/context-
    window preprocessing step: chunk ``i`` covers words
    ``[i*stride, i*stride + size)``; the last window is the first one
    whose end reaches the document end, so every token lands in ≥1
    chunk and consecutive chunks share ``size - stride`` tokens.

    Pure Catalyst: tokenize → ``sequence``/``transform`` builds the
    window list → ``posexplode`` emits one row per chunk. No shuffle,
    no Python — at 100 TB this is a scan-stage flatMap whose output
    partitioning follows the input files. Deterministic integer
    arithmetic throughout (SQL-oracle-able exactly).

    Returns ``(id_col, chunk_id, chunk_text, n_chunk_tokens)``.
    """
    if not (0 < stride <= size):
        raise ValueError(f"need 0 < stride <= size, got {stride=} {size=}")
    from sparkswift.operators.text import tokens

    # null or empty text → zero tokens → zero chunks (posexplode of an
    # empty array emits nothing) — nulls never become phantom chunks.
    # Spark's sequence(0, -1) would count DOWN, so the empty case is
    # guarded explicitly rather than via an empty sequence.
    words = tokens(F.coalesce(F.col(text_col), F.lit("")))
    n = F.size(words).cast("bigint")
    n_chunks = F.when(n <= size, F.lit(1).cast("bigint")).otherwise(
        (F.floor((n - size + stride - 1) / stride) + 1).cast("bigint")
    )
    window_structs = F.transform(
        F.sequence(F.lit(0).cast("bigint"), n_chunks - 1),
        lambda i: F.struct(
            F.array_join(F.slice(words, (i * stride + 1).cast("int"), size), " ").alias(
                "chunk_text"
            ),
            F.least(F.lit(size).cast("bigint"), n - i * stride).alias(
                "n_chunk_tokens"
            ),
        ),
    )
    empty = F.array().cast("array<struct<chunk_text:string,n_chunk_tokens:bigint>>")
    windows = F.when(n == 0, empty).otherwise(window_structs)
    return df.select(
        F.col(id_col),
        F.posexplode(windows).alias("chunk_id", "__c"),
    ).select(
        id_col,
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.col("__c.chunk_text").alias("chunk_text"),
        F.col("__c.n_chunk_tokens").alias("n_chunk_tokens"),
    )


def pack_bins(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 2048,
    n_packers: int = 32,
    seed: int = 0,
    len_col: str | None = None,
) -> DataFrame:
    """Document-preserving bin packing (the T5/FLAN layout, vs
    ``pack_sequences``'s GPT-style concat-then-chunk): every document
    lands WHOLE in exactly one training bin of token ``budget``; no
    document is ever split across sequences. First-fit-decreasing per
    packer.

    Scale design mirrors pack_sequences: token lengths are computed
    NATIVELY at the scan (the text itself never shuffles — only
    (id, len, packer) 20-byte rows move), documents are hash-assigned
    to ``n_packers`` independent packers (md5 on the id: stable under
    reruns and repartitioning), and each packer runs FFD over its own
    docs inside one Arrow batch. ``n_packers`` is the parallelism AND
    memory knob — size it so a packer's (id, len) list fits a task
    (~1M docs/packer is comfortable); bins never span packers.

    Determinism: packer assignment is content-hashed and the FFD order
    is (len DESC, id ASC), so the full bin layout is a pure function
    of the data — partition-layout invariant (pytest-asserted).

    Guarantees (pytest + the p22 gate certify these as laws):
    * every input doc appears in exactly one bin;
    * no bin load exceeds ``budget`` — except a doc longer than the
      budget alone, which gets its OWN bin with ``oversize = 1``;
    * per packer, at most ONE non-oversize bin ends ≤ half-full (the
      classic greedy argument: a second one's first item would have
      fit the first) — so total bins ≤ 2·⌈Σlen/budget⌉ + n_packers.

    Output: (doc_id, packer, doc_len, bin_id, bin_load, oversize)
    with bin_id globally unique as packer·2³² + local index.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if n_packers <= 0:
        raise ValueError("n_packers must be positive")
    from sparkswift.operators.sampling import hash_bucket_hex
    from sparkswift.operators.text import bpe_token_count

    # NULL-text contract (shared with substring_dedup / line_dedup):
    # coalesce to '' so a NULL doc counts 0 tokens — without it,
    # size() yields -1 under legacy sizeOfNull and a length of -1
    # "fits" every bin while DEFLATING its load accounting. A caller-
    # supplied len_col is clamped to ≥ 0 for the same reason.
    length = F.greatest(
        F.lit(0).cast("bigint"),
        F.col(len_col).cast("bigint")
        if len_col is not None
        else bpe_token_count(F.coalesce(F.col(text_col), F.lit(""))),
    )
    lens = df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        length.alias("doc_len"),
        F.pmod(
            F.conv(hash_bucket_hex(id_col, seed), 16, 10).cast("bigint"),
            F.lit(n_packers),
        )
        .cast("int")
        .alias("packer"),
    )

    out_schema = (
        "doc_id bigint, packer int, doc_len bigint, "
        "bin_id bigint, bin_load bigint, oversize int"
    )

    def _ffd(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            ["doc_len", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        packer = int(pdf["packer"].iloc[0])
        base = packer << 32
        bin_loads: list[int] = []      # running load per local bin
        assigned: list[int] = []       # local bin index per row
        oversize: list[int] = []
        # FFD: docs longer than the budget are peeled into their own
        # flagged bins; the rest scan bins first-fit. The inner scan
        # is O(bins) per doc — bounded by the n_packers sizing rule.
        for ln in pdf["doc_len"].astype(int):
            if ln > budget:
                assigned.append(len(bin_loads))
                oversize.append(1)
                bin_loads.append(ln)
                continue
            for b in range(len(bin_loads)):
                if bin_loads[b] + ln <= budget:
                    assigned.append(b)
                    oversize.append(0)
                    bin_loads[b] += ln
                    break
            else:
                assigned.append(len(bin_loads))
                oversize.append(0)
                bin_loads.append(ln)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "packer": pdf["packer"],
                "doc_len": pdf["doc_len"],
                "bin_id": [base + a for a in assigned],
                "bin_load": [bin_loads[a] for a in assigned],
                "oversize": oversize,
            }
        )

    return lens.groupBy("packer").applyInPandas(_ffd, out_schema)


def pack_token_bins(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 2048,
    n_packers: int = 32,
    seed: int = 0,
) -> DataFrame:
    """Training-ready token bins: :func:`pack_bins`'s document-
    preserving FFD layout over the ACTUAL BPE token-id sequences
    (:func:`~sparkswift.operators.text.bpe_encode_ids`), so every bin
    carries the packed uint id array a training job consumes plus the
    doc-boundary offsets T5/FLAN-style attention masking needs. The
    last pipeline stage before :func:`~sparkswift.sources.writers.
    write_token_shards` turns bins into Megatron-layout .bin/.idx
    shards.

    Scale shape: encoding is one Arrow map pass pinned by
    ``localCheckpoint`` so the two consumers (the packer, which needs
    only 20-byte (id, len) rows, and the bin assembly join) don't
    re-run BPE; the only shuffle that carries token ids is the single
    doc_id equi-join + bin groupBy that must co-locate each bin's
    members — the theoretical minimum, since the ids ARE the output.
    Doc order within a bin is doc_id-ascending via ``array_sort`` on
    (doc_id, ids) structs — deterministic under any partitioning, so
    the full shard bytes are a pure function of the data (the p23
    gate law). Offsets are built JVM-side with ``aggregate`` — no
    Python touches the packed arrays.

    Returns one row per bin: ``(bin_id, packer, oversize, n_docs,
    bin_load, doc_ids array<bigint>, doc_offsets array<bigint>,
    token_ids array<int>)`` with ``size(token_ids) == bin_load`` and
    ``doc_offsets[i]`` the start of ``doc_ids[i]``'s span.
    """
    from sparkswift.operators.text import bpe_encode_ids

    enc = bpe_encode_ids(
        df, merges, text_col=text_col, id_col=id_col
    ).localCheckpoint()
    assign = pack_bins(
        enc, id_col=id_col, budget=budget, n_packers=n_packers, seed=seed,
        len_col="n_bpe_tokens",
    )
    joined = enc.select(
        F.col(id_col).cast("bigint").alias("doc_id"), "token_ids"
    ).join(assign, "doc_id")
    docs_sorted = F.array_sort(
        F.collect_list(F.struct("doc_id", "token_ids"))
    )
    bins = joined.groupBy("packer", "bin_id").agg(
        F.max("oversize").alias("oversize"),
        F.sum("doc_len").cast("bigint").alias("bin_load"),
        docs_sorted.alias("__docs"),
    )
    # prefix-sum doc offsets; flatten the id stream — all native exprs
    offs = F.aggregate(
        "__docs",
        F.struct(
            F.array().cast("array<bigint>").alias("o"),
            F.lit(0).cast("bigint").alias("p"),
        ),
        lambda acc, d: F.struct(
            F.concat(acc["o"], F.array(acc["p"])).alias("o"),
            (acc["p"] + F.size(d["token_ids"])).alias("p"),
        ),
        lambda acc: acc["o"],
    )
    return bins.select(
        "bin_id",
        "packer",
        "oversize",
        F.size("__docs").cast("bigint").alias("n_docs"),
        "bin_load",
        F.transform("__docs", lambda d: d["doc_id"]).alias("doc_ids"),
        offs.alias("doc_offsets"),
        F.flatten(F.transform("__docs", lambda d: d["token_ids"])).alias(
            "token_ids"
        ),
    )


# ---------------------------------------------------------------------------
# SFT / chat-format export with per-token loss masks (p31) — the
# supervised-finetuning stage of the pipeline. Public precedent: HF
# chat templates (ChatML-style role markers) + TRL's completion-only
# collator (loss only on assistant tokens) + T5/FLAN packing.
# ---------------------------------------------------------------------------
SFT_BOS = "<|im_start|>"
SFT_EOS = "<|im_end|>"


def sft_encode_masks(
    df: DataFrame,
    merges: list[tuple[str, str]],
    turns_col: str = "turns",
    id_col: str = "conv_id",
) -> DataFrame:
    """Render (system/user/assistant) conversations into a ChatML-
    style template and BPE-encode them with an aligned per-token LOSS
    MASK: each turn renders as ``<|im_start|> role content...
    <|im_end|>`` (whitespace-joined, so the trained word-level BPE
    applies unchanged) and the mask is 1 EXACTLY on assistant-turn
    CONTENT tokens — role markers, template tokens, and non-assistant
    turns are 0 (the TRL completion-only-LM convention: loss on what
    the model should learn to produce, nothing else).

    ``turns_col`` is ``array<struct<role string, content string>>``.
    Arrow-batched ``mapInPandas`` with a per-batch word memo —
    map-side only, no shuffle (the bpe_encode_ids shape).

    Returns ``(id_col, n_tokens, n_unmasked, token_ids array<int>,
    loss_mask array<int>)`` with ``size(loss_mask) ==
    size(token_ids)`` by construction (gate-asserted anyway).
    """
    import pandas as pd

    from sparkswift.operators.text import _bpe_word_symbols, bpe_vocab

    ranks = {p: i for i, p in enumerate(merges)}
    vocab = bpe_vocab(merges)
    unk = vocab["<unk>"]

    def batches(it):
        cache: dict[str, list[int]] = {}

        def ids_of(word: str) -> list[int]:
            c = cache.get(word)
            if c is None:
                c = [
                    vocab.get(s, unk) for s in _bpe_word_symbols(word, ranks)
                ]
                cache[word] = c
            return c

        for pdf in it:
            out_ids, out_mask, n_tok, n_um = [], [], [], []
            for turns in pdf[turns_col]:
                ids: list[int] = []
                mask: list[int] = []
                for t in turns if turns is not None else []:
                    role = t["role"]
                    flag = 1 if role == "assistant" else 0
                    for w in (SFT_BOS, role):
                        i_ = ids_of(w)
                        ids.extend(i_)
                        mask.extend([0] * len(i_))
                    for w in (t["content"] or "").split():
                        i_ = ids_of(w)
                        ids.extend(i_)
                        mask.extend([flag] * len(i_))
                    i_ = ids_of(SFT_EOS)
                    ids.extend(i_)
                    mask.extend([0] * len(i_))
                out_ids.append(ids)
                out_mask.append(mask)
                n_tok.append(len(ids))
                n_um.append(sum(mask))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_tokens": pd.Series(n_tok, dtype="int64"),
                    "n_unmasked": pd.Series(n_um, dtype="int64"),
                    "token_ids": pd.Series(out_ids, dtype="object"),
                    "loss_mask": pd.Series(out_mask, dtype="object"),
                }
            )

    return df.select(F.col(id_col), F.col(turns_col)).mapInPandas(
        batches,
        f"{id_col} long, n_tokens long, n_unmasked long, "
        "token_ids array<int>, loss_mask array<int>",
    )


def sft_pack_bins(
    df: DataFrame,
    merges: list[tuple[str, str]],
    turns_col: str = "turns",
    id_col: str = "conv_id",
    budget: int = 2048,
    n_packers: int = 32,
    seed: int = 0,
) -> DataFrame:
    """:func:`pack_token_bins` for SFT data: FFD-pack whole
    conversations (never split — a chat cut mid-assistant-turn trains
    on garbage) into token bins that carry the packed ids AND the
    aligned per-token loss mask, plus the conversation-boundary
    offsets attention masking needs. Feed to
    :func:`~sparkswift.sources.writers.write_token_shards` with
    ``mask_col='loss_mask'`` for Megatron .bin/.idx shards with the
    ``.msk`` mask sidecar.

    Same scale shape as pack_token_bins: encoding is one Arrow map
    pass pinned by ``localCheckpoint``; the packer moves 20-byte
    (id, len) rows; the single id+mask-carrying shuffle is the
    doc_id equi-join + bin groupBy (the theoretical minimum).

    Returns one row per bin: ``(bin_id, packer, oversize, n_docs,
    bin_load, n_unmasked, doc_ids, doc_offsets, token_ids,
    loss_mask)``.
    """
    enc = sft_encode_masks(
        df, merges, turns_col=turns_col, id_col=id_col
    ).localCheckpoint()
    assign = pack_bins(
        enc, id_col=id_col, budget=budget, n_packers=n_packers, seed=seed,
        len_col="n_tokens",
    )
    joined = enc.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        "token_ids",
        "loss_mask",
    ).join(assign, "doc_id")
    docs_sorted = F.array_sort(
        F.collect_list(F.struct("doc_id", "token_ids", "loss_mask"))
    )
    bins = joined.groupBy("packer", "bin_id").agg(
        F.max("oversize").alias("oversize"),
        F.sum("doc_len").cast("bigint").alias("bin_load"),
        docs_sorted.alias("__docs"),
    )
    offs = F.aggregate(
        "__docs",
        F.struct(
            F.array().cast("array<bigint>").alias("o"),
            F.lit(0).cast("bigint").alias("p"),
        ),
        lambda acc, d: F.struct(
            F.concat(acc["o"], F.array(acc["p"])).alias("o"),
            (acc["p"] + F.size(d["token_ids"])).alias("p"),
        ),
        lambda acc: acc["o"],
    )
    flat_mask = F.flatten(F.transform("__docs", lambda d: d["loss_mask"]))
    return bins.select(
        "bin_id",
        "packer",
        "oversize",
        F.size("__docs").cast("bigint").alias("n_docs"),
        "bin_load",
        F.aggregate(
            flat_mask,
            F.lit(0).cast("bigint"),
            lambda acc, m: acc + m,
        ).alias("n_unmasked"),
        F.transform("__docs", lambda d: d["doc_id"]).alias("doc_ids"),
        offs.alias("doc_offsets"),
        F.flatten(F.transform("__docs", lambda d: d["token_ids"])).alias(
            "token_ids"
        ),
        flat_mask.alias("loss_mask"),
    )


def chunk_token_stream(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 2048,
    shard_nibbles: int = 1,
    seed: int = 0,
) -> DataFrame:
    """GPT-style concat-then-chunk over the ACTUAL BPE token-id
    stream — the materialized twin of :func:`pack_sequences` (which
    computes only placement arithmetic on the regex token estimate):
    documents are ordered deterministically within md5-hash shards
    (same bucket+id order as pack_sequences), their
    :func:`~sparkswift.operators.text.bpe_encode_ids` sequences
    concatenate, and the stream is cut into ``budget``-token training
    chunks; every chunk except each shard's tail is EXACTLY full —
    docs cross chunk boundaries, as in real pretraining.

    Scale shape: encoding is a map pass; the ONE shuffle carries each
    doc's packed id array to its shard's assembly task (the ids are
    the output — this is the minimum, and pack_sequences' docstring
    already sizes shards to tasks: one shard ≈ one training file;
    ~10k shards at 100 TB). Chunks inherit full determinism: the
    layout is a pure function of (corpus, seed, budget) — rerun- and
    partition-invariant.

    Returns ``(shard, chunk_id, n_tokens, n_docs_started,
    token_ids array<int>)``; feed to :func:`~sparkswift.sources.
    writers.write_token_shards` (chunks map onto its bins schema) for
    the binary Megatron layout.
    """
    from sparkswift.operators.text import bpe_encode_ids

    if budget <= 0:
        raise ValueError("budget must be positive")
    enc = bpe_encode_ids(df, merges, text_col=text_col, id_col=id_col)
    bucket = hash_bucket_hex(id_col, seed)
    tagged = df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.substring(bucket, 1, shard_nibbles).alias("shard"),
        bucket.alias("__ord"),
    ).join(
        enc.select(F.col(id_col).cast("bigint").alias("doc_id"), "token_ids"),
        "doc_id",
    )

    out_schema = (
        "shard string, chunk_id bigint, n_tokens bigint, "
        "n_docs_started bigint, token_ids array<int>"
    )

    def _cut(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(["__ord", "doc_id"]).reset_index(drop=True)
        shard = pdf["shard"].iloc[0]
        arrs = [np.asarray(a, dtype=np.int32) for a in pdf["token_ids"]]
        flat = np.concatenate(arrs) if arrs else np.empty(0, dtype=np.int32)
        doc_starts = np.zeros(len(arrs), dtype=np.int64)
        if len(arrs) > 1:
            doc_starts[1:] = np.cumsum([len(a) for a in arrs[:-1]])
        # at least one chunk whenever the shard has docs, so zero-token
        # docs are still claimed; the LAST chunk also claims any doc
        # starting exactly at stream end (trailing empty docs) — every
        # doc is counted by exactly one chunk, the p24 gate law
        n_chunks = max(1, -(-flat.size // budget))
        rows = []
        for c in range(n_chunks):
            lo, hi = c * budget, min((c + 1) * budget, flat.size)
            hi_eff = hi + 1 if c == n_chunks - 1 else hi
            started = int(
                ((doc_starts >= lo) & (doc_starts < hi_eff)).sum()
            )
            rows.append(
                (shard, c, hi - lo, started, flat[lo:hi].tolist())
            )
        return pd.DataFrame(
            rows,
            columns=[
                "shard", "chunk_id", "n_tokens", "n_docs_started", "token_ids"
            ],
        )

    return tagged.groupBy("shard").applyInPandas(_cut, out_schema)


def chunks_as_bins(chunks: DataFrame) -> DataFrame:
    """Adapt :func:`chunk_token_stream` output to the bins schema
    :func:`~sparkswift.sources.writers.write_token_shards` consumes —
    GPT chunks become sequences in the same Megatron .bin/.idx layout
    (bin_id packs (shard, chunk) into one int64; GPT chunks carry no
    intra-bin doc offsets — boundaries sidecar rows stay empty)."""
    shard_num = F.conv(F.col("shard"), 16, 10).cast("bigint")
    return chunks.select(
        (F.shiftleft(shard_num, 32) + F.col("chunk_id")).alias("bin_id"),
        shard_num.cast("int").alias("packer"),
        F.lit(0).alias("oversize"),
        F.col("n_docs_started").cast("bigint").alias("n_docs"),
        F.col("n_tokens").cast("bigint").alias("bin_load"),
        F.array().cast("array<bigint>").alias("doc_ids"),
        F.array().cast("array<bigint>").alias("doc_offsets"),
        "token_ids",
    )


def length_bucket_batches(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    boundaries: tuple[int, ...] = (16, 32, 64, 128, 256),
    batch_size: int = 8,
    n_shards: int = 16,
    seed: int = 0,
) -> DataFrame:
    """Sequence-LENGTH bucketing with deterministic micro-batch
    assignment — the dynamic-batching front half of SFT/eval loaders
    (bucket by padded length so a batch wastes ≤ bucket−len padding,
    then fix the batch membership so step k is reproducible). Each doc
    gets: its whitespace token count, the padded bucket length (least
    boundary ≥ count; the last boundary is also the cap for longer
    docs — the caller truncates), a hash shard, and a batch id =
    0-based rank within (bucket, shard) ordered by id, div batch_size.

    Scale design: batch numbering needs a total order, but only WITHIN
    (bucket, shard) — the md5 shard key (cross-engine-stable, the
    pack_sequences trick) caps every ordered partition at ~corpus/
    (buckets·shards) rows, so the job is ONE shuffle on (bucket,
    shard) with per-partition sorts; no global sort, no single-task
    window. ``n_shards`` is the parallelism knob (one hex nibble = 16
    here; 4 nibbles = 65k shards at 100 TB).

    Returns ``(id, ws_tokens, bucket_len, shard, batch_id)``.
    """
    if n_shards != 16:
        raise ValueError(
            "length_bucket_batches: this build shards by one md5 hex "
            "nibble (n_shards=16); widen the substring for more"
        )
    t = token_count(text_col)
    bucket = F.lit(boundaries[-1])
    for b in reversed(boundaries):
        bucket = F.when(t <= b, F.lit(b)).otherwise(bucket)
    # shard stays the raw hex nibble (a string), the p6 idiom — both
    # engines render md5 identically and no base conversion exists in
    # common between them
    shard = F.substring(hash_bucket_hex(id_col, seed), 1, 1)
    base = docs.select(
        F.col(id_col),
        t.cast("bigint").alias("ws_tokens"),
        bucket.cast("int").alias("bucket_len"),
        shard.alias("shard"),
    )
    w = Window.partitionBy("bucket_len", "shard").orderBy(id_col)
    return (
        base.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "batch_id",
            F.expr(f"CAST(__rn - 1 AS BIGINT) div {int(batch_size)}"),
        )
        .drop("__rn")
    )
