"""Python UDTFs — the genuine Spark table-function surface (SQL
``LATERAL`` / table arguments), complementing the mapInPandas explode
shape used by the hot-path operators (multimodal.sample_frames,
packing.chunk_overlap).

The reference has no UDTF concept (its surface stops at scalar/row
applies — swifter/swifter.py:287-521); this module exists so a user
arriving from SQL can call the engine's chunking/n-gram logic as a
table function: ``SELECT d.doc_id, c.* FROM documents d, LATERAL
chunk_text(d.text, 32, 24) c``.

Scale note: a Python UDTF is row-at-a-time Python — fine for the
lateral-join ergonomics it exists for, but the BULK path for the same
semantics is the native-expression `packing.chunk_overlap`
(posexplode, whole-stage codegen; equality is pytest-asserted). Use
UDTFs at the edges, expressions in the hot loop.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id: bigint, chunk_text: string, n_chunk_tokens: bigint")
class ChunkText:
    """Overlapping token-window chunking as a table function — same
    window rule as :func:`sparkswift.operators.packing.chunk_overlap`:
    chunk ``i`` covers words ``[i*stride, i*stride+size)``; null/empty
    text emits zero rows."""

    def eval(self, text: str, size: int, stride: int):
        if not (0 < stride <= size):
            raise ValueError(f"need 0 < stride <= size, got {stride=} {size=}")
        words = text.split() if text else []
        n = len(words)
        if n == 0:
            return
        n_chunks = 1 if n <= size else -((n - size) // -stride) + 1
        for i in range(n_chunks):
            start = i * stride
            chunk = words[start : start + size]
            yield (i, " ".join(chunk), len(chunk))


@udtf(returnType="pos: bigint, ngram: string")
class WordNgrams:
    """k-word n-grams with their positions (a doc shorter than k
    yields its whole text at pos 0 — word_shingles' rule)."""

    def eval(self, text: str, k: int):
        words = text.split() if text else []
        if not words:
            return
        if len(words) < k:
            yield (0, " ".join(words))
            return
        for i in range(len(words) - k + 1):
            yield (i, " ".join(words[i : i + k]))


def register_udtfs(spark) -> None:
    """Register every UDTF under its SQL name (idempotent)."""
    spark.udtf.register("chunk_text", ChunkText)
    spark.udtf.register("word_ngrams", WordNgrams)
