"""Scale rehearsal for the tokenizer-training family (t16/t21/t22):
the claim in docs/SCALE.md is that training cost is ONE distributed
word-frequency aggregate plus driver work over the BOUNDED distinct-
word table — so a corpus 10x the size with the same vocabulary must
(a) produce the IDENTICAL merge table / vocab (uniform x10 counts
preserve every argmax and tie-break — self-checking), and (b) cost
only the aggregate's delta, not 10x the driver phase.

The 10x corpus is the same documents repeated 10 times under fresh
ids — same distinct words, x10 counts. Identity of the learned
artifacts is asserted for all three trainers; wall times printed.

Usage: python tools/bpe_scale.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from sparkswift.session import get_spark
    from sparkswift.sources import load_table
    from sparkswift.operators.text import (
        bpe_train,
        unigram_train,
        wordpiece_train,
    )

    spark = get_spark("bpe-scale")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    big = docs.select(
        F.explode(F.sequence(F.lit(0), F.lit(9))).alias("r"), "doc_id", "text"
    ).select((F.col("doc_id") * 16 + F.col("r")).alias("doc_id"), "text")
    n1, n10 = docs.count(), big.count()
    print(f"docs: {n1} -> {n10}")

    for name, fn, kw in (
        ("bpe", bpe_train, dict(num_merges=200)),
        ("unigram", unigram_train, dict()),
        ("wordpiece", wordpiece_train, dict()),
    ):
        t0 = time.time()
        a = fn(docs, "text", **kw)
        t1 = time.time()
        b = fn(big, "text", **kw)
        t2 = time.time()
        if name == "unigram":
            # integer-exact trainers (bpe/wordpiece) must match
            # BIT-exactly; unigram's EM normalizes float expected
            # counts, so x10 counts shift log-probs by ~1 ulp — the
            # PIECE SET must be identical, scores within 1e-9
            pa, pb = dict(a), dict(b)
            same = set(pa) == set(pb) and all(
                abs(pa[p] - pb[p]) < 1e-9 for p in pa
            )
        else:
            same = a == b
        print(
            f"{name}: artifacts scale-invariant on 10x corpus = {same}; "
            f"wall {t1 - t0:.1f}s -> {t2 - t1:.1f}s (x{(t2 - t1) / (t1 - t0):.2f})"
        )
        assert same, f"{name} trainer is not scale-invariant under x10 counts"


if __name__ == "__main__":
    main()
