"""Scale rehearsal for the persisted dedup-store ingest loop
(VERDICT r12 #8): d14's neardup_incremental probe must cost with the
BATCH, not the store — the whole point of the bucketed store layout
is that a crawl loop's per-batch cost stays flat as the corpus grows.

Protocol (graph_scale.py discipline — self-checking):
* 1x store  = the sf documents, word-salted 'r0'.
* 10x store = ten DISJOINT word-salted variants r0..r9 (every shingle
  differs across copies, so the 10x store is 10x distinct content,
  not 10 near-dup clusters — bucket posting lists stay flat).
* planted-hit probe = copy-0 texts under fresh ids: every doc must
  return store_hit = 1 on BOTH stores (identical text => identical
  signature => 64/64 agreement; deterministic, scale-invariant).
* miss probe = a 'q'-salted variant: store_hit must be 0 everywhere.
* timing: interleaved reps of the miss probe against the 1x and 10x
  stores (update_store=False isolates probe cost), plus a 4x batch
  against the 10x store — cost must follow the batch, not the store.

Usage: python tools/store_scale.py [sf_dir]   (default sf0.1;
reps via STORE_SCALE_REPS, default 3)
"""

from __future__ import annotations

import os
import statistics
import sys
import time
import uuid

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def salted(docs: DataFrame, tag: str) -> DataFrame:
    """Every word gets the tag suffix — all k>=1 word shingles differ
    from every other tag's, so variants share no near-dups."""
    return docs.select(
        "doc_id",
        F.array_join(
            F.transform(F.split("text", " "), lambda w: F.concat(w, F.lit(tag))),
            " ",
        ).alias("text"),
    )


def variant(docs: DataFrame, r: int, tag_prefix: str = "r") -> DataFrame:
    return salted(docs, f"{tag_prefix}{r}").select(
        (F.col("doc_id") * 16 + r).alias("doc_id"), "text"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(os.environ.get("STORE_SCALE_REPS", "3"))

    from sparkswift.session import get_spark
    from sparkswift.sources import load_table
    from sparkswift.operators import dedup as dd

    spark = get_spark("store-scale")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()

    run = uuid.uuid4().hex[:8]
    s1 = f"ndscale1_{run}"
    s10 = f"ndscale10_{run}"
    seed1 = variant(docs, 0)
    seed10 = seed1
    for r in range(1, 10):
        seed10 = seed10.unionByName(variant(docs, r))
    t0 = time.time()
    dd.neardup_incremental(
        seed1, s1, update_store=True, bucketed=True, num_buckets=16
    ).count()
    t_seed1 = time.time() - t0
    t0 = time.time()
    dd.neardup_incremental(
        seed10, s10, update_store=True, bucketed=True, num_buckets=16
    ).count()
    t_seed10 = time.time() - t0

    rows1 = spark.table(f"{s1}_buckets").count()
    rows10 = spark.table(f"{s10}_buckets").count()
    print(f"docs/variant: {n}; store bucket rows 1x={rows1} 10x={rows10} "
          f"(ratio {rows10 / rows1:.2f}); seed wall {t_seed1:.1f}s / "
          f"{t_seed10:.1f}s")
    assert rows10 == 10 * rows1, "10x store must hold exactly 10x postings"

    # self-check: planted hits (copy-0 text, fresh ids) on BOTH stores
    planted = variant(docs, 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    for name, store in (("1x", s1), ("10x", s10)):
        hits = (
            dd.neardup_incremental(
                planted, store, update_store=False, bucketed=True, num_buckets=16
            )
            .agg(F.sum("store_hit").cast("long").alias("h"))
            .collect()[0]
            .h
        )
        assert hits == n, (name, hits, n)
    print(f"planted-hit probe: {n}/{n} store_hit=1 on both stores")

    # miss probes, interleaved timing
    probe1 = salted(docs, "q0")
    probe4 = probe1
    for r in range(1, 4):
        probe4 = probe4.unionByName(
            salted(docs, f"q{r}").select(
                (F.col("doc_id") * 16 + r + 8_000_000).alias("doc_id"), "text"
            )
        )
    timings: dict[str, list[float]] = {"1x": [], "10x": [], "10x_batch4": []}

    def probe(batch: DataFrame, store: str) -> float:
        t0 = time.time()
        out = dd.neardup_incremental(
            batch, store, update_store=False, bucketed=True, num_buckets=16
        )
        bad = out.agg(F.sum("store_hit").alias("h")).collect()[0].h
        assert not bad, f"miss probe produced {bad} store hits"
        return time.time() - t0

    probe(probe1, s1)  # warm
    for _ in range(reps):
        timings["1x"].append(probe(probe1, s1))
        timings["10x"].append(probe(probe1, s10))
        timings["10x_batch4"].append(probe(probe4, s10))
    med = {k: statistics.median(v) for k, v in timings.items()}
    for k, v in timings.items():
        print(f"probe {k}: median {med[k]:.2f}s  reps {[round(x, 2) for x in v]}")
    print(
        f"store-growth cost ratio (10x/1x, same batch): "
        f"{med['10x'] / med['1x']:.2f}  |  batch-growth ratio "
        f"(4x batch on 10x store): {med['10x_batch4'] / med['10x']:.2f}"
    )
    for suffix in ("_buckets", "_sigs"):
        spark.sql(f"DROP TABLE IF EXISTS {s1}{suffix}")
        spark.sql(f"DROP TABLE IF EXISTS {s10}{suffix}")


if __name__ == "__main__":
    main()
