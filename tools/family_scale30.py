"""x30/x100 scale rehearsal with spill/peak-memory capture (VERDICT
r14 "Next round" #4: push the rehearsal program past x10 on the
shuffle-heaviest families and one ANN build, recording measured
exponents and memory behavior, not just wall ratios).

Methodology = tools/family_scale.py's disjoint-copy self-check,
generalized: k copies with id stride 128 (so k<=128 never collides)
and every token suffixed with the copy id — all counted totals must
scale exactly xk or the run fails loudly. New here:

* k in (1, 10, 30) by default — override with
  SPARK_GRAFT_SCALE_KS=1,10,100 for the x100 rung — and a fitted
  exponent e = log(w_kmax/w_1)/log(kmax) per family (e<=1 = no
  superlinear term).
* spill + peak memory: run with SPARK_GRAFT_UI=1 and this tool sums
  memoryBytesSpilled/diskBytesSpilled across completed stages from
  the status REST API between marks, and reads the JVM's VmHWM from
  /proc (single-JVM local mode: driver+executors share the process,
  so VmHWM IS executor peak here).
* e6 IVFPQ build at corpus x1/x10/x30 (5k -> 150k vectors): not
  self-checking (k-means is corpus-global); recorded for wall/memory
  scaling of the build+search path with a FIXED query set.

Usage: SPARK_GRAFT_UI=1 python tools/family_scale30.py [sf_dir] \
           [d13|d11|d15|e6 ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

STRIDE = 128  # id stride: copies k<=128 never collide


def doc_copies(docs: DataFrame, k: int) -> DataFrame:
    """k disjoint copies: ids id*128+r, every TOKEN suffixed with the
    copy id (units never match across copies; within-copy structure
    untouched — the 1x baseline applies the same r=0 suffix)."""
    c = docs.select(
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("r"),
        "doc_id",
        "text",
    )
    txt = F.regexp_replace(
        "text", r"(\S+)", F.concat(F.lit("$1_"), F.col("r"))
    )
    return c.select(
        (F.col("doc_id") * STRIDE + F.col("r")).alias("doc_id"),
        txt.alias("text"),
    )


def _jvm_peak_gb(spark) -> float:
    pid = spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid()
    with open(f"/proc/{pid}/status") as f:
        for line in f:
            if line.startswith("VmHWM"):
                return int(line.split()[1]) / 1024 / 1024
    return float("nan")


def _spill_bytes(spark) -> tuple[int, int]:
    """(memorySpilled, diskSpilled) summed over completed stages via
    the status REST API; (0, 0) when the UI is off."""
    try:
        ui = spark.sparkContext.uiWebUrl
        if not ui:
            return 0, 0
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete",
            timeout=10,
        ) as r:
            import json

            stages = json.load(r)
        return (
            sum(s.get("memoryBytesSpilled", 0) for s in stages),
            sum(s.get("diskBytesSpilled", 0) for s in stages),
        )
    except Exception as e:  # UI off or API shape drift: report, not fail
        print(f"  (spill capture unavailable: {e})")
        return 0, 0


class Meter:
    def __init__(self, spark):
        self.spark = spark

    def run(self, label: str, fn):
        m0, d0 = _spill_bytes(self.spark)
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        m1, d1 = _spill_bytes(self.spark)
        peak = _jvm_peak_gb(self.spark)
        print(
            f"{label}: wall={dt:.1f}s spill_mem={(m1 - m0) / 1e6:.0f}MB "
            f"spill_disk={(d1 - d0) / 1e6:.0f}MB jvm_peak={peak:.1f}GB"
        )
        return out, dt


def _exponent(w1: float, wk: float, k: int) -> float:
    return math.log(max(wk, 1e-9) / max(w1, 1e-9)) / math.log(k)


def rehearse_d13(spark, sf_dir: str, ks=(1, 10, 30)) -> None:
    from sparkswift.operators.dedup import line_dedup
    from sparkswift.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    m = Meter(spark)
    walls, kepts = {}, {}
    for k in ks:
        d = doc_copies(docs, k)

        def go():
            out = line_dedup(d, line_sep=" ")
            return out.agg(F.sum("n_lines_kept").alias("kept")).collect()[
                0
            ].kept

        kept, dt = m.run(f"d13 k={k}", go)
        walls[k], kepts[k] = dt, kept
    for k in ks[1:]:
        assert kepts[k] == k * kepts[1], (k, kepts)
    e = _exponent(walls[ks[0]], walls[ks[-1]], ks[-1])
    print(f"d13 self-check OK; exponent e={e:.2f} over x{ks[-1]}")


def rehearse_d15(spark, sf_dir: str, ks=(1, 10, 30)) -> None:
    from sparkswift.operators.dedup import substring_dedup
    from sparkswift.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    m = Meter(spark)
    walls, kepts = {}, {}
    for k in ks:
        d = doc_copies(docs, k)

        def go():
            out = substring_dedup(d, window=20)
            return out.agg(F.sum("n_tokens_kept").alias("kept")).collect()[
                0
            ].kept

        kept, dt = m.run(f"d15 k={k}", go)
        walls[k], kepts[k] = dt, kept
    for k in ks[1:]:
        assert kepts[k] == k * kepts[1], (k, kepts)
    e = _exponent(walls[ks[0]], walls[ks[-1]], ks[-1])
    print(f"d15 self-check OK; exponent e={e:.2f} over x{ks[-1]}")


def rehearse_d11(spark, sf_dir: str, ks=(1, 10, 30)) -> None:
    from sparkswift.operators.dedup import fuzzy_join
    from sparkswift.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    m = Meter(spark)
    walls, pairs = {}, {}
    for k in ks:
        d = doc_copies(docs, k)
        right = d.select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
        )
        n, dt = m.run(
            f"d11 k={k}",
            lambda: fuzzy_join(d, right, k=3, threshold=0.8).count(),
        )
        walls[k], pairs[k] = dt, n
    for k in ks[1:]:
        assert pairs[k] == k * pairs[1], (k, pairs)
    e = _exponent(walls[ks[0]], walls[ks[-1]], ks[-1])
    print(f"d11 self-check OK; exponent e={e:.2f} over x{ks[-1]}")


def rehearse_e6(spark, sf_dir: str, ks=(1, 10, 30)) -> None:
    from sparkswift.operators import similarity as sim
    from sparkswift.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("label") == 0).limit(100).localCheckpoint()
    m = Meter(spark)
    walls = {}
    for k in ks:
        corpus = emb.select(
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("r"),
            "vec_id",
            "embedding",
        ).select(
            (F.col("vec_id") * STRIDE + F.col("r")).alias("vec_id"),
            "embedding",
        )
        n, dt = m.run(
            f"e6 k={k}",
            lambda: sim.cosine_topk_ivfpq(
                corpus, queries, k=5, train_size=2000, nprobe=12, refine=8
            ).count(),
        )
        walls[k] = dt
        print(f"  e6 k={k}: result rows={n}")
    e = _exponent(walls[ks[0]], walls[ks[-1]], ks[-1])
    print(f"e6 exponent e={e:.2f} over x{ks[-1]} corpus (fixed 100 queries)")


def main() -> None:
    from sparkswift.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    which = set(sys.argv[2:]) or {"d13", "d15", "d11", "e6"}
    ks = tuple(
        int(x)
        for x in os.environ.get("SPARK_GRAFT_SCALE_KS", "1,10,30").split(",")
    )
    assert max(ks) <= STRIDE, (ks, STRIDE)
    if os.environ.get("SPARK_GRAFT_UI") != "1":
        print("hint: SPARK_GRAFT_UI=1 enables spill capture")
    spark = get_spark("family-scale30")
    spark.sparkContext.setLogLevel("ERROR")
    if "d13" in which:
        rehearse_d13(spark, sf_dir, ks)
    if "d15" in which:
        rehearse_d15(spark, sf_dir, ks)
    if "d11" in which:
        rehearse_d11(spark, sf_dir, ks)
    if "e6" in which:
        rehearse_e6(spark, sf_dir, ks)


if __name__ == "__main__":
    main()
