"""Fleet-wide physical-plan lint: the scale anti-patterns no
registered query may exhibit, enforced over the WHOLE registry (the
hand-written tests in tests/test_plans.py assert per-query design
properties; this is the floor under everything else).

Rules, from the 100 TB design rules (docs/SCALE.md):

* no ``CartesianProduct`` — a cartesian plan on corpus-scaling sides
  is never acceptable;
* no ``BatchEvalPython`` — row-at-a-time Python in any hot path (the
  Arrow route ``ArrowEvalPython``/``MapInPandas`` is the sanctioned
  Python surface);
* no ``Exchange rangepartitioning`` — a global sort; top-k must plan
  as TakeOrdered, ordering for presentation is the reader's job;
* ``BroadcastNestedLoopJoin`` only where allowlisted with a bound:
  every allowlisted occurrence is a broadcast ONE-ROW aggregate
  (thresholds, normalizers, verdict fan-ins) or a broadcast
  SMALL-DIM interval join — bounded by construction, and the
  allowlist pins the count so a new unbounded loop can't hide
  behind an existing sanctioned one.

Usage: python tools/planlint.py [sf_dir] [query ...]   (exit 1 on any
violation). The pytest twin (tests/test_plan_lint.py) runs the
driver-window subset on every test run; this tool sweeps the full
registry (some index/store builds run real jobs at plan-build time,
~4 min total).
"""

from __future__ import annotations

import sys

# name -> max BroadcastNestedLoopJoin occurrences, each a broadcast
# one-row aggregate join (or j5's broadcast small-dim interval join).
# Re-pointed names (suite._REPOINT) are keyed by their REGISTRY name
# (the verdict frame they now serve); their raw-output twins sweep
# under a "raw:" prefix with the default allowance of 0.
BNLJ_ALLOWED: dict[str, int] = {
    "j5_range_join": 1,  # broadcast SMALL-DIM band join (by design)
    "d5_embedding_neardup": 1,  # one-row norm threshold
    "agg14_skew_report": 1,  # one-row total join
    "agg22_rolling_distinct": 1,  # one-row day-bounds clamp join
    "q22_sales_opportunity": 1,  # one-row balance threshold
    "q11_important_stock": 1,  # one-row inventory-total threshold
    "e1_cosine_topk": 1,  # one-row query-norm
    "e15_filtered_topk": 1,  # e1's broadcast query scan (by design)
    "e13_cosine_range": 1,  # broadcast query set x corpus scan (by design)
    "e14_cosine_range_ivf": 4,  # e13's broadcast query scan + one-row verdict fan-in
    "e16_filtered_topk_ivf": 5,  # e2-shaped verdict fan-in + one-row leak check
    "e12_hybrid_rrf": 2,  # t12's one-row corpus stats + e1's one-row query
    "t7_tfidf_top_terms": 1,  # one-row doc-count
    "t12_bm25": 1,  # one-row corpus stats
    "t15_unigram_logprob": 1,  # one-row vocab total
    "t20_bigram_logprob": 1,  # one-row vocab total
    "agg18_corr_matrix": 3,  # one-row count join, re-planned per reuse
    "p20_dsir_select": 1,  # one-row corpus totals
    "st13_stream_ivf_ingest": 1,  # one-row verdict fan-in
    "d2_skew_gate": 3,  # verdict row joins
    "d11_skew_gate": 4,  # one-row verdict fan-in (left/hot/uniq/bad/max)
    "d3_minhash_lsh": 1,
    "d4_simhash": 1,
    "d6_embedding_neardup_lsh": 3,
    "d8_neardup_pipeline": 1,
    "d12_semdedup": 3,
    "d14_neardup_incremental": 1,  # one-row verdict fan-in (n_recrawls x miss)
    "d15_substring_dedup": 3,
    "d16_semdedup_incremental": 1,  # one-row verdict fan-in (n_readds x miss)
    "e2_cosine_topk_lsh": 4,
    "e11_cosine_topk_sq": 4,  # one-row verdict fan-in, same shape as e2-e7 gates
    "e3_cosine_topk_ivf": 4,
    "e4_cosine_topk_ivf_persisted": 4,
    "e5_cosine_topk_pq": 4,
    "e6_cosine_topk_ivfpq": 4,
    "e10_cosine_topk_opq": 4,
    "e7_cosine_topk_ivfpq_persisted": 4,
    "p5_decontaminate_bloom": 1,
    "p16_quality_bins_global": 1,
    "p22_pack_bins": 3,
    "p31_sft_export": 7,  # one-row eos-template join + verdict fan-in (6 frames)
    "st28_stream_sft_masks": 1,  # one-row verdict fan-in
    "st29_stream_ohlc_ingest": 2,  # one-row verdict fan-in (rows x candles x mism)
    "st30_stream_compression_ratio": 1,  # one-row verdict fan-in
    "st31_stream_qoi_decode": 1,  # one-row verdict fan-in
    "g10_degree_assortativity": 2,  # one-row node/edge-count fan-in
    "st32_stream_cusum": 1,  # one-row verdict fan-in
    "st33_stream_spatial_join": 1,  # one-row verdict fan-in
    "t18_bpe_decode_gate": 2,  # one-row verdict fan-in (docs x bad x planted)
    "t21_unigram_tokens": 4,  # one-row verdict fan-in (rt/ids/re/planted)
    "t22_wordpiece_tokens": 4,  # one-row verdict fan-in (rt/ids/re/planted)
    "t23_gate": 2,  # one-row verdict fan-in (bounds x planted-discrimination)
    "p23_token_shards": 5,  # one-row verdict fan-in (docs/uniq/manifest/enc/readback)
    "p24_token_chunks": 4,  # one-row verdict fan-in (docs/full/totals/enc/dense)
    "p25_gate": 3,  # one-row verdict fan-in (sel/manifest/enc/readback)
    "st10_stream_neardup": 2,
    "agg16_heavy_hitters_gate": 8,
    "p26_gate": 3,  # one-row verdict fan-in (docs x members x bad x mani)
}

RANGE_EXCHANGE_ALLOWED: frozenset[str] = frozenset()


def lint_plan(name: str, plan: str) -> list[str]:
    """Return the rule violations for one query's executedPlan text."""
    flags: list[str] = []
    if "CartesianProduct" in plan:
        flags.append("CartesianProduct")
    if "BatchEvalPython" in plan:
        flags.append("BatchEvalPython (row-at-a-time Python)")
    n_bnlj = plan.count("BroadcastNestedLoopJoin")
    if n_bnlj > BNLJ_ALLOWED.get(name, 0):
        flags.append(
            f"BroadcastNestedLoopJoin x{n_bnlj} "
            f"(allowed {BNLJ_ALLOWED.get(name, 0)})"
        )
    if (
        "Exchange rangepartitioning" in plan
        and name not in RANGE_EXCHANGE_ALLOWED
    ):
        flags.append("Exchange rangepartitioning (global sort)")
    return flags


def main() -> int:
    sys.path.insert(0, "/root/repo")
    from sparkswift.session import get_spark
    from sparkswift import suite

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark("planlint")
    spark.sparkContext.setLogLevel("ERROR")
    violations: dict[str, list[str]] = {}
    n = 0
    # the registry (verdict frames for re-pointed names) plus the raw
    # rows-only operator outputs bench.py times — both must hold the
    # fleet-wide floor
    targets = dict(suite.queries())
    targets.update(
        {f"raw:{n}": fn for n, fn in suite.raw_queries().items()}
    )
    for name, fn in targets.items():
        if only and name not in only and name.removeprefix("raw:") not in only:
            continue
        n += 1
        try:
            plan = (
                fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
            )
        except Exception as ex:  # a build failure is itself a violation
            violations[name] = [f"plan build failed: {type(ex).__name__}: {ex}"]
            continue
        flags = lint_plan(name, plan)
        if flags:
            violations[name] = flags
    for name, flags in violations.items():
        print(f"LINT {name}: {'; '.join(flags)}")
    print(f"{n - len(violations)}/{n} clean")
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
