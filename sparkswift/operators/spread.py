"""Scale-adaptive input spreading for per-row-heavy Arrow/expression
chains.

The problem (guide §2.3): single-file fixtures scan as ONE partition
and projections / mapInPandas preserve partitioning, so a heavy
per-row chain runs on one core of a 32-core host unless spread. The
counter-problem (measured this round): EVERY task costs ~10-12 ms of
serialized scheduling + Python-runner handshake in local mode, so
spreading a few-hundred-row frame to ``defaultParallelism`` buys
nothing and pays a fixed ~0.4 s per 32-task wave — multiplied by the
union fan-outs (st38's four-format ingest ran 128 tasks for ~1.7 k
rows).

The width therefore follows the INPUT SIZE, not the core count
(guide §2: derive partitioning from data volume, never a constant
tuned for either local mode or the cluster):

    width = clamp(ceil(est_bytes / SPARK_GRAFT_SPREAD_TASK_BYTES),
                  2, defaultParallelism)

``est_bytes`` is the optimizer's size estimate (the `_chain_rounds`
pattern). The default budget (4 KB of input per task) keeps every
fixture-scale chain at full width — documents-scale frames estimate
~100 KB+ — while micro-batch slices (~7 KB) drop to 2 tasks; any real
corpus estimates in the GBs and pins the width at the cap, so cluster
plans are unchanged. The env knob exists for clusters whose per-row
work is extreme relative to input bytes (decode farms): lower it to
widen early.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def spread_width(df: DataFrame) -> int:
    """Adaptive spread width: input-size-derived, capped at
    ``defaultParallelism``, floored at 2 (always exercises
    distribution)."""
    n = df.sparkSession.sparkContext.defaultParallelism
    budget = int(os.environ.get("SPARK_GRAFT_SPREAD_TASK_BYTES", "4096"))
    try:
        sz = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return n
    return max(2, min(n, -(-sz // budget)))


def spread(df: DataFrame) -> DataFrame:
    """Spread a narrow input before a per-row-heavy chain. No-op for
    streaming inputs (micro-batch parallelism comes from the source;
    ``.rdd`` is illegal on a streaming frame) and when the input
    already has at least the adaptive width — always true at real
    scale, so cluster plans are unchanged."""
    if df.isStreaming:
        return df
    w = spread_width(df)
    if df.rdd.getNumPartitions() >= w:
        return df
    return df.repartition(w)
