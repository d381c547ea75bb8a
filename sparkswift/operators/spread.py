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


# Per-task input budget for chains whose per-row work is CHEAP
# relative to bytes (native expressions, candidate-bounded joins,
# vectorized BLAS scans): a fixture-scale frame then stays in its
# scan partitioning (width 1 → no exchange at all), a genuinely big
# single-file input still widens, and a real corpus scan is already
# wide so the call no-ops — same cluster plan as the heavy tier.
# Measured (r16 cold, sf0.1): forcing such chains to full width cost
# 0.5–2.3 s/query in exchange + task overhead with nothing to
# parallelize (e16 9.6→7.1 s, mm32 6.7→3.7 s, d16 5.2→3.9 s), while
# per-row-HEAVY chains (regex/shingle/decode/all-pairs scoring) lose
# multiples of that without full width (p20 3.0→7.9 s, d3 2.6→6.5 s,
# e1 1.4→3.6 s off). The caller knows the downstream cost; the two
# tiers encode it.
LIGHT_TASK_BYTES = 32 << 20


def spread_width(
    df: DataFrame, task_bytes: int | None = None, floor: int = 2
) -> int:
    """Adaptive spread width: input-size-derived, capped at
    ``defaultParallelism``, floored at ``floor`` (the heavy tier's 2
    always exercises distribution)."""
    n = df.sparkSession.sparkContext.defaultParallelism
    budget = task_bytes or int(
        os.environ.get("SPARK_GRAFT_SPREAD_TASK_BYTES", "4096")
    )
    try:
        sz = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return n
    return max(floor, min(n, -(-sz // budget)))


def spread(
    df: DataFrame, task_bytes: int | None = None, floor: int = 2
) -> DataFrame:
    """Spread a narrow input before a per-row-heavy chain. No-op for
    streaming inputs (micro-batch parallelism comes from the source;
    ``.rdd`` is illegal on a streaming frame) and when the input
    already has at least the adaptive width — always true at real
    scale, so cluster plans are unchanged."""
    if df.isStreaming:
        return df
    if os.environ.get("SPARK_GRAFT_SPREAD", "1") == "0":  # A/B gate (r16)
        return df
    w = spread_width(df, task_bytes, floor)
    if w <= 1:
        return df
    if df.rdd.getNumPartitions() >= w:
        return df
    return df.repartition(w)


def spread_light(df: DataFrame) -> DataFrame:
    """The cheap-chain tier: see ``LIGHT_TASK_BYTES``. Floor 1 — a
    fixture-scale frame is NOT exchanged at all."""
    return spread(df, task_bytes=LIGHT_TASK_BYTES, floor=1)
