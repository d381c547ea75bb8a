"""Iterative graph algorithms (north-star extension; the reference has
no graph surface — swifter stops at per-row applies).

Connected components live in :mod:`sparkswift.operators.dedup` (they
are the dedup-cluster primitive); this module holds the general
iterative-algorithm pattern with PageRank as the canonical instance:
per iteration one join + one aggregate, lineage broken by
``localCheckpoint`` so the plan stays O(1) deep, and NO driver-side
state beyond the loop counter — the 100 TB shape for power iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 10,
) -> DataFrame:
    """PageRank by power iteration over an edge list.

    Per iteration: contributions = edges ⋈ ranks on ``src`` (one hash
    shuffle; at scale pre-partition both sides by ``src`` to reuse the
    exchange), summed by ``dst`` (second shuffle); dangling mass
    (nodes with no out-edges) is computed as a one-row aggregate and
    broadcast back — no driver collect of anything node-sized. Each
    iteration ends in ``localCheckpoint`` so lineage depth stays
    constant across iterations (the CC lesson, dedup.py).

    Returns ``(node, rank)`` with Σrank = 1 up to float rounding.
    Deterministic up to float-sum association order — rows-only
    verification; exactness is pytest-asserted against a numpy power
    iteration on the same graph.
    """
    # materialize the (possibly expensive) edge derivation ONCE — the
    # loop re-evaluates whatever plan `edges` carries every iteration
    # otherwise (a join+distinct upstream would run max_iter times)
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    # static per-iteration inputs, built once: edges with their source
    # degree attached, and the (possibly empty) dangling-node set
    e_deg = e.join(out_deg, "src").localCheckpoint()
    dangling_nodes = nodes.join(
        out_deg, nodes["node"] == out_deg["src"], "left_anti"
    ).localCheckpoint()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))

    for _ in range(max_iter):
        # dangling mass: one-row aggregate, broadcast back
        dangling = ranks.join(dangling_nodes, "node", "left_semi").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
        )
        contribs = (
            e_deg.join(ranks, e_deg["src"] == ranks["node"])
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.col("__dm") / n)
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
