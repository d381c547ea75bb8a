"""Scale rehearsal for the iterative graph family (VERDICT r11 #7):
synthesize a deterministic ~10x edge set from the sf0.1 fixture
graphs (10 DISJOINT copies via explode — node id*16+replica), run
g3 triangle counting, g6 LPA, and g7 link prediction on both scales,
and measure wall time + the driving volumes (edges, wedge volume,
LPA rounds) against the docs/SCALE.md formulas.

Disjoint copies make the rehearsal SELF-CHECKING: every per-copy
result is identical to the 1x run, so total triangles and community
count must scale exactly 10x — a wrong 10x graph build or a
scale-dependent bug in an operator fails loudly, and the wall-clock
ratio is attributable to data volume alone.

Usage: python tools/graph_scale.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def copies(edges: DataFrame, k: int) -> DataFrame:
    """k disjoint copies: (src, dst) -> (src*16+r, dst*16+r), r<k."""
    return edges.select(
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("r"),
        "src",
        "dst",
    ).select(
        (F.col("src") * 16 + F.col("r")).alias("src"),
        (F.col("dst") * 16 + F.col("r")).alias("dst"),
    )


def canon(edges: DataFrame) -> DataFrame:
    return (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .filter(F.col("src") < F.col("dst"))
        .distinct()
    )


def wedge_volume(edges: DataFrame) -> int:
    """Sum deg(center)^2 over the canonical undirected graph — the g7
    wedge driver (orientation cannot bound it)."""
    e = canon(edges)
    adj = e.selectExpr("src as c").unionAll(e.selectExpr("dst as c"))
    return int(
        adj.groupBy("c")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.sum(F.col("d") * F.col("d")))
        .collect()[0][0]
    )


def oriented_wedges(edges: DataFrame) -> int:
    """Sum outdeg^2-ish volume after degree orientation — the g3
    wedge driver (choose(outdeg, 2) summed)."""
    e = canon(edges)
    deg = (
        e.selectExpr("src as n")
        .unionAll(e.selectExpr("dst as n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    dx = deg.selectExpr("n as src", "d as dx")
    dy = deg.selectExpr("n as dst", "d as dy")
    orient = e.join(dx, "src").join(dy, "dst").select(
        F.when(
            (F.col("dx") < F.col("dy"))
            | ((F.col("dx") == F.col("dy")) & (F.col("src") < F.col("dst"))),
            F.col("src"),
        )
        .otherwise(F.col("dst"))
        .alias("o")
    )
    return int(
        orient.groupBy("o")
        .agg(F.count(F.lit(1)).alias("od"))
        .agg(F.sum(F.col("od") * (F.col("od") - 1) / 2))
        .collect()[0][0]
    )


def main() -> None:
    from sparkswift.operators.graph import (
        jaccard_link_prediction,
        label_propagation,
        triangle_count,
    )
    from sparkswift.session import get_spark
    from sparkswift.sources import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("graph-scale")
    spark.sparkContext.setLogLevel("ERROR")

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p2"))

    def copart(src_df: DataFrame) -> DataFrame:
        bb = src_df.select(
            F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p2")
        )
        return (
            src_df.join(bb, src_df.l_orderkey == bb.k)
            .filter(F.col("l_partkey") < F.col("p2"))
            .select(F.col("l_partkey").alias("src"), F.col("p2").alias("dst"))
        )

    # g3 graph: full co-part; g7 graph: qty<=5 slice; g6 graph:
    # per-customer co-order cliques (the suite's fixture shapes)
    g3_edges = copart(li).localCheckpoint()
    g7_edges = copart(li.filter(F.col("l_quantity") <= 5)).localCheckpoint()
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    o2 = orders.selectExpr("o_custkey as c2", "o_orderkey as k2")
    g6_edges = (
        orders.join(o2, orders.o_custkey == o2.c2)
        .filter(F.col("o_orderkey") < F.col("k2"))
        .select(
            F.col("o_orderkey").alias("src"), F.col("k2").alias("dst")
        )
        .localCheckpoint()
    )

    def bench(tag: str, edges: DataFrame, run) -> tuple[float, object]:
        t0 = time.time()
        out = run(edges)
        dt = time.time() - t0
        print(f"  {tag}: {dt:.1f}s -> {out}")
        return dt, out

    for name, edges, vol_fn in (
        ("g3_triangles", g3_edges, oriented_wedges),
        ("g7_linkpred", g7_edges, wedge_volume),
        ("g6_lpa", g6_edges, None),
    ):
        e1 = canon(edges).localCheckpoint()
        e10 = copies(e1, 10).localCheckpoint()
        n1, n10 = e1.count(), e10.count()
        v1 = vol_fn(e1) if vol_fn else None
        v10 = vol_fn(e10) if vol_fn else None
        print(f"{name}: edges {n1} -> {n10}  wedges {v1} -> {v10}")

        if name == "g3_triangles":
            def run(e):
                df = triangle_count(e)
                return tuple(
                    df.agg(
                        F.count(F.lit(1)), F.sum("n_triangles")
                    ).collect()[0]
                )
        elif name == "g7_linkpred":
            def run(e):
                df = jaccard_link_prediction(e, top_k=100)
                r = df.agg(
                    F.count(F.lit(1)), F.min("jaccard"), F.max("jaccard")
                ).collect()[0]
                return (r[0], round(r[1], 6), round(r[2], 6))
        else:
            def run(e):
                stats: dict = {}
                df = label_propagation(e, stats=stats)
                n = df.agg(
                    F.count(F.lit(1)), F.countDistinct("label")
                ).collect()[0]
                return (n[0], n[1], stats["iters"], stats["breaks"])

        t_1, r_1 = bench(f"{name} 1x", e1, run)
        t_10, r_10 = bench(f"{name} 10x", e10, run)
        print(f"  time ratio {t_10 / max(t_1, 1e-9):.2f} for 10x data")
        if name == "g3_triangles":
            assert r_10[0] == 10 * r_1[0] and r_10[1] == 10 * r_1[1], (
                r_1,
                r_10,
            )
            print("  EXACTNESS: triangle totals scale exactly 10x ✓")
        if name == "g6_lpa":
            assert r_10[0] == 10 * r_1[0] and r_10[1] == 10 * r_1[1], (
                r_1,
                r_10,
            )
            print(
                f"  EXACTNESS: nodes/communities scale exactly 10x ✓ "
                f"(rounds {r_1[2]}→{r_10[2]}, breaks {r_1[3]}→{r_10[3]})"
            )

    # --- g9 weighted SSSP (the w/seed rule must derive from ORIGINAL
    # ids on the copied graph — the %N-vs-id*16+r lesson, NOTES r12:
    # per-copy rules use (node div 16), or totals won't scale x10) ---
    from sparkswift.operators.graph import sssp_distances

    e1 = canon(g7_edges).localCheckpoint()
    e10 = copies(e1, 10).localCheckpoint()
    results = {}
    for tag, e, copied in (("1x", e1, False), ("10x", e10, True)):
        q = "div 16" if copied else ""
        we = e.withColumn("w", F.expr(f"1 + ((src {q}) + (dst {q})) % 7"))
        nodes = e.select(F.col("src").alias("node")).unionAll(
            e.select(F.col("dst").alias("node"))
        )
        seeds = nodes.filter(F.expr(f"(node {q}) % 17 = 0")).distinct()
        stats: dict = {}
        t0 = time.time()
        out = sssp_distances(we, seeds, max_cost=40, stats=stats)
        r = out.agg(
            F.count(F.lit(1)), F.sum("dist"), F.max("dist")
        ).collect()[0]
        dt = time.time() - t0
        results[tag] = (tuple(r), stats["rounds"], dt)
        print(
            f"  g9_sssp {tag}: {dt:.1f}s -> reached {r[0]}, "
            f"sum_dist {r[1]}, max {r[2]}, rounds {stats['rounds']}"
        )
    (r1, rounds1, t1), (r10, rounds10, t10) = results["1x"], results["10x"]
    assert r10[0] == 10 * r1[0] and r10[1] == 10 * r1[1] and r10[2] == r1[2], (
        r1,
        r10,
    )
    print(
        f"  EXACTNESS: reached/sum_dist scale exactly 10x ✓ (max dist "
        f"scale-invariant; rounds {rounds1}→{rounds10}; time ratio "
        f"{t10 / max(t1, 1e-9):.2f})"
    )


if __name__ == "__main__":
    main()
