"""PageRank (operators/graph.py) — verified against a numpy power
iteration on the same graph."""

import numpy as np
import pandas as pd
import pytest

from sparkswift.operators.graph import pagerank


def _np_pagerank(edge_list, damping=0.85, iters=10):
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {u: 0 for u in nodes}
    for u, _ in set(edge_list):
        out[u] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - damping) / n)
        dangling = sum(r[idx[u]] for u in nodes if out[u] == 0)
        nxt += damping * dangling / n
        for u, v in set(edge_list):
            nxt[idx[v]] += damping * r[idx[u]] / out[u]
        r = nxt
    return {v: r[idx[v]] for v in nodes}


def _run(spark, edge_list, **kw):
    df = spark.createDataFrame(pd.DataFrame(edge_list, columns=["src", "dst"]))
    return {
        r.node: r.rank for r in pagerank(df, **kw).collect()
    }


def test_pagerank_cycle_is_uniform(spark):
    got = _run(spark, [(1, 2), (2, 3), (3, 1)])
    assert got[1] == pytest.approx(1 / 3, abs=1e-9)
    assert got[2] == pytest.approx(1 / 3, abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_star_center_dominates_and_matches_numpy(spark):
    edges = [(1, 0), (2, 0), (3, 0), (4, 0), (0, 1)]
    got = _run(spark, edges)
    want = _np_pagerank(edges)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v
    # hub 0 collects from four spokes (beats any pure spoke); node 1
    # additionally receives ALL of 0's outflow, so it tops the ranking
    assert got[0] > got[2] and got[1] == max(got.values())


def test_pagerank_handles_dangling_nodes(spark):
    # node 3 has no out-edges: its mass must redistribute, total = 1
    edges = [(1, 2), (2, 3), (1, 3)]
    got = _run(spark, edges)
    want = _np_pagerank(edges)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_pagerank_partition_invariant(spark):
    edges = [(i, (i * 7) % 23) for i in range(23)] + [(i, (i + 1) % 23) for i in range(23)]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    a = _run(spark, edges)
    b = {
        r.node: r.rank
        for r in pagerank(
            spark.createDataFrame(df).repartition(13)
        ).collect()
    }
    for v in a:
        assert a[v] == pytest.approx(b[v], abs=1e-12)


def test_pagerank_tol_early_exit_on_converging_graph(spark):
    """A bidirected cycle is 2-regular: the uniform start vector is
    already stationary, so the first L1 delta is ~0 and tol= must
    stop after ONE iteration — with ranks still exact."""
    edges = [(1, 2), (2, 3), (3, 1), (2, 1), (3, 2), (1, 3)]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    stats = {}
    out = pagerank(df, max_iter=10, tol=1e-9, stats=stats)
    got = {r.node: r.rank for r in out.collect()}
    assert stats["iters"] == 1 < 10
    assert out._pagerank_iters == 1
    for v in (1, 2, 3):
        assert got[v] == pytest.approx(1 / 3, abs=1e-12)


def test_pagerank_tol_matches_numpy_to_convergence(spark):
    """tol-terminated ranks must agree with a numpy power iteration
    run to (beyond) convergence on an asymmetric graph with dangling
    mass — the early exit may not change the answer it returns."""
    edges = [(1, 0), (2, 0), (3, 0), (4, 0), (0, 1), (1, 2)]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    stats = {}
    # damping=0.5 → contraction 0.5^n: converges to 1e-10 in ~30
    # rounds, keeping the per-iteration delta probe affordable in CI
    got = {
        r.node: r.rank
        for r in pagerank(
            df, damping=0.5, max_iter=60, tol=1e-10, stats=stats
        ).collect()
    }
    assert 0 < stats["iters"] < 60  # converged before the cap
    want = _np_pagerank(edges, damping=0.5, iters=200)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_tol_none_runs_exactly_max_iter(spark):
    edges = [(1, 2), (2, 3), (3, 1), (2, 1), (3, 2), (1, 3)]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    stats = {}
    out = pagerank(df, max_iter=4, stats=stats)  # tol=None default
    out.count()
    assert stats["iters"] == 4
    assert out._pagerank_iters == 4


def test_pagerank_tol_validation(spark):
    edges = [(1, 2), (2, 1)]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    for bad in (0.0, -1e-6, float("nan")):
        with pytest.raises(ValueError):
            pagerank(df, tol=bad)


def test_pagerank_symmetric_shortcut_matches_general_path(spark):
    """symmetric=True (no dangling machinery, nodes from the degree
    table) must reproduce the general path EXACTLY on a symmetrized
    edge list — same joins, same float association order, so the
    ranks are bit-identical, not just close."""
    base = [(1, 2), (2, 3), (3, 4), (1, 4), (2, 5)]
    sym = base + [(b, a) for a, b in base]
    general = _run(spark, sym)
    fast = _run(spark, sym, assume_distinct=True, symmetric=True)
    assert set(general) == set(fast)
    for node in general:
        assert general[node] == fast[node], node
    assert sum(fast.values()) == pytest.approx(1.0, abs=1e-9)


def test_personalized_pagerank_matches_numpy_and_exact_zeros(spark):
    """PPR contract: teleport (restart + dangling mass) goes to the
    seed distribution; nodes unreachable from the seeds hold rank
    EXACTLY 0.0 (they only ever sum 0.0-contributions)."""
    import numpy as np
    import pandas as pd

    from sparkswift.operators.graph import pagerank

    # 1 -> 10, 1 -> 11, 2 -> 11, 3 -> 12; seeds {1}: nodes 2, 3, 12
    # are unreachable; 10/11/12 dangle (mass returns to the seed)
    e = [(1, 10), (1, 11), (2, 11), (3, 12)]
    edges = spark.createDataFrame(
        pd.DataFrame({"src": [a for a, _ in e], "dst": [b for _, b in e]})
    )
    seeds = spark.createDataFrame(pd.DataFrame({"node": [1]}))
    stats = {}
    got = {
        r.node: r.rank
        for r in pagerank(
            edges, seeds=seeds, max_iter=8, stats=stats
        ).collect()
    }
    assert stats["iters"] == 8
    nodes = sorted(got)
    idx = {n: i for i, n in enumerate(nodes)}
    t = np.zeros(len(nodes))
    t[idx[1]] = 1.0
    deg = {1: 2, 2: 1, 3: 1}
    rank = t.copy()
    for _ in range(8):
        new = 0.15 * t.copy()
        dm = sum(rank[idx[n]] for n in nodes if n not in deg)
        new += 0.85 * dm * t
        for s, d in e:
            new[idx[d]] += 0.85 * rank[idx[s]] / deg[s]
        rank = new
    for n in nodes:
        assert abs(got[n] - rank[idx[n]]) < 1e-12, n
    assert got[2] == 0.0 and got[3] == 0.0 and got[12] == 0.0
    assert abs(sum(got.values()) - 1.0) < 1e-12


def test_personalized_pagerank_partition_invariant_zero_set(spark):
    import pandas as pd

    from sparkswift.operators.graph import pagerank

    pdf = pd.DataFrame(
        {"src": [i % 17 for i in range(200)], "dst": [i % 23 + 100 for i in range(200)]}
    )
    seeds = spark.createDataFrame(pd.DataFrame({"node": [0, 5]}))
    ref = None
    for parts in (1, 8):
        edges = spark.createDataFrame(pdf).repartition(parts)
        got = {
            r.node
            for r in pagerank(edges, seeds=seeds, max_iter=4).collect()
            if r.rank == 0.0
        }
        if ref is None:
            ref = got
        assert got == ref  # the exact-zero set is layout-independent


def test_personalized_pagerank_rejects_foreign_seeds(spark):
    import pandas as pd
    import pytest as _pytest

    from sparkswift.operators.graph import pagerank

    edges = spark.createDataFrame(pd.DataFrame({"src": [1], "dst": [2]}))
    seeds = spark.createDataFrame(pd.DataFrame({"node": [999]}))
    with _pytest.raises(ValueError):
        pagerank(edges, seeds=seeds, max_iter=2)


def test_triangle_count_pure_python_reference(spark):
    """Degree-oriented triangle counts vs a brute-force pure-python
    reference on a seeded random graph, plus known closed forms: K4
    (every node in C(3,2)=3 triangles) and a triangle-free star."""
    import itertools
    import random

    from sparkswift.operators.graph import triangle_count

    def ref_counts(edge_set):
        adj = {}
        for a, b in edge_set:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        counts = {}
        for x, y, z in itertools.combinations(sorted(adj), 3):
            if y in adj[x] and z in adj[x] and z in adj[y]:
                for n in (x, y, z):
                    counts[n] = counts.get(n, 0) + 1
        return counts

    rng = random.Random(11)
    nodes = list(range(24))
    edge_set = {
        (a, b)
        for a in nodes
        for b in nodes
        if a < b and rng.random() < 0.25
    }
    # K4 on 100..103 (3 triangles per node) + star on 200..205 (none)
    edge_set |= {(a, b) for a in range(100, 104) for b in range(100, 104) if a < b}
    edge_set |= {(200, b) for b in range(201, 206)}

    # feed DIRECTED duplicated edges to exercise canonicalization
    rows = [(a, b) for a, b in edge_set] + [(b, a) for a, b in edge_set]
    df = spark.createDataFrame(rows, "src long, dst long")
    got = {
        r["node"]: r["n_triangles"] for r in triangle_count(df).collect()
    }
    want = ref_counts(edge_set)
    assert got == want
    for n in range(100, 104):
        assert got[n] == 3
    assert all(n not in got for n in range(200, 206))
    # both bounded regimes agree: broadcast-adjacency intersection
    # (default here — m is tiny) vs the wedge-join path it replaces
    # under the limit (forced with broadcast_edge_limit=0)
    wedge = {
        r["node"]: r["n_triangles"]
        for r in triangle_count(df, broadcast_edge_limit=0).collect()
    }
    assert wedge == want


def test_clustering_coefficient_known_shapes(spark):
    """Closed forms: K4 nodes have coeff 1.0; a star hub has 0.0; a
    path's middle node 0.0; a triangle-with-tail mixes exactly."""
    from sparkswift.operators.graph import clustering_coefficient

    edges = (
        [(a, b) for a in range(4) for b in range(4) if a < b]  # K4
        + [(10, x) for x in (11, 12, 13)]                      # star
        + [(20, 21), (21, 22), (20, 22), (22, 23)]             # tri+tail
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["degree"], r["n_triangles"], r["coeff"])
        for r in clustering_coefficient(df).collect()
    }
    for n in range(4):
        assert got[n] == (3, 3, 1.0)
    assert got[10] == (3, 0, 0.0)
    assert got[11] == (1, 0, 0.0)  # degree < 2 convention
    assert got[20] == (2, 1, 1.0)
    assert got[22] == (3, 1, 1.0 / 3.0)
    assert got[23] == (1, 0, 0.0)


def test_kcore_equals_pure_python_peel(spark):
    """kcore membership == the unique maximal core from an independent
    pure-python peel, on a seeded random graph plus planted shapes
    (a K5 that must survive k=4; a long pendant chain that must not)."""
    import random
    from collections import defaultdict

    from sparkswift.operators.graph import kcore

    def ref_core(edge_set, k):
        adj = defaultdict(set)
        for a, b in edge_set:
            adj[a].add(b)
            adj[b].add(a)
        changed = True
        while changed:
            changed = False
            for n in list(adj):
                if len(adj[n]) < k:
                    for m in adj[n]:
                        adj[m].discard(n)
                    del adj[n]
                    changed = True
        return set(adj)

    rng = random.Random(7)
    nodes = list(range(40))
    edge_set = {
        (a, b) for a in nodes for b in nodes if a < b and rng.random() < 0.12
    }
    edge_set |= {(a, b) for a in range(100, 105) for b in range(100, 105) if a < b}
    edge_set |= {(200 + i, 201 + i) for i in range(6)}  # pendant chain

    rows = [(a, b) for a, b in edge_set] + [(b, a) for a, b in edge_set]
    df = spark.createDataFrame(rows, "src long, dst long")
    for k in (2, 3, 4):
        got = {
            r["node"]
            for r in kcore(df, k=k).filter("in_core = 1").collect()
        }
        want = ref_core(edge_set, k)
        assert got == want, k
    assert set(range(100, 105)) <= {
        r["node"] for r in kcore(df, k=4).filter("in_core = 1").collect()
    }
    assert not (
        set(range(200, 207))
        & {r["node"] for r in kcore(df, k=2).filter("in_core = 1").collect()}
    )


# --- g6: label propagation --------------------------------------------------


def _lpa_reference(edges, max_iter=200):
    """Independent pure-python twin of the synchronous LPA + 2-cycle
    monotone break (the fuzz harness that validated the design)."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def winners(labels):
        w = {}
        for v in adj:
            cnt = {}
            for u in adj[v]:
                cnt[labels[u]] = cnt.get(labels[u], 0) + 1
            w[v] = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        return w

    labels = {v: v for v in adj}
    prev2 = None
    for _ in range(max_iter):
        new = dict(winners(labels))
        if new == labels:
            return labels
        if prev2 is not None and new == prev2:
            wb = winners(new)
            new = {v: (wb[v] if wb[v] < new[v] else new[v]) for v in new}
            prev2 = None
            labels = new
            continue
        prev2, labels = labels, new
    raise RuntimeError("reference LPA did not converge")


def test_label_propagation_matches_pure_python_reference(spark):
    """Engine == the independent reference on the oscillation-prone
    shapes (same-parity 2-clique, 4-cycle, K33) and on random graphs;
    stats report rounds and breaking rounds."""
    import itertools
    import random

    from sparkswift.operators.graph import label_propagation

    cases = [
        [(4, 22)],  # same-parity 2-clique: pure swap oscillator
        [(0, 1), (1, 2), (2, 3), (3, 0)],  # bipartite 4-cycle
        [(2 * i, 2 * j + 1) for i in range(3) for j in range(3)],  # K33
        [(0, i) for i in range(1, 8)],  # star
    ]
    rng = random.Random(5)
    for _ in range(4):
        nodes = rng.sample(range(0, 1000), rng.randint(5, 14))
        p = rng.choice([0.3, 0.7])
        cases.append(
            [
                (a, b)
                for a, b in itertools.combinations(nodes, 2)
                if rng.random() < p
            ]
        )
    for edges in cases:
        if not edges:
            continue
        df = spark.createDataFrame(edges, "src long, dst long")
        stats = {}
        got = {
            r["node"]: r["label"]
            for r in label_propagation(df, stats=stats).collect()
        }
        assert got == _lpa_reference(edges), edges
        assert stats["iters"] >= 1 and stats["breaks"] >= 0


def test_label_propagation_planted_communities_stay_separate(spark):
    """Two bridged cliques keep distinct labels (what connected
    components CANNOT express) and each clique reaches consensus on a
    member id — the split-instability law behind g6's exact oracle."""
    import itertools

    from sparkswift.operators.graph import label_propagation

    a = [10, 12, 14, 16, 18]
    b = [1, 3, 5, 7, 9]
    edges = (
        list(itertools.combinations(a, 2))
        + list(itertools.combinations(b, 2))
        + [(18, 9)]
    )
    got = {
        r["node"]: r["label"]
        for r in label_propagation(
            spark.createDataFrame(edges, "src long, dst long")
        ).collect()
    }
    la = {got[v] for v in a}
    lb = {got[v] for v in b}
    assert len(la) == 1 and len(lb) == 1 and la != lb
    assert la.pop() in a and lb.pop() in b


def test_label_propagation_runaway_guard(spark):
    from sparkswift.operators.graph import label_propagation

    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not stabilize"):
        label_propagation(df, max_iter=1)


def test_jaccard_link_prediction_matches_pure_python(spark):
    """g7's engine result equals an independently-written pure-python
    reference (dict adjacency, brute all-pairs) on random graphs —
    scores, the non-edge restriction, and the (jaccard desc, u, v)
    top-k cut order all match."""
    import random

    from sparkswift.operators.graph import jaccard_link_prediction

    rnd = random.Random(5)
    for trial in range(5):
        n = 30
        edges = sorted(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rnd.randrange(n), rnd.randrange(n)) for _ in range(80)
                )
                if a != b
            }
        )
        adj: dict[int, set[int]] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        eset = set(edges)
        want = []
        nodes = sorted(adj)
        for i, u in enumerate(nodes):
            for v in nodes[i + 1 :]:
                if (u, v) in eset:
                    continue
                common = len(adj[u] & adj[v])
                if common == 0:
                    continue
                want.append(
                    (-common / len(adj[u] | adj[v]), u, v, common)
                )
        want.sort()
        want = [
            (u, v, c, -negj) for negj, u, v, c in want[:20]
        ]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = [
            (r.u, r.v, r.n_common, r.jaccard)
            for r in jaccard_link_prediction(df, top_k=20).collect()
        ]
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g[:3] == w[:3], (trial, g, w)
            assert abs(g[3] - w[3]) < 1e-12


def test_jaccard_link_prediction_excludes_existing_edges(spark):
    """Predicted links are never existing edges; a triangle with one
    open corner predicts exactly that corner."""
    from sparkswift.operators.graph import jaccard_link_prediction

    # path 1-2-3 plus 1-4, 3-4: open pair (1,3) shares {2,4}
    edges = [(1, 2), (2, 3), (1, 4), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = jaccard_link_prediction(df, top_k=10).collect()
    pairs = {(r.u, r.v) for r in out}
    assert all((u, v) not in set(edges) for u, v in pairs)
    top = out[0]
    assert (top.u, top.v, top.n_common) == (1, 3, 2)
    assert abs(top.jaccard - 1.0) < 1e-12  # N(1)={2,4}=N(3)


def test_bfs_distances_matches_pure_python(spark):
    """bfs_distances == brute pure-python multi-source BFS on random
    graphs (several densities), the hop bound truncates identically,
    sources dedupe, and stats['hops'] reports rounds."""
    import random
    from collections import deque

    from sparkswift.operators.graph import bfs_distances

    rng = random.Random(17)
    for n, m, max_hops in ((12, 14, 12), (30, 40, 3), (25, 20, 12)):
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        seeds = sorted({rng.randrange(n) for _ in range(3)})
        adj = {}
        for u, v in edges:
            if u == v:
                continue
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        want = {s: 0 for s in seeds if s in adj}
        q = deque((s, 0) for s in want)
        while q:
            u, d = q.popleft()
            if d >= max_hops:
                continue
            for v in adj.get(u, ()):  # noqa: B905
                if v not in want:
                    want[v] = d + 1
                    q.append((v, d + 1))
        edf = spark.createDataFrame(edges, "src long, dst long")
        # sources may include isolated ids (not in the edge set):
        # they still report dist 0 (they ARE within 0 hops of a seed)
        sdf = spark.createDataFrame(
            [(s,) for s in seeds + seeds], "node long"
        )
        stats = {}
        got = {
            r.node: r.dist
            for r in bfs_distances(
                edf, sdf, max_hops=max_hops, stats=stats
            ).collect()
        }
        for s in seeds:
            want[s] = 0  # isolated seeds included by the operator
        assert got == want, (n, m, max_hops, got, want)
        assert stats["hops"] <= max_hops


def test_sssp_matches_dijkstra_and_caps_cost(spark):
    """sssp_distances == single-source Dijkstra (pure python) restricted
    to dist <= max_cost, on random weighted graphs; the runaway cap
    raises when rounds are exhausted before convergence."""
    import heapq
    import random

    import pytest

    from sparkswift.operators.graph import sssp_distances

    rng = random.Random(23)
    for n, m, cap in ((12, 18, 10), (30, 50, 15), (25, 30, 6)):
        edges = [
            (rng.randrange(n), rng.randrange(n), rng.randrange(1, 6))
            for _ in range(m)
        ]
        seeds = sorted({rng.randrange(n) for _ in range(3)})
        adj: dict[int, list[tuple[int, int]]] = {}
        seen = set()
        for u, v, w in edges:
            if u == v:
                continue
            # operator dedups exact (u,v,w) triples both directions;
            # parallel edges with different weights stay — Dijkstra
            # relaxes over all of them, min wins on both sides
            for a, b in ((u, v), (v, u)):
                if (a, b, w) not in seen:
                    seen.add((a, b, w))
                    adj.setdefault(a, []).append((b, w))
        dist = {s: 0 for s in seeds}
        pq = [(0, s) for s in seeds]
        while pq:
            d, u = heapq.heappop(pq)
            if d > dist.get(u, 1 << 60):
                continue
            for v, w in adj.get(u, ()):
                nd = d + w
                if nd < dist.get(v, 1 << 60):
                    dist[v] = nd
                    heapq.heappush(pq, (nd, v))
        want = {u: d for u, d in dist.items() if d <= cap}
        edf = spark.createDataFrame(edges, "src long, dst long, w long")
        sdf = spark.createDataFrame([(s,) for s in seeds], "node long")
        stats = {}
        got = {
            r.node: r.dist
            for r in sssp_distances(
                edf, sdf, max_cost=cap, stats=stats
            ).collect()
        }
        assert got == want, (n, m, cap, got, want)

    # runaway cap: a 3-node weight-1 path needs 2 rounds; max_rounds=1
    # must RAISE (never silently truncate)
    edf = spark.createDataFrame([(0, 1, 1), (1, 2, 1)], "src long, dst long, w long")
    sdf = spark.createDataFrame([(0,)], "node long")
    with pytest.raises(RuntimeError, match="convergence"):
        sssp_distances(edf, sdf, max_cost=10, max_rounds=1)

    # ADVICE r12 off-by-one: a unit-weight chain of exactly max_cost
    # edges takes max_cost improving rounds + 1 detection round — the
    # DEFAULT cap must absorb it (it used to raise spuriously)
    k = 5
    edf = spark.createDataFrame(
        [(i, i + 1, 1) for i in range(k)], "src long, dst long, w long"
    )
    sdf = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.dist for r in sssp_distances(edf, sdf, max_cost=k).collect()}
    assert got == {i: i for i in range(k + 1)}


def test_degree_assortativity_matches_networkx_formula(spark):
    """g10 == a pure-python Newman assortativity computation on random
    graphs (including a star, strongly disassortative, and a cycle,
    degree-regular -> NULL)."""
    import random

    from sparkswift.operators.graph import degree_assortativity

    def ref(edges):
        es = set()
        for u, v in edges:
            if u != v:
                es.add((min(u, v), max(u, v)))
        deg = {}
        for u, v in es:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        pairs = [(deg[u], deg[v]) for u, v in es] + [
            (deg[v], deg[u]) for u, v in es
        ]
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sxx = sum(x * x for x, _ in pairs)
        sxy = sum(x * y for x, y in pairs)
        den = n * sxx - sx * sx
        return None if den == 0 else (n * sxy - sx * sx) / den

    rng = random.Random(31)
    cases = [
        [(0, i) for i in range(1, 8)],  # star: strongly negative
        [(i, (i + 1) % 9) for i in range(9)],  # cycle: regular -> NULL
        [(rng.randrange(15), rng.randrange(15)) for _ in range(30)],
        [(rng.randrange(40), rng.randrange(40)) for _ in range(120)],
    ]
    for edges in cases:
        edf = spark.createDataFrame(edges, "src long, dst long")
        row = degree_assortativity(edf).collect()[0]
        want = ref(edges)
        if want is None:
            assert row.assortativity is None, edges[:3]
        else:
            assert abs(row.assortativity - want) < 1e-12, (want, row)
    # the star's coefficient is exactly -1 in the n>2 star? no: star
    # endpoints pair (7,1) and (1,7) symmetric — assert it's negative
    star = degree_assortativity(
        spark.createDataFrame([(0, i) for i in range(1, 8)], "src long, dst long")
    ).collect()[0]
    assert star.assortativity < 0
