"""k-hop BFS and k-core (graph/traversal.py) vs. networkx / hand oracles.

networkx is the same oracle dependency the algorithm suite already
uses (reference requirements.txt:20). BFS: exact distance-dict match
against nx.single_source_shortest_path_length with cutoff; k-core:
exact vertex-set + degree match against nx.k_core.
"""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from graph_engine_spark.graph.traversal import (
    bfs_k_hops,
    cyclic_core,
    k_core,
    sssp,
)


def edge_df(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], ["src", "dst"]
    )


CHAIN = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]


def test_bfs_chain_out_direction(spark):
    res = bfs_k_hops(edge_df(spark, CHAIN), ["a"], max_hops=2, num_partitions=4)
    got = {r.id: r.dist for r in res.distances.collect()}
    assert got == {"a": 0, "b": 1, "c": 2}
    assert res.hops == 2 and not res.frontier_exhausted
    res.release()


def test_bfs_chain_in_and_both(spark):
    e = edge_df(spark, CHAIN)
    rin = bfs_k_hops(e, ["c"], max_hops=2, direction="in", num_partitions=4)
    assert {r.id: r.dist for r in rin.distances.collect()} == {
        "c": 0, "b": 1, "a": 2
    }
    rin.release()
    rboth = bfs_k_hops(e, ["c"], max_hops=1, direction="both", num_partitions=4)
    assert {r.id: r.dist for r in rboth.distances.collect()} == {
        "c": 0, "b": 1, "d": 1
    }
    rboth.release()


def test_bfs_matches_networkx_multi_source(spark):
    pairs = [(i, (i * 7 + 3) % 25) for i in range(25)] + [
        (i, (i * 5 + 1) % 25) for i in range(25)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    g = nx.DiGraph(pairs)
    # multi-source = min over per-source BFS distances
    want = {}
    for s in (0, 13):
        for v, d in nx.single_source_shortest_path_length(g, s, cutoff=3).items():
            want[str(v)] = min(want.get(str(v), d), d)
    res = bfs_k_hops(edge_df(spark, pairs), ["0", "13"], max_hops=3)
    got = {r.id: r.dist for r in res.distances.collect()}
    assert got == want
    res.release()


def test_bfs_frontier_exhaustion_stops_early(spark):
    tri = [("a", "b"), ("b", "c"), ("c", "a")]
    res = bfs_k_hops(edge_df(spark, tri), ["a"], max_hops=10, num_partitions=4)
    assert {r.id: r.dist for r in res.distances.collect()} == {
        "a": 0, "b": 1, "c": 2
    }
    assert res.frontier_exhausted and res.hops == 2
    # a source that never appears in the edge table is still its own
    # 0-neighborhood (reference neighbor scans resolve the node first)
    iso = bfs_k_hops(edge_df(spark, tri), ["zz"], max_hops=3, num_partitions=4)
    assert {r.id: r.dist for r in iso.distances.collect()} == {"zz": 0}
    assert iso.frontier_exhausted
    res.release()
    iso.release()


def test_bfs_sources_as_dataframe(spark):
    e = edge_df(spark, CHAIN)
    src = spark.createDataFrame([("a",), ("d",)], ["id"])
    res = bfs_k_hops(e, src, max_hops=1, num_partitions=4)
    assert {r.id: r.dist for r in res.distances.collect()} == {
        "a": 0, "d": 0, "b": 1, "e": 1
    }
    res.release()


def _clique(tag, n):
    ids = [f"{tag}{i}" for i in range(n)]
    return [(ids[i], ids[j]) for i in range(n) for j in range(i + 1, n)]


def test_kcore_matches_networkx(spark):
    pairs = (
        _clique("k", 5)
        + _clique("m", 4)
        + [("k0", "m0"), ("m0", "p0"), ("p0", "p1"), ("p1", "p2")]
    )
    res = k_core(edge_df(spark, pairs), k=3, num_partitions=4)
    core = nx.k_core(nx.Graph(pairs), k=3)
    got = {r.id: r.core_deg for r in res.vertices.collect()}
    assert got == dict(core.degree())
    assert res.converged
    res.release()


def test_kcore_peeling_cascade_runs_multiple_rounds(spark):
    # chain hanging off a K4: peeling at k=2 removes one chain vertex
    # per round (the pathological cascade), never touching the clique
    pairs = _clique("c", 4) + [("c0", "x1"), ("x1", "x2"), ("x2", "x3")]
    res = k_core(edge_df(spark, pairs), k=2, num_partitions=4)
    got = {r.id: r.core_deg for r in res.vertices.collect()}
    assert got == {"c0": 3, "c1": 3, "c2": 3, "c3": 3}
    assert res.converged and res.iterations >= 3
    assert len(res.round_seconds) == res.iterations
    res.release()


def test_kcore_empty_core(spark):
    res = k_core(edge_df(spark, CHAIN), k=3, num_partitions=4)
    assert res.vertices.count() == 0 and res.converged
    res.release()


def wedge_df(spark, triples):
    return spark.createDataFrame(
        [(str(a), str(b), float(w)) for a, b, w in triples],
        ["src", "dst", "w"],
    )


def test_sssp_relaxes_past_the_bfs_answer(spark):
    # direct edge costs 10; the 2-hop detour costs 4 — SSSP must
    # OVERWRITE a vertex it already reached (the semantics BFS lacks)
    triples = [("a", "z", 10), ("a", "m", 2), ("m", "z", 2)]
    res = sssp(wedge_df(spark, triples), ["a"], weight_col="w", num_partitions=4)
    got = {r.id: r.dist for r in res.distances.collect()}
    assert got == {"a": 0.0, "m": 2.0, "z": 4.0}
    assert res.converged
    res.release()


def test_sssp_matches_networkx_multi_source_dijkstra(spark):
    triples = [
        (i, (i * 7 + 3) % 25, (i * 3 + ((i * 7 + 3) % 25) * 5) % 7 + 1)
        for i in range(25)
    ] + [
        (i, (i * 5 + 1) % 25, (i * 11 + ((i * 5 + 1) % 25)) % 5 + 1)
        for i in range(25)
    ]
    triples = [(a, b, w) for a, b, w in triples if a != b]
    g = nx.DiGraph()
    for a, b, w in triples:
        # parallel edges collapse to MIN(w) (sssp's build rule)
        if g.has_edge(str(a), str(b)):
            w = min(w, g[str(a)][str(b)]["weight"])
        g.add_edge(str(a), str(b), weight=w)
    want = {}
    for s in ("0", "13"):
        for v, d in nx.single_source_dijkstra_path_length(
            g, s, weight="weight"
        ).items():
            want[v] = min(want.get(v, d), float(d))
    res = sssp(wedge_df(spark, triples), ["0", "13"], weight_col="w")
    got = {r.id: r.dist for r in res.distances.collect()}
    assert got == want
    assert res.converged
    res.release()


def test_sssp_unit_weights_match_bfs(spark):
    pairs = [(i, (i * 7 + 3) % 25) for i in range(25)] + [
        (i, (i * 5 + 1) % 25) for i in range(25)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    e = edge_df(spark, pairs)
    b = bfs_k_hops(e, ["0"], max_hops=25)
    s = sssp(e, ["0"], max_rounds=25)
    assert {r.id: float(r.dist) for r in b.distances.collect()} == {
        r.id: r.dist for r in s.distances.collect()
    }
    assert s.converged
    b.release()
    s.release()


def test_sssp_direction_and_round_bound(spark):
    triples = [("a", "b", 1), ("b", "c", 1), ("c", "d", 1)]
    e = wedge_df(spark, triples)
    rin = sssp(e, ["c"], weight_col="w", direction="in", num_partitions=4)
    assert {r.id: r.dist for r in rin.distances.collect()} == {
        "c": 0.0, "b": 1.0, "a": 2.0
    }
    rin.release()
    rboth = sssp(e, ["c"], weight_col="w", direction="both", max_rounds=1,
                 num_partitions=4)
    assert {r.id: r.dist for r in rboth.distances.collect()} == {
        "c": 0.0, "b": 1.0, "d": 1.0
    }
    assert not rboth.converged and rboth.rounds == 1
    rboth.release()


def test_sssp_rejects_negative_weights_and_handles_isolated_source(spark):
    with pytest.raises(ValueError, match="non-negative"):
        sssp(wedge_df(spark, [("a", "b", -1)]), ["a"], weight_col="w",
             num_partitions=4)
    iso = sssp(wedge_df(spark, [("a", "b", 1)]), ["zz"], weight_col="w",
               num_partitions=4)
    assert {r.id: r.dist for r in iso.distances.collect()} == {"zz": 0.0}
    assert iso.converged and iso.rounds == 0
    iso.release()


def _py_trim(pairs):
    """Reference trim: drop sources/sinks to fixpoint, return
    {id: (in_deg, out_deg)} inside the surviving subgraph."""
    edges = {(str(a), str(b)) for a, b in pairs}
    while True:
        outs = {u for u, v in edges}
        ins = {v for u, v in edges}
        keep = outs & ins
        ne = {(u, v) for u, v in edges if u in keep and v in keep}
        if ne == edges:
            break
        edges = ne
    from collections import Counter

    oc = Counter(u for u, v in edges)
    ic = Counter(v for u, v in edges)
    return {i: (ic[i], oc[i]) for i in oc}


def test_cyclic_core_dag_is_empty(spark):
    res = cyclic_core(edge_df(spark, CHAIN), num_partitions=4)
    assert res.vertices.count() == 0
    assert res.is_dag and res.converged
    res.release()


def test_cyclic_core_cycle_with_tail(spark):
    # 3-cycle with a 3-vertex tail hanging off: the tail peels one
    # vertex per round (sink trimming), the cycle survives at degree 1
    pairs = [("a", "b"), ("b", "c"), ("c", "a"),
             ("a", "t1"), ("t1", "t2"), ("t2", "t3")]
    res = cyclic_core(edge_df(spark, pairs), num_partitions=4)
    got = {r.id: (r.in_deg, r.out_deg) for r in res.vertices.collect()}
    assert got == {"a": (1, 1), "b": (1, 1), "c": (1, 1)}
    assert not res.is_dag and res.converged and res.iterations >= 3
    assert len(res.round_seconds) == res.iterations
    res.release()


def test_cyclic_core_keeps_cycle_to_cycle_bridges_and_self_loops(spark):
    # two 2-cycles joined by a bridge vertex: the bridge has in/out
    # degree >= 1 at fixpoint and survives (the documented superset) —
    # plus an isolated self-loop, a cycle of length 1
    pairs = [("a", "b"), ("b", "a"), ("b", "m"), ("m", "c"),
             ("c", "d"), ("d", "c"), ("s", "s"), ("s", "gone")]
    res = cyclic_core(edge_df(spark, pairs), num_partitions=4)
    got = {r.id: (r.in_deg, r.out_deg) for r in res.vertices.collect()}
    assert got == _py_trim(pairs)
    assert set(got) == {"a", "b", "m", "c", "d", "s"}
    res.release()


def test_cyclic_core_matches_reference_trim_on_functional_graph(spark):
    pairs = [(i, (i * i + 1) % 25) for i in range(25)] + [
        (i, (i + 7) % 25) for i in range(25) if i % 3 == 0
    ]
    res = cyclic_core(edge_df(spark, pairs))
    got = {r.id: (r.in_deg, r.out_deg) for r in res.vertices.collect()}
    assert got == _py_trim(pairs)
    assert res.converged
    res.release()


def test_traversal_release_leaves_no_cache_entries(spark):
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    baseline = cache_mgr.cachedData().size()
    e = edge_df(spark, _clique("k", 5) + CHAIN)
    b = bfs_k_hops(e, ["k0"], max_hops=4, num_partitions=4)
    b.distances.count()
    c = k_core(e, k=3, num_partitions=4)
    c.vertices.count()
    s = sssp(e, ["k0"], num_partitions=4)  # odd AND checkpointed paths
    s.distances.count()
    s3 = sssp(e, ["k0"], max_rounds=3, num_partitions=4)
    s3.distances.count()
    cy = cyclic_core(e, num_partitions=4)
    cy.vertices.count()
    b.release()
    c.release()
    s.release()
    s3.release()
    cy.release()
    assert cache_mgr.cachedData().size() == baseline
