"""k-hop BFS and k-core (graph/traversal.py) vs. networkx / hand oracles.

networkx is the same oracle dependency the algorithm suite already
uses (reference requirements.txt:20). BFS: exact distance-dict match
against nx.single_source_shortest_path_length with cutoff; k-core:
exact vertex-set + degree match against nx.k_core.
"""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from graph_engine_spark.graph.traversal import bfs_k_hops, k_core


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


def test_traversal_release_leaves_no_cache_entries(spark):
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    baseline = cache_mgr.cachedData().size()
    e = edge_df(spark, _clique("k", 5) + CHAIN)
    b = bfs_k_hops(e, ["k0"], max_hops=4, num_partitions=4)
    b.distances.count()
    c = k_core(e, k=3, num_partitions=4)
    c.vertices.count()
    b.release()
    c.release()
    assert cache_mgr.cachedData().size() == baseline
