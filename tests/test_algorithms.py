"""Iterative link-graph algorithms vs. oracles (FIXTURES.md §4).

Oracle = networkx, a dependency the reference itself uses
(reference requirements.txt:20). PageRank: allclose 1e-6 against
networkx.pagerank; CC: exact partition match; triangles: exact count;
LPA: deterministic-spec oracle in pure Python.
"""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from graph_engine_spark.corpus import synthesize_corpus
from graph_engine_spark.extractor import extract_graph
from graph_engine_spark.graph.linkgraph import module_link_graph
from graph_engine_spark.graph.pagerank import pagerank
from graph_engine_spark.graph.components import connected_components
from graph_engine_spark.graph.lpa import label_propagation
from graph_engine_spark.graph.triangles import triangle_count


def edge_df(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], ["src", "dst"]
    )


def ring(n):
    return [(i, (i + 1) % n) for i in range(n)]


def star(n):
    return [(i, 0) for i in range(1, n + 1)]


def two_cliques_bridge(k):
    e = []
    for i in range(k):
        for j in range(i + 1, k):
            e.append((f"a{i}", f"a{j}"))
            e.append((f"b{i}", f"b{j}"))
    e.append(("a0", "b0"))
    return e


def nx_pagerank(pairs, alpha=0.85, tol=1e-10, max_iter=1000):
    """Dense numpy power iteration with dangling redistribution —
    identical semantics to networkx.pagerank (which needs scipy, absent
    here). Fixture-scale only."""
    import numpy as np

    verts = sorted({str(a) for a, _ in pairs} | {str(b) for _, b in pairs})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    out = np.zeros(n)
    for a, _ in pairs:
        out[idx[str(a)]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        contrib = np.zeros(n)
        for a, b in pairs:
            contrib[idx[str(b)]] += r[idx[str(a)]] / out[idx[str(a)]]
        dangling = r[out == 0].sum()
        new = (1 - alpha) / n + alpha * (contrib + dangling / n)
        if np.abs(new - r).sum() < tol:
            r = new
            break
        r = new
    return {v: r[idx[v]] for v in verts}


def assert_ranks_close(result, oracle, tol=1e-6):
    got = {r["id"]: r["rank"] for r in result.ranks.collect()}
    assert set(got) == set(oracle)
    for k in oracle:
        assert abs(got[k] - oracle[k]) < tol, (k, got[k], oracle[k])


@pytest.mark.parametrize("pairs", [ring(20), star(15)], ids=["ring20", "star15"])
def test_pagerank_fixtures(spark, pairs):
    res = pagerank(edge_df(spark, pairs), tol=1e-7, max_iter=150, num_partitions=4)
    assert res.converged
    assert_ranks_close(res, nx_pagerank(pairs))


def test_pagerank_dangling_and_salting(spark):
    # star: hub 0 is dangling (no out-edges) AND skewed (in-deg 15);
    # threshold 10 puts exactly the hub on the salted two-stage path
    pairs = star(15) + [(20, 21), (21, 20)]
    res = pagerank(
        edge_df(spark, pairs), tol=1e-7, max_iter=150, num_partitions=4,
        salt_buckets=4, salt_degree_threshold=10,
    )
    assert res.converged
    assert_ranks_close(res, nx_pagerank(pairs))


def test_pagerank_targeted_salting_matches_unsalted(spark):
    """Degree-targeted salting is a pure physical rewrite: per-vertex
    ranks must equal the unsalted run bit-for-bit-close, whether the
    threshold selects hubs (two-stage path active) or selects nothing
    (auto-off)."""
    pairs = star(40) + ring(12) + [(0, "r0")]
    base = pagerank(edge_df(spark, pairs), tol=1e-9, max_iter=10, num_partitions=4)
    salted = pagerank(
        edge_df(spark, pairs), tol=1e-9, max_iter=10, num_partitions=4,
        salt_buckets=8, salt_degree_threshold=20,
    )
    auto_off = pagerank(
        edge_df(spark, pairs), tol=1e-9, max_iter=10, num_partitions=4,
        salt_buckets=8, salt_degree_threshold=10_000,
    )
    got = {r["id"]: r["rank"] for r in base.ranks.collect()}
    for other in (salted, auto_off):
        other_ranks = {r["id"]: r["rank"] for r in other.ranks.collect()}
        assert set(other_ranks) == set(got)
        for k, v in got.items():
            assert abs(other_ranks[k] - v) < 1e-12, (k, other_ranks[k], v)


def test_adjacency_out_degree_cap_chunks_hubs(spark):
    """A hub whose out-degree exceeds the cap is split across multiple
    adjacency rows of bounded width; out_deg stays the TOTAL degree on
    every chunk and PageRank over the chunked adjacency stays exact."""
    from graph_engine_spark.graph.adjacency import build_adjacency

    # hub h0 fans out to 500 leaves; cap 100 → ≥5 chunk rows
    pairs = [("h0", f"l{i:03d}") for i in range(500)] + [
        (f"l{i:03d}", "h0") for i in range(0, 500, 50)
    ]
    edges = edge_df(spark, pairs)
    adj = build_adjacency(edges, num_partitions=4, persist=False, max_out_degree=100)
    rows = adj.filter(F.col("src") == "h0").collect()
    assert len(rows) >= 5
    assert all(r["out_deg"] == 500 for r in rows)
    assert all(len(r["dsts"]) <= 200 for r in rows)  # hash-balanced chunks
    assert sum(len(r["dsts"]) for r in rows) == 500
    # non-hub vertices stay single-row
    assert adj.filter(F.col("src") == "l000").count() == 1

    # end-to-end: PageRank over the CHUNKED adjacency stays exact
    res = pagerank(edges, tol=1e-9, max_iter=15, num_partitions=4, max_out_degree=100)
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}
    oracle = nx_pagerank(pairs)
    for k, v in got.items():
        assert abs(v - oracle[k]) < 1e-6


def test_pagerank_checkpoint_resume(spark, tmp_path):
    from graph_engine_spark.graph.checkpoint import CheckpointManager

    pairs = ring(30) + star(10)
    full = pagerank(edge_df(spark, pairs), tol=1e-10, max_iter=40, num_partitions=4)
    # run 1: stop early at 6 supersteps, checkpointing every 3
    ck = CheckpointManager(str(tmp_path / "ck"), every_k=3)
    partial = pagerank(
        edge_df(spark, pairs), tol=1e-10, max_iter=6, num_partitions=4, checkpoint=ck
    )
    assert not partial.converged
    assert ck.iterations()  # durable supersteps exist
    # run 2: resume mid-iteration from the checkpoint, finish
    resumed = pagerank(
        edge_df(spark, pairs), tol=1e-10, max_iter=40, num_partitions=4,
        checkpoint=ck, resume=True,
    )
    # resumed from superstep 6 → runs 34 more; trajectory must equal the
    # uninterrupted 40-superstep run (mid-iteration resume, north rule)
    assert resumed.iterations == full.iterations == 40
    got_full = {r["id"]: r["rank"] for r in full.ranks.collect()}
    got_res = {r["id"]: r["rank"] for r in resumed.ranks.collect()}
    for k in got_full:
        assert abs(got_full[k] - got_res[k]) < 1e-9


def test_checkpoint_resume_rejects_mismatched_id_coding(spark, tmp_path):
    """A checkpoint written with string vertex ids must FAIL FAST when
    resumed into an encode_ids run (whose decode joins would otherwise
    silently match nothing), and vice versa — the manifest's recorded
    schema is the guard (ADVICE r2)."""
    import pytest

    from graph_engine_spark.graph.checkpoint import CheckpointManager

    pairs = ring(20) + star(6)  # star skew: no instant convergence
    # run 1: string-id coding, leave a checkpoint behind
    ck = CheckpointManager(str(tmp_path / "mix_ck"), every_k=3)
    pagerank(
        edge_df(spark, pairs), tol=1e-10, max_iter=6, num_partitions=2,
        checkpoint=ck, encode_ids=False,
    )
    assert ck.iterations()
    # run 2: integer coding resuming the string checkpoint → ValueError
    with pytest.raises(ValueError, match="vertex-id coding"):
        pagerank(
            edge_df(spark, pairs), tol=1e-10, max_iter=10, num_partitions=2,
            checkpoint=ck, resume=True, encode_ids=True,
        )
    # matching coding still resumes fine
    resumed = pagerank(
        edge_df(spark, pairs), tol=1e-10, max_iter=10, num_partitions=2,
        checkpoint=ck, resume=True, encode_ids=False,
    )
    assert resumed.iterations >= 6


def nx_components(pairs):
    g = nx.Graph()
    g.add_edges_from((str(a), str(b)) for a, b in pairs)
    return {frozenset(c) for c in nx.connected_components(g)}


@pytest.mark.parametrize("method", ["two_phase", "hash_min"])
def test_connected_components(spark, method):
    pairs = (
        ring(12)
        + [(f"x{i}", f"x{i+1}") for i in range(8)]  # chain component
        + [("solo1", "solo2")]
    )
    res = connected_components(edge_df(spark, pairs), method=method)
    assert res.converged
    rows = res.components.collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["component"], set()).add(r["id"])
    assert {frozenset(v) for v in by_label.values()} == nx_components(pairs)
    # canonical label = min id of component
    for label, members in by_label.items():
        assert label == min(members)


def test_connected_components_high_degree_hub(spark):
    """Scale-shape regression: a hub with degree ≫ everything else —
    the collect_set star formulation would materialize its whole
    neighborhood in one array row; the min-agg+join form must produce
    identical labels with rows never wider than an edge."""
    hub_pairs = [("hub", f"leaf{i:04d}") for i in range(2000)]
    # attach a chain to the hub so the component isn't diameter-1
    chain = [(f"c{i}", f"c{i+1}") for i in range(30)] + [("c0", "leaf0000")]
    other = [("iso_a", "iso_b")]
    pairs = hub_pairs + chain + other
    res = connected_components(edge_df(spark, pairs))
    assert res.converged
    by_label = {}
    for r in res.components.collect():
        by_label.setdefault(r["component"], set()).add(r["id"])
    assert {frozenset(v) for v in by_label.values()} == nx_components(pairs)
    for label, members in by_label.items():
        assert label == min(members)


def test_triangles(spark):
    pairs = two_cliques_bridge(5)
    res = triangle_count(edge_df(spark, pairs))
    g = nx.Graph()
    g.add_edges_from(pairs)
    expected_total = sum(nx.triangles(g).values()) // 3
    assert res.total == expected_total == 20
    per_v = {r["id"]: r["triangles"] for r in res.per_vertex.collect()}
    nx_per = {k: v for k, v in nx.triangles(g).items() if v > 0}
    assert per_v == nx_per


def lpa_oracle(pairs, max_iter=10):
    """Pure-python oracle for OUR deterministic sync LPA spec."""
    nbrs = {}
    for a, b in pairs:
        a, b = str(a), str(b)
        if a == b:
            continue
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    labels = {v: v for v in nbrs}
    for _ in range(max_iter):
        new = {}
        for v in nbrs:
            counts = {}
            for u in nbrs[v]:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[v] = best
        if new == labels:
            return new, True
        labels = new
    return labels, False


def test_lpa_two_cliques(spark):
    pairs = two_cliques_bridge(6)
    res = label_propagation(edge_df(spark, pairs), max_iter=10)
    oracle, conv = lpa_oracle(pairs, max_iter=10)
    got = {r["id"]: r["label"] for r in res.labels.collect()}
    assert got == oracle
    assert res.converged == conv
    # the two cliques end up with distinct internal labels
    a_labels = {got[f"a{i}"] for i in range(6)}
    b_labels = {got[f"b{i}"] for i in range(6)}
    assert len(a_labels) == 1 and len(b_labels) == 1 and a_labels != b_labels


def test_end_to_end_extract_then_rank(spark):
    """FIXTURES.md §4 last row: extract → module graph → PageRank vs nx."""
    corpus = synthesize_corpus(spark, n_files=150, n_components=5, hubs_per_component=4)
    _, edges = extract_graph(corpus)
    mg = module_link_graph(edges).persist()
    pairs = [(r["src"], r["dst"]) for r in mg.collect()]
    assert pairs
    res = pagerank(mg, tol=1e-7, max_iter=150, num_partitions=8)
    assert res.converged
    assert_ranks_close(res, nx_pagerank(pairs))
    # hub skew exists: top rank should be a hub module (index < c*h = 20)
    top = res.ranks.orderBy(F.desc("rank")).first()["id"]
    assert int(top.split("_")[1]) < 20


def test_cc_checkpoint_resume(spark, tmp_path):
    from graph_engine_spark.graph.checkpoint import CheckpointManager
    from graph_engine_spark.graph.components import connected_components

    pairs = ring(40) + star(12)
    full = connected_components(edge_df(spark, pairs), num_partitions=4)
    expect = {r["id"]: r["component"] for r in full.components.collect()}

    ck = CheckpointManager(str(tmp_path / "cc_ck"), every_k=1)
    partial = connected_components(
        edge_df(spark, pairs), max_iter=1, num_partitions=4, checkpoint=ck
    )
    assert not partial.converged and ck.iterations() == [1]
    resumed = connected_components(
        edge_df(spark, pairs), num_partitions=4, checkpoint=ck, resume=True
    )
    assert resumed.converged
    got = {r["id"]: r["component"] for r in resumed.components.collect()}
    assert got == expect


def test_lpa_checkpoint_resume(spark, tmp_path):
    from graph_engine_spark.graph.checkpoint import CheckpointManager
    from graph_engine_spark.graph.lpa import label_propagation

    pairs = two_cliques_bridge(6)
    full = label_propagation(edge_df(spark, pairs), max_iter=4, num_partitions=2)
    expect = {r["id"]: r["label"] for r in full.labels.collect()}

    ck = CheckpointManager(str(tmp_path / "lpa_ck"), every_k=2)
    partial = label_propagation(
        edge_df(spark, pairs), max_iter=2, num_partitions=2, checkpoint=ck
    )
    assert ck.iterations() == [2]
    resumed = label_propagation(
        edge_df(spark, pairs), max_iter=4, num_partitions=2, checkpoint=ck, resume=True
    )
    got = {r["id"]: r["label"] for r in resumed.labels.collect()}
    assert got == expect


def test_iterative_loops_leave_no_orphaned_cache_entries(spark):
    """Round-4 leak regression (same class as the minhash / streaming
    leaks of rounds 2-3): every lineage truncation inside the pagerank /
    CC / LPA loops re-roots the state frame on a LogicalRDD, so an
    unpersist() issued through the NEW handle is a silent no-op and the
    superseded SQL cache entry stays in the CacheManager forever —
    measured 12 stray entries after a single 13-superstep pagerank run
    before the fix. The loops must release the superseded handle
    explicitly; afterwards the CacheManager may hold only the returned
    result frame (caller-owned) and the id dictionary its plan joins."""
    from pyspark.storagelevel import StorageLevel

    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    edges = (
        spark.range(4000)
        .select(
            F.concat(F.lit("n"), F.pmod(F.xxhash64("id"), F.lit(300)).cast("string")).alias("src"),
            F.concat(F.lit("n"), F.pmod(F.xxhash64(F.col("id") + 1), F.lit(400)).cast("string")).alias("dst"),
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges.count()
    baseline = cache_mgr.cachedData().size()

    res = pagerank(edges, tol=1e-12, max_iter=9, num_partitions=4)
    assert res.iterations == 9  # enough supersteps to cross 4 truncations
    # caller-owned survivors: the final rank frame + the id dictionary
    after_pr = cache_mgr.cachedData().size()
    assert after_pr - baseline <= 2, f"pagerank orphaned {after_pr - baseline - 2} entries"

    # caller-owned survivors: the final star edge set + cc's id dictionary
    cc = connected_components(edges, max_iter=20, num_partitions=4)
    assert cc.converged
    after_cc = cache_mgr.cachedData().size()
    assert after_cc - after_pr <= 2, f"cc orphaned {after_cc - after_pr - 2} entries"

    lpa = label_propagation(edges, max_iter=5, num_partitions=4)
    after_lpa = cache_mgr.cachedData().size()
    assert after_lpa - after_cc <= 1, f"lpa orphaned {after_lpa - after_cc - 1} entries"

    # release() contract (round 5): every result frees its own caller-
    # visible survivors — rank/label/component frame AND the encode-path
    # id dictionary — returning the CacheManager to the pre-run state
    res.release()
    cc.release()
    lpa.release()
    assert cache_mgr.cachedData().size() == baseline

    # triangles: the persisted triangle table behind per_vertex and the
    # id dictionary are owned; clustering_coefficient releases its inner
    # run itself (both orphaned one entry per call before round 5)
    tri = triangle_count(edges, num_partitions=4)
    tri.per_vertex.count()
    tri.release()
    assert cache_mgr.cachedData().size() == baseline
    from graph_engine_spark.graph.triangles import clustering_coefficient

    clustering_coefficient(edges, num_partitions=4).count()
    assert cache_mgr.cachedData().size() == baseline


# --- weighted PageRank (edge weights = e.g. dynamic_call_count) -------


def np_weighted_pagerank(wpairs, alpha=0.85, tol=1e-10, max_iter=1000):
    """Dense numpy oracle: rank distributed proportionally to outgoing
    weight; non-positive weights dropped; dangling redistribution as in
    nx_pagerank."""
    import numpy as np

    live = [(str(a), str(b), float(w)) for a, b, w in wpairs if w > 0]
    verts = sorted({a for a, _, _ in live} | {b for _, b, _ in live}
                   | {str(a) for a, _, w in wpairs} | {str(b) for _, b, w in wpairs})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    W = np.zeros((n, n))
    for a, b, w in live:
        W[idx[a], idx[b]] += w
    out = W.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        contrib = np.zeros(n)
        for i in range(n):
            if out[i] > 0:
                contrib += r[i] * W[i] / out[i]
        dangling = r[out == 0].sum()
        new = (1 - alpha) / n + alpha * (contrib + dangling / n)
        if np.abs(new - r).sum() < tol:
            r = new
            break
        r = new
    return {v: r[idx[v]] for v in verts}


def weighted_edge_df(spark, wpairs):
    return spark.createDataFrame(
        [(str(a), str(b), float(w)) for a, b, w in wpairs], ["src", "dst", "w"]
    )


def test_weighted_pagerank_matches_numpy(spark):
    """Skewed weights, a dangling sink, a zero-weight edge (must be
    dropped), and a parallel duplicate (weights must add)."""
    wpairs = [
        (0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 1.0),
        (3, 0, 5.0), (1, 3, 0.5), (2, 4, 4.0),   # 4 = dangling sink
        (3, 2, 0.0),                              # dropped
        (0, 1, 1.5),                              # parallel: 0→1 totals 4.5
    ]
    res = pagerank(
        weighted_edge_df(spark, wpairs), tol=1e-9, max_iter=300,
        num_partitions=4, weight_col="w",
    )
    assert res.converged
    assert_ranks_close(res, np_weighted_pagerank(wpairs))


def test_weighted_pagerank_equal_weights_equals_unweighted(spark):
    """Constant weights make the weighted path a pure physical variant
    of the uniform one — ranks equal to 1e-12."""
    pairs = ring(12) + star(8) + [(0, "x1"), ("x1", 3)]
    base = pagerank(edge_df(spark, pairs), tol=1e-9, max_iter=12, num_partitions=4)
    weighted = pagerank(
        weighted_edge_df(spark, [(a, b, 2.5) for a, b in pairs]),
        tol=1e-9, max_iter=12, num_partitions=4, weight_col="w",
    )
    got = {r["id"]: r["rank"] for r in base.ranks.collect()}
    wgt = {r["id"]: r["rank"] for r in weighted.ranks.collect()}
    assert set(got) == set(wgt)
    for k, v in got.items():
        assert abs(wgt[k] - v) < 1e-12, (k, wgt[k], v)


def test_weighted_pagerank_hub_chunking_invariant(spark):
    """Out-degree cap chunking must not change weighted ranks: fracs
    are normalized by the vertex TOTAL, so chunked hub rows sum to the
    same contribution."""
    hub_out = [("h", f"t{i}", float(1 + i % 3)) for i in range(40)]
    back = [(f"t{i}", "h", 1.0) for i in range(0, 40, 4)]
    wpairs = hub_out + back
    full = pagerank(
        weighted_edge_df(spark, wpairs), tol=1e-9, max_iter=20,
        num_partitions=4, weight_col="w",
    )
    chunked = pagerank(
        weighted_edge_df(spark, wpairs), tol=1e-9, max_iter=20,
        num_partitions=4, weight_col="w", max_out_degree=8,
    )
    a = {r["id"]: r["rank"] for r in full.ranks.collect()}
    b = {r["id"]: r["rank"] for r in chunked.ranks.collect()}
    assert set(a) == set(b)
    for k, v in a.items():
        assert abs(b[k] - v) < 1e-12, (k, b[k], v)


def test_weighted_lpa_heavy_edge_flips_vote(spark):
    """One synchronous superstep (deterministic — multi-step
    synchronous LPA can 2-cycle, so single-step is the clean probe):
    x's neighbors all start self-labeled, so count-voting ties at 1
    and the min label a1 wins; weight-voting must pick the weight-5
    neighbor b0."""
    wpairs = [
        ("a0", "a1", 1.0), ("a0", "a2", 1.0), ("a1", "a2", 1.0),
        ("x", "a1", 1.0), ("x", "a2", 1.0),
        ("x", "b0", 5.0),
    ]
    unweighted = label_propagation(
        weighted_edge_df(spark, wpairs), max_iter=1, num_partitions=4
    )
    weighted = label_propagation(
        weighted_edge_df(spark, wpairs), max_iter=1, num_partitions=4,
        weight_col="w",
    )
    lu = {r["id"]: r["label"] for r in unweighted.labels.collect()}
    lw = {r["id"]: r["label"] for r in weighted.labels.collect()}
    assert lu["x"] == "a1"   # all votes count 1 → min-label tie-break
    assert lw["x"] == "b0"   # weight 5 beats two weight-1 votes


def test_weighted_lpa_equal_weights_equals_unweighted(spark):
    pairs = two_cliques_bridge(4) + [("c0", "c1"), ("c1", "c2")]
    base = label_propagation(edge_df(spark, pairs), max_iter=6, num_partitions=4)
    weighted = label_propagation(
        weighted_edge_df(spark, [(a, b, 3.0) for a, b in pairs]),
        max_iter=6, num_partitions=4, weight_col="w",
    )
    lb = {r["id"]: r["label"] for r in base.labels.collect()}
    lw = {r["id"]: r["label"] for r in weighted.labels.collect()}
    assert lb == lw


def test_clustering_coefficient_k3_plus_pendant(spark):
    """K3 {a,b,c} plus pendant c–d: coeff(a)=coeff(b)=1 (their whole
    neighborhood is connected), coeff(c)=2·1/(3·2)=1/3, coeff(d)=0
    (deg<2). Duplicate/reversed input edges must not change anything."""
    from graph_engine_spark.graph.triangles import clustering_coefficient

    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("b", "a")]
    rows = {
        r["id"]: r
        for r in clustering_coefficient(edge_df(spark, pairs)).collect()
    }
    assert rows["a"]["deg"] == 2 and abs(rows["a"]["coeff"] - 1.0) < 1e-12
    assert rows["b"]["deg"] == 2 and abs(rows["b"]["coeff"] - 1.0) < 1e-12
    assert rows["c"]["deg"] == 3 and abs(rows["c"]["coeff"] - 1 / 3) < 1e-12
    assert rows["d"]["deg"] == 1 and rows["d"]["coeff"] == 0.0
    assert {r["triangles"] for r in rows.values()} == {1, 0}


def test_weighted_pagerank_checkpoint_resume(spark, tmp_path):
    """Mid-iteration resume must hold for the weighted variant too:
    the loop state (ranks + dangling mass) is weight-agnostic, but the
    resumed run rebuilds the WEIGHTED adjacency — trajectory must equal
    the uninterrupted run."""
    from graph_engine_spark.graph.checkpoint import CheckpointManager

    wpairs = [(i, (i + 1) % 20, float(1 + (i * 3) % 5)) for i in range(20)] + [
        (i, 0, float(1 + i % 4)) for i in range(1, 10)
    ]
    df = lambda: weighted_edge_df(spark, wpairs)  # noqa: E731
    full = pagerank(df(), tol=1e-10, max_iter=20, num_partitions=4, weight_col="w")
    ck = CheckpointManager(str(tmp_path / "wck"), every_k=3)
    partial = pagerank(
        df(), tol=1e-10, max_iter=6, num_partitions=4, weight_col="w", checkpoint=ck
    )
    assert not partial.converged and ck.iterations()
    resumed = pagerank(
        df(), tol=1e-10, max_iter=20, num_partitions=4, weight_col="w",
        checkpoint=ck, resume=True,
    )
    assert resumed.iterations == full.iterations == 20
    got_full = {r["id"]: r["rank"] for r in full.ranks.collect()}
    got_res = {r["id"]: r["rank"] for r in resumed.ranks.collect()}
    for k in got_full:
        assert abs(got_full[k] - got_res[k]) < 1e-9


def test_weighted_pagerank_salting_matches_unsalted(spark):
    """Degree-targeted salting must stay a pure physical rewrite under
    weighted contributions (hub in-degree counts drive the salt
    decision; weights ride the aggregated value)."""
    wpairs = [(i, 0, float(1 + i % 7)) for i in range(1, 40)] + [
        (0, i, float(1 + i % 3)) for i in range(1, 8)
    ] + [(i, (i + 1) % 40 or 1, 2.0) for i in range(1, 40)]
    base = pagerank(
        weighted_edge_df(spark, wpairs), tol=1e-9, max_iter=10,
        num_partitions=4, weight_col="w",
    )
    salted = pagerank(
        weighted_edge_df(spark, wpairs), tol=1e-9, max_iter=10,
        num_partitions=4, weight_col="w",
        salt_buckets=8, salt_degree_threshold=20,
    )
    a = {r["id"]: r["rank"] for r in base.ranks.collect()}
    b = {r["id"]: r["rank"] for r in salted.ranks.collect()}
    assert set(a) == set(b)
    for k, v in a.items():
        assert abs(b[k] - v) < 1e-12, (k, b[k], v)


def test_weighted_lpa_checkpoint_resume(spark, tmp_path):
    """Weighted LPA resumes mid-iteration like the count-voted path:
    label state is weight-agnostic; the resumed run rebuilds the
    weighted symmetrized edge set."""
    from graph_engine_spark.graph.checkpoint import CheckpointManager

    wpairs = [(f"a{i}", f"a{(i + 1) % 9}", float(1 + i % 4)) for i in range(9)] + [
        (f"b{i}", f"b{(i + 2) % 11}", float(2 + i % 3)) for i in range(11)
    ] + [("a0", "b0", 1.0)]
    full = label_propagation(
        weighted_edge_df(spark, wpairs), max_iter=6, num_partitions=4,
        weight_col="w",
    )
    ck = CheckpointManager(str(tmp_path / "wlpa"), every_k=2)
    label_propagation(
        weighted_edge_df(spark, wpairs), max_iter=3, num_partitions=4,
        weight_col="w", checkpoint=ck,
    )
    assert ck.iterations()
    resumed = label_propagation(
        weighted_edge_df(spark, wpairs), max_iter=6, num_partitions=4,
        weight_col="w", checkpoint=ck, resume=True,
    )
    lf = {r["id"]: r["label"] for r in full.labels.collect()}
    lr = {r["id"]: r["label"] for r in resumed.labels.collect()}
    assert lf == lr


# --- LPA order-preserving integer coding (VERDICT r4 #4) --------------


def test_lpa_encoded_equals_uncoded(spark):
    """encode_ids=True runs the loop over order-preserving integer ids;
    decoded labels must EXACTLY equal the uncoded run — unweighted and
    weighted, on graphs whose outcome depends on the min-label
    tie-break (the semantics hash coding would break)."""
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    baseline = cache_mgr.cachedData().size()
    pairs = two_cliques_bridge(5) + [("c0", "c1"), ("c1", "c2"), ("zz", "c2")]
    for kw in ({}, {"weight_col": "w"}):
        if kw:
            df = weighted_edge_df(spark, [(a, b, 2.0) for a, b in pairs])
        else:
            df = edge_df(spark, pairs)
        plain = label_propagation(df, max_iter=6, num_partitions=4, **kw)
        coded = label_propagation(
            df, max_iter=6, num_partitions=4, encode_ids=True, **kw
        )
        lp = {r["id"]: r["label"] for r in plain.labels.collect()}
        lc = {r["id"]: r["label"] for r in coded.labels.collect()}
        assert lc == lp
        assert plain.converged == coded.converged
        assert plain.iterations == coded.iterations
        assert len(coded.round_seconds) == coded.iterations  # not _owned leak
        coded.release()
        plain.release()
    # release() freed the coded runs' id dictionaries too (regression:
    # the dict once rode the round_seconds slot and leaked forever)
    assert cache_mgr.cachedData().size() == baseline


def test_lpa_encoded_checkpoint_resume(spark, tmp_path):
    """Coded mid-iteration resume reloads the ORIGINAL durable
    dictionary (vid assignment is not bit-stable across rebuilds) and
    finishes with exactly the full run's labels; resuming coded state
    without a dictionary fails fast."""
    import pytest as _pytest

    from graph_engine_spark.graph.checkpoint import CheckpointManager
    from graph_engine_spark.graph.lpa import label_propagation

    pairs = two_cliques_bridge(5)
    full = label_propagation(
        edge_df(spark, pairs), max_iter=4, num_partitions=2, encode_ids=True
    )
    expect = {r["id"]: r["label"] for r in full.labels.collect()}

    ckdir = str(tmp_path / "lpa_enc_ck")
    ck = CheckpointManager(ckdir, every_k=2, keep_last=2)
    label_propagation(
        edge_df(spark, pairs), max_iter=2, num_partitions=2,
        checkpoint=ck, encode_ids=True,
    )
    resumed = label_propagation(
        edge_df(spark, pairs), max_iter=4, num_partitions=2,
        checkpoint=ck, resume=True, encode_ids=True,
    )
    got = {r["id"]: r["label"] for r in resumed.labels.collect()}
    assert got == expect

    # fail-fast: coded resume over a checkpoint with no dictionary
    import shutil

    shutil.rmtree(f"{ckdir}/id_dict")
    with _pytest.raises(ValueError, match="no id dictionary"):
        label_propagation(
            edge_df(spark, pairs), max_iter=4, num_partitions=2,
            checkpoint=ck, resume=True, encode_ids=True,
        )


# --- personalized PageRank (seeded teleport) --------------------------


def np_personalized_pagerank(pairs, seeds, alpha=0.85, tol=1e-10, max_iter=1000):
    """Dense numpy PPR oracle: teleport and dangling mass follow the
    seed distribution; seeds absent from the graph dropped before
    normalization (networkx `personalization=` semantics)."""
    import numpy as np

    verts = sorted({str(a) for a, _ in pairs} | {str(b) for _, b in pairs})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    out = np.zeros(n)
    for a, _ in pairs:
        out[idx[str(a)]] += 1
    p = np.zeros(n)
    for s, w in seeds.items():
        if str(s) in idx:
            p[idx[str(s)]] += w
    p /= p.sum()
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        contrib = np.zeros(n)
        for a, b in pairs:
            contrib[idx[str(b)]] += r[idx[str(a)]] / out[idx[str(a)]]
        dangling = r[out == 0].sum()
        new = (1 - alpha) * p + alpha * (contrib + dangling * p)
        if np.abs(new - r).sum() < tol:
            r = new
            break
        r = new
    return {v: r[idx[v]] for v in verts}


@pytest.mark.parametrize("encode", [True, False], ids=["coded", "uncoded"])
def test_personalized_pagerank_matches_numpy(spark, encode):
    """Weighted seed dict, a dangling sink, coded and uncoded paths."""
    pairs = [(i, (i * 7 + 3) % 25) for i in range(25)] + [
        (i, (i * 5 + 1) % 25) for i in range(25)
    ]
    pairs = [(a, b) for a, b in pairs if a != b] + [(7, 99)]  # 99 dangling
    seeds = {"0": 2.0, "13": 1.0}
    res = pagerank(
        edge_df(spark, pairs), tol=1e-9, max_iter=300, num_partitions=4,
        encode_ids=encode, personalization=seeds,
    )
    assert res.converged
    assert_ranks_close(res, np_personalized_pagerank(pairs, seeds))
    res.release()


def test_personalized_seed_handling(spark):
    """Seeds absent from the graph are dropped before normalization
    (list and dict forms agree); zero surviving mass raises without
    leaking cache entries or loop session conf."""
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    baseline = cache_mgr.cachedData().size()
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    pairs = ring(12)
    e = edge_df(spark, pairs)
    a = pagerank(e, tol=1e-9, max_iter=100, num_partitions=4,
                 personalization=["0", "zz"])
    b = pagerank(e, tol=1e-9, max_iter=100, num_partitions=4,
                 personalization={"0": 3.0})
    ga = {r["id"]: r["rank"] for r in a.ranks.collect()}
    gb = {r["id"]: r["rank"] for r in b.ranks.collect()}
    for k in ga:
        assert abs(ga[k] - gb[k]) < 1e-12
    a.release()
    b.release()
    with pytest.raises(ValueError, match="no positive mass"):
        pagerank(e, num_partitions=4, personalization=["zz"])
    assert spark.conf.get("spark.sql.adaptive.enabled") == aqe
    assert cache_mgr.cachedData().size() == baseline


def test_personalized_all_vertices_equals_uniform(spark):
    """Equal personalization over EVERY vertex is the uniform teleport —
    the personalized formula must reduce to standard PageRank exactly
    (same fixture, same superstep count)."""
    pairs = ring(10) + star(6)
    ids = sorted({str(a) for a, _ in pairs} | {str(b) for _, b in pairs})
    base = pagerank(edge_df(spark, pairs), tol=-1.0, max_iter=8, num_partitions=4)
    pers = pagerank(
        edge_df(spark, pairs), tol=-1.0, max_iter=8, num_partitions=4,
        personalization=ids,
    )
    a = {r["id"]: r["rank"] for r in base.ranks.collect()}
    b = {r["id"]: r["rank"] for r in pers.ranks.collect()}
    for k in a:
        assert abs(a[k] - b[k]) < 1e-12
    base.release()
    pers.release()


def test_personalized_checkpoint_resume_and_mismatch(spark, tmp_path):
    """Mid-iteration resume carries the teleport column in the state;
    resuming a personalized checkpoint without personalization (or vice
    versa) fails fast."""
    from graph_engine_spark.graph.checkpoint import CheckpointManager

    pairs = [(i, (i + 1) % 20) for i in range(20)] + [(i, 0) for i in range(1, 10)]
    seeds = {"0": 1.0, "5": 2.0}
    df = lambda: edge_df(spark, pairs)  # noqa: E731
    full = pagerank(df(), tol=1e-10, max_iter=20, num_partitions=4,
                    personalization=seeds)
    ck = CheckpointManager(str(tmp_path / "pck"), every_k=3)
    partial = pagerank(df(), tol=1e-10, max_iter=6, num_partitions=4,
                       personalization=seeds, checkpoint=ck)
    assert not partial.converged and ck.iterations()
    with pytest.raises(ValueError, match="personalization mismatch"):
        pagerank(df(), tol=1e-10, max_iter=20, num_partitions=4,
                 checkpoint=ck, resume=True)
    resumed = pagerank(df(), tol=1e-10, max_iter=20, num_partitions=4,
                       personalization=seeds, checkpoint=ck, resume=True)
    assert resumed.iterations == full.iterations == 20
    got_full = {r["id"]: r["rank"] for r in full.ranks.collect()}
    got_res = {r["id"]: r["rank"] for r in resumed.ranks.collect()}
    for k in got_full:
        assert abs(got_full[k] - got_res[k]) < 1e-9
    full.release()
    partial.release()
    resumed.release()


def test_weighted_personalized_pagerank_matches_numpy(spark):
    """weight_col and personalization compose: weighted contribution
    split, seeded teleport/dangling."""
    import numpy as np

    wpairs = [
        (0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 1.0),
        (3, 0, 5.0), (1, 3, 0.5), (2, 4, 4.0),
    ]
    seeds = {"1": 1.0, "3": 3.0}
    res = pagerank(
        weighted_edge_df(spark, wpairs), tol=1e-9, max_iter=300,
        num_partitions=4, weight_col="w", personalization=seeds,
    )
    # numpy oracle: weighted split + seeded teleport
    live = [(str(a), str(b), w) for a, b, w in wpairs if w > 0]
    verts = sorted({a for a, _, _ in live} | {b for _, b, _ in live})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    W = np.zeros((n, n))
    for a, b, w in live:
        W[idx[a], idx[b]] += w
    out = W.sum(axis=1)
    p = np.zeros(n)
    for s, w in seeds.items():
        p[idx[s]] += w
    p /= p.sum()
    r = np.full(n, 1.0 / n)
    for _ in range(1000):
        contrib = np.zeros(n)
        for i in range(n):
            if out[i] > 0:
                contrib += r[i] * W[i] / out[i]
        dangling = r[out == 0].sum()
        new = (1 - 0.85) * p + 0.85 * (contrib + dangling * p)
        if np.abs(new - r).sum() < 1e-10:
            r = new
            break
        r = new
    oracle = {v: r[idx[v]] for v in verts}
    assert res.converged
    assert_ranks_close(res, oracle)
    res.release()
