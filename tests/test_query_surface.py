"""Reference query-surface parity over an extracted graph
(SURVEY.md §2.2-2.3; reference mcp_integration.py tools)."""

import pytest
from pyspark.sql import functions as F

from graph_engine_spark.corpus import synthesize_corpus
from graph_engine_spark.extractor import extract_graph
from graph_engine_spark.queries import (
    callees_of,
    callers_of,
    callers_of_file,
    edges_for_file,
    edges_for_node,
    edges_for_nodes,
    find_functions_by_keyword,
    node_lookup,
    nodes_by_type,
    nodes_for_file,
    search_nodes,
    type_inventory,
)


@pytest.fixture(scope="module")
def graph(spark):
    corpus = synthesize_corpus(spark, n_files=80, n_components=4, hubs_per_component=2)
    nodes, edges = extract_graph(corpus)
    return nodes.persist(), edges.persist()


def test_nodes_by_type_and_limit(graph):
    nodes, _ = graph
    fns = nodes_by_type(nodes, "function")
    assert fns.count() > 0
    assert all(r["type"] == "function" for r in fns.limit(20).collect())
    assert nodes_by_type(nodes, "function", limit=5).count() == 5


def test_point_lookup(graph):
    nodes, _ = graph
    some = nodes.first()["id"]
    got = node_lookup(nodes, some).collect()
    assert len(got) == 1 and got[0]["id"] == some


def test_file_scoped(graph):
    nodes, edges = graph
    p = nodes.filter(F.col("type") == "module").first()["path"]
    assert nodes_for_file(nodes, p).count() > 0
    assert edges_for_file(edges, p).count() > 0
    assert all(r["path"] == p for r in nodes_for_file(nodes, p).collect())


def test_search_substring_case_insensitive(graph):
    nodes, _ = graph
    got = search_nodes(nodes, "MOD_0000", limit=10).collect()
    assert got
    for r in got:
        assert "mod_0000" in r["id"].lower() or "mod_0000" in r["path"].lower()


def test_keyword_function_search(graph):
    nodes, _ = graph
    got = find_functions_by_keyword(nodes, "hub_fn").collect()
    assert got and all("hub_fn" in r["name"] for r in got)


def test_one_hop_traversals(spark, graph):
    nodes, edges = graph
    # method_<i> calls fn_<i>_0 in every non-hub python file
    callee = edges.filter(
        (F.col("edge_type") == "calls") & F.col("dst").startswith("function:fn_")
    ).first()
    dst, src = callee["dst"], callee["src"]
    callers = callers_of(nodes, edges, dst).collect()
    assert any(r["id"] == src for r in callers)
    assert all(r["type"] == "function" for r in callers)
    callees = callees_of(nodes, edges, src).collect()
    assert any(r["id"] == dst for r in callees)


def test_two_hop_callers_of_file(spark, graph):
    nodes, edges = graph
    # pick a python file defining fn_<i>_1 (called by fn_<i>_0)
    row = (
        edges.filter(
            (F.col("edge_type") == "calls")
            & F.col("dst").rlike("^function:fn_[0-9]+_1$")
        )
        .first()
    )
    target_fn = row["dst"]
    path = nodes.filter(F.col("id") == target_fn).first()["path"]
    got = {r["id"] for r in callers_of_file(nodes, edges, path).collect()}
    assert row["src"] in got


def test_edges_for_node_directions(spark, graph):
    _, edges = graph
    nid = edges.first()["src"]
    out_n = edges_for_node(edges, nid, "outgoing").count()
    in_n = edges_for_node(edges, nid, "incoming").count()
    both = edges_for_node(edges, nid, "both").count()
    assert out_n > 0 and both >= max(out_n, in_n)


def test_edges_for_nodes_semijoin(spark, graph):
    _, edges = graph
    ids = spark.createDataFrame(
        [(r["src"],) for r in edges.limit(3).collect()], ["id"]
    )
    got = edges_for_nodes(edges, ids)
    assert got.count() > 0
    # dedup on logical edge key
    assert got.count() == got.select("src", "dst", "edge_type").distinct().count()


def test_type_inventory(graph):
    nodes, edges = graph
    t = {r["type"]: r["cnt"] for r in type_inventory(nodes).collect()}
    assert {"module", "function", "class", "import", "file"} <= set(t)
    e = {r["edge_type"]: r["cnt"] for r in type_inventory(edges, "edge_type").collect()}
    assert {"contains", "imports", "calls", "inherits", "member_of"} <= set(e)


def test_find_functions_by_param_keyword(graph):
    nodes, _ = graph
    # synthetic hub methods take 'self'; search by parameter name
    got = find_functions_by_keyword(nodes, "self", limit=5).collect()
    assert len(got) > 0
    for r in got:
        assert "self" in [p.lower() for p in (r["params"] or [])] or "self" in r["name"].lower()
