"""NL-intent routing (reference mcp_endpoint.py:261-343) and the
profiler report contract (reference tests/test_performance.py:41-103)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def graph(spark):
    from graph_engine_spark.corpus import synthesize_corpus
    from graph_engine_spark.extractor import extract_graph

    corpus = synthesize_corpus(spark, n_files=40, n_components=4, hubs_per_component=2)
    nodes, edges = extract_graph(corpus)
    return nodes.persist(), edges.persist()


def test_intent_node_info(graph):
    from graph_engine_spark.queries.intent import interpret_request

    nodes, edges = graph
    some_id = nodes.filter("type = 'function'").first()["id"]
    it = interpret_request(f"what is {some_id}?", nodes, edges)
    assert it.kind == "node_info" and it.argument == some_id
    rows = it.result.collect()
    assert len(rows) == 1 and rows[0]["id"] == some_id


def test_intent_edge_list(graph):
    from graph_engine_spark.queries.intent import interpret_request

    nodes, edges = graph
    some_id = edges.first()["src"]
    it = interpret_request(f"what calls {some_id}", nodes, edges)
    assert it.kind == "edge_list"
    got = it.result.collect()
    assert all(r["src"] == some_id or r["dst"] == some_id for r in got)


def test_intent_search_with_limit(graph):
    from graph_engine_spark.queries.intent import interpret_request

    nodes, edges = graph
    it = interpret_request("search for mod_00 limited to 3", nodes, edges)
    assert it.kind == "search_results" and it.limit == 3
    assert it.argument == "mod_00"
    assert len(it.result.collect()) <= 3


def test_intent_unknown(graph):
    from graph_engine_spark.queries.intent import interpret_request

    nodes, edges = graph
    it = interpret_request("how is the weather", nodes, edges)
    assert it.kind == "unknown" and it.result is None


def test_profiler_report_contract(spark, tmp_path):
    """Same asserted fields as the reference's profiler E2E test."""
    from graph_engine_spark.profiler import profile_pipeline

    report = profile_pipeline(spark, n_files=60, output_dir=str(tmp_path / "out"))
    assert "Overall processing time" in report
    assert "parse_file" in report
    assert "scan_secrets" in report
    assert "storage_add_update" in report
    assert "storage_save" in report
    assert "Untimed/Overhead" in report
