"""Bucketed edge-table storage: round-trip + the two plan properties
the 100 TB design buys with it (exchange-free src aggregation; joins
that reuse the bucketed side's clustering instead of re-shuffling it).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from graph_engine_spark.storage.edgetable import (
    bucket_spec,
    read_edge_table,
    src_degrees_from_table,
    write_edge_table,
)
from tests.test_plan_shapes import plan_of


@pytest.fixture(scope="module")
def edge_table(spark, tmp_path_factory):
    """A small skewed edge set written as a bucketed table once for the
    module; dropped (catalog entry) afterwards."""
    name = "test_bucketed_edges"
    path = str(tmp_path_factory.mktemp("edgetable"))
    rows = [
        (f"m{i % 40}", f"m{(i * 7 + 1) % 97}", "imports" if i % 3 else "calls")
        for i in range(500)
    ]
    # plant duplicates: dedup-on-write is part of the contract
    edges = spark.createDataFrame(rows + rows[:50], ["src", "dst", "edge_type"])
    write_edge_table(edges, name, path, buckets=8)
    yield name, edges
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_round_trip_is_deduplicated_set(spark, edge_table):
    name, edges = edge_table
    got = sorted(map(tuple, read_edge_table(spark, name).collect()))
    want = sorted(map(tuple, edges.dropDuplicates().collect()))
    assert got == want


def test_bucket_spec_registered(spark, edge_table):
    name, _ = edge_table
    spec = bucket_spec(spark, name)
    assert spec["num_buckets"] == 8
    assert "src" in spec["bucket_columns"]
    assert "src" in spec["sort_columns"]


def test_src_aggregation_plans_no_exchange(spark, edge_table):
    """HashPartitioning(src, 8) from the bucketed scan satisfies the
    aggregation's distribution — the degree profile runs shuffle-free."""
    name, _ = edge_table
    plan = plan_of(src_degrees_from_table(spark, name))
    assert "Exchange" not in plan, plan
    assert re.search(r"Bucketed: true", plan), plan


def test_src_join_shuffles_only_the_other_side(spark, edge_table):
    """Joining on src must reuse the table's clustering: exactly one
    Exchange (the non-bucketed side), none above the bucketed scan."""
    name, _ = edge_table
    other = spark.range(200).select(
        F.concat(F.lit("m"), F.col("id") % 40).alias("src"),
        F.col("id").alias("rank"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_edge_table(spark, name).join(other, "src")
        plan = plan_of(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert re.search(r"Bucketed: true", plan), plan
    # formatted explain prints each node twice (tree edge + detail
    # header) — count the detail headers, one per physical node
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_pagerank_identical_through_bucketed_table(spark, edge_table):
    """Integration: the iterative layer consumes the bucketed table
    exactly like a plain frame — per-vertex ranks match to 1e-12
    (same deterministic plan, different physical source)."""
    from graph_engine_spark.graph.pagerank import pagerank

    name, edges = edge_table
    # dedup first: the fixture plants duplicate rows, which the write
    # removed — parallel edges would change contribution weights
    direct = {
        r["id"]: r["rank"]
        for r in pagerank(edges.dropDuplicates(), tol=-1.0, max_iter=5).ranks.collect()
    }
    via_table = {
        r["id"]: r["rank"]
        for r in pagerank(
            read_edge_table(spark, name), tol=-1.0, max_iter=5
        ).ranks.collect()
    }
    assert direct.keys() == via_table.keys()
    assert all(abs(direct[k] - via_table[k]) < 1e-12 for k in direct)


def test_plain_path_read_would_lose_the_bucketing(spark, edge_table):
    """Negative control for the read_edge_table docstring: reading the
    same files by path plans a shuffle for the same aggregation."""
    name, _ = edge_table
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {name}")
        .filter(F.col("col_name") == "Location")
        .collect()[0]["data_type"]
    )
    by_path = spark.read.parquet(loc.replace("file:", ""))
    plan = plan_of(by_path.groupBy("src").agg(F.count("*").alias("d")))
    assert "Exchange" in plan, plan
