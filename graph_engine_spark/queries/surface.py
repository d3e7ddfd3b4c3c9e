"""The reference's query surface as parameterized DataFrame queries.

One function per MCP/REST tool (SURVEY.md §2.2-2.6; reference
graph_core/mcp_integration.py). Every reference tool is an O(N) python
scan over dicts; here each is a declarative plan Catalyst optimizes —
filters push into the Parquet/Iceberg scan, point lookups broadcast,
``limit`` becomes CollectLimit (the reference's early-exit loop,
mcp_integration.py:102-104, for free).

All functions take and return DataFrames; serving layers (REST/MCP in
the reference) are out of engine scope (SURVEY.md §3.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# --- projections / filters (reference mcp_integration.py:78-206) ---

def nodes_by_type(nodes: DataFrame, node_type: str, limit: int | None = None) -> DataFrame:
    """reference mcp_integration.py:181-192."""
    out = nodes.filter(F.col("type") == node_type)
    return out.limit(limit) if limit else out


def node_lookup(nodes: DataFrame, node_id: str) -> DataFrame:
    """Point lookup (reference in_memory.py:183-189)."""
    return nodes.filter(F.col("id") == node_id)


def nodes_for_file(nodes: DataFrame, path: str) -> DataFrame:
    """File-scoped projection (reference json_storage.py:470-491) —
    partition pruning on path replaces the file_nodes index."""
    return nodes.filter(F.col("path") == path)


def edges_for_file(edges: DataFrame, path: str) -> DataFrame:
    """Edge provenance filter (reference json_storage.py:493-515)."""
    return edges.filter(F.col("path") == path)


def search_nodes(nodes: DataFrame, keyword: str, limit: int | None = None) -> DataFrame:
    """Case-insensitive substring over id or path
    (reference mcp_integration.py:124-145)."""
    kw = keyword.lower()
    out = nodes.filter(
        F.lower(F.col("id")).contains(kw) | F.lower(F.col("path")).contains(kw)
    )
    return out.limit(limit) if limit else out


def find_functions_by_keyword(nodes: DataFrame, keyword: str, limit: int | None = None) -> DataFrame:
    """Keyword over function name OR any parameter name
    (reference mcp_integration.py:256-288, param scan 279-284)."""
    kw = keyword.lower()
    param_hit = F.coalesce(
        F.exists("params", lambda p: F.lower(p).contains(kw)), F.lit(False)
    )
    out = nodes.filter(
        (F.col("type") == "function")
        & (F.lower(F.col("name")).contains(kw) | param_hit)
    )
    return out.limit(limit) if limit else out


# --- joins / traversals (reference mcp_integration.py:147-324) ---

def edges_for_node(edges: DataFrame, node_id: str, direction: str = "both") -> DataFrame:
    """Directional edge filter (reference mcp_integration.py:147-179)."""
    if direction == "outgoing":
        return edges.filter(F.col("src") == node_id)
    if direction == "incoming":
        return edges.filter(F.col("dst") == node_id)
    return edges.filter((F.col("src") == node_id) | (F.col("dst") == node_id))


def edges_for_nodes(edges: DataFrame, ids_df: DataFrame) -> DataFrame:
    """Adjacency lookup for a node set (reference in_memory.py:191-209):
    union of two equi-semi-joins (not an OR-join — each side stays a
    hashable equi-join), deduped on the logical edge key."""
    out_e = edges.join(
        F.broadcast(ids_df.select(F.col("id").alias("src"))), "src", "leftsemi"
    )
    in_e = edges.join(
        F.broadcast(ids_df.select(F.col("id").alias("dst"))), "dst", "leftsemi"
    )
    return out_e.unionByName(in_e).dropDuplicates(["src", "dst", "edge_type"])


def callers_of(nodes: DataFrame, edges: DataFrame, function_id: str) -> DataFrame:
    """1-hop reverse traversal (reference mcp_integration.py:208-230):
    incoming 'calls' edges → source nodes of type function."""
    callers = edges.filter(
        (F.col("edge_type") == "calls") & (F.col("dst") == function_id)
    ).select(F.col("src").alias("id"))
    return nodes.join(callers, "id", "leftsemi").filter(F.col("type") == "function")


def callees_of(nodes: DataFrame, edges: DataFrame, function_id: str) -> DataFrame:
    """1-hop forward traversal (reference mcp_integration.py:232-254)."""
    callees = edges.filter(
        (F.col("edge_type") == "calls") & (F.col("src") == function_id)
    ).select(F.col("dst").alias("id"))
    return nodes.join(callees, "id", "leftsemi")


def callers_of_file(nodes: DataFrame, edges: DataFrame, path: str) -> DataFrame:
    """Two-hop semi-join (reference mcp_integration.py:290-324):
    functions in the file → their callers, deduped by caller id."""
    in_file = (
        nodes.filter((F.col("path") == path) & (F.col("type") == "function"))
        .select(F.col("id").alias("dst"))
    )
    caller_ids = (
        edges.filter(F.col("edge_type") == "calls")
        .join(F.broadcast(in_file), "dst", "leftsemi")
        .select(F.col("src").alias("id"))
        .distinct()
    )
    return nodes.join(caller_ids, "id", "leftsemi").filter(F.col("type") == "function")


# --- aggregations (reference in_memory.py:211-227 etc.) ---

def count_nodes(nodes: DataFrame) -> int:
    return nodes.count()


def count_edges(edges: DataFrame) -> int:
    return edges.count()


def type_inventory(df: DataFrame, col: str = "type") -> DataFrame:
    """Distinct type inventory with counts (SURVEY.md §2.4)."""
    return df.groupBy(col).agg(F.count("*").alias("cnt")).orderBy(col)
