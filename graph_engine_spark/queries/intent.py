"""Natural-language intent layer — free text → query-surface call.

Re-expresses the reference's regex intent recognizer
(reference mcp_integration/mcp_endpoint.py:261-343): three intents
checked in the same priority order with equivalent patterns, returning
a parameterized DataFrame from queries/surface.py instead of an MCP
tool result. Pure driver-side routing — no data motion until the
returned DataFrame is acted on.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

from graph_engine_spark.queries.surface import (
    edges_for_node,
    node_lookup,
    search_nodes,
)

# patterns mirror mcp_endpoint.py:279 (node info), :296 (edges), :313
# (search) — same alternations, same priority order
_INFO_RX = re.compile(
    r"(?:info about|details for|what is|describe)(?:\s+|[\s`])"
    r"(node[0-9a-zA-Z_-]+|[a-zA-Z0-9_:.-]+)",
    re.IGNORECASE,
)
_EDGES_RX = re.compile(
    r"(?:edges for|connections to|connections from|calls to|references for|"
    r"what calls|what uses|related to)(?:\s+|[\s`])"
    r"(node[0-9a-zA-Z_-]+|[a-zA-Z0-9_:.-]+)",
    re.IGNORECASE,
)
_SEARCH_RX = re.compile(r"(?:search for|find nodes matching|find|look for) +(.+)", re.IGNORECASE)
_LIMIT_RX = re.compile(r"limit(?:ed to)? +(\d+)", re.IGNORECASE)


@dataclass
class Intent:
    kind: str  # node_info | edge_list | search_results | unknown
    argument: str | None
    limit: int
    result: DataFrame | None


def interpret_request(
    request_text: str, nodes: DataFrame, edges: DataFrame
) -> Intent:
    """Route free text to the matching query; unknown text returns
    kind='unknown' with no DataFrame (the reference's default error)."""
    text = request_text.lower()

    m = _INFO_RX.search(text)
    if m:
        node_id = m.group(1).strip().replace("`", "")
        return Intent("node_info", node_id, 1, node_lookup(nodes, node_id))

    m = _EDGES_RX.search(text)
    if m:
        node_id = m.group(1).strip().replace("`", "")
        return Intent("edge_list", node_id, 0, edges_for_node(edges, node_id, "both"))

    limit = 10
    ml = _LIMIT_RX.search(text)
    if ml:
        limit = int(ml.group(1))

    m = _SEARCH_RX.search(text)
    if m:
        query = m.group(1).strip()
        if ml:
            query = _LIMIT_RX.sub("", query).strip()
            query = re.sub(r" with $", "", query, flags=re.IGNORECASE).strip()
        return Intent("search_results", query, limit, search_nodes(nodes, query, limit))

    return Intent("unknown", None, 0, None)
