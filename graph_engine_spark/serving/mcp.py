"""MCP stdio JSON-RPC endpoint — reference mcp_integration/mcp_endpoint.py.

The reference serves three tools over the Model Context Protocol's
stdio transport (mcp_endpoint.py:346-354 wires Server(tools=[...]) into
stdio_main): ``get_node_info`` (:122-146), ``search_nodes`` (:148-187)
and ``list_edges`` (:189-216). This module is the same surface with the
same tool names, input schemas (:219-255) and result shapes
(_convert_node_to_dict/_convert_edge_to_dict, :70-90), on a stdlib-only
newline-delimited JSON-RPC 2.0 loop (no ``mcp`` package in the
sandbox), so a reference MCP client connects unchanged.

Two graph views back the tools:
  * ``JsonGraphView`` — loads a reference ``{nodes, edges, file_nodes}``
    snapshot (the reference endpoint itself serves from that same
    document via JSONGraphStorage, mcp_endpoint.py:52-60). Pure stdlib:
    the subprocess CLI (``python -m graph_engine_spark.serving.mcp
    --snapshot graph.json``) needs no Spark session.
  * ``StateGraphView`` — a live GraphState; lookups/search/edge-listing
    are pushed into Spark (point-lookup filter, substring filter +
    limit, edge semi-join) so only the bounded result rows reach the
    driver. Like the REST shim, this layer is NOT in any hot path.

Tool semantics mirrored exactly:
  * get_node_info: missing node → isError result "Node '<id>' not
    found" (:136-140), not a JSON-RPC error;
  * search_nodes: case-insensitive substring over node id OR filepath
    (:165-169), limit default 10, non-positive/invalid limit resets to
    10 (:156-158), result ``{"nodes": [...]}``;
  * list_edges: node existence checked first (:198-202), then every
    edge touching the node in either direction, result
    ``{"edges": [...]}``.
"""

from __future__ import annotations

import json
import sys


TOOLS = [
    # names/descriptions/inputSchema verbatim from the reference tool
    # registry (mcp_endpoint.py:219-255)
    {
        "name": "get_node_info",
        "description": "Retrieve information about a specific node by its ID.",
        "inputSchema": {
            "type": "object",
            "properties": {
                "node_id": {
                    "type": "string",
                    "description": "The unique identifier of the node.",
                }
            },
            "required": ["node_id"],
        },
    },
    {
        "name": "search_nodes",
        "description": "Search for nodes based on a query string (e.g., in name or filepath).",
        "inputSchema": {
            "type": "object",
            "properties": {
                "query": {
                    "type": "string",
                    "description": "The search query string.",
                },
                "limit": {
                    "type": "integer",
                    "description": "Maximum number of results to return.",
                    "default": 10,
                },
            },
            "required": ["query"],
        },
    },
    {
        "name": "list_edges",
        "description": "List all incoming and outgoing edges connected to a specific node.",
        "inputSchema": {
            "type": "object",
            "properties": {
                "node_id": {
                    "type": "string",
                    "description": "The unique identifier of the node.",
                }
            },
            "required": ["node_id"],
        },
    },
]

PROTOCOL_VERSION = "2024-11-05"


def _node_out(doc: dict) -> dict:
    """Reference _convert_node_to_dict (mcp_endpoint.py:70-78): the tool
    emits {node_id, filepath, node_type, metadata}. The reference reads
    'node_type' off dicts that store the key as 'type' (so it always
    emitted null there); we emit the actual type — same intended shape,
    populated. Remaining document fields travel in metadata."""
    meta = {
        k: v
        for k, v in doc.items()
        if k not in ("id", "filepath", "type") and v is not None
    }
    return {
        "node_id": doc.get("id", "unknown_id"),
        "filepath": doc.get("filepath"),
        "node_type": doc.get("type"),
        "metadata": meta,
    }


def _edge_out(doc: dict) -> dict:
    """Reference _convert_edge_to_dict (mcp_endpoint.py:81-89)."""
    meta = {
        k: v
        for k, v in doc.items()
        if k not in ("source", "target", "type") and v is not None
    }
    return {
        "source": doc.get("source", "unknown_source"),
        "target": doc.get("target", "unknown_target"),
        "edge_type": doc.get("type"),
        "metadata": meta,
    }


class JsonGraphView:
    """Reference-snapshot-backed view (stdlib only — the CLI path)."""

    def __init__(self, snapshot_path: str):
        with open(snapshot_path, encoding="utf-8") as f:
            data = json.load(f)
        self._nodes = {n["id"]: n for n in data.get("nodes", []) if "id" in n}
        self._edges = list(data.get("edges", []))

    def get_node(self, node_id: str) -> dict | None:
        return self._nodes.get(node_id)

    def search(self, query: str, limit: int) -> list[dict]:
        q = query.lower()
        out = []
        for n in self._nodes.values():
            if q in n.get("id", "").lower() or (
                n.get("filepath") and q in n["filepath"].lower()
            ):
                out.append(n)
                if len(out) >= limit:
                    break
        return out

    def edges_for_node(self, node_id: str) -> list[dict]:
        return [
            e
            for e in self._edges
            if e.get("source") == node_id or e.get("target") == node_id
        ]


class StateGraphView:
    """Live-GraphState-backed view: every tool call is a bounded Spark
    query (point lookup / pushed-down substring filter + limit / edge
    adjacency), collecting only the rows the tool returns."""

    def __init__(self, state):
        self._state = state

    def get_node(self, node_id: str) -> dict | None:
        from pyspark.sql import functions as F

        from graph_engine_spark.storage.jsonio import node_row_to_doc

        rows = self._state.nodes.filter(F.col("id") == node_id).limit(1).collect()
        return node_row_to_doc(rows[0]) if rows else None

    def search(self, query: str, limit: int) -> list[dict]:
        from pyspark.sql import functions as F

        from graph_engine_spark.storage.jsonio import node_row_to_doc

        q = query.lower()
        rows = (
            self._state.nodes.filter(
                F.lower(F.col("id")).contains(q)
                | F.lower(F.col("path")).contains(q)
            )
            .orderBy(F.asc("id"))  # deterministic page (reference takes dict order)
            .limit(limit)
            .collect()
        )
        return [node_row_to_doc(r) for r in rows]

    def edges_for_node(self, node_id: str) -> list[dict]:
        from pyspark.sql import functions as F

        from graph_engine_spark.storage.jsonio import edge_row_to_doc

        rows = (
            self._state.edges.filter(
                (F.col("src") == node_id) | (F.col("dst") == node_id)
            )
            .orderBy(F.asc("src"), F.asc("dst"), F.asc("edge_type"))
            .collect()
        )
        return [edge_row_to_doc(r) for r in rows]


class MCPServer:
    """Newline-delimited JSON-RPC 2.0 loop implementing the MCP
    lifecycle (initialize → initialized → tools/list | tools/call)."""

    def __init__(self, view):
        self._view = view

    # --- tool dispatch ----------------------------------------------
    def _tool_result(self, text: str, is_error: bool = False) -> dict:
        return {
            "content": [{"type": "text", "text": text}],
            "isError": is_error,
        }

    def call_tool(self, name: str, arguments: dict) -> dict:
        try:
            if name == "get_node_info":
                node_id = arguments.get("node_id")
                if not node_id or not isinstance(node_id, str):
                    raise ValueError("Missing or invalid 'node_id' argument.")
                node = self._view.get_node(node_id)
                if node is None:
                    return self._tool_result(f"Node '{node_id}' not found", True)
                return self._tool_result(json.dumps(_node_out(node)))
            if name == "search_nodes":
                query = arguments.get("query")
                limit = arguments.get("limit", 10)
                if not query or not isinstance(query, str):
                    raise ValueError("Missing or invalid 'query' argument.")
                if not isinstance(limit, int) or isinstance(limit, bool) or limit <= 0:
                    limit = 10  # reference resets invalid limits (:156-158)
                nodes = [_node_out(n) for n in self._view.search(query, limit)]
                return self._tool_result(json.dumps({"nodes": nodes}))
            if name == "list_edges":
                node_id = arguments.get("node_id")
                if not node_id or not isinstance(node_id, str):
                    raise ValueError("Missing or invalid 'node_id' argument.")
                if self._view.get_node(node_id) is None:
                    return self._tool_result(f"Node '{node_id}' not found", True)
                edges = [_edge_out(e) for e in self._view.edges_for_node(node_id)]
                return self._tool_result(json.dumps({"edges": edges}))
            return self._tool_result(f"Unknown tool: {name}", True)
        except Exception as e:  # tool errors are MCP results, not RPC errors
            return self._tool_result(f"Internal server error: {e}", True)

    # --- JSON-RPC plumbing ------------------------------------------
    def handle(self, msg: dict) -> dict | None:
        """One request/notification → one response dict (None for
        notifications)."""
        method = msg.get("method")
        msg_id = msg.get("id")
        is_notification = "id" not in msg

        def ok(result):
            return {"jsonrpc": "2.0", "id": msg_id, "result": result}

        def err(code, message):
            return {
                "jsonrpc": "2.0",
                "id": msg_id,
                "error": {"code": code, "message": message},
            }

        if method == "initialize":
            return ok(
                {
                    "protocolVersion": PROTOCOL_VERSION,
                    "capabilities": {"tools": {}},
                    "serverInfo": {
                        "name": "graph-engine-spark",
                        "version": "0.4",
                    },
                }
            )
        if method in ("notifications/initialized", "initialized"):
            return None
        if is_notification:
            return None  # unknown notifications are dropped per JSON-RPC
        if method == "tools/list":
            return ok({"tools": TOOLS})
        if method == "tools/call":
            params = msg.get("params") or {}
            name = params.get("name")
            if not name:
                return err(-32602, "tools/call requires params.name")
            return ok(self.call_tool(name, params.get("arguments") or {}))
        if method == "ping":
            return ok({})
        return err(-32601, f"Method not found: {method}")

    def serve_stdio(self, stdin=None, stdout=None) -> None:
        """Blocking newline-delimited JSON-RPC loop (MCP stdio
        transport). EOF on stdin ends the session."""
        stdin = stdin or sys.stdin
        stdout = stdout or sys.stdout
        for line in stdin:
            line = line.strip()
            if not line:
                continue
            try:
                msg = json.loads(line)
            except json.JSONDecodeError:
                resp = {
                    "jsonrpc": "2.0",
                    "id": None,
                    "error": {"code": -32700, "message": "Parse error"},
                }
                stdout.write(json.dumps(resp) + "\n")
                stdout.flush()
                continue
            resp = self.handle(msg)
            if resp is not None:
                stdout.write(json.dumps(resp) + "\n")
                stdout.flush()


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        description="Serve the graph over MCP stdio (reference "
        "mcp_integration/mcp_endpoint.py surface)."
    )
    ap.add_argument(
        "--snapshot",
        required=True,
        help="reference-format {nodes, edges, file_nodes} JSON document "
        "(the same file the reference endpoint loads via GRAPH_STORAGE_PATH)",
    )
    args = ap.parse_args(argv)
    MCPServer(JsonGraphView(args.snapshot)).serve_stdio()
    return 0


if __name__ == "__main__":
    sys.exit(main())
