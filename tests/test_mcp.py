"""MCP stdio endpoint — reference mcp_integration/mcp_endpoint.py
parity: same three tools (get_node_info / search_nodes / list_edges),
same input schemas and result shapes, served over newline-delimited
JSON-RPC 2.0 on stdio (the MCP stdio transport).

The subprocess test drives a REAL stdio session against the CLI
(`python -m graph_engine_spark.serving.mcp --snapshot ...`) — no Spark
needed in the child, mirroring the reference endpoint which serves
from its JSON snapshot (mcp_endpoint.py:52-60). The in-process test
exercises the StateGraphView (bounded Spark queries) over genuinely
extracted state.
"""

import json
import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SNAPSHOT = {
    "nodes": [
        {
            "id": "function:greet",
            "type": "function",
            "name": "greet",
            "filepath": "src/sample.py",
            "start_line": 3,
            "end_line": 5,
            "files": ["src/sample.py"],
        },
        {
            "id": "module:sample.py",
            "type": "module",
            "name": "sample.py",
            "filepath": "src/sample.py",
            "files": ["src/sample.py"],
        },
        {
            "id": "module:other.py",
            "type": "module",
            "name": "other.py",
            "filepath": "lib/other.py",
            "files": ["lib/other.py"],
        },
    ],
    "edges": [
        {
            "source": "module:sample.py",
            "target": "function:greet",
            "type": "contains",
            "file": "src/sample.py",
        },
        {
            "source": "module:other.py",
            "target": "module:sample.py",
            "type": "imports",
            "file": "lib/other.py",
        },
    ],
    "file_nodes": {},
}


class _StdioClient:
    def __init__(self, proc):
        self.proc = proc
        self._next_id = 0

    def request(self, method, params=None):
        self._next_id += 1
        msg = {"jsonrpc": "2.0", "id": self._next_id, "method": method}
        if params is not None:
            msg["params"] = params
        self.proc.stdin.write(json.dumps(msg) + "\n")
        self.proc.stdin.flush()
        line = self.proc.stdout.readline()
        assert line, "server closed stdout"
        resp = json.loads(line)
        assert resp["id"] == self._next_id
        return resp

    def notify(self, method):
        self.proc.stdin.write(json.dumps({"jsonrpc": "2.0", "method": method}) + "\n")
        self.proc.stdin.flush()


def _tool_text(resp):
    result = resp["result"]
    assert result["content"][0]["type"] == "text"
    return result["isError"], result["content"][0]["text"]


def test_mcp_stdio_subprocess(tmp_path):
    snap = tmp_path / "graph.json"
    snap.write_text(json.dumps(SNAPSHOT))
    proc = subprocess.Popen(
        [sys.executable, "-m", "graph_engine_spark.serving.mcp", "--snapshot", str(snap)],
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        cwd=REPO_ROOT,
        env={**os.environ, "PYTHONPATH": REPO_ROOT},
    )
    try:
        c = _StdioClient(proc)
        # lifecycle: initialize → initialized notification
        resp = c.request(
            "initialize",
            {
                "protocolVersion": "2024-11-05",
                "capabilities": {},
                "clientInfo": {"name": "pytest", "version": "0"},
            },
        )
        assert resp["result"]["protocolVersion"] == "2024-11-05"
        assert "tools" in resp["result"]["capabilities"]
        c.notify("notifications/initialized")

        # tools/list: the reference's three tools, schemas included
        resp = c.request("tools/list")
        tools = {t["name"]: t for t in resp["result"]["tools"]}
        assert set(tools) == {"get_node_info", "search_nodes", "list_edges"}
        assert tools["search_nodes"]["inputSchema"]["required"] == ["query"]
        assert tools["get_node_info"]["inputSchema"]["required"] == ["node_id"]

        # search_nodes: substring over id OR filepath, limit respected
        _, text = _tool_text(
            c.request(
                "tools/call",
                {"name": "search_nodes", "arguments": {"query": "sample"}},
            )
        )
        got = {n["node_id"] for n in json.loads(text)["nodes"]}
        assert got == {"function:greet", "module:sample.py"}
        _, text = _tool_text(
            c.request(
                "tools/call",
                {"name": "search_nodes", "arguments": {"query": "module", "limit": 1}},
            )
        )
        assert len(json.loads(text)["nodes"]) == 1

        # get_node_info: hit and reference-shape miss
        is_err, text = _tool_text(
            c.request(
                "tools/call",
                {"name": "get_node_info", "arguments": {"node_id": "function:greet"}},
            )
        )
        assert not is_err
        node = json.loads(text)
        assert node["node_id"] == "function:greet"
        assert node["filepath"] == "src/sample.py"
        assert node["node_type"] == "function"
        is_err, text = _tool_text(
            c.request(
                "tools/call",
                {"name": "get_node_info", "arguments": {"node_id": "nope"}},
            )
        )
        assert is_err and "not found" in text

        # list_edges: both directions for the node
        is_err, text = _tool_text(
            c.request(
                "tools/call",
                {"name": "list_edges", "arguments": {"node_id": "module:sample.py"}},
            )
        )
        assert not is_err
        edges = {
            (e["source"], e["target"], e["edge_type"])
            for e in json.loads(text)["edges"]
        }
        assert edges == {
            ("module:sample.py", "function:greet", "contains"),
            ("module:other.py", "module:sample.py", "imports"),
        }

        # JSON-RPC errors: unknown method; missing tool name
        resp = c.request("no/such/method")
        assert resp["error"]["code"] == -32601
        resp = c.request("tools/call", {})
        assert resp["error"]["code"] == -32602
    finally:
        proc.stdin.close()
        proc.wait(timeout=10)
        assert proc.returncode == 0


def test_mcp_state_view_over_extracted_graph(spark):
    from graph_engine_spark.serving.mcp import MCPServer, StateGraphView
    from graph_engine_spark.streaming.maintenance import apply_upserts, empty_state

    src = "import os\n\ndef top(x):\n    return helper(x)\n\ndef helper(y):\n    return y\n"
    corpus = spark.createDataFrame(
        [("r", "a.py", "c1", "python", src)],
        "repo string, path string, commit string, lang string, content string",
    )
    state = apply_upserts(empty_state(spark), corpus)
    srv = MCPServer(StateGraphView(state))

    def call(name, arguments):
        resp = srv.handle(
            {
                "jsonrpc": "2.0",
                "id": 1,
                "method": "tools/call",
                "params": {"name": name, "arguments": arguments},
            }
        )
        result = resp["result"]
        return result["isError"], json.loads(result["content"][0]["text"]) if not result[
            "isError"
        ] else result["content"][0]["text"]

    is_err, node = call("get_node_info", {"node_id": "function:top"})
    assert not is_err
    assert node["node_type"] == "function" and node["filepath"] == "a.py"
    assert node["metadata"]["parameters"] == ["x"]

    is_err, found = call("search_nodes", {"query": "a.py", "limit": 50})
    assert not is_err
    # filepath substring matches every a.py-scoped node
    assert {"module:a.py", "file:a.py"} <= {n["node_id"] for n in found["nodes"]}

    is_err, listed = call("list_edges", {"node_id": "function:top"})
    assert not is_err
    triples = {(e["source"], e["target"], e["edge_type"]) for e in listed["edges"]}
    assert ("function:top", "function:helper", "calls") in triples

    is_err, text = call("list_edges", {"node_id": "ghost"})
    assert is_err and "not found" in text
