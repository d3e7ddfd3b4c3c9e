"""Reference-format JSON snapshot round-trip
(reference json_storage.py:47-232; sample data/graph_data.json shape)."""

import json

from pyspark.sql import functions as F


REFERENCE_SHAPED_DOC = {
    # field names and nesting exactly as the reference writes them —
    # including windows-style paths and the per-edge uuid id we ignore
    "nodes": [
        {
            "id": "function:greet",
            "type": "function",
            "name": "greet",
            "filepath": "src\\sample_module.py",
            "start_line": 50,
            "end_line": 51,
            "files": ["src\\sample_module.py", "src\\sample.py"],
        },
        {
            "id": "module:sample_module.py",
            "type": "module",
            "name": "sample_module.py",
            "filepath": "src\\sample_module.py",
            "start_line": 1,
            "end_line": 60,
            "files": ["src\\sample_module.py"],
        },
    ],
    "edges": [
        {
            "source": "module:sample_module.py",
            "target": "function:greet",
            "type": "contains",
            "id": "contains:d145aed4-a70c-4ff1-8106-0658c89f89cc",
            "file": "src\\sample_module.py",
        }
    ],
    "file_nodes": {
        "src\\sample_module.py": ["function:greet", "module:sample_module.py"],
        "src\\sample.py": ["function:greet"],
    },
}


def test_import_reference_document(spark, tmp_path):
    from graph_engine_spark.storage.jsonio import import_reference_json

    p = tmp_path / "graph_data.json"
    p.write_text(json.dumps(REFERENCE_SHAPED_DOC))
    state = import_reference_json(spark, str(p))
    nodes = {r["id"]: r for r in state.nodes.collect()}
    assert set(nodes) == {"function:greet", "module:sample_module.py"}
    assert nodes["function:greet"]["path"] == "src\\sample_module.py"
    assert sorted(nodes["function:greet"]["files"]) == [
        "src\\sample.py",
        "src\\sample_module.py",
    ]
    edges = state.edges.collect()
    assert len(edges) == 1
    assert (edges[0]["src"], edges[0]["dst"], edges[0]["edge_type"]) == (
        "module:sample_module.py",
        "function:greet",
        "contains",
    )
    assert edges[0]["path"] == "src\\sample_module.py"


def test_export_import_round_trip_from_extraction(spark, tmp_path):
    """State built by the engine exports to the reference document shape
    and re-imports identically (nodes/edges, file_nodes derived)."""
    from graph_engine_spark.storage.jsonio import (
        export_reference_json,
        import_reference_json,
    )
    from graph_engine_spark.streaming.maintenance import apply_upserts, empty_state

    src = "import os\n\ndef shared_func():\n    return 1\n"
    corpus = spark.createDataFrame(
        [("r", "a.py", "c" * 40, "python", src), ("r", "b.py", "c" * 40, "python", src)],
        ["repo", "path", "commit", "lang", "content"],
    )
    state = apply_upserts(empty_state(spark), corpus)
    out = tmp_path / "exported.json"
    export_reference_json(state, str(out))

    doc = json.loads(out.read_text())
    assert set(doc) == {"nodes", "edges", "file_nodes"}
    # reference field names used throughout
    assert all("filepath" in n for n in doc["nodes"])
    assert all({"source", "target", "type", "id"} <= set(e) for e in doc["edges"])
    # shared node appears under both files in file_nodes
    assert "function:shared_func" in doc["file_nodes"]["a.py"]
    assert "function:shared_func" in doc["file_nodes"]["b.py"]
    # deterministic edge ids (documented deviation from uuid4)
    ids = [e["id"] for e in doc["edges"]]
    assert len(ids) == len(set(ids))
    assert all(i.split(":", 1)[0] == e["type"] for i, e in zip(ids, doc["edges"]))

    back = import_reference_json(spark, str(out))
    orig_nodes = {(r["id"], tuple(sorted(r["files"]))) for r in state.nodes.collect()}
    back_nodes = {(r["id"], tuple(sorted(r["files"]))) for r in back.nodes.collect()}
    assert orig_nodes == back_nodes
    orig_edges = {(r["src"], r["dst"], r["edge_type"]) for r in state.edges.collect()}
    back_edges = {(r["src"], r["dst"], r["edge_type"]) for r in back.edges.collect()}
    assert orig_edges == back_edges


def test_rename_history_both_shapes(spark, tmp_path):
    """The reference appends plain old_path STRINGS to rename_history
    (reference manager.py:501-503); this engine's extension is
    {old_path, new_path, ts} structs. Import accepts both; export emits
    the string shape by default (reference parity) and the struct shape
    under rich_rename_history=True."""
    from graph_engine_spark.storage.jsonio import (
        export_reference_json,
        import_reference_json,
    )

    doc = {
        "nodes": [
            {
                "id": "module:a.py",
                "type": "module",
                "name": "a.py",
                "filepath": "a.py",
                "files": ["a.py"],
                # genuine reference shape: list of old-path strings
                "rename_history": ["old_a.py", "older_a.py"],
            },
            {
                "id": "module:b.py",
                "type": "module",
                "name": "b.py",
                "filepath": "b.py",
                "files": ["b.py"],
                # this engine's struct extension
                "rename_history": [
                    {"old_path": "old_b.py", "new_path": "b.py", "ts": 12.5}
                ],
            },
        ],
        "edges": [],
        "file_nodes": {},
    }
    p = tmp_path / "ref.json"
    p.write_text(json.dumps(doc))
    state = import_reference_json(spark, str(p))
    hist = {r["id"]: r["rename_history"] for r in state.nodes.collect()}
    assert [(h["old_path"], h["new_path"], h["ts"]) for h in hist["module:a.py"]] == [
        ("old_a.py", None, None),
        ("older_a.py", None, None),
    ]
    assert [(h["old_path"], h["new_path"], h["ts"]) for h in hist["module:b.py"]] == [
        ("old_b.py", "b.py", 12.5)
    ]

    # default export: reference string shape
    out = tmp_path / "out.json"
    export_reference_json(state, str(out))
    by_id = {n["id"]: n for n in json.loads(out.read_text())["nodes"]}
    assert by_id["module:a.py"]["rename_history"] == ["old_a.py", "older_a.py"]
    assert by_id["module:b.py"]["rename_history"] == ["old_b.py"]

    # rich export: struct shape, lossless round-trip
    rich = tmp_path / "rich.json"
    export_reference_json(state, str(rich), rich_rename_history=True)
    by_id = {n["id"]: n for n in json.loads(rich.read_text())["nodes"]}
    assert by_id["module:b.py"]["rename_history"] == [
        {"old_path": "old_b.py", "new_path": "b.py", "ts": 12.5}
    ]
