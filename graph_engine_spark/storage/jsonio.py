"""Reference-format JSON snapshot import/export.

The reference persists its whole graph as ONE JSON document
``{nodes, edges, file_nodes}`` (reference json_storage.py:173-232 save,
:47-107 load; shipped sample ``data/graph_data.json``). The engine's
durable state is versioned Parquet (Iceberg snapshots off-sandbox) —
the scale path — but this shim round-trips the reference's document so
its fixtures and snapshots load directly and our state can be handed
back to a reference deployment.

Field mapping (reference → engine):
  node:  filepath → path; id/type/name/start_line/end_line/files as-is;
         dynamic_call_count carried when present. rename_history is
         accepted in BOTH shapes — the reference's plain old_path
         strings (manager.py:501-503) and this engine's richer
         {old_path, new_path, ts} structs — and exported as strings by
         default for reference parity (rich_rename_history=True opts
         into the struct extension).
  edge:  source/target/type → src/dst/edge_type; file → path;
         dynamic, dynamic_call_count, first_call_time, last_call_time
         carried when present. The reference's per-edge uuid ``id``
         (``contains:<uuid4>``) is regenerated deterministically on
         export (sha-derived — the engine's documented deviation from
         uuid4, extractor/pyext.py).
  file_nodes: derived view {file → [node ids]} — recomputed from the
         node ``files`` arrays on export, not stored.

The document is driver-sized BY DESIGN (the reference loads it into one
Python process); import parallelizes immediately via createDataFrame,
and export collects — callers at corpus scale use the Parquet state and
never this format. Export is atomic tmp-write + os.replace, mirroring
json_storage.py:217-224.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import functions as F

from graph_engine_spark.schemas import EDGES_SCHEMA, NODES_SCHEMA


def import_reference_json(spark, json_path: str):
    """Load a reference ``{nodes, edges, file_nodes}`` document into a
    GraphState (nodes/edges typed to the engine schemas; file_hashes is
    empty — the reference document does not store per-file content
    hashes, so the first maintenance batch after an import re-hashes)."""
    from graph_engine_spark.streaming.maintenance import GraphState, empty_state

    with open(json_path, encoding="utf-8") as f:
        data = json.load(f)

    node_rows = []
    for n in data.get("nodes", []):
        node_rows.append(
            (
                n["id"],
                n.get("type", "unknown"),
                n.get("name", n["id"]),
                n.get("repo", ""),
                n.get("filepath", n.get("path", "")),
                n.get("start_line"),
                n.get("end_line"),
                list(n.get("files", []) or []) or None,
                n.get("content_hash"),
                list(n["parameters"]) if n.get("parameters") else None,
                n.get("dynamic_call_count"),
                # rename_history (manager.py:499-507): the reference
                # appends plain old_path STRINGS (manager.py:501-503);
                # our export can also emit the richer struct form —
                # accept both shapes here
                [
                    (h, None, None)
                    if isinstance(h, str)
                    else (h.get("old_path"), h.get("new_path"), h.get("ts"))
                    for h in n["rename_history"]
                ]
                if n.get("rename_history")
                else None,
            )
        )
    edge_rows = []
    for e in data.get("edges", []):
        edge_rows.append(
            (
                e["source"],
                e["target"],
                e.get("type", "unknown"),
                e.get("repo", ""),
                e.get("file", e.get("path")),
                e.get("dynamic"),
                e.get("dynamic_call_count"),
                e.get("first_call_time"),
                e.get("last_call_time"),
            )
        )
    base = empty_state(spark)
    nodes = (
        spark.createDataFrame(node_rows, NODES_SCHEMA)
        if node_rows
        else base.nodes
    )
    edges = (
        spark.createDataFrame(edge_rows, EDGES_SCHEMA)
        if edge_rows
        else base.edges
    )
    return GraphState(nodes=nodes, edges=edges, file_hashes=base.file_hashes)


def _clean(d: dict) -> dict:
    return {k: v for k, v in d.items() if v is not None}


def _edge_id(src: str, dst: str, edge_type: str) -> str:
    h = hashlib.sha256(f"{src}:{dst}:{edge_type}".encode()).hexdigest()[:16]
    return f"{edge_type}:{h}"


def node_row_to_doc(r, rich_rename_history: bool = False) -> dict:
    """Engine node Row → reference node dict (field mapping in the
    module docstring). Shared by the JSON snapshot export and the REST
    serving layer (api.py:38-47 returns exactly these dicts).

    rename_history parity: the reference stores a list of plain
    old_path STRINGS (manager.py:501-503), so that is the default
    emitted shape. ``rich_rename_history=True`` opts into this engine's
    extension — ``[{old_path, new_path, ts}]`` structs — which
    ``import_reference_json`` also accepts."""
    if "rename_history" in r.__fields__ and r["rename_history"]:
        hist = (
            [
                {"old_path": h["old_path"], "new_path": h["new_path"], "ts": h["ts"]}
                for h in r["rename_history"]
            ]
            if rich_rename_history
            else [h["old_path"] for h in r["rename_history"]]
        )
    else:
        hist = None
    return _clean(
        {
            "id": r["id"],
            "type": r["type"],
            "name": r["name"],
            "filepath": r["path"],
            "start_line": r["start_line"],
            "end_line": r["end_line"],
            "files": list(r["files"]) if r["files"] else None,
            "parameters": list(r["params"]) if r["params"] else None,
            "dynamic_call_count": r["dynamic_call_count"],
            "rename_history": hist,
        }
    )


def edge_row_to_doc(r) -> dict:
    """Engine edge Row → reference edge dict (source/target/type plus
    dynamic annotations; deterministic sha-derived id)."""
    return _clean(
        {
            "source": r["src"],
            "target": r["dst"],
            "type": r["edge_type"],
            "id": _edge_id(r["src"], r["dst"], r["edge_type"]),
            "file": r["path"],
            "dynamic": r["dynamic"],
            "dynamic_call_count": r["dynamic_call_count"],
            "first_call_time": r["first_call_time"],
            "last_call_time": r["last_call_time"],
        }
    )


def export_reference_json(
    state, json_path: str, rich_rename_history: bool = False
) -> None:
    """Write GraphState as a reference-compatible
    ``{nodes, edges, file_nodes}`` document (atomic tmp + replace).
    ``rename_history`` is emitted as the reference's list of old_path
    strings unless ``rich_rename_history=True`` (see node_row_to_doc)."""
    nodes = state.nodes.collect()
    edges = state.edges.collect()
    data = {"nodes": [], "edges": [], "file_nodes": {}}
    for r in nodes:
        data["nodes"].append(node_row_to_doc(r, rich_rename_history))
        for fpath in r["files"] or []:
            data["file_nodes"].setdefault(fpath, []).append(r["id"])
    for r in edges:
        data["edges"].append(edge_row_to_doc(r))
    for fpath in data["file_nodes"]:
        data["file_nodes"][fpath] = sorted(data["file_nodes"][fpath])

    tmp = f"{json_path}.tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(data, f, indent=2)
    os.replace(tmp, json_path)
