"""Module-level link graph from the extracted edge table.

The extractor emits ``file:<basename> -imports-> import:<module>`` edges
(reference tree_sitter_parser.py:510-524). For link-graph analytics we
resolve each imported module name to the module that defines it —
basename-without-extension equality, the same convention the reference's
corpus uses — producing a directed module→module edge table. Unresolved
imports (stdlib, third-party) are either dropped or kept as sink
vertices.

Spark shape: two narrow projections + one equi-join. The module-name
dimension (distinct modules) is small relative to the imports fact table
and is broadcast when it fits; otherwise AQE picks SMJ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def module_link_graph(
    edges: DataFrame,
    keep_external: bool = False,
    broadcast_modules: bool = True,
) -> DataFrame:
    """edges → (src, dst) module-name pairs, deduplicated.

    src/dst are module names (basename without extension).
    """
    imports = (
        edges.filter(F.col("edge_type") == "imports")
        .select(
            F.regexp_replace(
                F.substring_index(F.col("src"), ":", -1), r"\.[^.]+$", ""
            ).alias("src"),
            F.substring_index(F.col("dst"), ":", -1).alias("imported"),
        )
    )
    modules = (
        edges.select(
            F.regexp_replace(
                F.substring_index(F.col("path"), "/", -1), r"\.[^.]+$", ""
            ).alias("module_name")
        )
        .distinct()
    )
    if broadcast_modules:
        modules = F.broadcast(modules)
    if keep_external:
        resolved = imports.join(
            modules, imports.imported == modules.module_name, "left"
        ).select("src", F.col("imported").alias("dst"))
    else:
        resolved = imports.join(
            modules, imports.imported == modules.module_name, "leftsemi"
        ).select("src", F.col("imported").alias("dst"))
    return resolved.filter(F.col("src") != F.col("dst")).distinct()


def function_call_graph(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    keep_external: bool = False,
) -> DataFrame:
    """Function-level call graph: (src, dst) pairs from 'calls' edges.

    The extractor emits ``function:<caller> -calls-> function:<callee>``
    with the callee taken from source text (reference
    tree_sitter_parser.py:549-567) — callees may be undefined (stdlib,
    third-party, attribute chains). By default those are dropped by a
    semi-join against the defined function nodes, leaving the internal
    call graph the iterative algorithms run on; ``keep_external=True``
    keeps them as sink vertices.

    Spark shape: one filter + (optionally) one broadcastable semi-join —
    the defined-function dimension is small relative to the call fact
    table.
    """
    calls = (
        edges.filter(F.col("edge_type") == "calls")
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
    )
    if keep_external or nodes is None:
        return calls.distinct()
    defined = nodes.filter(F.col("type") == "function").select(
        F.col("id").alias("dst")
    )
    return calls.join(F.broadcast(defined), "dst", "leftsemi").distinct()
