"""Canonical engine schemas (SURVEY.md §1.4, FIXTURES.md §1-2).

The reference is schemaless dicts with a fixed de-facto shape
(reference graph_core/analyzer/treesitter_parser/tree_sitter_parser.py:884-920,
graph_core/storage/in_memory.py:57-105). We declare the closed schema up
front: dynamic attribute addition in the reference becomes nullable
columns here (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Engine input — authoritative shape from BASELINE.json input_hint.
CORPUS_SCHEMA = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("content", StringType(), False),
    ]
)

# Single-pass extraction IR: one mapInPandas emits node rows and edge
# rows in a union schema (kind discriminates); nodes/edges tables are
# column-pruned selects over it. One extraction pass, not two.
IR_SCHEMA = StructType(
    [
        StructField("kind", StringType(), False),  # 'node' | 'edge'
        StructField("id", StringType(), True),  # node id
        StructField("type", StringType(), True),  # node type
        StructField("name", StringType(), True),
        StructField("src", StringType(), True),  # edge fields
        StructField("dst", StringType(), True),
        StructField("edge_type", StringType(), True),
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("start_line", IntegerType(), True),  # 1-based
        StructField("end_line", IntegerType(), True),
        StructField("content_hash", StringType(), True),  # module nodes only
        StructField("params", ArrayType(StringType()), True),  # function nodes
    ]
)

# File-watch event stream (reference watchers emit
# (event_type, filepath) tuples, manager.py:604-774; content travels
# with the event here because a distributed consumer can't re-read the
# watcher host's filesystem). ts = event time for the 2 s rename window.
FILE_EVENTS_SCHEMA = StructType(
    [
        StructField("event_type", StringType(), False),  # created|modified|deleted
        StructField("ts", TimestampType(), False),
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("content", StringType(), True),  # null on deletes of unknown content
    ]
)

NODES_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("type", StringType(), False),
        StructField("name", StringType(), False),
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("start_line", IntegerType(), True),
        StructField("end_line", IntegerType(), True),
        StructField("files", ArrayType(StringType()), True),
        StructField("content_hash", StringType(), True),
        StructField("params", ArrayType(StringType()), True),
        # dynamic instrumentation totals (reference manager.py:249-272
        # update_function_call_count) — merged from the stateful call
        # stream, null on purely static nodes
        StructField("dynamic_call_count", LongType(), True),
        # rename audit trail on the node itself (reference
        # manager.py:499-507 rename_history[]); the streaming sink keeps
        # the durable cross-restart log, this column carries the
        # in-state view appended by apply_renames
        StructField(
            "rename_history",
            ArrayType(
                StructType(
                    [
                        StructField("old_path", StringType(), True),
                        StructField("new_path", StringType(), True),
                        StructField("ts", DoubleType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

EDGES_SCHEMA = StructType(
    [
        StructField("src", StringType(), False),
        StructField("dst", StringType(), False),
        StructField("edge_type", StringType(), False),
        # dynamic call edges carry no file provenance (reference
        # edge_data has no filepath, manager.py:196-204) — nullable
        StructField("repo", StringType(), True),
        StructField("path", StringType(), True),
        # dynamic-call annotations (reference manager.py:180-215):
        # dynamic=true marks edges observed at runtime (statically
        # extracted edges keep null), counters are running totals
        StructField("dynamic", BooleanType(), True),
        StructField("dynamic_call_count", LongType(), True),
        StructField("first_call_time", DoubleType(), True),
        StructField("last_call_time", DoubleType(), True),
    ]
)

EDGE_TYPES = ("contains", "member_of", "inherits", "imports", "calls")
NODE_TYPES = ("module", "file", "function", "class", "import", "call")

RANKS_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("rank", LongType(), False),
    ]
)
