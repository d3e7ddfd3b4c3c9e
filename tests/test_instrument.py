"""Import-hook call instrumentation (reference
graph_core/dynamic/import_hook.py + manager.py:426-469 consumer
mapping). Mostly Spark-free: the producer runs in the monitored app's
interpreter; one test closes the loop into the engine's batch merge."""

import importlib
import sys
import textwrap

import pytest

from graph_engine_spark.dynamic import (
    clear_events,
    drain_events,
    events_to_call_totals,
    events_to_edge_rows,
    install_import_hook,
    monitored_files,
    uninstall_import_hook,
    write_events_ndjson,
)
from graph_engine_spark.dynamic.instrument import FunctionCallEvent

APP = """
def outer():
    def inner():
        return 1
    return inner() + helper()

def helper():
    return 2

class Svc:
    def handle(self):
        return helper()

async def aio():
    return 3
"""


@pytest.fixture
def app_module(tmp_path):
    pkgdir = tmp_path / "monitored_app"
    pkgdir.mkdir()
    (pkgdir / "__init__.py").write_text("")
    (pkgdir / "app.py").write_text(textwrap.dedent(APP))
    hook = install_import_hook(str(tmp_path))
    sys.path.insert(0, str(tmp_path))
    clear_events()
    try:
        mod = importlib.import_module("monitored_app.app")
        yield mod, pkgdir
    finally:
        uninstall_import_hook(hook)
        sys.path.remove(str(tmp_path))
        for name in [m for m in sys.modules if m.startswith("monitored_app")]:
            del sys.modules[name]
        clear_events()


def test_emits_reference_qualified_names(app_module):
    mod, pkgdir = app_module
    clear_events()
    assert mod.outer() == 3
    names = [e.function_name for e in drain_events()]
    # reference format: the nesting stack includes the function's own
    # name at emit time (import_hook.py:83-87,141), so outer reports
    # outer.outer and the nested inner reports outer.inner.inner
    assert names == ["outer.outer", "outer.inner.inner", "helper.helper"]
    assert str(pkgdir / "app.py") in monitored_files()


def test_methods_and_async_instrumented(app_module):
    mod, _ = app_module
    clear_events()
    assert mod.Svc().handle() == 2
    import asyncio

    assert asyncio.run(mod.aio()) == 3
    events = drain_events()
    assert [e.function_name for e in events] == [
        "handle.handle",
        "helper.helper",
        "aio.aio",
    ]
    assert {e.module_name for e in events} == {"monitored_app.app"}
    assert all(e.timestamp > 0 for e in events)


def test_include_exclude_patterns(tmp_path):
    for name, body in [("keep", "def f():\n    return 1\n"), ("skip", "def g():\n    return 2\n")]:
        d = tmp_path / name
        d.mkdir()
        (d / "__init__.py").write_text("")
        (d / "m.py").write_text(body)
    hook = install_import_hook(str(tmp_path), exclude=[r"^skip\."])
    sys.path.insert(0, str(tmp_path))
    clear_events()
    try:
        keep = importlib.import_module("keep.m")
        skip = importlib.import_module("skip.m")
        assert keep.f() == 1 and skip.g() == 2
        names = [e.function_name for e in drain_events()]
        assert names == ["f.f"]  # skip.m imported uninstrumented
    finally:
        uninstall_import_hook(hook)
        sys.path.remove(str(tmp_path))
        for name in [m for m in sys.modules if m.startswith(("keep", "skip"))]:
            del sys.modules[name]
        clear_events()


def test_edge_rows_parent_recovery():
    # manager.py:434-469 cases, driven by the repeated-name format
    evs = [
        FunctionCallEvent("outer.inner.inner", "pkg.app", "/a/app.py", 10.0),
        FunctionCallEvent("helper.helper", "pkg.app", "/a/app.py", 11.0),  # top-level: no edge
        FunctionCallEvent("outer.outer.inner.inner", "app2", "/a/app2.py", 12.0),
    ]
    rows = events_to_edge_rows(evs)
    assert rows == [
        {"src": "function:app.outer", "dst": "function:app.inner", "ts": 10.0},
        {"src": "function:app2.outer", "dst": "function:app2.inner", "ts": 12.0},
    ]
    totals = events_to_call_totals(evs)
    assert {t["id"]: t["calls"] for t in totals} == {
        "function:app.inner": 1,
        "function:app.helper": 1,
        "function:app2.inner": 1,
    }


def test_uninstrumented_import_untouched(tmp_path):
    d = tmp_path / "plain"
    d.mkdir()
    (d / "__init__.py").write_text("")
    (d / "m.py").write_text("def f():\n    return 41\n")
    sys.path.insert(0, str(tmp_path))
    clear_events()
    try:  # no hook installed at all
        mod = importlib.import_module("plain.m")
        assert mod.f() == 41
        assert drain_events() == []
    finally:
        sys.path.remove(str(tmp_path))
        for name in [m for m in sys.modules if m.startswith("plain")]:
            del sys.modules[name]


def test_ndjson_bridge_to_engine_merge(spark, tmp_path, app_module):
    """Close the loop: instrumented app → drained events → NDJSON →
    Spark batch agg → merge_dynamic_calls into graph state — the full
    reference pipeline (import hook → queue poll → graph update,
    manager.py:374-469) with the engine's distributed consumers on the
    right-hand side."""
    import pyspark.sql.functions as F

    from graph_engine_spark.schemas import NODES_SCHEMA
    from graph_engine_spark.streaming.maintenance import GraphState, empty_state, merge_dynamic_calls

    mod, _ = app_module
    clear_events()
    mod.outer()
    mod.outer()
    events = drain_events()
    path = write_events_ndjson(events, str(tmp_path / "calls"))
    assert path is not None

    totals = (
        spark.createDataFrame(events_to_edge_rows(events))
        .groupBy("src", "dst")
        .agg(
            F.count("*").alias("dynamic_call_count"),
            F.min("ts").alias("first_call_time"),
            F.max("ts").alias("last_call_time"),
        )
    )
    # In the real pipeline static extraction runs FIRST, so the nodes the
    # dynamic events touch already exist (the reference likewise only
    # updates existing nodes — manager.py:161-165 drops events whose
    # endpoints are unknown, and update_function_call_count:257-258 is a
    # no-op for missing nodes). Seed the minimal statically-known nodes.
    base = empty_state(spark)
    static_nodes = spark.createDataFrame(
        [
            (f"function:app.{n}", "function", n, "r", "monitored_app/app.py",
             None, None, None, None, None, None, None)
            for n in ("outer", "inner", "helper")
        ],
        NODES_SCHEMA,
    )
    merged = merge_dynamic_calls(
        GraphState(static_nodes, base.edges, base.file_hashes), totals
    )
    edge = merged.edges.filter(F.col("dst") == "function:app.inner").collect()
    assert len(edge) == 1
    assert edge[0]["dynamic"] is True and edge[0]["dynamic_call_count"] == 2
    assert edge[0]["src"] == "function:app.outer"
    callee = merged.nodes.filter(F.col("id") == "function:app.inner").collect()
    assert callee[0]["dynamic_call_count"] == 2

    # the NDJSON file round-trips through Spark's json reader with the
    # exact schema the streaming source declares
    back = spark.read.schema(
        "function_name string, module_name string, filename string, ts double"
    ).json(str(tmp_path / "calls"))
    assert back.count() == len(events)
