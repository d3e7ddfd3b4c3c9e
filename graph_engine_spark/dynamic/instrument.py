"""Runtime call-event producer — the reference's import-hook AST
instrumentation (graph_core/dynamic/import_hook.py) re-expressed as the
application-side head of this engine's call-event stream.

Role in the Spark architecture: instrumentation runs in the MONITORED
application's interpreter, never on executors. Its only job is to turn
"function f was called" into event rows that the engine's distributed
consumers already handle — ``streaming.callcounts.stateful_call_counts``
(unbounded, applyInPandasWithState) and
``streaming.maintenance.merge_dynamic_calls`` (batch totals into graph
state). The bridge is ``write_events_ndjson``: newline-delimited JSON
files that Structured Streaming's file source tails (SURVEY.md §2.1
"runtime call-event source"). Everything here is stdlib-only.

Reference parity (import_hook.py cited per part):

* ``FunctionCallEvent(function_name, module_name, filename)`` with a
  wall-clock ``timestamp`` (:37-55).
* An ``importlib.abc.MetaPathFinder``/``Loader`` pair that intercepts
  imports under a watch directory and rewrites each module's AST so
  every ``def``/``async def`` body begins with an event-emit call
  (:58-194, :451-607). Include/exclude regexes gate which modules are
  instrumented (:348-386).
* Qualified-name format, bug-for-bug: the reference pushes the
  function's own name on the nesting stack BEFORE building its emit
  call, so a top-level ``outer`` reports ``outer.outer`` and a nested
  ``inner`` reports ``outer.inner.inner`` (:83-87 with the push at
  :141). Its consumer (manager.py:426-469) relies on exactly this
  repetition to recover the parent, so the producer must reproduce it.
* ``events_to_edge_rows`` / ``events_to_call_totals`` are the
  consumer-side mapping (manager.py:434-469): node id
  ``function:{module_last}.{func_last}``, a parent→child call edge for
  nested calls (stepping past the repeated name), self-references
  dropped.

Deliberate deviations (documented, not accidental):

* The transformed AST is compiled directly (``compile(tree, ...)``)
  instead of the reference's unparse → pickle-cache → recompile cycle
  (:196-314, :433-438). A single AST pass is cheaper than the cache's
  own pickle round-trip, so the disk cache buys nothing here; content
  addressing is kept only as an in-memory guard against double
  transformation of an unchanged file.
* Events carry ``ts`` (float epoch seconds) end-to-end because the
  engine's counters maintain first/last call times distributively
  (callcounts.py OUTPUT_SCHEMA); the reference stamps the same
  ``time.time()`` on the event (:51) but re-reads the clock in its
  single-threaded consumer.
"""

from __future__ import annotations

import ast
import hashlib
import importlib.abc
import importlib.machinery
import importlib.util
import json
import os
import re
import sys
import threading
import time
from dataclasses import dataclass, field

# The emit hook is looked up through this module at call time, so
# instrumented modules need only one injected import (of this module),
# mirroring the reference's single queue import (:417-421).
_events: list = []
_monitored: set = set()
_lock = threading.Lock()


@dataclass
class FunctionCallEvent:
    """One observed call (import_hook.py:37-55). ``function_name`` is
    the reference's repeated-qualified format (see module docstring)."""

    function_name: str
    module_name: str
    filename: str
    timestamp: float = field(default_factory=time.time)


def _emit(function_name: str, module_name: str, filename: str) -> None:
    """Target of the injected instrumentation call."""
    with _lock:
        _events.append(FunctionCallEvent(function_name, module_name, filename))


def drain_events() -> list:
    """Remove and return all queued events (import_hook.py:643-660)."""
    with _lock:
        out, _events[:] = list(_events), []
    return out


def clear_events() -> None:
    with _lock:
        _events.clear()


def monitored_files() -> set:
    """Files whose modules were actually instrumented (:663-670)."""
    with _lock:
        return set(_monitored)


class _CallInstrumenter(ast.NodeTransformer):
    """Prepend an emit call to every function body.

    Matches the reference transformer's observable output exactly
    (import_hook.py:58-194): the nesting stack includes the function's
    own name when its emit call is built, producing the repeated
    ``outer.inner.inner`` qualified names its consumer expects; lambdas
    are traversed but not instrumented (no statement body, :180-193).
    """

    def __init__(self, module_name: str, filename: str):
        self.module_name = module_name
        self.filename = filename
        self.stack: list[str] = []
        self.count = 0

    def _instrument(self, node):
        self.stack.append(node.name)
        self.generic_visit(node)  # nested defs first, with this frame on the stack
        qualified = ".".join([*self.stack, node.name])
        emit = ast.Expr(
            ast.Call(
                func=ast.Attribute(
                    value=ast.Name(id="__graph_engine_instrument__", ctx=ast.Load()),
                    attr="_emit",
                    ctx=ast.Load(),
                ),
                args=[
                    ast.Constant(qualified),
                    ast.Constant(self.module_name),
                    ast.Constant(self.filename),
                ],
                keywords=[],
            )
        )
        node.body.insert(0, emit)
        self.count += 1
        self.stack.pop()
        return node

    visit_FunctionDef = _instrument
    visit_AsyncFunctionDef = _instrument


def _transform(source: str, module_name: str, filename: str):
    """AST-rewrite ``source``; returns a code object, or None when the
    module defines no functions or does not parse (a syntax error is
    the monitored app's problem, not the tracer's — reference
    :443-445 likewise falls back to the original source)."""
    try:
        tree = ast.parse(source)
    except SyntaxError:
        return None
    xf = _CallInstrumenter(module_name, filename)
    tree = xf.visit(tree)
    if not xf.count:
        return None
    ast.fix_missing_locations(tree)
    code = compile(tree, filename, "exec")
    return code


class _Loader(importlib.abc.Loader):
    def __init__(self, inner, fullname: str, filename: str, hook):
        self._inner = inner
        self._fullname = fullname
        self._filename = filename
        self._hook = hook

    def create_module(self, spec):
        if hasattr(self._inner, "create_module"):
            return self._inner.create_module(spec)
        return None

    def exec_module(self, module) -> None:
        source = None
        if hasattr(self._inner, "get_source"):
            source = self._inner.get_source(self._fullname)
        code = (
            _transform(source, self._fullname, self._filename)
            if source is not None
            else None
        )
        if code is None:
            self._inner.exec_module(module)
            return
        with _lock:
            _monitored.add(self._filename)
        # one injected binding gives the instrumented code its emit hook
        module.__dict__["__graph_engine_instrument__"] = sys.modules[__name__]
        exec(code, module.__dict__)


class ImportHook(importlib.abc.MetaPathFinder):
    """Meta-path finder gating instrumentation to ``watch_dir`` with
    optional include/exclude regexes over the dotted module path or the
    absolute file path (import_hook.py:348-386, :451-534)."""

    def __init__(self, watch_dir: str, include=None, exclude=None):
        self.watch_dir = os.path.abspath(watch_dir)
        self.include = [re.compile(p) for p in (include or [])]
        self.exclude = [re.compile(p) for p in (exclude or [])]
        self._in_find: set = set()
        self._seen_hashes: set = set()  # in-memory double-transform guard

    def _wants(self, origin: str) -> bool:
        if not origin.endswith(".py"):
            return False
        path = os.path.abspath(origin)
        if not path.startswith(self.watch_dir + os.sep):
            return False
        dotted = os.path.relpath(path, self.watch_dir)[:-3].replace(os.sep, ".")
        if any(p.search(dotted) or p.search(path) for p in self.exclude):
            return False
        if self.include:
            return any(p.search(dotted) or p.search(path) for p in self.include)
        return True

    def find_spec(self, fullname, path=None, target=None):
        if fullname in self._in_find:
            return None  # delegating below re-enters the meta path
        self._in_find.add(fullname)
        try:
            spec = None
            for finder in sys.meta_path:
                if finder is self:
                    continue
                try:
                    spec = finder.find_spec(fullname, path, target)
                except Exception:
                    spec = None
                if spec is not None:
                    break
            if spec is None or spec.origin is None or not self._wants(spec.origin):
                return spec
            spec.loader = _Loader(spec.loader, fullname, spec.origin, self)
            return spec
        finally:
            self._in_find.discard(fullname)


def install_import_hook(watch_dir: str, include=None, exclude=None) -> ImportHook:
    """Install and return the hook (import_hook.py:610-640). Modules
    imported afterwards from under ``watch_dir`` emit call events."""
    hook = ImportHook(watch_dir, include=include, exclude=exclude)
    sys.meta_path.insert(0, hook)
    return hook


def uninstall_import_hook(hook: ImportHook) -> None:
    try:
        sys.meta_path.remove(hook)
    except ValueError:
        pass


# --- consumer-side mapping (manager.py:426-469) ----------------------


def _function_id(module_name: str, func_name: str) -> str:
    return f"function:{module_name.split('.')[-1]}.{func_name}"


def _parent_name(parts: list[str]) -> str | None:
    """Recover the caller from the repeated-qualified name: for
    ``['outer', 'inner', 'inner']`` the parent is ``outer``; a repeated
    parent name steps back once more (manager.py:450-463)."""
    if len(parts) < 2:
        return None
    idx = -2
    if parts[idx] == parts[-1] and len(parts) > 2:
        idx -= 1
    return parts[idx]


def events_to_edge_rows(events) -> list[dict]:
    """Call events → ``(src, dst, ts)`` dicts, the input schema of
    ``stateful_call_counts`` and the batch ``call_count_agg`` plan.
    Only nested calls yield an edge (the reference adds a call edge
    only when a parent frame exists, manager.py:450-469); top-level
    calls still count via ``events_to_call_totals``."""
    rows = []
    for ev in events:
        parts = ev.function_name.split(".")
        parent = _parent_name(parts)
        if parent is None:
            continue
        src = _function_id(ev.module_name, parent)
        dst = _function_id(ev.module_name, parts[-1])
        if src == dst:  # self-reference guard (manager.py:465-466)
            continue
        rows.append({"src": src, "dst": dst, "ts": ev.timestamp})
    return rows


def events_to_call_totals(events) -> list[dict]:
    """Call events → per-function ``(id, calls)`` totals — the
    reference's ``update_function_call_count`` per event
    (manager.py:448-449), here pre-aggregated so the downstream merge
    (``merge_dynamic_calls``) receives one row per function."""
    totals: dict[str, int] = {}
    for ev in events:
        fid = _function_id(ev.module_name, ev.function_name.split(".")[-1])
        totals[fid] = totals.get(fid, 0) + 1
    return [{"id": k, "calls": v} for k, v in sorted(totals.items())]


def write_events_ndjson(events, out_dir: str) -> str | None:
    """Append a batch of events as one newline-delimited-JSON file in
    ``out_dir`` — the handoff to Structured Streaming's file source
    (``spark.readStream.schema(...).json(out_dir)``). One file per
    drain keeps the micro-batch boundary aligned with the drain poll,
    like the reference's 0.5 s queue poll (manager.py:399-421).
    Write-then-rename so the stream never reads a partial file."""
    if not events:
        return None
    os.makedirs(out_dir, exist_ok=True)
    payload = "".join(
        json.dumps(
            {
                "function_name": ev.function_name,
                "module_name": ev.module_name,
                "filename": ev.filename,
                "ts": ev.timestamp,
            }
        )
        + "\n"
        for ev in events
    )
    name = hashlib.sha256(payload.encode()).hexdigest()[:16]
    final = os.path.join(out_dir, f"calls-{name}.json")
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        f.write(payload)
    os.replace(tmp, final)
    return final
