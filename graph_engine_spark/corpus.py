"""Deterministic synthetic source-code corpus generator.

Produces the engine's input table ``corpus(repo, path, commit, lang,
content)`` (BASELINE.json input_hint) fully distributed: ``spark.range``
partitions the file-index space and a ``mapInPandas`` stage renders each
file's source text from the index alone — no driver-side data, no
external data, byte-identical across runs and parallelism levels.

Topology (designed so the extracted module link graph is non-trivial,
per FIXTURES.md §1):
  * ``n_components`` disjoint components (component of file i = i % c).
  * Within a component, a ring: file i imports the next file in its
    component — guarantees connectivity and diameter for CC tests.
  * ``hubs_per_component`` hub files per component; every file imports
    one hub chosen by a geometric (skewed) pick — hub_0 of each
    component receives ~half of all imports, producing the in-degree
    skew the north rule's salting requirement targets.
  * Every 10th file defines ``shared_helper`` — exercises the
    reference's non-file-qualified node-id collapse (same-named entities
    merge across files with set-merged ``files``; reference
    graph_core/storage/in_memory.py:66-74, data/graph_data.json).
  * ~1 in 6 files is JavaScript, ~1 in 11 TypeScript; the rest Python
    (reference supports .py/.js/.ts/.tsx —
    graph_core/analyzer/__init__.py:40-45).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from graph_engine_spark.schemas import CORPUS_SCHEMA

_MULT = 1103515245
_INC = 12345


def _det_rand(i: int, salt: int) -> int:
    """Deterministic pseudo-random int from (file index, salt) — LCG-style
    mix, no global RNG state so generation is order-independent."""
    x = (i * _MULT + salt * 2654435761 + _INC) & 0x7FFFFFFF
    x ^= x >> 13
    return x


def plan_file(
    i: int,
    n_files: int,
    n_components: int,
    hubs_per_component: int,
    imports_per_file: int = 3,
) -> dict:
    """Pure-python plan for file i: name, language, and import targets.

    Returns module indices (not names) so tests can reconstruct the
    expected link graph without parsing.
    """
    c = n_components
    comp = i % c
    is_hub = (i // c) < hubs_per_component
    # ring successor within the component
    succ = i + c
    if succ >= n_files:
        succ = comp
    # skewed hub pick: geometric over the component's hubs
    r = _det_rand(i, 1) % 100
    pick = 0
    threshold = 50
    while r >= threshold and pick < hubs_per_component - 1:
        r -= threshold
        threshold = max(1, threshold // 2)
        pick += 1
    hub = comp + c * pick
    # one extra long-range import inside the component for density
    extra = comp + c * (_det_rand(i, 2) % max(1, (n_files - comp + c - 1) // c))
    if extra >= n_files:
        extra = comp

    if is_hub:
        lang = "python"  # hubs stay python so inherits bases resolve
    else:
        m = _det_rand(i, 3) % 100
        lang = "python" if m < 70 else ("javascript" if m < 87 else "typescript")

    imports = []
    for t in (succ, hub, extra):
        if t != i and t not in imports:
            imports.append(t)
    # density knob beyond the base succ/hub/extra triple: extra
    # deterministic intra-component imports so benchmark graphs can be
    # made compute-bound (supersteps dominated by edge work, not task
    # scheduling) without changing the base topology tests rely on.
    comp_size = max(1, (n_files - comp + c - 1) // c)
    for j in range(3, imports_per_file):
        t = comp + c * (_det_rand(i, 100 + j) % comp_size)
        if t < n_files and t != i and t not in imports:
            imports.append(t)
    return {
        "index": i,
        "component": comp,
        "is_hub": is_hub,
        "lang": lang,
        "imports": imports,
        "hub": hub,
    }


def module_name(i: int) -> str:
    return f"mod_{i:06d}"


def file_path(i: int, lang: str) -> str:
    ext = {"python": "py", "javascript": "js", "typescript": "ts"}[lang]
    return f"src/pkg{i % 37:02d}/{module_name(i)}.{ext}"


def _render_python(plan: dict) -> str:
    i = plan["index"]
    lines = [f'"""Synthetic module {module_name(i)} (component {plan["component"]})."""']
    for t in plan["imports"]:
        lines.append(f"import {module_name(t)}")
    lines.append("from os import path")
    lines.append("")
    hub_mod = module_name(plan["hub"])
    if plan["is_hub"]:
        lines.append(f"class Base_{plan['component']}:")
        lines.append(f"    def hub_util_{i}(self):")
        lines.append("        return path.join('a', 'b')")
        lines.append("")
        lines.append(f"def hub_fn_{i}():")
        lines.append("    return 1")
    else:
        lines.append(f"class C_{i}(Base_{plan['component']}):")
        lines.append(f"    def method_{i}(self):")
        lines.append(f"        return fn_{i}_0()")
        lines.append("")
        lines.append(f"def fn_{i}_0():")
        lines.append(f"    return fn_{i}_1() + {hub_mod}.hub_fn_{plan['hub']}()")
        lines.append("")
        lines.append(f"def fn_{i}_1():")
        lines.append(f"    return len('{module_name(i)}')")
    if i % 10 == 0:
        lines.append("")
        lines.append("def shared_helper():")
        lines.append("    return 42")
    lines.append("")
    return "\n".join(lines)


def _render_js(plan: dict, ts: bool) -> str:
    i = plan["index"]
    lines = [f"// synthetic module {module_name(i)}"]
    for t in plan["imports"]:
        lines.append(f"import {{ x{t} }} from '{module_name(t)}';")
    lines.append("")
    lines.append(f"class C_{i} extends Base_{plan['component']} {{")
    lines.append(f"  method_{i}() {{ return fn_{i}_0(); }}")
    lines.append("}")
    lines.append("")
    anno = ": number" if ts else ""
    lines.append(f"function fn_{i}_0(){anno} {{")
    lines.append(f"  return fn_{i}_1();")
    lines.append("}")
    lines.append("")
    lines.append(f"const fn_{i}_1 = () => {i};")
    if i % 10 == 0:
        lines.append("function shared_helper() { return 42; }")
    lines.append("")
    return "\n".join(lines)


def render_file(
    i: int,
    n_files: int,
    n_components: int,
    hubs_per_component: int,
    imports_per_file: int = 3,
) -> dict:
    plan = plan_file(i, n_files, n_components, hubs_per_component, imports_per_file)
    lang = plan["lang"]
    if lang == "python":
        content = _render_python(plan)
    else:
        content = _render_js(plan, ts=(lang == "typescript"))
    repo = f"org/repo-{i % 13:03d}"
    path = file_path(i, lang)
    commit = hashlib.sha256(f"{repo}:{path}".encode()).hexdigest()[:40]
    return {"repo": repo, "path": path, "commit": commit, "lang": lang, "content": content}


def synthesize_corpus(
    spark: SparkSession,
    n_files: int,
    n_components: int = 5,
    hubs_per_component: int = 4,
    partitions: int | None = None,
    imports_per_file: int = 3,
) -> DataFrame:
    """Distributed deterministic corpus: same bytes at any parallelism."""
    if partitions is None:
        partitions = max(8, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                render_file(int(i), n_files, n_components, hubs_per_component, imports_per_file)
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])

    base = spark.range(0, n_files, numPartitions=partitions)
    return base.mapInPandas(gen, schema=CORPUS_SCHEMA)


def expected_module_edges(
    n_files: int,
    n_components: int = 5,
    hubs_per_component: int = 4,
    imports_per_file: int = 3,
):
    """Driver-side oracle for tests: the designed module-level link graph
    as (src_index, dst_index) pairs. Small-scale use only."""
    out = set()
    for i in range(n_files):
        plan = plan_file(i, n_files, n_components, hubs_per_component, imports_per_file)
        for t in plan["imports"]:
            out.add((i, t))
    return sorted(out)
