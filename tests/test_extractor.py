"""Extractor unit + integration tests.

Mirrors the reference's parser/storage test strategy (SURVEY.md §5):
golden node/edge sets over known sources, non-file-qualified id
collapse, (src,dst,edge_type) dedup, and the BASELINE.json per-row
invariant: sha2(content,256) == hashlib.sha256(content).hexdigest().
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from graph_engine_spark.corpus import synthesize_corpus, expected_module_edges
from graph_engine_spark.extractor import extract_graph
from graph_engine_spark.extractor.pyext import extract_python, extract_js
from graph_engine_spark.graph.linkgraph import module_link_graph

PY_SAMPLE = '''"""Sample."""
import os.path
from collections import OrderedDict

class BaseClass:
    pass

class Person(BaseClass):
    def __init__(self, name):
        self.name = name

    def greet(self):
        return format_name(self.name)

def format_name(n):
    return n.strip().title()

async def fetch():
    return format_name("x")
'''

JS_SAMPLE = """// sample
import { thing } from 'other_module';
const helper = require('helper_lib');

class Animal extends Base {
  speak() { return describe(this.kind); }
}

function makeAnimal(kind) {
  return new Animal(kind);
}

function describe(k) {
  return formatKind(k);
}

const arrowFn = (x) => formatKind(x + 1);

const formatKind = (k) => String(k).trim();

makeAnimal('cat');
"""


def test_python_extraction_golden():
    nodes, edges = extract_python("src/sample.py", PY_SAMPLE)
    ids = {n[0] for n in nodes}
    assert "module:sample.py" in ids
    assert "file:sample.py" in ids
    assert {"class:BaseClass", "class:Person"} <= ids
    assert {"function:__init__", "function:greet", "function:format_name",
            "function:fetch"} <= ids
    assert {"import:os.path", "import:collections"} <= ids
    eset = set(edges)
    assert ("file:sample.py", "import:os.path", "imports") in eset
    assert ("file:sample.py", "import:collections", "imports") in eset
    assert ("class:Person", "class:BaseClass", "inherits") in eset
    assert ("function:greet", "class:Person", "member_of") in eset
    assert ("function:greet", "function:format_name", "calls") in eset
    # method calls carry the dotted callee text (reference behavior)
    assert ("function:format_name", "function:n.strip().title", "calls") not in eset
    assert ("module:sample.py", "class:Person", "contains") in eset
    assert ("module:sample.py", "function:format_name", "contains") in eset
    # methods are not module-contained (nested under class)
    assert ("module:sample.py", "function:greet", "contains") not in eset


def test_python_syntax_error_degrades_to_module_only():
    nodes, edges = extract_python("bad.py", "def broken(:\n")
    assert [n[0] for n in nodes] == ["module:bad.py"]
    assert edges == []


def test_js_extraction_golden():
    nodes, edges = extract_js("src/sample.js", JS_SAMPLE)
    ids = {n[0] for n in nodes}
    assert {"module:sample.js", "class:Animal", "function:makeAnimal",
            "function:arrowFn", "import:other_module", "import:helper_lib"} <= ids
    eset = set(edges)
    assert ("class:Animal", "class:Base", "inherits") in eset
    assert ("file:sample.js", "import:other_module", "imports") in eset
    assert ("file:sample.js", "import:helper_lib", "imports") in eset
    assert ("module:sample.js", "function:makeAnimal", "contains") in eset
    # call edges (reference tree_sitter_parser.py:549-567): declared
    # functions, arrows, and shorthand methods all get caller scopes
    assert ("function:describe", "function:formatKind", "calls") in eset
    assert ("function:arrowFn", "function:formatKind", "calls") in eset
    assert ("function:speak", "function:describe", "calls") in eset
    # `new Animal(kind)` is a new_expression, not a call
    assert ("function:makeAnimal", "function:Animal", "calls") not in eset
    # module-level `makeAnimal('cat')` has no enclosing function scope
    assert not any(d == "function:makeAnimal" and t == "calls" for _, d, t in eset)
    # dotted built-in callee inside an arrow body carries raw text
    assert ("function:formatKind", "function:String", "calls") in eset
    # shorthand method registered as a function node with params
    ids2 = {n[0]: n for n in nodes}
    assert ids2["function:speak"][1] == "function"
    assert ids2["function:describe"][5] == ["k"]


def test_mixed_language_call_graph(spark):
    """A mixed py+js corpus yields call-graph edges from BOTH languages
    (round-2 gap: JS callers were silently absent)."""
    from graph_engine_spark.graph.linkgraph import function_call_graph

    py = "def py_callee():\n    return 1\n\ndef py_caller():\n    return py_callee()\n"
    js = (
        "function jsCallee() { return 1; }\n"
        "function jsCaller() { return jsCallee(); }\n"
    )
    corpus = spark.createDataFrame(
        [
            ("r", "a.py", "c1", "python", py),
            ("r", "b.js", "c1", "javascript", js),
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    nodes, edges = extract_graph(corpus)
    g = function_call_graph(edges, nodes)
    got = {(r["src"], r["dst"]) for r in g.collect()}
    assert ("function:py_caller", "function:py_callee") in got
    assert ("function:jsCaller", "function:jsCallee") in got


@pytest.fixture(scope="module")
def small_graph(spark):
    corpus = synthesize_corpus(spark, n_files=120, n_components=4, hubs_per_component=3)
    nodes, edges = extract_graph(corpus)
    return corpus, nodes.persist(), edges.persist()


def test_sha256_invariant(spark, small_graph):
    """BASELINE.json per-row invariant: JVM sha2 == hashlib.sha256."""
    corpus, nodes, edges = small_graph
    rows = (
        corpus.limit(20)
        .select("content", F.sha2(F.col("content").cast("binary"), 256).alias("h"))
        .collect()
    )
    assert rows
    for r in rows:
        assert r["h"] == hashlib.sha256(r["content"].encode()).hexdigest()
    # and the module nodes carry exactly that hash
    joined = (
        nodes.filter(F.col("type") == "module")
        .join(corpus.select("path", "content"), "path")
        .select("content_hash", "content")
        .limit(20)
        .collect()
    )
    for r in joined:
        assert r["content_hash"] == hashlib.sha256(r["content"].encode()).hexdigest()


def test_edge_dedup_uniqueness(small_graph):
    _, _, edges = small_graph
    total = edges.count()
    distinct = edges.select("src", "dst", "edge_type").distinct().count()
    assert total == distinct > 0


def test_shared_name_collapse(small_graph):
    """Non-file-qualified ids: shared_helper defined in many files is ONE
    node with set-merged files (reference in_memory.py:66-74)."""
    _, nodes, _ = small_graph
    rows = nodes.filter(F.col("id") == "function:shared_helper").collect()
    assert len(rows) == 1
    assert len(rows[0]["files"]) > 1


def test_module_link_graph_matches_designed_topology(spark, small_graph):
    _, _, edges = small_graph
    got = {
        (r["src"], r["dst"])
        for r in module_link_graph(edges).collect()
    }
    expected = {
        (f"mod_{a:06d}", f"mod_{b:06d}")
        for a, b in expected_module_edges(120, 4, 3)
    }
    assert got == expected


def test_corpus_deterministic_across_parallelism(spark):
    a = synthesize_corpus(spark, 50, partitions=2).orderBy("path").collect()
    b = synthesize_corpus(spark, 50, partitions=16).orderBy("path").collect()
    assert a == b


def test_function_parameters_extracted():
    """Function nodes carry parameter names (reference
    mcp_integration.py:279-284 scans node['parameters'])."""
    nodes, _ = extract_python("src/sample.py", PY_SAMPLE)
    by_id = {n[0]: n for n in nodes}
    assert by_id["function:__init__"][5] == ["self", "name"]
    assert by_id["function:format_name"][5] == ["n"]
    assert by_id["class:Person"][5] is None
    jn, _ = extract_js("src/sample.js", JS_SAMPLE)
    jby = {n[0]: n for n in jn}
    assert jby["function:makeAnimal"][5] == ["kind"]
    assert jby["function:arrowFn"][5] == ["x"]


def test_function_call_graph(spark, small_graph):
    from graph_engine_spark.graph.linkgraph import function_call_graph

    corpus, nodes, edges = small_graph
    g = function_call_graph(edges, nodes)
    got = {(r["src"], r["dst"]) for r in g.collect()}
    # non-hub python files define fn_i_0 -> fn_i_1 chains and
    # method_i -> fn_i_0 calls (corpus.py _render_python)
    assert any(
        s.startswith("function:fn_") and d.startswith("function:fn_") for s, d in got
    )
    assert any(s.startswith("function:method_") for s, d in got)
    # every dst resolves to a defined function node
    defined = {
        r["id"] for r in nodes.filter(F.col("type") == "function").collect()
    }
    assert all(d in defined for _, d in got)
    # external callees (dotted module attributes) kept only on request
    ext = function_call_graph(edges, nodes, keep_external=True)
    assert ext.count() >= g.count()


def test_treesitter_request_degrades_to_fallback_without_grammars():
    """parser='treesitter' in an environment with no grammars (this
    sandbox) must produce EXACTLY the fallback extraction — the
    reference's MinimalParser degradation, silently and per-file."""
    from graph_engine_spark.extractor.pyext import extract_file

    for path, lang, src in (
        ("src/sample.py", "python", PY_SAMPLE),
        ("src/sample.js", "javascript", JS_SAMPLE),
    ):
        assert extract_file(path, lang, src, parser="treesitter") == extract_file(
            path, lang, src
        )


def test_treesitter_path_matches_fallback_golden():
    """Where real grammars exist, the tree-sitter walk must produce the
    same golden node-id/edge sets as the ast path (IR-shape parity);
    skipped in grammarless environments."""
    import pytest as _pytest

    _pytest.importorskip("tree_sitter")
    from graph_engine_spark.extractor.tsext import extract_treesitter, ts_available

    if not ts_available("python"):
        _pytest.skip("tree_sitter importable but no python grammar wheel")
    ts_out = extract_treesitter("src/sample.py", "python", PY_SAMPLE)
    assert ts_out is not None
    ts_nodes, ts_edges = ts_out
    ast_nodes, ast_edges = extract_python("src/sample.py", PY_SAMPLE)
    assert {(n[0], n[1]) for n in ts_nodes} == {(n[0], n[1]) for n in ast_nodes}
    assert set(ts_edges) == set(ast_edges)


def test_js_params_destructuring_and_defaults():
    """Destructured / nested-default JS params never yield garbage
    tokens like '{a' — only identifier-shaped names survive."""
    from graph_engine_spark.extractor.pyext import _js_params

    assert _js_params("a, b") == ["a", "b"]
    assert _js_params("a, b = 5") == ["a", "b"]
    assert _js_params("{a, b}, c") == ["c"]
    assert _js_params("[x, y], z = 3") == ["z"]
    assert _js_params("a, ...rest") == ["a", "...rest"]
    # nested default call truncated by the function regex at the inner
    # ')' — the param name still recovers cleanly, the destructured
    # group and the mangled default contribute nothing
    assert _js_params("{a, b}, c = g(1") == ["c"]
    assert _js_params("") == []


def test_extract_graph_caches_deduped_edges_not_nodes(spark):
    """Round-6: the deduped edge table is persisted alongside the IR —
    its dropDuplicates groups on every column, so each downstream
    consumer (link-graph builds, traversals) would otherwise replay the
    full-width dedup shuffle. nodes stays UNcached: its consumers prune
    the merge aggregation to the columns they touch, which is cheaper
    than materializing the full files/history merge."""
    corpus = synthesize_corpus(spark, 30)
    nodes, edges = extract_graph(corpus)
    assert edges.storageLevel.useMemory
    assert not nodes.storageLevel.useMemory
    edges.unpersist()

    nodes2, edges2 = extract_graph(corpus, persist_ir=False)
    assert not edges2.storageLevel.useMemory
    assert not nodes2.storageLevel.useMemory
