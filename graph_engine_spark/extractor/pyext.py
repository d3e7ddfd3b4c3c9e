"""Per-file node/edge extraction — pure Python, executor-side.

Reproduces the reference extractor's semantics (capability parity, not a
code port). Node-ID scheme and edge types follow
reference graph_core/analyzer/treesitter_parser/tree_sitter_parser.py:
  * ids: ``module:<basename>``, ``function:<name>``, ``class:<name>``,
    ``import:<module>``, ``file:<basename>``, ``call:<id>``
    (tree_sitter_parser.py:247, 458, 481, 510, 524, 552) — deliberately
    NOT file-qualified: same-named entities collapse across files
    (reference data/graph_data.json, tests/test_in_memory_graph.py:125-157).
  * edge types: contains, member_of, inherits, imports, calls
    (tree_sitter_parser.py:286, 474, 503, 524, 567).

Since tree-sitter grammars are unavailable here (the reference itself
degrades to a regex "MinimalParser" in that case —
tree_sitter_parser.py:241-363, and its shipped artifact
data/graph_data.json was produced by that fallback: all 59 edges are
'contains'), the Python extractor uses the stdlib ``ast`` module (public
API, exact grammar) and the JS/TS extractor uses regex patterns
equivalent to the reference fallback, extended with the ES6-import /
extends / arrow-function handling of the tree-sitter path
(tree_sitter_parser.py:645-737).

Documented deviations (SURVEY.md §7.3):
  * ``call:`` node ids are content-derived hashes, not uuid4
    (tree_sitter_parser.py:814-816) — determinism is required for
    dedup/resume; no reference query inspects call ids.
  * 'calls'/'member_of' edges attach to the nearest *processed* ancestor
    scope. The reference's recursion drops ancestry at unhandled CST
    nodes (tree_sitter_parser.py:408-418 passes the current node's id,
    None for unhandled types), which would suppress these edges under a
    real grammar; we implement the evident intent (its unit tests and
    fixtures assume calls/member_of edges exist).
"""

from __future__ import annotations

import ast
import hashlib
import posixpath
import re


def _call_id(path: str, line: int, col: int, name: str) -> str:
    h = hashlib.sha256(f"{path}:{line}:{col}:{name}".encode()).hexdigest()[:16]
    return f"call:{h}"


def _node(nodes, node_id, ntype, name, start, end, params=None):
    # first-write-wins per file, mirroring reference _add_node dedup
    # (tree_sitter_parser.py:879-881)
    if node_id not in nodes:
        nodes[node_id] = (node_id, ntype, name, start, end, params)


def _py_params(fn) -> list:
    """Parameter names of a FunctionDef (reference nodes optionally carry
    a 'parameters' list scanned by find_functions_by_keyword,
    mcp_integration.py:279-284)."""
    a = fn.args
    out = [x.arg for x in (*a.posonlyargs, *a.args, *a.kwonlyargs)]
    if a.vararg:
        out.append("*" + a.vararg.arg)
    if a.kwarg:
        out.append("**" + a.kwarg.arg)
    return out


def _edge(edges, src, dst, etype):
    edges.add((src, dst, etype))


def _attr_text(node: ast.AST) -> str | None:
    """Dotted source text of a Name/Attribute callee, e.g. 'os.path.join'
    (the reference uses the raw node text — tree_sitter_parser.py:549)."""
    parts = []
    cur = node
    while isinstance(cur, ast.Attribute):
        parts.append(cur.attr)
        cur = cur.value
    if isinstance(cur, ast.Name):
        parts.append(cur.id)
        return ".".join(reversed(parts))
    return None


def extract_python(path: str, content: str):
    """Extract (nodes, edges) from Python source via stdlib ast."""
    basename = posixpath.basename(path)
    nodes: dict = {}
    edges: set = set()
    module_id = f"module:{basename}"
    file_id = f"file:{basename}"
    n_lines = content.count("\n") + 1
    _node(nodes, module_id, "module", basename, 1, n_lines)
    try:
        tree = ast.parse(content)
    except SyntaxError:
        # reference returns a module-only result on parse failure
        # (tree_sitter_parser.py:365-380)
        return list(nodes.values()), []

    def walk(node: ast.AST, scope_id: str | None, class_id: str | None):
        for child in ast.iter_child_nodes(node):
            if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef)):
                fid = f"function:{child.name}"
                _node(nodes, fid, "function", child.name, child.lineno,
                      child.end_lineno, _py_params(child))
                if class_id is not None:
                    _edge(edges, fid, class_id, "member_of")
                if scope_id is None:
                    _edge(edges, module_id, fid, "contains")
                walk(child, fid, None)
            elif isinstance(child, ast.ClassDef):
                cid = f"class:{child.name}"
                _node(nodes, cid, "class", child.name, child.lineno, child.end_lineno)
                if scope_id is None:
                    _edge(edges, module_id, cid, "contains")
                for base in child.bases:
                    base_name = _attr_text(base)
                    if base_name and "." not in base_name:
                        _edge(edges, cid, f"class:{base_name}", "inherits")
                walk(child, cid, cid)
            elif isinstance(child, ast.Import):
                for alias in child.names:
                    iid = f"import:{alias.name}"
                    _node(nodes, iid, "import", alias.name, child.lineno, child.end_lineno)
                    _node(nodes, file_id, "file", basename, 1, n_lines)
                    _edge(edges, file_id, iid, "imports")
            elif isinstance(child, ast.ImportFrom):
                if child.module:
                    iid = f"import:{child.module}"
                    _node(nodes, iid, "import", child.module, child.lineno, child.end_lineno)
                    _node(nodes, file_id, "file", basename, 1, n_lines)
                    _edge(edges, file_id, iid, "imports")
            elif isinstance(child, ast.Call):
                callee = _attr_text(child.func)
                if callee:
                    cid = _call_id(path, child.lineno, child.col_offset, callee)
                    _node(nodes, cid, "call", callee, child.lineno, child.end_lineno)
                    if scope_id is not None and scope_id.startswith("function:"):
                        _edge(edges, scope_id, f"function:{callee}", "calls")
                walk(child, scope_id, class_id)
            else:
                walk(child, scope_id, class_id)

    walk(tree, None, None)
    return list(nodes.values()), sorted(edges)


# --- JS / TS regex extraction (reference fallback path, extended) ---

_JS_FUNC = re.compile(r"function\s+([a-zA-Z_$][a-zA-Z0-9_$]*)\s*\(([^)]*)\)")
_JS_CLASS = re.compile(
    r"class\s+([a-zA-Z_$][a-zA-Z0-9_$]*)(?:\s+extends\s+([a-zA-Z_$][a-zA-Z0-9_$.]*))?"
)
_JS_IMPORT = re.compile(r"""import\s+(?:[^'"]*?\s+from\s+)?['"]([^'"]+)['"]""")
_JS_REQUIRE = re.compile(r"""require\s*\(\s*['"]([^'"]+)['"]\s*\)""")
_JS_ARROW = re.compile(
    r"(?:const|let|var)\s+([a-zA-Z_$][a-zA-Z0-9_$]*)\s*=\s*(?:async\s*)?\(([^)]*)\)\s*=>"
)


_JS_IDENT = re.compile(r"^(?:\.\.\.)?([a-zA-Z_$][a-zA-Z0-9_$]*)$")


def _js_params(raw: str) -> list:
    """Identifier-shaped parameter names from a raw JS parameter list.

    Destructured or nested-default params — `function f({a, b}, c = g(1))`
    — would yield garbage tokens ('{a', 'b}') under a naive comma split
    (and `[^)]*` in the function regex truncates at the first inner
    ')'), polluting keyword-over-params search. Brace/bracket groups are
    blanked before splitting and only clean identifier tokens (optionally
    rest `...x`) survive; a truncated/destructured tail contributes
    nothing rather than noise.
    """
    # blank out {...} and [...] destructuring groups (non-nested pass is
    # enough: nested groups still leave no identifier-shaped token)
    cleaned = re.sub(r"[{\[][^}\]]*[}\]]?", " ", raw)
    out = []
    for p in cleaned.split(","):
        name = p.split("=")[0].strip()
        m = _JS_IDENT.match(name)
        if m:
            out.append(name if name.startswith("...") else m.group(1))
    return out


def extract_js(path: str, content: str):
    """Extract (nodes, edges) from JS/TS source via regex patterns."""
    basename = posixpath.basename(path)
    nodes: dict = {}
    edges: set = set()
    module_id = f"module:{basename}"
    file_id = f"file:{basename}"
    n_lines = content.count("\n") + 1
    _node(nodes, module_id, "module", basename, 1, n_lines)

    def line_of(pos: int) -> int:
        return content.count("\n", 0, pos) + 1

    for rx in (_JS_FUNC, _JS_ARROW):
        for m in rx.finditer(content):
            fid = f"function:{m.group(1)}"
            _node(nodes, fid, "function", m.group(1), line_of(m.start()),
                  line_of(m.start()) + 1, _js_params(m.group(2)))
            _edge(edges, module_id, fid, "contains")
    for m in _JS_CLASS.finditer(content):
        cid = f"class:{m.group(1)}"
        _node(nodes, cid, "class", m.group(1), line_of(m.start()), line_of(m.start()) + 1)
        _edge(edges, module_id, cid, "contains")
        if m.group(2) and "." not in m.group(2):
            _edge(edges, cid, f"class:{m.group(2)}", "inherits")
    for rx in (_JS_IMPORT, _JS_REQUIRE):
        for m in rx.finditer(content):
            mod = m.group(1)
            iid = f"import:{mod}"
            ln = line_of(m.start())
            _node(nodes, iid, "import", mod, ln, ln)
            _node(nodes, file_id, "file", basename, 1, n_lines)
            _edge(edges, file_id, iid, "imports")
    return list(nodes.values()), sorted(edges)


_EXTRACTORS = {
    "python": extract_python,
    "javascript": extract_js,
    "typescript": extract_js,
}

SUPPORTED_LANGS = tuple(_EXTRACTORS)


def extract_file(path: str, lang: str, content: str):
    """Route by language (reference graph_core/analyzer/__init__.py:40-45)."""
    fn = _EXTRACTORS.get(lang)
    if fn is None:
        return [], []
    return fn(path, content)
