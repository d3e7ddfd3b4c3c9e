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


#: call-site shape: a (possibly dotted) identifier followed by '(' —
#: the raw callee text, matching the reference tree-sitter processor's
#: use of the call_expression function text (tree_sitter_parser.py:549)
_JS_CALL = re.compile(
    r"([a-zA-Z_$][a-zA-Z0-9_$]*(?:\.[a-zA-Z_$][a-zA-Z0-9_$]*)*)\s*\("
)

_JS_KEYWORDS = frozenset(
    "break case catch class const continue debugger default delete do else "
    "export extends finally for function if import in instanceof new return "
    "super switch this throw try typeof var void while with yield let "
    "static async await of".split()
)


def _match_paren(content: str, open_pos: int, cap: int = 400) -> int:
    """Index of the ')' matching content[open_pos] == '(', scanning at
    most ``cap`` chars (bounds worst-case cost per call site on
    pathological minified lines); -1 when unmatched within the cap."""
    depth = 0
    for i in range(open_pos, min(len(content), open_pos + cap)):
        c = content[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
    return -1


def _brace_span(content: str, search_from: int, max_gap: int = 200) -> int:
    """End index of the brace-balanced block whose '{' opens within
    ``max_gap`` chars of ``search_from`` (tolerates TS return-type
    annotations between the param list and the body); -1 when the
    definition is expression-bodied (no block)."""
    brace = content.find("{", search_from)
    if brace == -1 or brace - search_from > max_gap:
        return -1
    depth = 0
    for i in range(brace, len(content)):
        c = content[i]
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return i
    return len(content) - 1


def extract_js(path: str, content: str):
    """Extract (nodes, edges) from JS/TS source via regex patterns.

    Call edges (reference tree_sitter_parser.py:549-567,645-737): every
    non-keyword ``name(`` site emits a call node, and — when it falls
    inside the brace-matched body of a function/arrow/shorthand-method
    definition — a ``function:<caller> -calls-> function:<callee>``
    edge from the INNERMOST enclosing definition. ``name(args) {``
    headers that are not calls (shorthand methods / object-literal
    methods) are registered as function definitions instead, so calls
    inside class methods get a caller scope too.
    """
    basename = posixpath.basename(path)
    nodes: dict = {}
    edges: set = set()
    module_id = f"module:{basename}"
    file_id = f"file:{basename}"
    n_lines = content.count("\n") + 1
    _node(nodes, module_id, "module", basename, 1, n_lines)

    def line_of(pos: int) -> int:
        return content.count("\n", 0, pos) + 1

    # (start, end, function_id) body spans — innermost-match caller
    # attribution for call sites
    spans: list = []

    for rx in (_JS_FUNC, _JS_ARROW):
        for m in rx.finditer(content):
            fid = f"function:{m.group(1)}"
            _node(nodes, fid, "function", m.group(1), line_of(m.start()),
                  line_of(m.start()) + 1, _js_params(m.group(2)))
            _edge(edges, module_id, fid, "contains")
            end = _brace_span(content, m.end())
            if end == -1:
                # expression-bodied arrow: scope runs to end of line
                end = content.find("\n", m.end())
                end = len(content) - 1 if end == -1 else end
            spans.append((m.start(), end, fid))
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

    # classify every `ident(` site: definition header vs call site
    call_sites: list = []
    for m in _JS_CALL.finditer(content):
        name = m.group(1)
        head = name.split(".", 1)[0]
        if name in _JS_KEYWORDS:
            continue
        if m.start() > 0 and content[m.start() - 1] == ".":
            # chained-call tail `String(k).trim(` — the callee isn't a
            # resolvable name root (the Python ast path drops these too:
            # _attr_text returns None when the base isn't a Name)
            continue
        before = content[max(0, m.start() - 20):m.start()]
        if re.search(r"(?:function|new)\s+$", before):
            # `function name(` is the definition already captured above;
            # `new Foo(` is a new_expression, not a call_expression
            continue
        close = _match_paren(content, m.end() - 1)
        after = content[close + 1:close + 40].lstrip() if close != -1 else ""
        if close != -1 and after.startswith("{") and "." not in name and head not in _JS_KEYWORDS:
            # `name(args) { …` with no dot and no keyword head: a
            # shorthand/object-literal METHOD definition, not a call —
            # register it as a function scope (reference method_definition)
            fid = f"function:{name}"
            params_raw = content[m.end():close]
            _node(nodes, fid, "function", name, line_of(m.start()),
                  line_of(m.start()) + 1, _js_params(params_raw))
            _edge(edges, module_id, fid, "contains")
            end = _brace_span(content, close + 1)
            spans.append((m.start(), end if end != -1 else close, fid))
            continue
        if head in _JS_KEYWORDS:
            continue
        call_sites.append((m.start(1), name))

    spans.sort()
    for pos, name in call_sites:
        ln = line_of(pos)
        col = pos - (content.rfind("\n", 0, pos) + 1)
        _node(nodes, _call_id(path, ln, col, name), "call", name, ln, ln)
        caller = None
        for start, end, fid in spans:  # sorted by start → last hit is innermost
            if start <= pos <= end:
                caller = fid
        if caller is not None:
            # recursion self-loops included — same as the Python path
            _edge(edges, caller, f"function:{name}", "calls")
    return list(nodes.values()), sorted(edges)


_EXTRACTORS = {
    "python": extract_python,
    "javascript": extract_js,
    "typescript": extract_js,
}

SUPPORTED_LANGS = tuple(_EXTRACTORS)


def extract_file(path: str, lang: str, content: str, parser: str = "fallback"):
    """Route by language (reference graph_core/analyzer/__init__.py:40-45).

    parser="treesitter": use a real grammar when one is importable in
    this process (reference tree_sitter_parser.py:94-132 cached-parser
    path), degrading to the ast/regex extractors when it is not — the
    reference's own MinimalParser degradation. The default stays the
    deterministic fallback so goldens never depend on which wheels an
    executor image happens to carry.
    """
    if parser == "treesitter":
        from graph_engine_spark.extractor.tsext import extract_treesitter

        out = extract_treesitter(path, lang, content)
        if out is not None:
            return out
    fn = _EXTRACTORS.get(lang)
    if fn is None:
        return [], []
    return fn(path, content)
