"""Optional tree-sitter extraction path (reference
tree_sitter_parser.py:94-132 parser-cache pattern, per executor).

When real grammars are importable (``tree_sitter`` plus a language
wheel like ``tree_sitter_python``, or the bundled
``tree_sitter_languages`` pack), ``extract_file(..., parser=
"treesitter")`` routes through this module and produces the SAME IR
shape as the ast/regex fallbacks in pyext.py — identical id scheme
(module:/file:/function:/class:/import:/call:), identical edge types
(contains, member_of, inherits, imports, calls), content-derived call
ids (the sanctioned uuid4 deviation). In this sandbox no grammar is
installed, so every entry point degrades to ``None`` and the caller
falls back — mirroring the reference's own MinimalParser degradation
(tree_sitter_parser.py:241-363).

Parsers are cached per process: one compiled grammar per language per
executor, reused across every file that executor parses (the reference
caches Parser objects on the analyzer instance; a Spark executor's
long-lived Python worker gives the same amortization).
"""

from __future__ import annotations

import posixpath

from graph_engine_spark.extractor.pyext import _call_id, _edge, _node

#: language → (pypi wheel module, tree_sitter_languages name)
_LANG_MODULES = {
    "python": ("tree_sitter_python", "python"),
    "javascript": ("tree_sitter_javascript", "javascript"),
    "typescript": ("tree_sitter_typescript", "typescript"),
}

#: per-process (executor) parser cache — None records "unavailable" so
#: the import dance runs once per language, not once per file
_PARSERS: dict[str, object] = {}


def get_parser(lang: str):
    """Cached tree_sitter.Parser for ``lang``, or None when no grammar
    can be loaded in this process."""
    if lang in _PARSERS:
        return _PARSERS[lang]
    parser = None
    spec = _LANG_MODULES.get(lang)
    if spec is not None:
        try:
            import tree_sitter

            mod_name, pack_name = spec
            try:
                mod = __import__(mod_name)
                if lang == "typescript":
                    lang_ptr = mod.language_typescript()
                else:
                    lang_ptr = mod.language()
                parser = tree_sitter.Parser(tree_sitter.Language(lang_ptr))
            except Exception:
                import tree_sitter_languages

                parser = tree_sitter_languages.get_parser(pack_name)
        except Exception:
            parser = None
    _PARSERS[lang] = parser
    return parser


def ts_available(lang: str) -> bool:
    return get_parser(lang) is not None


def _text(node, src: bytes) -> str:
    return src[node.start_byte:node.end_byte].decode("utf-8", "replace")


def _dotted_callee(node, src: bytes) -> str | None:
    """Raw dotted text of a call's function child when it is an
    identifier/attribute chain rooted at an identifier (the same
    resolvability rule as pyext._attr_text); None otherwise."""
    t = node.type
    if t == "identifier":
        return _text(node, src)
    if t in ("attribute", "member_expression"):
        obj = node.child_by_field_name("object") or node.child_by_field_name("value")
        attr = node.child_by_field_name("attribute") or node.child_by_field_name(
            "property"
        )
        if obj is None or attr is None:
            return None
        base = _dotted_callee(obj, src)
        if base is None:
            return None
        return f"{base}.{_text(attr, src)}"
    return None


def _param_names(params_node, src: bytes) -> list:
    """Identifier-shaped parameter names from a parameters /
    formal_parameters node (same cleanup policy as pyext._js_params:
    destructuring contributes nothing)."""
    out = []
    if params_node is None:
        return out
    for ch in params_node.named_children:
        t = ch.type
        if t == "identifier":
            out.append(_text(ch, src))
        elif t in ("default_parameter", "typed_parameter", "typed_default_parameter",
                   "optional_parameter", "required_parameter"):
            name = ch.child_by_field_name("name") or (
                ch.named_children[0] if ch.named_children else None
            )
            if name is not None and name.type == "identifier":
                out.append(_text(name, src))
        elif t in ("list_splat_pattern", "rest_pattern"):
            inner = ch.named_children[0] if ch.named_children else None
            if inner is not None and inner.type == "identifier":
                out.append("*" + _text(inner, src) if t == "list_splat_pattern"
                           else "..." + _text(inner, src))
        elif t == "dictionary_splat_pattern":
            inner = ch.named_children[0] if ch.named_children else None
            if inner is not None and inner.type == "identifier":
                out.append("**" + _text(inner, src))
    return out


def extract_treesitter(path: str, lang: str, content: str):
    """(nodes, edges) via a real grammar, or None to signal fallback.

    The CST walk mirrors pyext's scope semantics: functions/classes at
    module depth get 'contains' from the module node, methods get
    'member_of' to their class, call sites inside a function scope emit
    'calls' edges with the raw dotted callee text."""
    parser = get_parser(lang)
    if parser is None:
        return None
    try:
        src = content.encode("utf-8")
        tree = parser.parse(src)
    except Exception:
        return None

    basename = posixpath.basename(path)
    nodes: dict = {}
    edges: set = set()
    module_id = f"module:{basename}"
    file_id = f"file:{basename}"
    n_lines = content.count("\n") + 1
    _node(nodes, module_id, "module", basename, 1, n_lines)

    def add_import(mod_name: str, line: int):
        iid = f"import:{mod_name}"
        _node(nodes, iid, "import", mod_name, line, line)
        _node(nodes, file_id, "file", basename, 1, n_lines)
        _edge(edges, file_id, iid, "imports")

    def walk(node, scope_id, class_id):
        for child in node.children:
            t = child.type
            line = child.start_point[0] + 1
            end_line = child.end_point[0] + 1
            if t in ("function_definition", "function_declaration",
                     "method_definition", "generator_function_declaration"):
                name_n = child.child_by_field_name("name")
                if name_n is None:
                    walk(child, scope_id, class_id)
                    continue
                fname = _text(name_n, src)
                fid = f"function:{fname}"
                params = _param_names(child.child_by_field_name("parameters"), src)
                _node(nodes, fid, "function", fname, line, end_line, params)
                if class_id is not None:
                    _edge(edges, fid, class_id, "member_of")
                if scope_id is None and class_id is None:
                    _edge(edges, module_id, fid, "contains")
                walk(child, fid, None)
            elif t in ("class_definition", "class_declaration"):
                name_n = child.child_by_field_name("name")
                if name_n is None:
                    walk(child, scope_id, class_id)
                    continue
                cname = _text(name_n, src)
                cid = f"class:{cname}"
                _node(nodes, cid, "class", cname, line, end_line)
                if scope_id is None:
                    _edge(edges, module_id, cid, "contains")
                sup = child.child_by_field_name("superclasses")
                if sup is not None:  # python argument_list
                    for b in sup.named_children:
                        base = _dotted_callee(b, src)
                        if base and "." not in base:
                            _edge(edges, cid, f"class:{base}", "inherits")
                for ch2 in child.children:  # js class_heritage
                    if ch2.type == "class_heritage":
                        for b in ch2.named_children:
                            base = _dotted_callee(b, src)
                            if base and "." not in base:
                                _edge(edges, cid, f"class:{base}", "inherits")
                walk(child, cid, cid)
            elif t == "import_statement":
                if lang == "python":
                    for al in child.named_children:
                        if al.type == "dotted_name":
                            add_import(_text(al, src), line)
                        elif al.type == "aliased_import":
                            dn = al.child_by_field_name("name")
                            if dn is not None:
                                add_import(_text(dn, src), line)
                else:  # js/ts: import ... from 'source'
                    s = child.child_by_field_name("source")
                    if s is not None:
                        add_import(_text(s, src).strip("'\""), line)
            elif t == "import_from_statement":
                mn = child.child_by_field_name("module_name")
                if mn is not None and mn.type != "relative_import":
                    add_import(_text(mn, src), line)
            elif t in ("call", "call_expression"):
                fn = child.child_by_field_name("function")
                callee = _dotted_callee(fn, src) if fn is not None else None
                if callee:
                    if lang != "python" and callee == "require":
                        args = child.child_by_field_name("arguments")
                        lit = args.named_children[0] if args is not None and args.named_children else None
                        if lit is not None and lit.type == "string":
                            add_import(_text(lit, src).strip("'\""), line)
                            walk(child, scope_id, class_id)
                            continue
                    col = child.start_point[1]
                    cid = _call_id(path, line, col, callee)
                    _node(nodes, cid, "call", callee, line, end_line)
                    if scope_id is not None and scope_id.startswith("function:"):
                        _edge(edges, scope_id, f"function:{callee}", "calls")
                walk(child, scope_id, class_id)
            elif t in ("variable_declarator",):
                # const f = (x) => ... / function expression assignment
                name_n = child.child_by_field_name("name")
                val = child.child_by_field_name("value")
                if (
                    name_n is not None
                    and val is not None
                    and name_n.type == "identifier"
                    and val.type in ("arrow_function", "function_expression", "function")
                ):
                    fname = _text(name_n, src)
                    fid = f"function:{fname}"
                    params = _param_names(val.child_by_field_name("parameters"), src)
                    _node(nodes, fid, "function", fname, line, end_line, params)
                    if class_id is not None:
                        _edge(edges, fid, class_id, "member_of")
                    if scope_id is None and class_id is None:
                        _edge(edges, module_id, fid, "contains")
                    walk(val, fid, None)
                else:
                    walk(child, scope_id, class_id)
            else:
                walk(child, scope_id, class_id)

    walk(tree.root_node, None, None)
    return list(nodes.values()), sorted(edges)
