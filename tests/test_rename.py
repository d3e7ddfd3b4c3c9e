"""Rename-detection similarity join (reference rename_detection.py:210-341)."""

from __future__ import annotations

import pytest

from graph_engine_spark.pipelines.rename import detect_renames, similarity_pairs


@pytest.fixture(scope="module")
def frames(spark):
    # deleted files: a.py (unique content), b.py (content shared with a decoy)
    deleted = spark.createDataFrame(
        [
            ("old/a.py", "alpha beta gamma delta epsilon zeta"),
            ("old/b.py", "one two three four five six seven"),
            ("old/unmatched.py", "totally unique words nothing else shares"),
            ("old/c.txt", "alpha beta gamma delta epsilon zeta"),  # other ext
        ],
        ["path", "text"],
    )
    created = spark.createDataFrame(
        [
            ("new/a_renamed.py", "alpha beta gamma delta epsilon zeta"),  # exact
            ("new/b_moved.py", "one two three four five six eight"),  # 6/8 sim
            ("new/fresh.py", "completely different vocabulary here now"),
            ("new/c_kept.txt", "alpha beta gamma delta epsilon zeta"),
        ],
        ["path", "text"],
    )
    return deleted, created


def test_similarity_pairs_extension_gate(frames):
    deleted, created = frames
    pairs = {
        (r["old_path"], r["new_path"]): r["similarity"]
        for r in similarity_pairs(deleted, created, threshold=0.7).collect()
    }
    # exact-content rename found with similarity 1.0
    assert pairs[("old/a.py", "new/a_renamed.py")] == 1.0
    # near-match above threshold: 6 shared / 8 union
    assert abs(pairs[("old/b.py", "new/b_moved.py")] - 0.75) < 1e-12
    # extension gate: .txt never pairs with .py despite identical content
    assert ("old/c.txt", "new/a_renamed.py") not in pairs
    assert ("old/a.py", "new/c_kept.txt") not in pairs
    # unrelated content below threshold
    assert ("old/unmatched.py", "new/fresh.py") not in pairs


def test_detect_renames_mutual_best_one_to_one(frames):
    deleted, created = frames
    got = {
        (r["old_path"], r["new_path"]) for r in detect_renames(deleted, created).collect()
    }
    assert got == {
        ("old/a.py", "new/a_renamed.py"),
        ("old/b.py", "new/b_moved.py"),
        ("old/c.txt", "new/c_kept.txt"),
    }


def test_detect_renames_conflict_resolution(spark):
    # two deleted files both similar to one created file: the better
    # (then lexicographically smaller) old path wins; 1:1 holds.
    deleted = spark.createDataFrame(
        [
            ("old/x1.py", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
            ("old/x2.py", "w1 w2 w3 w4 w5 w6 w7 w8 w9 other"),
        ],
        ["path", "text"],
    )
    created = spark.createDataFrame(
        [("new/y.py", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")], ["path", "text"]
    )
    got = detect_renames(deleted, created).collect()
    assert len(got) == 1
    assert (got[0]["old_path"], got[0]["new_path"]) == ("old/x1.py", "new/y.py")
    assert got[0]["similarity"] == 1.0


# --- function renames (reference rename_detection.py:84-207, mirrored
# from reference tests/test_function_renames.py:62-239) ---------------

PY_OLD = """
def original_function(param1, param2):
    # A test function
    result = param1 + param2
    return result
"""
PY_MODIFIED = """
def renamed_function(param1, param2):
    # A test function with minor changes
    # Added comment
    result = param1 + param2
    return result  # Another comment
"""
PY_DIFFERENT = """
def different_function(p1, p2, p3):
    # A completely different function
    if p1 > 0:
        return p1 * p2 * p3
    else:
        return p1 + p2 + p3
"""

_FUNC_SCHEMA = (
    "path string, func_id string, name string, body string, "
    "n_lines int, n_params int"
)


def _match(spark, old_rows, new_rows, threshold=0.7):
    from graph_engine_spark.pipelines.rename import match_function_renames

    old = spark.createDataFrame(old_rows, _FUNC_SCHEMA)
    new = spark.createDataFrame(new_rows, _FUNC_SCHEMA)
    return {
        r["old_id"]: r["new_id"]
        for r in match_function_renames(old, new, threshold=threshold).collect()
    }


def test_match_functions_exact_body(spark):
    """Identical body under a new name matches (reference :62-97)."""
    got = _match(
        spark,
        [("t.py", "function:original_function", "original_function", PY_OLD, 4, None)],
        [("t.py", "function:renamed_function", "renamed_function", PY_OLD, 4, None)],
    )
    assert got == {"function:original_function": "function:renamed_function"}


def test_match_functions_similar_body(spark):
    """Minor body edits still match at the relaxed threshold (:99-140)."""
    got = _match(
        spark,
        [("t.py", "function:original_function", "original_function", PY_OLD, 4, None)],
        [("t.py", "function:renamed_function", "renamed_function", PY_MODIFIED, 5, None)],
        threshold=0.4,
    )
    assert got == {"function:original_function": "function:renamed_function"}


def test_match_functions_different_body(spark):
    """Substantially different bodies do not match (:142-178)."""
    got = _match(
        spark,
        [("t.py", "function:original_function", "original_function", PY_OLD, 4, None)],
        [("t.py", "function:different_function", "different_function", PY_DIFFERENT, 7, None)],
    )
    assert got == {}


def test_match_functions_multiple_candidates(spark):
    """Each renamed function pairs with its own original (:180-239)."""
    got = _match(
        spark,
        [
            ("t.py", "function:function1", "function1",
             "def function1(a, b): return a + b", 0, None),
            ("t.py", "function:function2", "function2",
             "def function2(a, b): return a * b", 0, None),
        ],
        [
            ("t.py", "function:add_func", "add_func",
             "def add_func(a, b): return a + b", 0, None),
            ("t.py", "function:multiply_func", "multiply_func",
             "def multiply_func(a, b): return a * b", 0, None),
        ],
    )
    assert got == {
        "function:function1": "function:add_func",
        "function:function2": "function:multiply_func",
    }


def test_match_functions_same_name_skipped_and_cross_file_blocked(spark):
    """Exact name matches are never renames (:143-145), and candidates
    never cross file boundaries (the per-file blocking key)."""
    got = _match(
        spark,
        [
            ("a.py", "old:same", "same_name", PY_OLD, 4, 2),
            ("b.py", "old:other", "in_file_b", PY_OLD, 4, 2),
        ],
        [
            ("a.py", "new:same", "same_name", PY_OLD, 4, 2),
            # same body as b.py's function but lives in a different file
            ("a.py", "new:crossfile", "moved_here", PY_OLD, 4, 2),
        ],
    )
    # old:same ↔ new:same share a name → skipped; old:same → new:crossfile
    # IS a valid in-file rename; b.py's function can't match across files
    assert got == {"old:same": "new:crossfile"}


def test_match_functions_conflict_resolution(spark):
    """Two new functions claiming one old: highest score wins, the other
    gets nothing (reference :180-207 greedy over sorted matches)."""
    body = "alpha beta gamma delta epsilon zeta eta theta"
    got = _match(
        spark,
        [("t.py", "old:1", "orig", body, 10, 2)],
        [
            ("t.py", "new:close", "close_copy", body, 10, 2),  # exact: 1.0 score path
            ("t.py", "new:far", "far_copy", body + " extra tokens here", 12, 2),
        ],
    )
    assert got == {"old:1": "new:close"}


def test_function_table_from_extraction(spark):
    """Bodies sliced from corpus content by node line range feed the
    matcher end-to-end."""
    from graph_engine_spark.extractor import extract_graph
    from graph_engine_spark.pipelines.rename import (
        function_table_from_extraction,
        match_function_renames,
    )

    old_src = "def compute_total(a, b):\n    total = a + b\n    return total\n"
    new_src = "def sum_values(a, b):\n    total = a + b\n    return total\n"
    mk = lambda path, content: ("r", path, "c0", "python", content)
    cols = ["repo", "path", "commit", "lang", "content"]
    old_corpus = spark.createDataFrame([mk("m.py", old_src)], cols)
    new_corpus = spark.createDataFrame([mk("m.py", new_src)], cols)
    old_nodes, _ = extract_graph(old_corpus)
    new_nodes, _ = extract_graph(new_corpus)
    old_f = function_table_from_extraction(old_nodes, old_corpus)
    new_f = function_table_from_extraction(new_nodes, new_corpus)
    rows = match_function_renames(old_f, new_f).collect()
    assert len(rows) == 1
    assert rows[0]["score"] >= 0.7


def test_minhash_blocker_matches_extension_blocker_on_planted_pairs(spark):
    rows_d, rows_c = [], []
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    for i in range(20):
        rows_d.append((f"old/f{i}.py", f"{base} doc {i} " + " ".join(f"tok{i}_{j}" for j in range(10))))
        rows_c.append((f"new/f{i}.py", f"{base} doc {i} " + " ".join(f"tok{i}_{j}" for j in range(10)) + " tail"))
    deleted = spark.createDataFrame(rows_d, ["path", "text"])
    created = spark.createDataFrame(rows_c, ["path", "text"])
    ext = {
        (r["old_path"], r["new_path"])
        for r in detect_renames(deleted, created, blocker="extension").collect()
    }
    mh = {
        (r["old_path"], r["new_path"])
        for r in detect_renames(deleted, created, blocker="minhash").collect()
    }
    planted = {(f"old/f{i}.py", f"new/f{i}.py") for i in range(20)}
    assert ext == planted
    # LSH blocking is a candidate *filter*: everything it returns is a
    # true pair, and on these high-similarity pairs recall is total
    assert mh == planted


# --- difflib parity mode (VERDICT r3 item 6) -------------------------
# Fixtures replayed VERBATIM from reference tests/test_rename_detection.py;
# scores must be BIT-EQUAL to difflib.SequenceMatcher computed the way
# the reference computes them (readlines for files, raw strings for
# function bodies).


def _ref_file_ratio(a, b):
    import difflib

    return difflib.SequenceMatcher(
        None, a.splitlines(keepends=True), b.splitlines(keepends=True)
    ).ratio()


def test_difflib_mode_calculate_similarity_parity(spark):
    """reference test_calculate_similarity (test_rename_detection.py:39-61):
    identical → 1.0; one-line change → in [0.5, 1.0); disjoint → <0.5 —
    and every score bit-equal to SequenceMatcher over readlines."""
    from graph_engine_spark.pipelines.rename import similarity_pairs

    f1 = "This is a test file.\nIt has multiple lines.\n"
    f3 = "This is a test file.\nIt has several lines.\n"
    f4 = "Completely different content.\n"
    deleted = spark.createDataFrame([("file1.txt", f1)], ["path", "text"])
    created = spark.createDataFrame(
        [("file2.txt", f1), ("file3.txt", f3), ("file4.txt", f4)],
        ["path", "text"],
    )
    got = {
        r["new_path"]: r["similarity"]
        for r in similarity_pairs(
            deleted, created, threshold=0.0, similarity="difflib"
        ).collect()
    }
    assert got["file2.txt"] == 1.0
    assert got["file3.txt"] == _ref_file_ratio(f1, f3)
    assert 0.5 <= got["file3.txt"] < 1.0
    assert got["file4.txt"] == _ref_file_ratio(f1, f4)
    assert got["file4.txt"] < 0.5


def test_difflib_mode_rename_detection_cases(spark):
    """reference test_exact/partial/no_rename_detection
    (test_rename_detection.py:65-147) through detect_renames with the
    reference's own 0.7 threshold."""
    from graph_engine_spark.pipelines.rename import detect_renames

    orig = "def test_function():\n    return 'Hello, World!'\n"
    partial = "def test_function():\n    # Added comment\n    return 'Hello, World!'\n"
    different = "def another_function():\n    return 'Goodbye, World!'\n"

    deleted = spark.createDataFrame([("original.py", orig)], ["path", "text"])

    # exact: identical content → similarity 1.0, detected
    got = detect_renames(
        deleted,
        spark.createDataFrame([("renamed.py", orig)], ["path", "text"]),
        similarity="difflib",
    ).collect()
    assert len(got) == 1
    assert (got[0]["old_path"], got[0]["new_path"], got[0]["similarity"]) == (
        "original.py",
        "renamed.py",
        1.0,
    )

    # partial: added comment line → detected, score bit-equal to the
    # reference scorer and ≥ 0.7
    got = detect_renames(
        deleted,
        spark.createDataFrame([("renamed.py", partial)], ["path", "text"]),
        similarity="difflib",
    ).collect()
    assert len(got) == 1
    assert got[0]["similarity"] == _ref_file_ratio(orig, partial) >= 0.7

    # different content → no rename
    got = detect_renames(
        deleted,
        spark.createDataFrame([("different.py", different)], ["path", "text"]),
        similarity="difflib",
    ).collect()
    assert got == []


def test_difflib_mode_function_rename_score_parity(spark):
    """reference match_functions semantics (rename_detection.py:137-169)
    with body_similarity='difflib': the weighted score must equal
    0.7·SequenceMatcher(body).ratio() + 0.2·line_sim + 0.1·param_sim
    bit-for-bit."""
    import difflib

    from graph_engine_spark.pipelines.rename import match_function_renames

    old_body = "def old_name(a, b):\n    total = a + b\n    return total\n"
    new_body = "def new_name(a, b):\n    total = a + b\n    return total  # sum\n"
    old = spark.createDataFrame(
        [("m.py", "function:old_name", "old_name", old_body, 3, 2)],
        ["path", "func_id", "name", "body", "n_lines", "n_params"],
    )
    new = spark.createDataFrame(
        [("m.py", "function:new_name", "new_name", new_body, 3, 2)],
        ["path", "func_id", "name", "body", "n_lines", "n_params"],
    )
    got = match_function_renames(
        old, new, threshold=0.0, body_similarity="difflib"
    ).collect()
    assert len(got) == 1
    body_ratio = difflib.SequenceMatcher(None, old_body, new_body).ratio()
    assert got[0]["body_sim"] == body_ratio
    expected = 0.7 * body_ratio + 0.2 * 1.0 + 0.1 * 1.0  # same lines, same params
    assert got[0]["score"] == expected
