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
