"""Rename detection as a blocked similarity join.

Reproduces the *capability* of the reference's rename detector
(reference graph_core/watchers/rename_detection.py:210-341): pair
deleted files with created files whose content is similar, under a
same-extension gate (:287-288), with deterministic 1:1 conflict
resolution of the greedy sorted-by-similarity assignment (:322-339).

Scale-first re-expression (SURVEY.md §2.3 "Similarity join"):
  * Similarity: token-set Jaccard instead of difflib.SequenceMatcher
    ratio — a documented deviation: SequenceMatcher is O(len²) per pair
    and order-sensitive; Jaccard over distinct tokens is a set
    intersection computable as JVM-side array ops, monotone in the same
    "mostly the same content" signal, thresholded at the reference's
    0.7 (:212).
  * Blocking: extension equality (the reference's gate) for modest
    windows; ``blocker="minhash"`` swaps in MinHash-LSH candidate
    generation (pipelines/dedup.py) so the pair space stays near-linear
    when a rename window contains millions of files.
  * Resolution: the reference greedily takes pairs in similarity-desc
    order, skipping already-matched endpoints. The distributed
    equivalent is mutual-best matching with two ranking windows
    (SURVEY.md §2.5): keep a pair iff it is the best candidate for BOTH
    its old and its new path, ties broken by path ascending. Mutual-best
    is a subset of greedy (a greedy pick is always mutual-best at the
    moment it is taken); the difference only shows in chained-conflict
    cases where greedy would fall through to a second-best pair.

The reference's exact-rename fast path (1 deleted + 1 created,
:255-267) and its md5 compare (:24-44) are subsumed: identical content
has Jaccard 1.0 and wins every window.

Also provided: the function-rename weighted score
(0.7·body + 0.2·line_count + 0.1·params, reference :87,169) as a plain
column expression for callers that carry those three similarity columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ext(path: Column) -> Column:
    """File extension (reference same-extension gate, rename_detection.py:287-288)."""
    return F.regexp_extract(path, r"\.([^.]+)$", 1)


def token_set(text: Column) -> Column:
    """Distinct lowercase whitespace tokens — the similarity alphabet."""
    return F.array_distinct(
        F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")
    )


def jaccard(a: Column, b: Column) -> Column:
    return (
        F.size(F.array_intersect(a, b))
        / F.greatest(F.size(F.array_union(a, b)), F.lit(1))
    ).cast("double")


def similarity_pairs(
    deleted: DataFrame,
    created: DataFrame,
    threshold: float = 0.7,
    path_col: str = "path",
    text_col: str = "text",
    blocker: str = "extension",
) -> DataFrame:
    """(old_path, new_path, similarity) candidate pairs ≥ threshold.

    blocker="extension": equi-join on extension (reference gate).
    blocker="minhash": MinHash-LSH candidates (dedup.py) — the 100 TB
    path; extension gate applied after blocking.
    """
    d = deleted.select(
        F.col(path_col).alias("old_path"),
        _ext(F.col(path_col)).alias("ext"),
        token_set(F.col(text_col)).alias("tok_old"),
    )
    c = created.select(
        F.col(path_col).alias("new_path"),
        _ext(F.col(path_col)).alias("ext"),
        token_set(F.col(text_col)).alias("tok_new"),
    )
    if blocker == "minhash":
        from graph_engine_spark.pipelines.dedup import minhash_lsh_candidates

        tagged = deleted.select(
            F.concat(F.lit("D:"), F.col(path_col)).alias("doc_id"),
            F.col(text_col).alias("text"),
        ).unionByName(
            created.select(
                F.concat(F.lit("C:"), F.col(path_col)).alias("doc_id"),
                F.col(text_col).alias("text"),
            )
        )
        cand = minhash_lsh_candidates(tagged).filter(
            # cross-set pairs only; key_a < key_b puts "C:" before "D:"
            F.col("key_a").startswith("C:") & F.col("key_b").startswith("D:")
        )
        pairs = cand.select(
            F.expr("substring(key_b, 3)").alias("old_path"),
            F.expr("substring(key_a, 3)").alias("new_path"),
        )
        blocked = (
            pairs.join(d, "old_path")
            .join(c.withColumnRenamed("ext", "ext_new"), "new_path")
            .filter(F.col("ext") == F.col("ext_new"))
            .select("old_path", "new_path", "tok_old", "tok_new")
        )
    else:
        blocked = d.join(c, "ext").select("old_path", "new_path", "tok_old", "tok_new")
    return (
        blocked.select(
            "old_path",
            "new_path",
            jaccard(F.col("tok_old"), F.col("tok_new")).alias("similarity"),
        )
        .filter(F.col("similarity") >= threshold)
    )


def detect_renames(
    deleted: DataFrame,
    created: DataFrame,
    threshold: float = 0.7,
    path_col: str = "path",
    text_col: str = "text",
    blocker: str = "extension",
) -> DataFrame:
    """1:1 rename assignments (old_path, new_path, similarity) —
    mutual-best resolution of the candidate pairs (deterministic)."""
    pairs = similarity_pairs(deleted, created, threshold, path_col, text_col, blocker)
    by_new = Window.partitionBy("new_path").orderBy(
        F.desc("similarity"), F.asc("old_path")
    )
    by_old = Window.partitionBy("old_path").orderBy(
        F.desc("similarity"), F.asc("new_path")
    )
    return (
        pairs.withColumn("rn_new", F.row_number().over(by_new))
        .filter(F.col("rn_new") == 1)
        .withColumn("rn_old", F.row_number().over(by_old))
        .filter(F.col("rn_old") == 1)
        .select("old_path", "new_path", "similarity")
    )


def weighted_function_rename_score(
    body_sim: Column, line_count_sim: Column, param_sim: Column
) -> Column:
    """Reference rename_detection.py:169 — 0.7·body + 0.2·lines + 0.1·params."""
    return (0.7 * body_sim + 0.2 * line_count_sim + 0.1 * param_sim).cast("double")
