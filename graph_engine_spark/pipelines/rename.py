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
    0.7 (:212). ``similarity="difflib"`` / ``body_similarity="difflib"``
    opt into the reference's exact SequenceMatcher scores (Arrow-batched
    UDF over the blocked candidates) where bit-parity matters more than
    throughput.
  * Blocking: extension equality (the reference's gate) for modest
    windows; ``blocker="minhash"`` swaps in MinHash-LSH candidate
    generation (pipelines/dedup.py) so the pair space stays near-linear
    when a rename window contains millions of files.
  * Resolution: the reference greedily takes pairs in similarity-desc
    order, skipping already-matched endpoints. The distributed
    equivalent here is two sequential ranking windows (SURVEY.md §2.5):
    best old candidate per new path first, then best surviving claimant
    per old path, ties broken by path ascending. This matches the
    greedy outcome whenever each endpoint conflicts at most once (the
    overwhelmingly common case); in chained-conflict cases greedy can
    fall through to a second-best pair that the two-pass form drops.

The reference's exact-rename fast path (1 deleted + 1 created,
:255-267) and its md5 compare (:24-44) are subsumed: identical content
has Jaccard 1.0 and wins every window.

Also provided: the function-rename weighted score
(0.7·body + 0.2·line_count + 0.1·params, reference :87,169) as a plain
column expression for callers that carry those three similarity columns.
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf type hints resolve
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


def _difflib_ratio_udf(mode: str):
    """Arrow-batched SequenceMatcher.ratio() — the reference's exact
    scorer, for callers that need bit-parity with its scores near the
    0.7 threshold (VERDICT r3 missing-item #3). mode="lines" compares
    line lists exactly like calculate_similarity's readlines
    (rename_detection.py:62-69); mode="chars" compares raw strings
    exactly like the function-body ratio (:151).

    Scale posture: O(len²) per pair and Python-side — this is the
    OPT-IN parity path, only ever run on the BLOCKED candidate set
    (post extension/minhash blocking), never corpus². Jaccard stays the
    default."""
    import difflib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def ratio(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(a, b):
            if x is None or y is None:
                out.append(0.0)
            elif mode == "lines":
                out.append(
                    difflib.SequenceMatcher(
                        None, x.splitlines(keepends=True), y.splitlines(keepends=True)
                    ).ratio()
                )
            else:
                out.append(difflib.SequenceMatcher(None, x, y).ratio())
        return pd.Series(out, dtype="float64")

    return ratio


def similarity_pairs(
    deleted: DataFrame,
    created: DataFrame,
    threshold: float = 0.7,
    path_col: str = "path",
    text_col: str = "text",
    blocker: str = "extension",
    similarity: str = "jaccard",
) -> DataFrame:
    """(old_path, new_path, similarity) candidate pairs ≥ threshold.

    blocker="extension": equi-join on extension (reference gate).
    blocker="minhash": MinHash-LSH candidates (dedup.py) — the 100 TB
    path; extension gate applied after blocking.

    similarity="jaccard" (default): JVM-side token-set Jaccard — the
    scale path. similarity="difflib": bit-parity with the reference's
    SequenceMatcher-over-readlines scorer (rename_detection.py:62-69)
    via an Arrow-batched UDF on the blocked pairs — for replaying
    reference fixtures / matching its scores near the threshold.
    """
    use_difflib = similarity == "difflib"
    sim_cols_old = (
        [F.col(text_col).alias("text_old")]
        if use_difflib
        else [token_set(F.col(text_col)).alias("tok_old")]
    )
    sim_cols_new = (
        [F.col(text_col).alias("text_new")]
        if use_difflib
        else [token_set(F.col(text_col)).alias("tok_new")]
    )
    d = deleted.select(
        F.col(path_col).alias("old_path"),
        _ext(F.col(path_col)).alias("ext"),
        *sim_cols_old,
    )
    c = created.select(
        F.col(path_col).alias("new_path"),
        _ext(F.col(path_col)).alias("ext"),
        *sim_cols_new,
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
            .select("old_path", "new_path", *sim_pair_cols(use_difflib))
        )
    else:
        blocked = d.join(c, "ext").select(
            "old_path", "new_path", *sim_pair_cols(use_difflib)
        )
    score = (
        _difflib_ratio_udf("lines")(F.col("text_old"), F.col("text_new"))
        if use_difflib
        else jaccard(F.col("tok_old"), F.col("tok_new"))
    )
    return (
        blocked.select("old_path", "new_path", score.alias("similarity"))
        .filter(F.col("similarity") >= threshold)
    )


def sim_pair_cols(use_difflib: bool) -> list[str]:
    return ["text_old", "text_new"] if use_difflib else ["tok_old", "tok_new"]


def detect_renames(
    deleted: DataFrame,
    created: DataFrame,
    threshold: float = 0.7,
    path_col: str = "path",
    text_col: str = "text",
    blocker: str = "extension",
    similarity: str = "jaccard",
) -> DataFrame:
    """1:1 rename assignments (old_path, new_path, similarity).

    Resolution is SEQUENTIAL best-per-new then best-per-old (the same
    two-pass shape as the reference's greedy loop and the DuckDB
    oracle): each new path first takes its best old candidate, then
    conflicts on an old path resolve to the highest-scoring claimant.
    A kept pair is therefore always its new path's best candidate, and
    the best among that old path's SURVIVING claimants — not necessarily
    the old path's best over the full candidate set (true mutual-best
    would drop such chained-conflict pairs instead of keeping them)."""
    pairs = similarity_pairs(
        deleted, created, threshold, path_col, text_col, blocker, similarity
    )
    return resolve_pairs(pairs)


def resolve_pairs(pairs: DataFrame) -> DataFrame:
    """Two-pass 1:1 resolution over (old_path, new_path, similarity)
    candidate pairs — the distributed form of the reference's greedy
    similarity-desc assignment (rename_detection.py:322-339). Factored
    out so streaming micro-batches (whose interval join produces the
    pairs) share the exact batch semantics."""
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


def match_function_renames(
    old_funcs: DataFrame,
    new_funcs: DataFrame,
    threshold: float = 0.7,
    file_col: str = "path",
    id_col: str = "func_id",
    name_col: str = "name",
    body_col: str = "body",
    lines_col: str = "n_lines",
    params_col: str = "n_params",
    body_similarity: str = "jaccard",
) -> DataFrame:
    """Function-rename matching (reference rename_detection.py:84-207).

    Input: two function tables with (file, func_id, name, body, n_lines,
    n_params) — old-version functions and new-version functions. Output:
    (path, old_id, new_id, body_sim, line_sim, param_sim, score), one
    row per resolved rename.

    Semantics mirrored from ``match_functions``:
      * candidates are old × new within the SAME file (:105-110 — the
        reference is called per-file; the file equi-join is also the
        natural blocking key, so candidate volume is bounded by
        functions-per-file², never corpus²);
      * exact name matches are skipped (:143-145 — same name = same
        function, not a rename);
      * body similarity: token-set Jaccard standing in for the
        reference's difflib.SequenceMatcher ratio (:151) — the same
        documented deviation as file renames (O(len²) and
        order-sensitive vs JVM-side array intersection); 0.0 when
        either body is empty (:150-153). ``body_similarity="difflib"``
        opts into the reference's exact SequenceMatcher ratio on the
        raw body strings (Arrow-batched UDF over the file-blocked
        candidates) for bit-parity with its scores;
      * line-count similarity 1/(1+|Δlines|) (:156-157), parameter-count
        similarity 1/(1+|Δparams|) when both sides carry a parameter
        list, else 0.0 (:160-167);
      * score = 0.7·body + 0.2·lines + 0.1·params (:169), threshold 0.7
        (:87);
      * resolution (:180-207): each new function takes its best-scoring
        old candidate (threshold applies to the best only — equivalent
        to thresholding first, since the below-threshold best has no
        above-threshold runner-up), then conflicts on an old function
        resolve to the highest-scoring claimant — expressed as two
        ranking windows, ties broken by id ascending (the reference
        keeps first-encountered list order; ascending id is the
        deterministic spelling of that).
    """
    o = old_funcs.select(
        F.col(file_col).alias("path"),
        F.col(id_col).alias("old_id"),
        F.col(name_col).alias("old_name"),
        F.col(body_col).alias("old_body"),
        token_set(F.col(body_col)).alias("tok_old"),
        F.col(lines_col).alias("old_lines"),
        F.col(params_col).alias("old_params"),
    )
    n = new_funcs.select(
        F.col(file_col).alias("path"),
        F.col(id_col).alias("new_id"),
        F.col(name_col).alias("new_name"),
        F.col(body_col).alias("new_body"),
        token_set(F.col(body_col)).alias("tok_new"),
        F.col(lines_col).alias("new_lines"),
        F.col(params_col).alias("new_params"),
    )
    both_bodies = (
        F.col("old_body").isNotNull()
        & (F.length("old_body") > 0)
        & F.col("new_body").isNotNull()
        & (F.length("new_body") > 0)
    )
    body_score = (
        _difflib_ratio_udf("chars")(F.col("old_body"), F.col("new_body"))
        if body_similarity == "difflib"
        else jaccard(F.col("tok_old"), F.col("tok_new"))
    )
    scored = (
        o.join(n, "path")
        .filter(F.col("old_name") != F.col("new_name"))
        .select(
            "path",
            "old_id",
            "new_id",
            F.when(both_bodies, body_score)
            .otherwise(F.lit(0.0))
            .alias("body_sim"),
            (
                1.0 / (1.0 + F.abs(F.col("new_lines") - F.col("old_lines")))
            ).cast("double").alias("line_sim"),
            F.when(
                F.col("old_params").isNotNull() & F.col("new_params").isNotNull(),
                1.0 / (1.0 + F.abs(F.col("new_params") - F.col("old_params"))),
            )
            .otherwise(F.lit(0.0))
            .cast("double")
            .alias("param_sim"),
        )
        .withColumn(
            "score",
            weighted_function_rename_score(
                F.col("body_sim"), F.col("line_sim"), F.col("param_sim")
            ),
        )
        .filter(F.col("score") >= threshold)
    )
    by_new = Window.partitionBy("path", "new_id").orderBy(
        F.desc("score"), F.asc("old_id")
    )
    by_old = Window.partitionBy("path", "old_id").orderBy(
        F.desc("score"), F.asc("new_id")
    )
    return (
        scored.withColumn("rn_new", F.row_number().over(by_new))
        .filter(F.col("rn_new") == 1)
        .withColumn("rn_old", F.row_number().over(by_old))
        .filter(F.col("rn_old") == 1)
        .select("path", "old_id", "new_id", "body_sim", "line_sim", "param_sim", "score")
    )


def function_table_from_extraction(nodes: DataFrame, corpus: DataFrame) -> DataFrame:
    """Build the (path, func_id, name, body, n_lines, n_params) input of
    match_function_renames from an extracted node table + its corpus:
    function bodies are sliced JVM-side from content by the node's
    start/end line (the extractor deliberately does not duplicate body
    text onto every node — at 10^12-file scale that would multiply the
    node table by average function length)."""
    funcs = nodes.filter(F.col("type") == "function").select(
        "path",
        F.col("id").alias("func_id"),
        "name",
        "start_line",
        "end_line",
        (F.col("end_line") - F.col("start_line")).alias("n_lines"),
        F.size("params").alias("n_params"),
    )
    content = corpus.select("path", F.split("content", "\n").alias("_lines"))
    return funcs.join(content, "path").select(
        "path",
        "func_id",
        "name",
        F.concat_ws(
            "\n",
            F.slice(
                "_lines",
                F.col("start_line"),
                F.col("end_line") - F.col("start_line") + F.lit(1),
            ),
        ).alias("body"),
        "n_lines",
        "n_params",
    )
