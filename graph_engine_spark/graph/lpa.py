"""Synchronous label propagation with deterministic tie-breaking.

Classic LPA is asynchronous and randomized; the north rule requires
exact, reproducible labels, so this is the deterministic synchronous
variant: every superstep each vertex adopts the most frequent label
among its (undirected) neighbors, ties broken by minimum label; isolated
vertices keep their own label. Convergence = no label changed, with a
fixed iteration cap (synchronous LPA can 2-cycle on bipartite
structures — the cap bounds that).

Spark shape per superstep: one join (labels onto the static symmetrized
edge list), one count aggregation on (id, label), one ranking window
partitioned by id for the argmax (SURVEY.md §2.5 — the same
row_number-over-(count desc, label asc) pattern the reference's greedy
rename resolution maps to). Change detection is fused into the step
join: the old label rides along as ``_prev`` in the stepped frame, so
the has-anything-changed probe is a filter over that frame, not a
second labels⋈labels join per superstep (round-4 change, mirroring
pagerank's fused delta).

Deliberately NOT integer-coded (unlike pagerank/cc/triangles): the
deterministic tie-break is "minimum LABEL", and labels are vertex ids —
hashing is not order-preserving, so coded ties would resolve to
different winners and propagate different (though equally valid-looking)
labels than the specified semantics. An order-preserving dense-rank
dictionary would permit coding at the cost of a one-time global sort;
revisit if LPA ever dominates a profile.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graph_engine_spark.graph.adjacency import vertices as vertex_ids
from graph_engine_spark.graph.pagerank import _IterLoopConf


@dataclass
class LPAResult:
    labels: DataFrame  # (id, label)
    iterations: int
    converged: bool


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 10,
    num_partitions: int | None = None,
    checkpoint=None,
    resume: bool = False,
    weight_col: str | None = None,
) -> LPAResult:
    """weight_col: weighted votes — a vertex adopts the label with the
    LARGEST TOTAL EDGE WEIGHT among its neighbors (sum instead of
    count), ties still broken by minimum label. Symmetrization sums:
    undirected weight(a,b) = Σ w over both directed duplicates.
    Non-positive weights are dropped (they carry no vote). Same natural
    weight as weighted PageRank: the reference's dynamic_call_count
    totals — communities by observed interaction strength."""
    from graph_engine_spark.graph.adjacency import partitions_for_count

    spark = edges.sparkSession
    # build the loop's static symmetrized edge set first; sizing counts
    # THAT persisted table (materializing it for the loop), never the
    # caller's upstream lineage twice (cf. ADVICE r1)
    if weight_col is None:
        sym = (
            edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
            .unionAll(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    else:
        d = edges.select(
            F.col(src).alias("a"),
            F.col(dst).alias("b"),
            F.col(weight_col).cast("double").alias("w"),
        ).filter(F.col("w") > 0)
        # the unweighted distinct becomes a weight-summing aggregation —
        # same single shuffle, merging directed duplicates
        sym = (
            d.unionAll(d.select(F.col("b").alias("a"), F.col("a").alias("b"), "w"))
            .filter(F.col("a") != F.col("b"))
            .groupBy("a", "b")
            .agg(F.sum("w").alias("w"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    if num_partitions is None:
        num_partitions = partitions_for_count(sym.count(), spark)
    loop_conf = _IterLoopConf(spark, num_partitions)
    try:
        return _label_propagation(
            edges, sym, src, dst, max_iter, checkpoint, resume,
            weighted=weight_col is not None,
        )
    finally:
        loop_conf.restore()


def _label_propagation(
    edges, sym, src, dst, max_iter, checkpoint=None, resume=False, weighted=False
) -> LPAResult:
    spark = edges.sparkSession
    verts = vertex_ids(edges, src, dst).persist(StorageLevel.MEMORY_AND_DISK)
    it, converged = 0, False
    labels = None
    if resume and checkpoint is not None:
        state = checkpoint.resume(spark)
        if state is not None:
            it, labels, _ = state
            labels = labels.persist(StorageLevel.MEMORY_AND_DISK)
    if labels is None:
        labels = verts.select("id", F.col("id").alias("label")).persist()
    # handle owning the current label table's cache entry (None when the
    # state lives in localCheckpoint blocks) — see pagerank.py's
    # ranks_cached note: unpersist() through a re-rooted frame is a
    # no-op, so each truncation must release its predecessor explicitly
    labels_cached = labels
    win = Window.partitionBy("id").orderBy(F.desc("cnt"), F.asc("label"))
    while it < max_iter:
        votes = (
            sym.join(labels, sym.a == labels.id)
            .groupBy(F.col("b").alias("id"), "label")
            .agg((F.sum("w") if weighted else F.count("*")).alias("cnt"))
        )
        best = (
            votes.withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") == 1)
            .select("id", F.col("label").alias("new_label"))
        )
        # fused step: the old label rides along as _prev, so change
        # detection is a filter on THIS frame (no second |V| join).
        # shuffle_hash: with broadcasts disabled the planner would plan
        # sort-merge and re-sort the labels side every superstep (see
        # pagerank.py)
        stepped = (
            labels.join(best.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                F.col("label").alias("_prev"),
                F.coalesce("new_label", "label").alias("label"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        changed = (
            stepped.filter(F.col("label") != F.col("_prev")).limit(1).count()
        )
        if labels_cached is not None:
            labels_cached.unpersist()
        labels = stepped.drop("_prev")
        labels_cached = stepped
        it += 1
        if checkpoint is not None and checkpoint.should_checkpoint(it):
            labels = checkpoint.save(labels, it, {"changed": changed}).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            labels_cached.unpersist()  # state re-rooted on Parquet
            labels_cached = labels
        elif it % 2 == 0:
            # the vote join references labels once and the stepped frame
            # once more → plan doubles without truncation (see
            # pagerank.py)
            labels = labels.localCheckpoint(eager=True)
            labels_cached.unpersist()  # blocks materialized by eager=True
            labels_cached = None
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    verts.unpersist()
    return LPAResult(labels, it, converged)
