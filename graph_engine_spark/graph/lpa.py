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

Integer coding (encode_ids=True): the deterministic tie-break is
"minimum LABEL", and labels are vertex ids — HASH coding (pagerank/cc/
triangles style) is not order-preserving, so coded ties would resolve
to different winners and propagate different (though equally
valid-looking) labels than the specified semantics. LPA instead builds
an ORDER-PRESERVING dictionary — one global range-sort of the vertex
ids, vid = monotonically_increasing_id over the sorted frame (partition
ranges are ordered, so vid order == id order) — runs the loop on longs
(string keys dominate the per-superstep shuffle bytes at scale — the
same several-fold cut the other three algorithms already enjoy), and
decodes BOTH columns on exit: results are exactly equal to the uncoded
run. The dictionary is one extra |V| range shuffle paid once; with
checkpointing it is written durably under the checkpoint dir (vid
assignment is order-preserving but not bit-stable across sessions —
range sampling differs — so resume must reload the ORIGINAL dict, never
rebuild it).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graph_engine_spark.graph.adjacency import vertices as vertex_ids
from graph_engine_spark.graph.pagerank import _IterLoopConf


@dataclass
class LPAResult:
    labels: DataFrame  # (id, label)
    iterations: int
    converged: bool
    # wall seconds per superstep (driver-observed) — the same
    # observability series pagerank (superstep_seconds) and CC
    # (round_seconds) carry
    round_seconds: list = field(default_factory=list)
    # cache entries this run owns beyond the labels frame (the encode-
    # path id dictionary the decoded plan joins) — same contract as
    # ComponentsResult.release()
    _owned: list = field(default_factory=list, repr=False)

    def release(self) -> None:
        """Unpersist the labels frame and the internal id dictionary its
        plan joins (encode path). The frame stays valid but replays its
        truncated lineage on next evaluation — materialize first."""
        self.labels.unpersist()
        for df in self._owned:
            df.unpersist()


def _order_preserving_id_map(
    edges: DataFrame, src: str, dst: str, checkpoint, resume: bool
) -> DataFrame:
    """(id, vid) dictionary with vid order == id order: range-shuffle
    the distinct vertex ids, sort within partitions, number with
    monotonically_increasing_id (partition_id·2³³ + offset — strictly
    increasing across ordered range partitions). Values are sparse;
    only their ORDER is contracted. With a checkpoint manager the dict
    is written durably under <base_dir>/id_dict the first time and
    RELOADED on resume — vid assignment depends on range-partitioner
    sampling, so a rebuilt dict in a new session could code the same id
    differently and silently mis-join the restored state."""
    spark = edges.sparkSession
    dict_path = os.path.join(checkpoint.base_dir, "id_dict") if checkpoint else None
    if dict_path and os.path.exists(os.path.join(dict_path, "_SUCCESS")):
        return spark.read.parquet(dict_path).persist(StorageLevel.MEMORY_AND_DISK)
    if dict_path and resume and checkpoint.iterations():
        # a coded resume MUST reuse the original dict; checkpointed
        # state without one was written by an uncoded run (or the dict
        # was deleted) — rebuilding would silently mis-join the state
        raise ValueError(
            f"resume with encode_ids=True but {dict_path} has no id "
            "dictionary — the checkpoint was not written by a coded "
            "run; rerun with the matching encode_ids setting"
        )
    # size the dictionary shuffle to the graph, not the session default
    # (round-6: a 60k-edge graph was range-shuffled into 64 near-empty
    # partitions; partitions_for_count keeps the range sampling and the
    # sort proportional to the data at any scale)
    from graph_engine_spark.graph.adjacency import partitions_for_count

    n_part = partitions_for_count(edges.count(), spark)
    m = (
        vertex_ids(edges, src, dst)
        .repartitionByRange(n_part, "id")
        .sortWithinPartitions("id")
        .withColumn("vid", F.monotonically_increasing_id())
    )
    if dict_path:
        m.write.mode("overwrite").parquet(dict_path)
        m = spark.read.parquet(dict_path)
    return m.persist(StorageLevel.MEMORY_AND_DISK)


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 10,
    num_partitions: int | None = None,
    checkpoint=None,
    resume: bool = False,
    weight_col: str | None = None,
    encode_ids: bool = False,
) -> LPAResult:
    """encode_ids: run the loop over order-preserving integer vertex
    ids (module docstring) — labels decode to EXACTLY the uncoded run's.
    Off by default: the dictionary costs one extra |V| range shuffle,
    which only pays for itself once the per-superstep shuffle dominates
    (large graphs / many supersteps — the 100 TB configuration).

    weight_col: weighted votes — a vertex adopts the label with the
    LARGEST TOTAL EDGE WEIGHT among its neighbors (sum instead of
    count), ties still broken by minimum label. Symmetrization sums:
    undirected weight(a,b) = Σ w over both directed duplicates.
    Non-positive weights are dropped (they carry no vote). Same natural
    weight as weighted PageRank: the reference's dynamic_call_count
    totals — communities by observed interaction strength.

    Reproducibility (ADVICE r4): vote totals are summed as
    DECIMAL(28,9), not DOUBLE — decimal addition is exact and
    order-independent, so near-tied labels cannot flip between runs on
    partition-order-dependent FP summation. Weights are consequently
    quantized to 9 fractional digits on entry; weights differing only
    beyond 1e-9 compare equal (integer-valued weights — the natural
    dynamic_call_count case — are always exact)."""
    from graph_engine_spark.graph.adjacency import partitions_for_count

    spark = edges.sparkSession

    id_map = None
    owned_edges = None
    coded_verts = None
    if encode_ids:
        # the coded path makes several passes over the edge table (the
        # dictionary-sizing count, the vertex range sort, two coding
        # joins) — persist an unpersisted input for the build so
        # expensive caller lineage replays at most once (pagerank's
        # owned_edges pattern)
        if edges.storageLevel == StorageLevel.NONE:
            owned_edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
            edges = owned_edges
        id_map = _order_preserving_id_map(edges, src, dst, checkpoint, resume)
        id_map.count()  # materialize while the source lineage is warm
        wcols = [F.col(weight_col)] if weight_col is not None else []
        edges = (
            edges.select(F.col(src), F.col(dst), *wcols)
            .join(
                id_map.select(F.col("id").alias(src), F.col("vid").alias("_vs")),
                src,
            )
            .join(
                id_map.select(F.col("id").alias(dst), F.col("vid").alias("_vd")),
                dst,
            )
            .select(F.col("_vs").alias(src), F.col("_vd").alias(dst), *wcols)
        )
        # the coded vertex set IS the dictionary's vid column — the dict
        # was built from vertex_ids(edges) and the coding joins are
        # inner on every vertex, so projecting the (materialized) dict
        # avoids replaying the two coding joins + a distinct just to
        # recompute the same set inside the loop (round-6: the coded
        # arm ran 13 extra jobs per call, half of them this replay)
        coded_verts = id_map.select(F.col("vid").alias("id"))

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
        # decimal, not double: exact order-independent sums (docstring)
        d = edges.select(
            F.col(src).alias("a"),
            F.col(dst).alias("b"),
            F.col(weight_col).cast("decimal(28,9)").alias("w"),
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
        res = _label_propagation(
            edges, sym, src, dst, max_iter, checkpoint, resume,
            weighted=weight_col is not None,
            expected_id_type="bigint" if encode_ids else None,
            verts=coded_verts,
        )
    finally:
        loop_conf.restore()
        if owned_edges is not None:
            # the loop state is materialized — the build-scoped edge
            # cache can go
            owned_edges.unpersist()
    if id_map is not None:
        # decode BOTH columns — vid order == id order, so the decoded
        # labels are exactly the uncoded run's (module docstring)
        lab = res.labels
        out = (
            lab.join(
                id_map.select(F.col("vid").alias("id"), F.col("id").alias("_oid")),
                "id",
            )
            .join(
                id_map.select(
                    F.col("vid").alias("label"), F.col("id").alias("_olabel")
                ),
                "label",
            )
            .select(F.col("_oid").alias("id"), F.col("_olabel").alias("label"))
        )
        res = LPAResult(
            out, res.iterations, res.converged, res.round_seconds,
            res._owned + [id_map],
        )
    return res


def _label_propagation(
    edges, sym, src, dst, max_iter, checkpoint=None, resume=False, weighted=False,
    expected_id_type=None, verts=None,
) -> LPAResult:
    """verts: optional precomputed vertex-id frame (id) equal to
    vertex_ids(edges) — the encoded path passes the id dictionary's vid
    projection so the coding-join plan is not replayed for the set."""
    spark = edges.sparkSession
    if verts is None:
        verts = vertex_ids(edges, src, dst)
    verts = verts.persist(StorageLevel.MEMORY_AND_DISK)
    it, converged = 0, False
    labels = None
    if resume and checkpoint is not None:
        state = checkpoint.resume(spark, expected_id_type=expected_id_type)
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
    # Repartition the static symmetrized edge set by the vote-join key
    # ONCE (round-6): sym comes out of its distinct/groupBy partitioned
    # by (a, b), which does NOT satisfy the join's hashpartitioning(a)
    # requirement — without this, every superstep re-shuffled the whole
    # |E| edge set; now only the |V| label table moves per superstep
    # (the same static-side discipline as pagerank's CSR adjacency).
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sym_a = sym.repartition(n_part, "a").persist(StorageLevel.MEMORY_AND_DISK)
    sym_a.count()
    rounds: list[float] = []
    while it < max_iter:
        _t0 = time.time()
        stepped = _lpa_round_body(sym_a, labels, weighted).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        # ONE action per superstep (round-6 fusion — the old
        # filter+limit(1) probe was a second job and left the cache
        # partially materialized): the aggregate materializes the
        # stepped frame and counts the changed labels
        changed = stepped.agg(
            F.count(F.when(F.col("label") != F.col("_prev"), 1)).alias("c")
        ).collect()[0]["c"]
        if labels_cached is not None:
            labels_cached.unpersist()
        labels = stepped.drop("_prev")
        labels_cached = stepped
        it += 1
        rounds.append(time.time() - _t0)
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
    sym_a.unpersist()
    sym.unpersist()
    verts.unpersist()
    # the persisted handle backing the returned labels is labels_cached
    # (None when the state lives in localCheckpoint blocks) — owned so
    # release() actually frees it (unpersist through .drop is a no-op)
    return LPAResult(
        labels, it, converged, rounds,
        [f for f in (labels_cached,) if f is not None],
    )


def _lpa_round_body(sym_a: DataFrame, labels: DataFrame, weighted: bool) -> DataFrame:
    """One fused LPA superstep: (id, _prev, label).

    Argmax via min_by over the (-cnt, label) struct (round-6): votes
    rows are unique per (id, label), so the ordering key is unique and
    min_by is deterministic — exactly the old row_number window's
    (cnt desc, label asc) pick, as a hash aggregation instead of a
    per-superstep sort. shuffle_hash hints: with broadcasts disabled
    the planner would otherwise degrade both joins to sort-merge (see
    pagerank.py's superstep note)."""
    votes = (
        sym_a.join(labels.hint("shuffle_hash"), sym_a.a == labels.id)
        .groupBy(F.col("b").alias("id"), "label")
        .agg((F.sum("w") if weighted else F.count("*")).alias("cnt"))
    )
    best = votes.groupBy("id").agg(
        F.min_by(
            "label", F.struct((-F.col("cnt")).alias("c"), F.col("label").alias("l"))
        ).alias("new_label")
    )
    # fused step: the old label rides along as _prev, so change
    # detection reads THIS frame (no second |V| join)
    return labels.join(best.hint("shuffle_hash"), "id", "left").select(
        "id",
        F.col("label").alias("_prev"),
        F.coalesce("new_label", "label").alias("label"),
    )
