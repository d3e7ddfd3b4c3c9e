"""Bounded traversals over the edge table: k-hop BFS and k-core.

Two classic link-graph operators the reference's query surface implies
but never generalizes (its 1-hop/2-hop scans — graph_core/graph.py
neighbor lookups — are the k=1/k=2 special cases of BFS here):

- ``bfs_k_hops``: multi-source shortest hop-distance, bounded at k.
  Frontier-at-a-time BFS as DataFrame joins — each round shuffles ONLY
  the current frontier against the adjacency (the edge side stays
  hash-partitioned by join key for the whole run, so every round reuses
  the same Exchange), then one anti-join against the visited set. This
  is the "transitive imports up to depth k" query a code graph answers
  constantly; at 10^12-file scale the frontier is tiny relative to the
  edge table, which is exactly the asymmetry this plan exploits.

- ``k_core``: iterative degree peeling (Matula–Beck coreness, the
  distributed round-synchronous variant): drop every vertex with
  undirected degree < k, recompute, repeat to fixpoint. Each round is
  one degree aggregation + two semi-joins — all shuffles keyed on the
  vertex id, so AQE coalesces them as the surviving subgraph shrinks.
  Peel rounds are bounded by the cascade depth, not the diameter.

Both loops follow the house discipline of pagerank/components/lpa:
persisted-handle ownership (the frame that OWNS the cache entry is
tracked explicitly; unpersist through a re-rooted frame is a no-op),
localCheckpoint lineage truncation every 2 rounds, `_IterLoopConf`
shuffle sizing, and a ``release()`` on the result that frees every
cache entry the run created. Results are exact and deterministic —
pure set/min/count semantics, no floats — so they hash-match a SQL
oracle bit-for-bit.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graph_engine_spark.graph.adjacency import partitions_for_count
from graph_engine_spark.graph.pagerank import _IterLoopConf


@dataclass
class BFSResult:
    distances: DataFrame  # (id, dist) — min hops from the source set
    hops: int  # rounds actually executed
    frontier_exhausted: bool  # True: every reachable vertex was visited
    round_seconds: list = field(default_factory=list)
    _owned: list = field(default_factory=list, repr=False)

    def release(self) -> None:
        """Unpersist the distances frame and the loop's surviving cache
        entries. The frame stays valid but replays truncated lineage on
        next evaluation — materialize first (collect / write /
        localCheckpoint), then release."""
        self.distances.unpersist()
        for df in self._owned:
            df.unpersist()


@dataclass
class KCoreResult:
    vertices: DataFrame  # (id, core_deg) — degree within the k-core
    k: int
    iterations: int  # peel rounds executed
    converged: bool
    round_seconds: list = field(default_factory=list)
    _owned: list = field(default_factory=list, repr=False)

    def release(self) -> None:
        """Same contract as BFSResult.release()."""
        self.vertices.unpersist()
        for df in self._owned:
            df.unpersist()


def bfs_k_hops(
    edges: DataFrame,
    sources,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 3,
    direction: str = "out",
    num_partitions: int | None = None,
) -> BFSResult:
    """Shortest hop-distance from a source set, bounded at ``max_hops``.

    sources: a list of vertex ids (cast to the edge key's type) or a
    DataFrame with an ``id`` column. direction: "out" follows edges
    src→dst, "in" follows them reversed, "both" treats the graph as
    undirected.

    Returns (id, dist) for every vertex reachable within max_hops,
    INCLUDING the sources at dist 0 (a source is always its own
    0-neighborhood, even when it never appears in the edge table —
    matching the reference's neighbor scans, which look up the node
    first and the edges second). dist is the true minimum because the
    traversal is level-synchronous: a vertex enters `visited` the first
    round it is reachable, and later sightings are anti-joined away.

    Scale shape: the adjacency is repartitioned by the join key ONCE
    and persisted; each round's frontier join reuses that partitioning
    (the frontier side — small — is the only per-round shuffle). The
    anti-join against visited shuffles |visited| once per round; at
    bounded k that set is the k-neighborhood, not the graph.
    """
    spark = edges.sparkSession
    if direction not in ("out", "in", "both"):
        raise ValueError(f"direction must be out|in|both, got {direction!r}")

    if isinstance(sources, DataFrame):
        src_df = sources.select("id").distinct()
    else:
        key_type = dict(edges.dtypes)[src]
        src_df = spark.createDataFrame(
            [(s,) for s in sources], f"id {key_type}"
        ).distinct()

    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    rev = edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    if direction == "out":
        adj = fwd
    elif direction == "in":
        adj = rev
    else:
        adj = fwd.unionByName(rev)
    adj = adj.filter(F.col("u") != F.col("v")).distinct()

    if num_partitions is None:
        num_partitions = partitions_for_count(edges.count(), spark)
    loop_conf = _IterLoopConf(spark, num_partitions)
    try:
        adj = adj.repartition(num_partitions, "u").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        adj.count()

        frontier = src_df.persist(StorageLevel.MEMORY_AND_DISK)
        frontier.count()
        visited = frontier.select("id", F.lit(0).alias("dist")).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        visited.count()
        # handles that OWN the current cache entries (see pagerank.py's
        # ranks_cached note: re-rooted frames make unpersist a no-op)
        visited_cached = visited
        frontier_cached = frontier

        hop = 0
        exhausted = False
        rounds: list[float] = []
        while hop < max_hops:
            t0 = time.time()
            # shuffle_hash hints: under the loop conf broadcasts are off,
            # which also disables the planner's own shuffled-hash
            # selection (canBuildLocalHashMap keys off the broadcast
            # threshold) — without the hints both joins degrade to
            # sort-merge and re-SORT the cached adjacency/visited set
            # every round (see pagerank.py's superstep join note;
            # guarded by tests/test_plan_shapes.py)
            nxt = (
                adj.join(
                    frontier.withColumnRenamed("id", "u").hint("shuffle_hash"),
                    "u",
                )
                .select(F.col("v").alias("id"))
                .distinct()
                .join(visited.hint("shuffle_hash"), "id", "left_anti")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            n_new = nxt.count()
            hop += 1
            if n_new == 0:
                nxt.unpersist()
                rounds.append(time.time() - t0)
                exhausted = True
                hop -= 1  # the empty round discovered nothing
                break
            new_visited = visited.unionByName(
                nxt.select("id", F.lit(hop).alias("dist"))
            ).persist(StorageLevel.MEMORY_AND_DISK)
            new_visited.count()
            if visited_cached is not None:
                visited_cached.unpersist()
            frontier_cached.unpersist()
            visited, visited_cached = new_visited, new_visited
            frontier, frontier_cached = nxt, nxt
            if hop % 2 == 0 and hop < max_hops:
                # truncate the union-per-round lineage
                visited = visited.localCheckpoint(eager=True)
                visited_cached.unpersist()
                visited_cached = None
            rounds.append(time.time() - t0)

        adj.unpersist()
        if frontier_cached is not None and frontier_cached is not visited_cached:
            frontier_cached.unpersist()
        owned = [f for f in (visited_cached,) if f is not None]
        return BFSResult(visited, hop, exhausted, rounds, owned)
    finally:
        loop_conf.restore()


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    num_partitions: int | None = None,
) -> KCoreResult:
    """Vertices of the k-core (maximal subgraph with min degree ≥ k)
    of the undirected simple graph under the edge table, with each
    survivor's degree inside the core.

    One peel round = degree agg + two semi-joins, all keyed on the
    vertex id. Converged when a round removes no edge; rounds are
    bounded by the peeling cascade depth (a chain hanging off the core
    peels one vertex per round — the pathological case — while bulk
    low-degree mass disappears in round one).
    """
    spark = edges.sparkSession
    base = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    und = base.unionByName(base.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()

    if num_partitions is None:
        num_partitions = partitions_for_count(edges.count(), spark)
    loop_conf = _IterLoopConf(spark, num_partitions)
    try:
        und = und.repartition(num_partitions, "u").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        n_edges = und.count()
        und_cached = und

        it = 0
        converged = False
        rounds: list[float] = []
        while it < max_iter:
            t0 = time.time()
            keep = (
                und.groupBy("u")
                .agg(F.count("*").alias("d"))
                .filter(F.col("d") >= k)
                .select("u")
            )
            # shuffle_hash on the (shrinking) keep side — same planner
            # gap as the BFS joins above: hintless semi-joins under the
            # loop conf re-sort the cached edge set every peel round
            pruned = (
                und.join(keep.hint("shuffle_hash"), "u", "left_semi")
                .join(
                    keep.withColumnRenamed("u", "v").hint("shuffle_hash"),
                    "v",
                    "left_semi",
                )
                .select("u", "v")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            n2 = pruned.count()
            it += 1
            changed = n2 != n_edges
            n_edges = n2
            if und_cached is not None:
                und_cached.unpersist()
            und, und_cached = pruned, pruned
            if it % 2 == 0 and changed:
                und = und.localCheckpoint(eager=True)
                und_cached.unpersist()
                und_cached = None
            rounds.append(time.time() - t0)
            if not changed:
                converged = True
                break

        out = (
            und.groupBy("u")
            .agg(F.count("*").alias("core_deg"))
            .select(F.col("u").alias("id"), "core_deg")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        out.count()
        if und_cached is not None:
            und_cached.unpersist()
        return KCoreResult(out, k, it, converged, rounds, [])
    finally:
        loop_conf.restore()
