"""Bounded traversals over the edge table: k-hop BFS, k-core, SSSP.

Classic link-graph operators the reference's query surface implies
but never generalizes (its 1-hop/2-hop adjacency scans —
graph_core/storage/in_memory.py:191 get_edges_for_nodes and the
2-hop walk composed from it — are the k=1/k=2 special cases of BFS
here, and BFS itself is the unit-weight special case of SSSP):

- ``bfs_k_hops``: multi-source shortest hop-distance, bounded at k.
  Frontier-at-a-time BFS as DataFrame joins — each round shuffles ONLY
  the current frontier against the adjacency (the edge side stays
  hash-partitioned by join key for the whole run, so every round reuses
  the same Exchange), then one anti-join against the visited set. This
  is the "transitive imports up to depth k" query a code graph answers
  constantly; at 10^12-file scale the frontier is tiny relative to the
  edge table, which is exactly the asymmetry this plan exploits.

- ``sssp``: multi-source single-source-shortest-paths by frontier
  Bellman–Ford relaxation — the weighted generalization of
  ``bfs_k_hops`` (edge weights from e.g. the reference's
  ``dynamic_call_count`` annotations turn "how many hops" into "how
  hot is the cheapest call chain"). Each round relaxes only the
  vertices whose distance improved last round against the persisted
  adjacency, so the per-round shuffle is the improving frontier, not
  the graph; converged means exact shortest distances (non-negative
  weights are enforced).

- ``cyclic_core``: circular-import detection by bidirectional trimming
  (the FW-BW "trim" step of distributed SCC algorithms, run to
  fixpoint): repeatedly delete every vertex with in-degree 0 OR
  out-degree 0. The survivor set is EMPTY iff the graph is a DAG, and
  otherwise contains every directed cycle (plus any bridge vertices
  lying on cycle-to-cycle paths — a documented superset). "Does this
  codebase have circular imports, and roughly where" is one of the
  first questions asked of an import graph; the reference's surface
  can only answer it one 2-hop probe at a time.

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


@dataclass
class CyclicCoreResult:
    vertices: DataFrame  # (id, in_deg, out_deg) inside the cyclic core
    is_dag: bool  # True: the core is empty — no directed cycle exists
    iterations: int  # trim rounds executed
    converged: bool
    round_seconds: list = field(default_factory=list)
    _owned: list = field(default_factory=list, repr=False)

    def release(self) -> None:
        """Same contract as BFSResult.release()."""
        self.vertices.unpersist()
        for df in self._owned:
            df.unpersist()


def cyclic_core(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 100,
    num_partitions: int | None = None,
) -> CyclicCoreResult:
    """Maximal subgraph in which every vertex has in-degree ≥ 1 AND
    out-degree ≥ 1 — the fixpoint of deleting sources and sinks.

    Semantics (exact, set-theoretic, AT THE FIXPOINT): the result is
    empty iff the edge table is a DAG (every finite digraph whose
    vertices all have in-degree ≥ 1 contains a cycle); every vertex on
    a directed cycle survives; a non-cycle vertex survives only if it
    lies on a path from one cycle to another (the superset the
    docstring header documents — exact cycle membership needs SCCs,
    for which this trim is the standard distributed preprocessing
    step). Self-loops are KEPT: a self-import is a cycle of length 1.
    When max_iter is exhausted short of the fixpoint (converged=False)
    the survivors are a SUPERSET of the cyclic core and ``is_dag`` is
    reported False — an empty-or-not intermediate trim is not a DAG
    certificate (ADVICE r5 #2); survivors with a one-sided degree are
    zero-filled, never dropped.

    One trim round = one two-sided degree aggregation + two semi-joins,
    all keyed on the vertex id over the persisted, shrinking edge set —
    the same plan shape as ``k_core`` (whose peel discipline this
    follows), so the same scale argument applies: bulk acyclic mass
    (most of a sane import graph) disappears in the first rounds, and
    rounds are bounded by the longest chain hanging off a cycle.
    """
    spark = edges.sparkSession
    dg = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()

    if num_partitions is None:
        num_partitions = partitions_for_count(edges.count(), spark)
    loop_conf = _IterLoopConf(spark, num_partitions)
    try:
        dg = dg.repartition(num_partitions, "u").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        n_edges = dg.count()
        dg_cached = dg

        it = 0
        converged = False
        rounds: list[float] = []
        while it < max_iter and n_edges > 0:
            t0 = time.time()
            # survivors must emit AND receive at least one edge.
            # Hinted semi-join, not INTERSECT (ADVICE r5 #3): under the
            # loop conf (broadcasts off) INTERSECT plans as sort-merge
            # and re-sorts the cached edge set every trim round; the
            # semi-join of distinct tails against distinct heads is the
            # same set under shuffled hash.
            keep = (
                dg.select("u").distinct()
                .join(
                    dg.select(F.col("v").alias("u")).distinct().hint("shuffle_hash"),
                    "u",
                    "left_semi",
                )
            )
            # re-root EVERY round (round-6, the CC fix): one trim round
            # references dg ~5× (two keep distincts + the edge set
            # through two semi-joins), so un-truncated lineage grows
            # ~5× per round and a deep trim cascade pays Catalyst
            # analysis, not execution. The eager checkpoint IS the
            # round's materialization; the count over its blocks is
            # ~free.
            pruned = (
                dg.join(keep.hint("shuffle_hash"), "u", "left_semi")
                .join(
                    keep.withColumnRenamed("u", "v").hint("shuffle_hash"),
                    "v",
                    "left_semi",
                )
                .select("u", "v")
                .localCheckpoint(eager=True)
            )
            n2 = pruned.count()
            it += 1
            changed = n2 != n_edges
            n_edges = n2
            if dg_cached is not None:
                dg_cached.unpersist()
                dg_cached = None
            dg = pruned
            rounds.append(time.time() - t0)
            if not changed:
                converged = True
                break
        if n_edges == 0:
            converged = True

        out_d = dg.groupBy("u").agg(F.count("*").alias("out_deg"))
        in_d = (
            dg.groupBy(F.col("v").alias("u"))
            .agg(F.count("*").alias("in_deg"))
        )
        # full outer + zero-fill (ADVICE r5 #2): short of the fixpoint a
        # survivor can have only one of in/out degree — an inner join
        # silently dropped it. At fixpoint every survivor has both
        # degrees ≥ 1, so this is identical to the old inner join there.
        out = (
            out_d.join(in_d, "u", "full")
            .select(
                F.col("u").alias("id"),
                F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
                F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        n_core = out.count()
        if dg_cached is not None:
            dg_cached.unpersist()
        # is_dag is a DAG *certificate* — only a converged empty core
        # proves acyclicity (ADVICE r5 #2: an exhausted max_iter run
        # must not certify)
        return CyclicCoreResult(
            out, converged and n_core == 0, it, converged, rounds, []
        )
    finally:
        loop_conf.restore()


@dataclass
class SSSPResult:
    distances: DataFrame  # (id, dist) — min weighted distance from the source set
    rounds: int  # relaxation rounds that improved at least one vertex
    converged: bool  # True: a round improved nothing — distances are exact
    round_seconds: list = field(default_factory=list)
    _owned: list = field(default_factory=list, repr=False)

    def release(self) -> None:
        """Same contract as BFSResult.release()."""
        self.distances.unpersist()
        for df in self._owned:
            df.unpersist()


def sssp(
    edges: DataFrame,
    sources,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    max_rounds: int = 30,
    direction: str = "out",
    num_partitions: int | None = None,
) -> SSSPResult:
    """Minimum weighted distance from a source set (multi-source SSSP)
    by round-synchronous Bellman–Ford relaxation.

    sources: a list of vertex ids or a DataFrame with an ``id`` column
    (same contract as ``bfs_k_hops``). weight_col: edge weight column,
    cast to double; ``None`` means unit weights (= hop distance, BFS
    semantics but with re-relaxation — useful only for parity tests).
    Negative weights raise: bounded-round Bellman–Ford cannot certify
    them, and the "converged ⇒ exact" contract below would silently
    break on a negative cycle.

    Returns (id, dist) for every vertex whose best path from the
    sources uses at most ``max_rounds`` edges, sources included at
    dist 0. When ``converged`` is True the distances are THE shortest
    distances (a relaxation fixpoint with non-negative weights); when
    False they are exact over ≤max_rounds-edge paths — still a valid
    anytime answer for "cheapest call chain within depth k".

    Scale shape (same asymmetry as BFS, plus relaxation): parallel
    edges collapse to MIN(w) once at build; the adjacency is
    hash-partitioned by the join key once and persisted; each round
    shuffles the IMPROVING frontier (join), its candidates (min-agg on
    the same key the dists table is keyed on), and the improvement
    anti-join — all keyed on the vertex id, never the edge table. On a
    1000-executor run the frontier after the first rounds is a small
    fraction of |V| while the |E|-sized side never moves.
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

    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"), w.alias("w"))
    rev = edges.select(F.col(dst).alias("u"), F.col(src).alias("v"), w.alias("w"))
    if direction == "out":
        adj = fwd
    elif direction == "in":
        adj = rev
    else:
        adj = fwd.unionByName(rev)
    # parallel edges: only the cheapest can ever win a relaxation
    adj = (
        adj.filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
    )

    if num_partitions is None:
        num_partitions = partitions_for_count(edges.count(), spark)
    loop_conf = _IterLoopConf(spark, num_partitions)
    try:
        adj = adj.repartition(num_partitions, "u").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        adj.count()
        # fail fast on NULL/NaN weights too (ADVICE r5 #1): a NULL
        # weight survives min() and yields NULL candidate distances that
        # re-match `dist.isNull()` forever — the loop would burn
        # max_rounds and emit NULL dists, breaking 'converged ⇒ exact'
        bad = F.col("w").isNull() | F.isnan("w") | (F.col("w") < 0)
        if adj.filter(bad).limit(1).count() > 0:
            adj.unpersist()
            raise ValueError(
                "sssp requires non-negative, non-NULL edge weights "
                "(negative-cycle detection is out of contract; see "
                "docstring)"
            )

        dists = src_df.select("id", F.lit(0.0).alias("dist")).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        dists.count()
        frontier = dists  # round 0 relaxes out of the sources themselves
        stepped_cached: DataFrame | None = dists  # handle owning the cache

        rnd = 0
        converged = False
        rounds_t: list[float] = []
        while rnd < max_rounds:
            t0 = time.time()
            stepped = _sssp_round_body(adj, frontier, dists).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            # ONE action per round (round-6 fusion — was 2 actions + an
            # anti-join + union): the aggregate both materializes the
            # stepped cache and returns the improved-vertex count
            n_imp = stepped.agg(
                F.sum(F.col("_imp").cast("long")).alias("n")
            ).collect()[0]["n"] or 0
            if n_imp == 0:
                stepped.unpersist()
                rounds_t.append(time.time() - t0)
                converged = True
                break
            rnd += 1
            if stepped_cached is not None:
                stepped_cached.unpersist()
            stepped_cached = stepped
            if rnd % 2 == 0 and rnd < max_rounds:
                # truncate the per-round lineage; eager=True materializes
                # the checkpoint blocks so the superseded cache entry can
                # be released immediately
                stepped = stepped.localCheckpoint(eager=True)
                stepped_cached.unpersist()
                stepped_cached = None
            dists = stepped.drop("_imp")
            frontier = stepped.filter(F.col("_imp")).select("id", "dist")
            rounds_t.append(time.time() - t0)

        adj.unpersist()
        owned = [f for f in (stepped_cached,) if f is not None]
        return SSSPResult(dists, rnd, converged, rounds_t, owned)
    finally:
        loop_conf.restore()


def _sssp_round_body(adj: DataFrame, frontier: DataFrame, dists: DataFrame) -> DataFrame:
    """One fused Bellman–Ford relaxation round: (id, dist, _imp).

    Candidates = min over the frontier's out-edges; the old
    anti-join + union new-dists build is replaced by ONE full-outer
    shuffled-hash join of the dists table against the candidates —
    same row set (dists ∪ newly reached), half the joins, and the
    improved flag rides the frame so the convergence probe needs no
    second pass. shuffle_hash hints: under the loop conf broadcasts are
    off, which also disables the planner's own SHJ selection — hintless
    joins degrade to sort-merge and re-sort the cached adjacency/dists
    every round (guarded by tests/test_plan_shapes.py)."""
    cand = (
        adj.join(
            frontier.select(
                F.col("id").alias("u"), F.col("dist").alias("_du")
            ).hint("shuffle_hash"),
            "u",
        )
        .select("v", (F.col("_du") + F.col("w")).alias("_nd"))
        .groupBy("v")
        .agg(F.min("_nd").alias("_nd"))
        .select(F.col("v").alias("id"), "_nd")
    )
    imp = F.col("_nd").isNotNull() & (
        F.col("dist").isNull() | (F.col("_nd") < F.col("dist"))
    )
    return dists.join(cand.hint("shuffle_hash"), "id", "full").select(
        "id",
        F.when(imp, F.col("_nd")).otherwise(F.col("dist")).alias("dist"),
        imp.alias("_imp"),
    )


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

        visited = src_df.select("id", F.lit(0).alias("dist")).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        visited.count()
        frontier = visited.select("id")
        # handle that OWNS the current cache entry (see pagerank.py's
        # ranks_cached note: re-rooted frames make unpersist a no-op)
        stepped_cached: DataFrame | None = visited

        hop = 0
        exhausted = False
        rounds: list[float] = []
        while hop < max_hops:
            t0 = time.time()
            stepped = _bfs_round_body(adj, frontier, visited, hop + 1).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            # ONE action per round (round-6 fusion — was 2 actions + an
            # anti-join + union): the aggregate materializes the stepped
            # cache and returns the newly-discovered count
            n_new = stepped.agg(
                F.sum(F.col("_new").cast("long")).alias("n")
            ).collect()[0]["n"] or 0
            hop += 1
            if n_new == 0:
                stepped.unpersist()
                rounds.append(time.time() - t0)
                exhausted = True
                hop -= 1  # the empty round discovered nothing
                break
            if stepped_cached is not None:
                stepped_cached.unpersist()
            stepped_cached = stepped
            if hop % 2 == 0 and hop < max_hops:
                # truncate the per-round lineage (eager=True materializes
                # the checkpoint blocks; release the superseded cache)
                stepped = stepped.localCheckpoint(eager=True)
                stepped_cached.unpersist()
                stepped_cached = None
            visited = stepped.drop("_new")
            frontier = stepped.filter(F.col("_new")).select("id")
            rounds.append(time.time() - t0)

        adj.unpersist()
        owned = [f for f in (stepped_cached,) if f is not None and f is not visited]
        return BFSResult(visited, hop, exhausted, rounds, owned)
    finally:
        loop_conf.restore()


def _bfs_round_body(
    adj: DataFrame, frontier: DataFrame, visited: DataFrame, hop: int
) -> DataFrame:
    """One fused level-synchronous BFS round: (id, dist, _new).

    Neighbor candidates of the frontier are attached to the visited set
    with ONE full-outer shuffled-hash join — replacing the old
    anti-join + union (two |visited| passes per round) with a single
    one; rows absent from visited are the new hop-`hop` layer and carry
    the _new flag for the fused convergence probe. shuffle_hash hints:
    under the loop conf broadcasts are off, which also disables the
    planner's own SHJ selection — hintless joins degrade to sort-merge
    and re-sort the cached adjacency/visited set every round (guarded
    by tests/test_plan_shapes.py)."""
    cand = (
        adj.join(frontier.withColumnRenamed("id", "u").hint("shuffle_hash"), "u")
        .select(F.col("v").alias("id"))
        .distinct()
        .select("id", F.lit(True).alias("_c"))
    )
    new = F.col("_c").isNotNull() & F.col("dist").isNull()
    return visited.join(cand.hint("shuffle_hash"), "id", "full").select(
        "id",
        F.when(new, F.lit(hop)).otherwise(F.col("dist")).alias("dist"),
        new.alias("_new"),
    )


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
            # re-root EVERY round (round-6, the CC fix — see cyclic_core
            # above): keeps a deep peeling cascade's plan depth constant
            pruned = (
                und.join(keep.hint("shuffle_hash"), "u", "left_semi")
                .join(
                    keep.withColumnRenamed("u", "v").hint("shuffle_hash"),
                    "v",
                    "left_semi",
                )
                .select("u", "v")
                .localCheckpoint(eager=True)
            )
            n2 = pruned.count()
            it += 1
            changed = n2 != n_edges
            n_edges = n2
            if und_cached is not None:
                und_cached.unpersist()
                und_cached = None
            und = pruned
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
