"""PageRank as iterative DataFrame joins — the north-rule headline.

Semantics: standard damped PageRank with uniform teleport and dangling-
mass redistribution; converges on L1 delta < tol (same contract as
``networkx.pagerank(alpha=d, tol=tol)``, the oracle library the
reference repo itself depends on — reference requirements.txt:20).

Superstep design (SURVEY.md §4) — ONE Spark action per superstep:
  1. contributions: ranks ⋈ adjacency (inner equi-join against the
     static, pre-hash-partitioned CSR adjacency — only the rank side
     shuffles per iteration), then ``explode(dsts)`` with
     contrib = rank / out_deg;
  2. optional degree-TARGETED hub salting: only dsts whose in-degree
     exceeds ``salt_degree_threshold`` are spread over salt buckets in a
     two-stage aggregation ``groupBy(dst, salt) → groupBy(dst)``; all
     other keys keep salt 0, so the second-stage shuffle moves only
     already-aggregated rows. Salting every key (round-1 form) measured
     3× slower than unsalted — map-side partial aggregation already
     bounds reducer fan-in to ≤ num_map_partitions rows per key, so the
     knob defaults OFF and exists for the regime where hub in-degree
     per map partition overwhelms the partial hash agg into spilling;
  3. dangling mass: rank mass on vertices with no out-edges must be
     redistributed uniformly. Computing it needs an aggregate over the
     *current* ranks — instead of a separate job, the delta aggregation
     of superstep t also returns the dangling mass of ranks_{t+1}
     (the rank table carries a precomputed ``dangling`` flag), so
     superstep t+1 starts with its dangling mass already known. The
     first mass is analytic: |dangling| / N.
  4. new rank = (1-d)/N + d·(contrib_sum + dangling/N) joined onto the
     CURRENT rank table (left join keeps zero-in-degree vertices; the
     rank table holds every vertex, so it is the same row set as the
     static vertex table) — and because the join base is the rank table,
     the OLD rank rides along in a ``_prev`` column;
  5. one action: agg(L1 delta, next dangling mass) over that same
     stepped frame. Round-4 change: the previous shape built new ranks
     from the static vertex table and then joined new⋈old a SECOND
     time for the delta — one extra |V| hash join per superstep that
     the ``_prev`` carry makes unnecessary. Checkpoint every k
     supersteps via CheckpointManager with manifest metrics (resume
     mid-iteration).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graph_engine_spark.graph.adjacency import (
    auto_partitions,
    build_adjacency,
    build_weighted_adjacency,
    vertices,
)
from graph_engine_spark.graph.checkpoint import CheckpointManager


class _IterLoopConf:
    """Session conf tuned for an iterative superstep loop, restored on
    exit. Measured on the sandbox (10k-vertex hub graph, local[8]):
    median superstep 4.0s (AQE + sort-merge) → 0.6s with static
    planning + shuffled hash join.

      * AQE off: identical static plan every superstep → the cached
        adjacency's hash partitioning is reused; no per-job re-planning.
      * preferSortMergeJoin=false + the explicit shuffle_hash hint at
        the join site: with broadcasts disabled the planner's own
        shuffled-hash selection is also disabled (canBuildLocalHashMap
        keys off the broadcast threshold), so without the hint every
        superstep silently re-sorts the static adjacency under a
        sort-merge join.
      * shuffle partitions pinned to the adjacency's partition count so
        every superstep's exchanges align with the cached layout.

    Skew inside the loop is handled explicitly (salting), not by AQE.
    """

    _KEYS = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.join.preferSortMergeJoin": "false",
        # per-superstep driver broadcasts cost more than the shuffled
        # hash join they replace (measured ~3x superstep latency); the
        # rank table is never broadcast-sized at target scale anyway
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }

    def __init__(self, spark, num_partitions: int):
        self.spark = spark
        self.saved = {k: spark.conf.get(k) for k in self._KEYS}
        self.saved["spark.sql.shuffle.partitions"] = spark.conf.get(
            "spark.sql.shuffle.partitions"
        )
        for k, v in self._KEYS.items():
            spark.conf.set(k, v)
        spark.conf.set("spark.sql.shuffle.partitions", str(num_partitions))

    def restore(self):
        for k, v in self.saved.items():
            self.spark.conf.set(k, v)


@dataclass
class PageRankResult:
    ranks: DataFrame  # (id, rank)
    iterations: int
    delta: float
    converged: bool
    superstep_seconds: list = field(default_factory=list)
    delta_history: list = field(default_factory=list)  # L1 delta per superstep
    # cache entries this run owns beyond the ranks frame (the encode-
    # path id dictionary and the persisted rank table the decoded plan
    # reads) — same release() contract as ComponentsResult/LPAResult
    _owned: list = field(default_factory=list, repr=False)

    def release(self) -> None:
        """Unpersist the ranks frame and the internal frames its plan
        joins (rank table, id dictionary). The frame stays valid but
        replays truncated lineage on next evaluation — materialize
        first (collect / write / localCheckpoint), then release."""
        self.ranks.unpersist()
        for df in self._owned:
            df.unpersist()


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    num_partitions: int | None = None,
    salt_buckets: int = 0,
    salt_degree_threshold: int = 10_000,
    checkpoint: CheckpointManager | None = None,
    resume: bool = False,
    lineage_every: int = 2,
    max_out_degree: int | None = None,
    encode_ids: bool = True,
    weight_col: str | None = None,
    personalization=None,
) -> PageRankResult:
    """PageRank over an (src, dst) edge table. Ranks sum to 1.

    personalization: seeded teleport (personalized PageRank) — a list of
    vertex ids (equal weight), a dict {id: weight}, or a DataFrame
    (id, weight). Teleport and dangling mass go to the seed
    distribution instead of uniformly (networkx.pagerank
    `personalization=` semantics: seeds absent from the graph are
    dropped before normalization; zero surviving mass raises). This is
    the "importance relative to THIS file/module" query a code graph
    answers for relatedness ranking. Cost: the per-vertex teleport
    weight rides the rank table as one extra double column — the
    uniform path is untouched and pays nothing. Combines freely with
    weight_col, salting, and checkpoint/resume (the weight column is
    checkpointed with the state; resuming a personalized checkpoint
    without `personalization`, or vice versa, fails fast).

    weight_col: edge-weighted variant — each vertex distributes its
    rank proportionally to outgoing edge weights instead of uniformly
    (contribution = rank × w/Σw, pre-normalized at adjacency build;
    see adjacency.build_weighted_adjacency). Non-positive weights are
    dropped. The natural weight in this engine is the reference's
    ``dynamic_call_count`` running totals on call edges
    (manager.py:180-215, carried by ``streaming.merge_dynamic_calls``):
    centrality by OBSERVED call frequency rather than static structure.
    Loop shape, salting, checkpoints, and convergence are identical to
    the unweighted path.

    encode_ids: dictionary-encode string vertex ids to 64-bit integers
    (xxhash64) for the duration of the loop, decoding on the way out.
    String keys dominate superstep cost at scale — every shuffled row
    carries the id bytes and every exchange hashes them — so integer
    coding cuts shuffle volume and memory bandwidth several-fold
    (measured ~2× per-superstep on a 20M-edge graph at local[32]); it
    is what every production graph engine does. xxhash64 keeps the
    coding deterministic across runs (checkpoint/resume-safe).
    Collision odds are birthday-bounded (~n²/2⁶⁵: negligible through
    ~10^9 vertices); beyond that, swap the hash for a persisted dense
    zipWithIndex dictionary — the loop is unchanged.
    """
    spark = edges.sparkSession
    owned_edges = None
    # The graph build makes several passes over the edge table (vertex
    # dictionary, adjacency degree probe + agg, dangling flags) — and
    # the sizing branch adds a count. Persist for the build regardless
    # of whether the caller sized the loop explicitly, so upstream
    # lineage (extract pipelines are expensive) is replayed at most
    # once, not once per pass.
    if edges.storageLevel == StorageLevel.NONE:
        owned_edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
        edges = owned_edges
    if num_partitions is None:
        # size the loop to the graph, not the session default: on small
        # graphs per-task scheduling dominates (measured 11 s → 0.5 s per
        # superstep on a 60k-edge graph); at cluster scale callers pass
        # an explicit count matched to executor cores.
        num_partitions = auto_partitions(edges)
    loop_conf = _IterLoopConf(spark, num_partitions)

    key_type = dict(edges.dtypes)["src"]  # pre-encoding seed-id type
    id_map = None
    if encode_ids:
        id_map = (
            vertices(edges)
            .select("id", F.xxhash64("id").alias("vid"))
            .repartition(num_partitions, "vid")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        edges = edges.select(
            F.xxhash64("src").alias("src"),
            F.xxhash64("dst").alias("dst"),
            *([F.col(weight_col).alias(weight_col)] if weight_col else []),
        )

    adj_kwargs = {} if max_out_degree is None else {"max_out_degree": max_out_degree}
    if weight_col is not None:
        adj = build_weighted_adjacency(
            edges, num_partitions, weight_col, **adj_kwargs
        )
    else:
        adj = build_adjacency(edges, num_partitions, **adj_kwargs)
    verts = (
        vertices(edges)
        # distinct: hub adjacency is chunked into multiple rows per src
        # (out-degree cap) — the dangling flag must stay one row per id
        .join(
            adj.select(F.col("src").alias("id")).distinct()
            .withColumn("dangling", F.lit(False)),
            "id",
            "left",
        )
        .select("id", F.coalesce("dangling", F.lit(True)).alias("dangling"))
        .repartition(num_partitions, "id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if id_map is not None:
        # materialize the dictionary while the source edge cache is warm
        # (the final decode join replays this cache, not the upstream)
        id_map.count()
    counts = verts.agg(
        F.count("*").alias("n"),
        F.sum(F.col("dangling").cast("long")).alias("nd"),
    ).collect()[0]
    n, n_dangling = counts["n"], counts["nd"]
    if n == 0:
        loop_conf.restore()
        if owned_edges is not None:
            owned_edges.unpersist()
        adj.unpersist()  # empty result reads verts/id_map only
        empty = (
            id_map.select("id", F.lit(0.0).alias("rank"))
            if id_map is not None
            else verts.select("id", F.lit(0.0).alias("rank"))
        )
        return PageRankResult(
            empty, 0, 0.0, True, [], [],
            [f for f in (verts, id_map) if f is not None],
        )

    # Degree-TARGETED salting: only dsts whose in-degree exceeds the
    # threshold are spread over salt buckets; every other key keeps the
    # single-stage aggregation. (Salting every key — the round-1 knob —
    # measured 3× SLOWER than unsalted: it pays a full extra shuffle to
    # duplicate what map-side partial aggregation already does. Partial
    # agg bounds any reducer's fan-in to ≤ num_map_partitions rows per
    # key, so sum-shaped supersteps only need salting when hub in-degree
    # per map partition overwhelms the partial hash agg into spilling.)
    hubs_df = None
    hub_salts = None
    if salt_buckets > 1:
        hubs_df = (
            edges.groupBy(F.col("dst").alias("id"))
            .agg(F.count("*").alias("in_deg"))
            .filter(F.col("in_deg") >= salt_degree_threshold)
            .select("id", F.lit(True).alias("_is_hub"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        if hubs_df.count() > 0:
            hub_salts = F.broadcast(hubs_df)
        # else: nothing skewed enough — stay single-stage

    def _abort() -> None:
        # fail-fast paths must not leak the loop-tuned session conf or
        # the build caches
        adj.unpersist()
        verts.unpersist()
        if hubs_df is not None:
            hubs_df.unpersist()
        if owned_edges is not None:
            owned_edges.unpersist()
        if id_map is not None:
            id_map.unpersist()
        loop_conf.restore()

    pers = None
    if personalization is not None:
        if isinstance(personalization, DataFrame):
            p_raw = personalization.select(
                "id",
                F.col(personalization.columns[1]).cast("double").alias("_pw"),
            )
        elif isinstance(personalization, dict):
            p_raw = spark.createDataFrame(
                [(k, float(v)) for k, v in personalization.items()],
                f"id {key_type}, _pw double",
            )
        else:
            p_raw = spark.createDataFrame(
                [(s, 1.0) for s in personalization], f"id {key_type}, _pw double"
            )
        if id_map is not None:
            p_raw = p_raw.select(F.xxhash64("id").alias("id"), "_pw")
        # networkx semantics: seeds absent from the graph are dropped
        # BEFORE normalization; duplicate seed rows merge additively
        present = (
            p_raw.join(verts.select("id"), "id", "left_semi")
            .groupBy("id")
            .agg(F.sum("_pw").alias("_pw"))
        )
        total = present.agg(F.sum("_pw")).collect()[0][0]
        if total is None or total <= 0.0:
            _abort()
            raise ValueError(
                "personalization has no positive mass on graph vertices"
            )
        pers = present.select(
            "id", (F.col("_pw") / F.lit(float(total))).alias("_p")
        )

    start_iter = 0
    if pers is not None:
        ranks = verts.join(pers, "id", "left").select(
            "id",
            "dangling",
            F.coalesce("_p", F.lit(0.0)).alias("_p"),
            F.lit(1.0 / n).alias("rank"),
        )
    else:
        ranks = verts.select("id", "dangling", F.lit(1.0 / n).alias("rank"))
    dangling_mass = n_dangling / n
    if resume and checkpoint is not None:
        try:
            state = checkpoint.resume(
                spark, expected_id_type="bigint" if encode_ids else "string"
            )
        except Exception:
            _abort()
            raise
        if state is not None:
            start_iter, ranks, metrics = state
            dangling_mass = metrics["dangling_mass"]
            if ("_p" in ranks.columns) != (pers is not None):
                _abort()
                raise ValueError(
                    "checkpoint personalization mismatch: state "
                    + ("carries" if "_p" in ranks.columns else "lacks")
                    + " a teleport column but personalization is "
                    + ("unset" if pers is None else "set")
                    + " — resume with the original arguments"
                )
    ranks = ranks.persist(StorageLevel.MEMORY_AND_DISK)
    # the handle that OWNS the current rank table's SQL cache entry.
    # When the loop state is re-rooted (localCheckpoint / durable
    # checkpoint), the replacement frame has a different logical plan,
    # so unpersist() through the replacement is a silent no-op and the
    # superseded entry would sit in the CacheManager forever (one
    # orphaned |V| entry per truncation — measured 12 stray entries
    # after a 13-superstep run). Tracking the owning handle explicitly
    # lets every re-root release its predecessor deterministically.
    ranks_cached = ranks

    delta = float("inf")
    supersteps: list[float] = []
    deltas: list[float] = []
    it = start_iter
    base = (1.0 - damping) / n
    while it < max_iter and delta > tol:
        t0 = time.time()
        # shuffle_hash hint: with broadcasts disabled (threshold -1) the
        # planner can no longer select a shuffled hash join on its own —
        # canBuildLocalHashMap is tied to the broadcast threshold — and
        # silently degrades to sort-merge, re-SORTING the static cached
        # adjacency every superstep. The hint restores SHJ with ranks as
        # the build side (guarded by tests/test_plan_shapes.py).
        if weight_col is not None:
            # weighted: frac is pre-normalized at build, so the step is
            # the same single explode — rank × frac, no per-step divide
            contribs = (
                ranks.hint("shuffle_hash")
                .join(adj, ranks.id == adj.src, "inner")
                .select(F.explode("nbrs").alias("_nb"), "rank")
                .select(
                    F.col("_nb.dst").alias("id"),
                    (F.col("rank") * F.col("_nb.frac")).alias("contrib"),
                )
            )
        else:
            contribs = ranks.hint("shuffle_hash").join(adj, ranks.id == adj.src, "inner").select(
                F.explode("dsts").alias("id"),
                (F.col("rank") / F.col("out_deg")).alias("contrib"),
            )
        if hub_salts is not None:
            # hub keys get a per-map-partition salt so the first-stage
            # exchange spreads them over `salt_buckets` reducers; every
            # non-hub key keeps salt 0 → exactly one first-stage row, so
            # the second-stage shuffle moves ~|V| + buckets·|hubs|
            # already-aggregated rows (tiny next to the contribution
            # volume), not a second full pass over |E|.
            contribs = (
                contribs.join(hub_salts, "id", "left")
                .groupBy(
                    "id",
                    F.when(
                        F.col("_is_hub").isNotNull(),
                        F.pmod(F.spark_partition_id(), F.lit(salt_buckets)),
                    )
                    .otherwise(F.lit(0))
                    .alias("_salt"),
                )
                .agg(F.sum("contrib").alias("contrib"))
                .groupBy("id")
                .agg(F.sum("contrib").alias("contrib"))
            )
        else:
            contribs = contribs.groupBy("id").agg(F.sum("contrib").alias("contrib"))

        # Fused step: join contributions back onto the CURRENT rank
        # table (same row set as verts — every vertex is present, with
        # its dangling flag), so the old rank rides along as `_prev`
        # and the delta aggregation below reads THIS frame instead of
        # re-joining new⋈old (docstring step 4-5). shuffle_hash hint on
        # the contribs (build) side: without it this left join planned
        # as sort-merge, re-SORTING both |V| sides every superstep
        # (same planner gap as the adjacency join above — with
        # broadcasts disabled the planner never selects SHJ unaided).
        if pers is not None:
            # personalized: teleport AND dangling mass follow the seed
            # distribution (_p rides the rank table — no extra join)
            new_rank = (
                F.lit(1.0 - damping) * F.col("_p")
                + F.lit(damping)
                * (
                    F.coalesce(F.col("contrib"), F.lit(0.0))
                    + F.lit(dangling_mass) * F.col("_p")
                )
            )
            carry = ["id", "dangling", "_p"]
        else:
            new_rank = F.lit(base) + F.lit(damping) * (
                F.coalesce(F.col("contrib"), F.lit(0.0))
                + F.lit(dangling_mass / n)
            )
            carry = ["id", "dangling"]
        stepped = (
            ranks.join(contribs.hint("shuffle_hash"), "id", "left")
            .select(
                *carry,
                F.col("rank").alias("_prev"),
                new_rank.alias("rank"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # single action: L1 delta + next superstep's dangling mass
        row = stepped.agg(
            F.sum(F.abs(F.col("rank") - F.col("_prev"))).alias("delta"),
            F.sum(F.when(F.col("dangling"), F.col("rank")).otherwise(0.0)).alias("dm"),
        ).collect()[0]
        delta, dangling_mass = float(row["delta"]), float(row["dm"] or 0.0)
        deltas.append(delta)
        if ranks_cached is not None:
            ranks_cached.unpersist()
        ranks = stepped.drop("_prev")
        ranks_cached = stepped
        it += 1
        supersteps.append(time.time() - t0)
        if checkpoint is not None and checkpoint.should_checkpoint(it):
            ranks = checkpoint.save(
                ranks,
                it,
                {
                    "delta": delta,
                    "dangling_mass": dangling_mass,
                    "superstep_seconds": supersteps[-1],
                },
            ).persist(StorageLevel.MEMORY_AND_DISK)
            # state is re-rooted on Parquet — release the in-memory step
            ranks_cached.unpersist()
            ranks_cached = ranks
        elif it % lineage_every == 0:
            # Truncate the logical plan. Each superstep references the
            # previous rank table TWICE (new-rank build + delta join), so
            # the un-truncated logical plan DOUBLES per superstep and
            # Catalyst analysis cost grows exponentially in the depth
            # since the last truncation (measured on a 6k-edge graph:
            # cadence 8 → 62s for 20 supersteps with 3-11s late steps;
            # cadence 2 → 10.7s flat ~0.45s/step; cadence 1 pays
            # localCheckpoint overhead every step for no analysis win).
            # localCheckpoint rewrites the plan to a LogicalRDD leaf; the
            # durable variant above does the same via Parquet when a
            # CheckpointManager is active.
            ranks = ranks.localCheckpoint(eager=True)
            # eager=True has materialized the checkpoint blocks — the
            # superseded SQL cache entry can be released (see
            # ranks_cached note above)
            ranks_cached.unpersist()
            ranks_cached = None

    adj.unpersist()
    verts.unpersist()
    if hubs_df is not None:
        hubs_df.unpersist()
    if owned_edges is not None:
        owned_edges.unpersist()
    loop_conf.restore()
    if id_map is not None:
        # decode: internal vids → original string ids (id_map stays
        # persisted — the returned plan references it, same lifetime
        # contract as the persisted rank table itself)
        final = ranks.join(id_map, ranks.id == id_map.vid).select(
            id_map.id, ranks.rank
        )
    else:
        final = ranks.select("id", "rank")
    # the persisted handle is ranks_cached, NOT the returned/derived
    # frame (unpersist through a .drop/.select re-root is a no-op);
    # None when the final state lives in localCheckpoint blocks
    owned = [f for f in (ranks_cached, id_map) if f is not None]
    return PageRankResult(
        final, it, float(delta), delta <= tol, supersteps, deltas, owned
    )
