"""Triangle counting by degree-ordered wedge join.

The standard scalable formulation (cf. Suri & Vassilvitskii, WWW'11):
orient each undirected edge from the endpoint with (degree, id) lower to
higher — every triangle is then counted exactly once, and the wedge join
fans out from low-degree vertices, bounding the work a hub contributes
to O(deg_hub) instead of O(deg_hub²) — the degree-ordering IS the skew
mitigation for hub files.

Spark shape: canonicalize (one projection + distinct), degree join,
self-join on the middle vertex (wedges), then a semi-ish inner join of
wedges against the oriented edge set to close triangles. All equi-joins;
AQE picks broadcast for the degree dim when small.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


@dataclass
class TriangleResult:
    total: int
    per_vertex: DataFrame  # (id, triangles)
    # cache entries this run owns (the materialized triangle table
    # behind per_vertex and the encode-path id dictionary) — same
    # release() contract as PageRankResult/ComponentsResult/LPAResult
    _owned: list = field(default_factory=list, repr=False)

    def release(self) -> None:
        """Unpersist the triangle table and id dictionary the
        per_vertex plan reads. The frame stays valid but replays its
        lineage on next evaluation — materialize first."""
        self.per_vertex.unpersist()
        for df in self._owned:
            df.unpersist()


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int | None = None,
    encode_ids: bool = True,
) -> TriangleResult:
    """Exact triangle count. num_partitions pins the shuffle width for
    the wedge join; auto-sized finer than the iterative loops because
    wedge volume is superlinear in edges (measured on a 60k-edge hub
    graph at local[32]: 64 shuffle partitions → 55 s, 16 → 7 s).

    encode_ids: the wedge/closing joins run over xxhash64-coded integer
    ids (the wedge join shuffles superlinear row volume — integer keys
    cut its bytes several-fold). Degree-ordered orientation only needs
    SOME total order for its tie-break, so any injective coding leaves
    the triangle set — and therefore total and per-vertex counts —
    unchanged; per-vertex output decodes back to original ids."""
    from graph_engine_spark.graph.adjacency import partitions_for_count

    spark = edges.sparkSession

    id_map = None
    if encode_ids:
        from graph_engine_spark.graph.adjacency import vertices as _vertices
        from pyspark.storagelevel import StorageLevel as _SL

        id_map = (
            _vertices(edges, src, dst)
            .select("id", F.xxhash64("id").alias("vid"))
            .persist(_SL.MEMORY_AND_DISK)
        )
        edges = edges.select(F.xxhash64(src).alias(src), F.xxhash64(dst).alias(dst))
    # canonicalize once, persist, and size the wedge-join width from the
    # persisted table's count — no second pass over the caller's lineage
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if num_partitions is None:
        num_partitions = partitions_for_count(
            und.count(), spark, edges_per_partition=4_000
        )
    if id_map is not None:
        id_map.count()  # materialize before und's source may unpersist
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(num_partitions))
    try:
        res = _triangle_count(und)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    if id_map is not None:
        pv = res.per_vertex
        res = TriangleResult(
            res.total,
            pv.join(id_map, pv.id == id_map.vid).select(id_map.id, pv.triangles),
            res._owned + [id_map],
        )
    return res


def _triangle_count(und: DataFrame) -> TriangleResult:
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    # orient: lower (deg, id) -> higher (deg, id)
    e = (
        und.join(deg.withColumnRenamed("id", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("id", "b").withColumnRenamed("deg", "db"), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    wedges = e1.join(e2, F.col("e1.u") == F.col("e2.u")).filter(
        F.col("e1.v") < F.col("e2.v")
    ).select(
        F.col("e1.u").alias("w"), F.col("e1.v").alias("x"), F.col("e2.v").alias("y")
    )
    closing = e.select(F.col("u").alias("x"), F.col("v").alias("y")).unionAll(
        e.select(F.col("v").alias("x"), F.col("u").alias("y"))
    )
    tris = wedges.join(closing, ["x", "y"], "inner").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    total = tris.count()
    # tris is materialized — release the oriented edge set (round-4
    # cache hygiene: repeated triangle_count calls must not accumulate
    # entries; recompute-on-eviction replays from e's lineage, which is
    # correct either way)
    e.unpersist()
    per_vertex = (
        tris.select(F.col("w").alias("id"))
        .unionAll(tris.select(F.col("x").alias("id")))
        .unionAll(tris.select(F.col("y").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("triangles"))
    )
    und.unpersist()
    # tris stays persisted (per_vertex reads it) — owned, so the
    # caller's release() frees it deterministically
    return TriangleResult(total, per_vertex, [tris])


def clustering_coefficient(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int | None = None,
    encode_ids: bool = True,
) -> DataFrame:
    """Per-vertex local clustering coefficient over the simple
    undirected graph: (id, deg, triangles, coeff) for EVERY vertex,
    coeff = 2T / (deg·(deg−1)), 0 when deg < 2.

    Reuses the degree-ordered exact triangle machinery above (its
    per-vertex output covers only triangle members), then left-joins
    onto the full undirected degree table — one extra distinct +
    count aggregation over the canonicalized edge set, nothing
    superlinear beyond the wedge join already paid.

    ``edges`` is read twice (inside triangle_count and again for the
    degree table); an unpersisted input is persisted for the duration
    — pagerank's owned_edges pattern (ADVICE r4: expensive upstream
    lineage was replayed twice per call) — and the |V|-row result is
    materialized EAGERLY (localCheckpoint: out of the CacheManager,
    freed by the ContextCleaner when the caller drops it) while that
    cache is live, so the owned entry can be released before returning
    without the returned frame replaying upstream at evaluation."""
    from pyspark.storagelevel import StorageLevel

    owned_edges = None
    if edges.storageLevel == StorageLevel.NONE:
        owned_edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
        edges = owned_edges
    try:
        tr = triangle_count(
            edges, src=src, dst=dst, num_partitions=num_partitions,
            encode_ids=encode_ids,
        )
        pv = tr.per_vertex
        und = (
            edges.select(
                F.least(F.col(src), F.col(dst)).alias("a"),
                F.greatest(F.col(src), F.col(dst)).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        deg = (
            und.select(F.col("a").alias("id"))
            .unionAll(und.select(F.col("b").alias("id")))
            .groupBy("id")
            .agg(F.count("*").alias("deg"))
        )
        result = deg.join(pv, "id", "left").select(
            "id",
            "deg",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            F.when(
                F.col("deg") >= 2,
                2.0
                * F.coalesce("triangles", F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("coeff"),
        )
        out = result.localCheckpoint(eager=True)
        # the eager checkpoint has materialized the result — the inner
        # run's triangle table / id dictionary can be released (they
        # were orphaned per call before round 5)
        tr.release()
        return out
    finally:
        if owned_edges is not None:
            owned_edges.unpersist()
