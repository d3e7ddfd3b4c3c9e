"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: synthesize a deterministic corpus,
extract the code-dependency graph, PageRank the module link graph,
return the top-10 modules (SURVEY.md §7.1).

``queries()`` / ``oracle_sql()`` — operator coverage from SURVEY.md §2
expressed over the driver's pre-registered tables (region nation
customer supplier part orders lineitem events documents embeddings),
each with a DuckDB-equivalent SQL oracle. Graph-iterative operators
(PageRank / CC) are included WITH SQL oracles by unrolling a fixed
number of supersteps over a deterministic edge table derived from the
driver tables; rank values are rounded so cross-engine float summation
order cannot flip the value hash.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------- entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: extract → dedupe → iterate → top-k (SURVEY.md §7.1)."""
    from graph_engine_spark.corpus import synthesize_corpus
    from graph_engine_spark.extractor import extract_graph
    from graph_engine_spark.graph.linkgraph import module_link_graph
    from graph_engine_spark.graph.pagerank import pagerank

    corpus = synthesize_corpus(spark, n_files=300, n_components=5, hubs_per_component=4)
    _, edges = extract_graph(corpus)
    module_graph = module_link_graph(edges)
    result = pagerank(module_graph, tol=1e-6, max_iter=60)
    return (
        result.ranks.orderBy(F.desc("rank"), F.asc("id"))
        .limit(10)
        .select("id", F.round("rank", 9).alias("rank"))
    )


# ------------------------------------------------------------- queries
# Each entry: (spark, sf_dir) -> DataFrame, with a DuckDB oracle below.
# Aggregate/computed columns are aliased identically on both sides.

def _q_node_type_filter(spark, sf_dir):
    """Type filter (reference mcp_integration.py:181-192) over events."""
    from graph_engine_spark.queries.surface import nodes_by_type

    ev = _load(spark, sf_dir, "events").withColumnRenamed("event_type", "type")
    return nodes_by_type(ev, "click").select("event_id", "user_id", "type")


def _q_point_lookup(spark, sf_dir):
    """Point lookup (reference in_memory.py:183-189)."""
    c = _load(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") == 42).select("c_custkey", "c_name", "c_acctbal")


def _q_search_substring(spark, sf_dir):
    """Case-insensitive substring search (reference mcp_integration.py:124-145)."""
    d = _load(spark, sf_dir, "documents")
    return (
        d.filter(
            F.lower(F.col("text")).contains("data") | F.lower(F.col("source")).contains("wiki")
        )
        .select("doc_id", "source")
    )


def _q_one_hop_in(spark, sf_dir):
    """1-hop reverse traversal shape (reference mcp_integration.py:208-230):
    incoming edges → source entities, type-filtered. Edge table =
    orders(custkey→orderkey); 'callers' of order set = customers."""
    c = _load(spark, sf_dir, "customer")
    o = _load(spark, sf_dir, "orders")
    callers = o.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return (
        c.join(callers.distinct(), "c_custkey", "inner")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def _q_two_hop(spark, sf_dir):
    """Two-hop semi-join (reference mcp_integration.py:290-324):
    parts in hot orders → suppliers providing them."""
    li = _load(spark, sf_dir, "lineitem")
    o = _load(spark, sf_dir, "orders")
    s = _load(spark, sf_dir, "supplier")
    hot = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    supp_ids = (
        li.join(hot, li.l_orderkey == hot.o_orderkey, "leftsemi")
        .select(F.col("l_suppkey").alias("s_suppkey"))
        .distinct()
    )
    return s.join(supp_ids, "s_suppkey", "leftsemi").select("s_suppkey", "s_name")


def _q_edges_for_node_union(spark, sf_dir):
    """Directional edge filter, both directions with dedup
    (reference in_memory.py:191-209) on a nation adjacency built from
    customer/supplier co-location."""
    n = _load(spark, sf_dir, "nation")
    out_e = n.filter(F.col("n_regionkey") == 2).select(
        F.col("n_nationkey").alias("a"), F.col("n_regionkey").alias("b")
    )
    in_e = n.filter(F.col("n_nationkey") % 5 == 2).select(
        F.col("n_nationkey").alias("a"), F.col("n_regionkey").alias("b")
    )
    return out_e.unionByName(in_e).dropDuplicates(["a", "b"]).select("a", "b")


def _q_degree(spark, sf_dir):
    """Degree aggregation (adjacency cardinality) — orders as edge table."""
    o = _load(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_custkey").alias("id"))
        .agg(F.count("*").alias("out_deg"), F.max("o_totalprice").alias("max_price"))
    )


def _q_topk_degree(spark, sf_dir):
    """Top-k with deterministic tie-break (TakeOrderedAndProject)."""
    o = _load(spark, sf_dir, "orders")
    deg = o.groupBy(F.col("o_custkey").alias("id")).agg(F.count("*").alias("out_deg"))
    return deg.orderBy(F.desc("out_deg"), F.asc("id")).limit(20)


def _q_type_inventory(spark, sf_dir):
    """Distinct type inventory (frontend filter population, SURVEY §2.4)."""
    ev = _load(spark, sf_dir, "events")
    return ev.groupBy(F.col("event_type").alias("type")).agg(
        F.count("*").alias("cnt")
    )


def _q_set_ops(spark, sf_dir):
    """Intersection/difference (reference rename_detection.py:230-241)."""
    c = _load(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 1000).select("c_custkey")
    b = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    return a.intersect(b).unionByName(
        a.exceptAll(b).withColumn("c_custkey", F.col("c_custkey") * -1)
    )


def _q_files_per_node(spark, sf_dir):
    """Set-union merge of defining files (reference in_memory.py:66-74):
    sorted collect_set analog over lineitem (parts ← orders)."""
    li = _load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_partkey") <= 50)
        .groupBy(F.col("l_partkey").alias("id"))
        .agg(F.array_sort(F.collect_set("l_orderkey")).alias("files"))
    )


def _q_call_count_agg(spark, sf_dir):
    """Dynamic call-count accumulation (reference manager.py:180-215):
    count + first/last timestamps per (src,dst)."""
    ev = _load(spark, sf_dir, "events")
    return ev.groupBy(F.col("user_id").alias("src"), F.col("event_type").alias("dst")).agg(
        F.count("*").alias("dynamic_call_count"),
        F.min("ts").alias("first_call_time"),
        F.max("ts").alias("last_call_time"),
    )


def _q_interval_join(spark, sf_dir):
    """Interval containment join (reference graph_integration.py:128-157):
    lineitem ship date within 30 days of its order's date."""
    li = _load(spark, sf_dir, "lineitem")
    o = _load(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") <= F.date_add(F.col("o_orderdate"), 30))
    )
    return j.groupBy("o_orderpriority").agg(F.count("*").alias("cnt"))


def _q_sha256(spark, sf_dir):
    """Per-row invariant (BASELINE.json): sha2(content,256) — over
    documents.text standing in for corpus.content (FIXTURES.md §5)."""
    d = _load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.sha2(F.col("text").cast("binary"), 256).alias("content_sha")
    )


def _q_line_split(spark, sf_dir):
    """Line split + numbers (reference secret_scanner.py:262-265)."""
    d = _load(spark, sf_dir, "documents")
    lines = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), r"\.\s+")).alias("pos", "sentence")
    )
    return lines.select(
        "doc_id", (F.col("pos") + 1).alias("line_number"), F.length("sentence").alias("line_len")
    )


def _q_regex_extract(spark, sf_dir):
    """Regex extraction (reference fallback parser / secret patterns)."""
    d = _load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z]+"), 0)).alias("n_words"),
    )


def _q_text_quality(spark, sf_dir):
    """Quality scoring ratios (training-data pipeline op)."""
    from graph_engine_spark.pipelines.text import punct_ratio, whitespace_token_count

    d = _load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.round(punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        whitespace_token_count(F.col("text")).alias("ws_tokens"),
    )


def _q_token_count(spark, sf_dir):
    from graph_engine_spark.pipelines.text import token_count

    d = _load(spark, sf_dir, "documents")
    return d.select("doc_id", token_count(F.col("text")).alias("n_tokens"))


def _q_fingerprint(spark, sf_dir):
    from graph_engine_spark.pipelines.text import fingerprint

    d = _load(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint(F.col("text")).alias("fingerprint"))


def _q_dedup_exact(spark, sf_dir):
    from graph_engine_spark.pipelines.dedup import exact_dedup

    d = _load(spark, sf_dir, "documents")
    return exact_dedup(d)


_EMB_DIM = 64  # all driver embeddings tables are 64-dim
_QUERY_VEC = [(1.0 if i % 2 == 0 else -0.5) for i in range(_EMB_DIM)]


def _q_embedding_topk(spark, sf_dir):
    from graph_engine_spark.pipelines.similarity import brute_force_topk

    e = _load(spark, sf_dir, "embeddings")
    top = brute_force_topk(e, _QUERY_VEC, k=15)
    return top.select("vec_id", F.round("cosine", 6).alias("cosine"))


def _q_pagerank_sql(spark, sf_dir):
    """PageRank, 5 unrolled supersteps, over a deterministic edge table
    derived from nation (src=n_nationkey, dst=(n_nationkey*7+3)%25 ∪
    region links). Rounded to 8 dp for cross-engine hash equality."""
    from graph_engine_spark.graph.pagerank import pagerank

    n = _load(spark, sf_dir, "nation")
    e1 = n.select(
        F.col("n_nationkey").cast("string").alias("src"),
        ((F.col("n_nationkey") * 7 + 3) % 25).cast("string").alias("dst"),
    )
    e2 = n.select(
        F.col("n_nationkey").cast("string").alias("src"),
        ((F.col("n_regionkey") * 5) % 25).cast("string").alias("dst"),
    )
    edges = e1.unionByName(e2).filter(F.col("src") != F.col("dst")).distinct()
    res = pagerank(edges, damping=0.85, tol=-1.0, max_iter=5, num_partitions=8)
    return res.ranks.select(
        F.col("id").cast("int").alias("id"), F.round("rank", 8).alias("rank")
    )


def _q_components_sql(spark, sf_dir):
    """Connected components over a deterministic small-diameter graph
    derived from nation; oracle = unrolled min-propagation in SQL."""
    from graph_engine_spark.graph.components import connected_components

    n = _load(spark, sf_dir, "nation")
    edges = n.select(
        F.format_string("v%02d", F.col("n_nationkey")).alias("src"),
        F.format_string("v%02d", (F.col("n_nationkey") % 5) * 6).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    res = connected_components(edges)
    return res.components.select("id", "component")


def _q_triangles_sql(spark, sf_dir):
    """Triangle count over a deterministic graph on nation keys."""
    from graph_engine_spark.graph.triangles import triangle_count

    n = _load(spark, sf_dir, "nation")
    e1 = n.select(
        F.col("n_nationkey").alias("a"), ((F.col("n_nationkey") + 1) % 25).alias("b")
    )
    e2 = n.select(
        F.col("n_nationkey").alias("a"), ((F.col("n_nationkey") + 2) % 25).alias("b")
    )
    edges = (
        e1.unionByName(e2)
        .select(F.least("a", "b").cast("string").alias("src"),
                F.greatest("a", "b").cast("string").alias("dst"))
        .distinct()
    )
    res = triangle_count(edges)
    return res.per_vertex.select(
        F.col("id").cast("int").alias("id"), "triangles"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "node_type_filter": _q_node_type_filter,
        "point_lookup": _q_point_lookup,
        "search_substring": _q_search_substring,
        "one_hop_in": _q_one_hop_in,
        "two_hop": _q_two_hop,
        "edges_union_dedup": _q_edges_for_node_union,
        "degree": _q_degree,
        "topk_degree": _q_topk_degree,
        "type_inventory": _q_type_inventory,
        "set_ops": _q_set_ops,
        "files_per_node": _q_files_per_node,
        "call_count_agg": _q_call_count_agg,
        "interval_join": _q_interval_join,
        "sha256_invariant": _q_sha256,
        "line_split": _q_line_split,
        "regex_extract": _q_regex_extract,
        "text_quality": _q_text_quality,
        "token_count": _q_token_count,
        "fingerprint": _q_fingerprint,
        "dedup_exact": _q_dedup_exact,
        "embedding_topk": _q_embedding_topk,
        "pagerank_5steps": _q_pagerank_sql,
        "connected_components": _q_components_sql,
        "triangle_count": _q_triangles_sql,
    }


# ---------------------------------------------------------- oracle SQL

_PAGERANK_ORACLE = """
WITH edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT n_nationkey AS src, (n_nationkey * 7 + 3) % 25 AS dst FROM nation
    UNION ALL
    SELECT n_nationkey AS src, (n_regionkey * 5) % 25 AS dst FROM nation
  ) WHERE src <> dst
),
verts AS (
  SELECT DISTINCT id FROM (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)
),
nv AS (SELECT COUNT(*) AS n FROM verts),
outdeg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
r0 AS (SELECT id, 1.0 / (SELECT n FROM nv) AS rank FROM verts),
{steps}
SELECT id, ROUND(rank, 8) AS rank FROM r5
"""


def _pagerank_step(i: int) -> str:
    prev, cur = f"r{i-1}", f"r{i}"
    return f"""
{cur} AS (
  SELECT v.id,
         (1 - 0.85) / (SELECT n FROM nv)
         + 0.85 * (
             COALESCE(c.contrib, 0)
             + (SELECT COALESCE(SUM({prev}.rank), 0) FROM {prev}
                LEFT JOIN outdeg ON {prev}.id = outdeg.src
                WHERE outdeg.src IS NULL) / (SELECT n FROM nv)
           ) AS rank
  FROM verts v
  LEFT JOIN (
    SELECT e.dst AS id, SUM(r.rank / o.d) AS contrib
    FROM edges e JOIN {prev} r ON e.src = r.id JOIN outdeg o ON e.src = o.src
    GROUP BY e.dst
  ) c ON v.id = c.id
)"""


_CC_ORACLE = """
WITH RECURSIVE base AS (
  SELECT printf('v%02d', n_nationkey) AS src,
         printf('v%02d', (n_nationkey % 5) * 6) AS dst
  FROM nation
  WHERE printf('v%02d', n_nationkey) <> printf('v%02d', (n_nationkey % 5) * 6)
),
sym AS (
  SELECT src AS a, dst AS b FROM base
  UNION
  SELECT dst AS a, src AS b FROM base
),
verts AS (SELECT DISTINCT a AS id FROM sym),
{steps}
SELECT id, component FROM l8
"""


def _cc_step(i: int) -> str:
    prev, cur = f"l{i-1}", f"l{i}"
    return f"""
{cur} AS (
  SELECT v.id,
         LEAST(p.component,
               COALESCE((SELECT MIN(q.component) FROM sym s JOIN {prev} q ON s.a = q.id
                         WHERE s.b = v.id), p.component)) AS component
  FROM verts v JOIN {prev} p ON v.id = p.id
)"""


def oracle_sql() -> dict[str, str]:
    pr_steps = ",".join(_pagerank_step(i) for i in range(1, 6))
    pr = _PAGERANK_ORACLE.format(steps=pr_steps.lstrip(","))
    cc_init = "l0 AS (SELECT id, id AS component FROM verts)"
    cc_steps = cc_init + "," + ",".join(_cc_step(i) for i in range(1, 9))
    cc = _CC_ORACLE.format(steps=cc_steps)
    return {
        "node_type_filter": """
            SELECT event_id, user_id, event_type AS type FROM events
            WHERE event_type = 'click'
        """,
        "point_lookup": """
            SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey = 42
        """,
        "search_substring": """
            SELECT doc_id, source FROM documents
            WHERE contains(lower(text), 'data') OR contains(lower(source), 'wiki')
        """,
        "one_hop_in": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
              AND c_mktsegment = 'BUILDING'
        """,
        "two_hop": """
            SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN (
              SELECT l_suppkey FROM lineitem WHERE l_orderkey IN (
                SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'))
        """,
        "edges_union_dedup": """
            SELECT DISTINCT a, b FROM (
              SELECT n_nationkey AS a, n_regionkey AS b FROM nation WHERE n_regionkey = 2
              UNION ALL
              SELECT n_nationkey AS a, n_regionkey AS b FROM nation WHERE n_nationkey % 5 = 2
            )
        """,
        "degree": """
            SELECT o_custkey AS id, COUNT(*) AS out_deg, MAX(o_totalprice) AS max_price
            FROM orders GROUP BY o_custkey
        """,
        "topk_degree": """
            SELECT o_custkey AS id, COUNT(*) AS out_deg FROM orders
            GROUP BY o_custkey ORDER BY out_deg DESC, id ASC LIMIT 20
        """,
        "type_inventory": """
            SELECT event_type AS type, COUNT(*) AS cnt FROM events GROUP BY event_type
        """,
        "set_ops": """
            SELECT c_custkey FROM customer WHERE c_acctbal > 1000
            INTERSECT
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
            UNION ALL
            SELECT -c_custkey FROM (
              SELECT c_custkey FROM customer WHERE c_acctbal > 1000
              EXCEPT ALL
              SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
        """,
        "files_per_node": """
            SELECT l_partkey AS id, list_sort(list(DISTINCT l_orderkey)) AS files
            FROM lineitem WHERE l_partkey <= 50 GROUP BY l_partkey
        """,
        "call_count_agg": """
            SELECT user_id AS src, event_type AS dst, COUNT(*) AS dynamic_call_count,
                   MIN(ts) AS first_call_time, MAX(ts) AS last_call_time
            FROM events GROUP BY user_id, event_type
        """,
        "interval_join": """
            SELECT o_orderpriority, COUNT(*) AS cnt
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= o_orderdate
              AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
            GROUP BY o_orderpriority
        """,
        "sha256_invariant": """
            SELECT doc_id, sha256(text) AS content_sha FROM documents
        """,
        "line_split": """
            SELECT doc_id, pos + 1 AS line_number, length(sentence) AS line_len
            FROM (
              SELECT doc_id, unnest(regexp_split_to_array(text, '\\.\\s+')) AS sentence,
                     generate_subscripts(regexp_split_to_array(text, '\\.\\s+'), 1) - 1 AS pos
              FROM documents)
        """,
        "regex_extract": """
            SELECT doc_id, length(regexp_extract_all(text, '[A-Za-z]+')) AS n_words
            FROM documents
        """,
        "text_quality": """
            SELECT doc_id,
                   ROUND((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                         / GREATEST(length(text), 1)::DOUBLE, 6) AS punct_ratio,
                   length(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS ws_tokens
            FROM documents
        """,
        "token_count": """
            SELECT doc_id, length(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_tokens
            FROM documents
        """,
        "fingerprint": """
            SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
            FROM documents
        """,
        "dedup_exact": """
            SELECT MIN(doc_id) AS doc_id, sha256(text) AS content_sha, COUNT(*) AS dup_count
            FROM documents GROUP BY sha256(text)
        """,
        "embedding_topk": f"""
            SELECT vec_id,
                   ROUND(list_cosine_similarity(embedding::DOUBLE[],
                         {_QUERY_VEC!r}::DOUBLE[]), 6) AS cosine
            FROM embeddings
            ORDER BY cosine DESC, vec_id ASC LIMIT 15
        """,
        "pagerank_5steps": pr,
        "connected_components": cc,
        "triangle_count": """
            WITH base AS (
              SELECT DISTINCT LEAST(a, b)::VARCHAR AS src, GREATEST(a, b)::VARCHAR AS dst FROM (
                SELECT n_nationkey AS a, (n_nationkey + 1) % 25 AS b FROM nation
                UNION ALL
                SELECT n_nationkey AS a, (n_nationkey + 2) % 25 AS b FROM nation)
            ),
            und AS (SELECT src AS a, dst AS b FROM base UNION SELECT dst, src FROM base),
            tri AS (
              SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM und e1 JOIN und e2 ON e1.b = e2.a AND e1.a < e2.b
              JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
              WHERE e1.a < e1.b AND e2.a < e2.b
            ),
            pv AS (
              SELECT id, COUNT(*) AS triangles FROM (
                SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
              GROUP BY id
            )
            SELECT id::INT AS id, triangles FROM pv
        """,
    }
