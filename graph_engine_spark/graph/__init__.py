from graph_engine_spark.graph.linkgraph import module_link_graph  # noqa: F401
from graph_engine_spark.graph.adjacency import build_adjacency, degrees  # noqa: F401
from graph_engine_spark.graph.pagerank import pagerank  # noqa: F401
from graph_engine_spark.graph.components import connected_components  # noqa: F401
from graph_engine_spark.graph.lpa import label_propagation  # noqa: F401
from graph_engine_spark.graph.triangles import triangle_count  # noqa: F401
