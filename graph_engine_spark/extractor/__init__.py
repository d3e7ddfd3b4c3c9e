from graph_engine_spark.extractor.extract import (  # noqa: F401
    dedupe_edges,
    dedupe_nodes,
    extract_ir,
    extract_graph,
)
