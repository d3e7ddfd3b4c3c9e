from graph_engine_spark.functions.secrets import (  # noqa: F401
    scan_secrets,
    annotate_nodes_with_secrets,
)
