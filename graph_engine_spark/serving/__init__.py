from graph_engine_spark.serving.rest import GraphRestServer  # noqa: F401
