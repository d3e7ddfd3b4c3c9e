"""graph_engine_spark — a from-scratch PySpark-native code-dependency
link-graph analytics engine.

Capability parity target: espinozasenior/graph-engine (see SURVEY.md).
Architecture is Spark-first (DataFrame/Catalyst/AQE), not a port: the
reference is a single-machine networkx container; this engine expresses
the same data model and query surface as DataFrames over a corpus table
``(repo, path, commit, lang, content)`` and adds the link-graph
analytics mandated by BASELINE.json: PageRank, connected components
(small-star/large-star), label propagation, and triangle counting, with
explicit partitioning, hub-skew salting, and checkpoint/resume.
"""

__version__ = "0.1.0"

from graph_engine_spark.session import get_spark  # noqa: F401
