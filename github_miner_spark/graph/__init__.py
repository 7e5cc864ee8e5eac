from github_miner_spark.graph.model import (
    GRAPH_ORACLE_CTES,
    PropertyGraph,
    build_graph,
)

__all__ = ["GRAPH_ORACLE_CTES", "PropertyGraph", "build_graph"]
