"""github_miner_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of rossanthony/github-miner.

Not a port: the reference's imperative TypeScript/Neo4j/Redis stack is
re-expressed as explicit-schema DataFrames over parquet, Catalyst/Spark
SQL for all relational operators, and iterative DataFrame jobs for path
and graph algorithms (see SURVEY.md for the operator inventory).

Layout:
    session     SparkSession factory with scale-conscious defaults
    io          explicit-schema loaders for the test/lake tables
    graph       property-graph model + degree/path/algorithm operators
    queries     relational + graph query definitions (registry-backed)
    functions   text analysis, dedup, similarity (LLM-pipeline ops)
    etl         manifest parsing, edge extraction, idempotent merge
    streaming   Structured Streaming jobs over the events table
"""

__version__ = "0.1.0"
