"""Central query registry.

Every operator from SURVEY.md §2 is registered here exactly once with:
- a Spark callable ``(spark, sf_dir) -> DataFrame`` (the engine), and
- optionally an ANSI-SQL oracle string for DuckDB (the correctness twin).

``__spark_entry__.py`` re-exports this registry through the driver
contract (queries() / oracle_sql()). Column names are aliased
identically on both sides — the driver's hash-compare sorts columns by
name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None = None
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    description: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a Spark query with its optional DuckDB oracle."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, description or (fn.__doc__ or ""), tags)
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import github_miner_spark.queries.relational  # noqa: F401
    import github_miner_spark.queries.graph_queries  # noqa: F401
    import github_miner_spark.queries.paths_queries  # noqa: F401
    import github_miner_spark.queries.algorithms_queries  # noqa: F401
    import github_miner_spark.queries.etl_queries  # noqa: F401
    import github_miner_spark.queries.text_queries  # noqa: F401
    import github_miner_spark.queries.dedup_queries  # noqa: F401
    import github_miner_spark.queries.similarity_queries  # noqa: F401
    import github_miner_spark.queries.events_queries  # noqa: F401


def all_specs() -> dict[str, QuerySpec]:
    load_all()
    return dict(_REGISTRY)


def spark_queries() -> dict[str, SparkQuery]:
    return {name: spec.spark for name, spec in all_specs().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None}
