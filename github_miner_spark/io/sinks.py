"""File sinks: CSV / JSON / parquet writers with read-back helpers
(SURVEY.md §2.1 S7-S9).

The reference lands raw JSON per entity (src/GitHubMinerHelper.ts:94,129;
src/Neo4jClient.ts:534) and exports query results to CSV for pandas
post-processing (18 files under analysis/). Spark-first equivalents:
``df.write`` with explicit formats, one directory per dataset, partition
count controlled by the caller. Snapshot/restore (reference
package.json:13-15 neo4j-admin dump/load) is a parquet copy of the
vertices/edges store.

Scale notes: CSV is the interchange sink only — it carries no schema,
so ``read_csv_back`` takes the schema explicitly (never inferSchema on
100 TB). ``coalesce(n)`` trades write parallelism for file count; the
default keeps the upstream partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_csv(df: DataFrame, path: str, num_files: int | None = None) -> None:
    """Header'd CSV export — the analysis/*.csv sink (S9)."""
    out = df.coalesce(num_files) if num_files else df
    out.write.mode("overwrite").option("header", True).csv(path)


def read_csv_back(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    return spark.read.schema(schema).option("header", True).csv(path)


def write_json(df: DataFrame, path: str, num_files: int | None = None) -> None:
    """JSON-lines export — the file-lake sink (S7)."""
    out = df.coalesce(num_files) if num_files else df
    out.write.mode("overwrite").json(path)


def read_json_back(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def snapshot(df: DataFrame, path: str) -> None:
    """Table snapshot (neo4j-admin dump analog, S11): parquet copy."""
    df.write.mode("overwrite").parquet(path)


def restore(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
