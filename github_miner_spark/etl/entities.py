"""GitHub-miner entity tables per FIXTURES.md §A: explicit schemas,
ISO-8601 string -> TimestampType upgrade, and a deterministic sample
generator for tests.

The reference stores timestamps as ISO strings and only ever compares
them lexically (SURVEY.md §1.4); here they are proper timestamps via
``to_timestamp`` (the documented upgrade), with the raw string retained
where lexical-compat matters. NodeModule rows have varying property
sets in the reference (undefined dropped per-row,
src/Neo4jClient.ts:250-253) — modeled as nullable columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# FIXTURES.md A1 — projection at reference src/Neo4jClient.ts:57-69
GIT_REPOS_SCHEMA = StructType(
    [
        StructField("full_name", StringType(), False),
        StructField("name", StringType()),
        StructField("ownerUsername", StringType()),
        StructField("size", LongType()),
        StructField("stargazers_count", LongType()),
        StructField("watchers_count", LongType()),
        StructField("forks_count", LongType()),
        StructField("open_issues_count", LongType()),
        StructField("created_at", StringType()),
        StructField("updated_at", StringType()),
        StructField("pushed_at", StringType()),
    ]
)

# FIXTURES.md A2 — reference src/Neo4jClient.ts:81-89
GIT_USERS_SCHEMA = StructType(
    [
        StructField("username", StringType(), False),
        StructField("htmlUrl", StringType()),
    ]
)

# FIXTURES.md A3 — reference src/Neo4jClient.ts:240-249
NODE_MODULES_SCHEMA = StructType(
    [
        StructField("name", StringType(), False),
        StructField("description", StringType()),
        StructField("version", StringType()),
        StructField("repositoryType", StringType()),
        StructField("repositoryUrl", StringType()),
        StructField("dependenciesTotal", LongType()),
        StructField("devDependenciesTotal", LongType()),
        StructField("peerDependenciesTotal", LongType()),
    ]
)

# FIXTURES.md A4 — heterogeneous edge table (string identity keys)
ENTITY_EDGES_SCHEMA = StructType(
    [
        StructField("src", StringType(), False),
        StructField("dst", StringType(), False),
        StructField("rel_type", StringType(), False),
        StructField("src_label", StringType()),
        StructField("dst_label", StringType()),
        StructField("version", StringType()),
        StructField("created_at", StringType()),
    ]
)

TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ssX"


def upgrade_repo_timestamps(repos: DataFrame) -> DataFrame:
    """ISO-8601 strings -> TimestampType (`created_ts` etc.), raw
    strings retained — the FIXTURES/SURVEY §1.5 upgrade path."""
    out = repos
    for c in ("created_at", "updated_at", "pushed_at"):
        out = out.withColumn(c.replace("_at", "_ts"), F.to_timestamp(F.col(c), TS_FORMAT))
    return out


def sample_entities(spark: SparkSession, n_users: int = 5, repos_per_user: int = 3):
    """Deterministic miniature corpus exercising the FIXTURES edge
    cases: scoped module names, null-heavy NodeModule rows, self-loop
    and 2-cycle module deps, one hub module, exactly one OWNS per repo,
    HOSTED_ON from a same-named module for even repos."""
    users, repos, modules, edges = [], [], [], []
    for u in range(n_users):
        uname = f"user{u}"
        users.append((uname, f"https://github.com/{uname}"))
        for r in range(repos_per_user):
            fn = f"{uname}/repo{r}"
            created = f"201{u % 9}-0{r + 1}-15T12:00:00Z"
            repos.append((fn, f"repo{r}", uname, 100 + u, 10 * u + r, 10 * u + r,
                          100 + r, r, created, created, created))
            edges.append((uname, fn, "OWNS", "GitUser", "GitRepo", None, created))
    mod_names = ["lodash", "@scope/pkg-a", "pkg-b", "pkg-c", "pkg-self"]
    for i, m in enumerate(mod_names):
        modules.append(
            (m, None if i % 2 else f"module {m}", f"1.{i}.0",
             "git" if i % 2 == 0 else None, None, i, i % 3, 0)
        )
    # every repo depends on the hub (lodash: heavy tail), plus chains
    for fn, *_ in [(r[0],) for r in repos]:
        edges.append((fn, "lodash", "DEPENDS_ON", "GitRepo", "NodeModule", "^4.0.0", None))
    edges += [
        ("@scope/pkg-a", "pkg-b", "DEPENDS_ON", "NodeModule", "NodeModule", "~1.2.0", None),
        ("pkg-b", "pkg-c", "DEPENDS_ON", "NodeModule", "NodeModule", "1.0.0", None),
        ("pkg-c", "@scope/pkg-a", "DEPENDS_ON", "NodeModule", "NodeModule", ">=0.1.0", None),  # cycle
        ("pkg-self", "pkg-self", "DEV_DEPENDS_ON", "NodeModule", "NodeModule", "0.0.1", None),  # self-loop
        ("lodash", "user0/repo0", "HOSTED_ON", "NodeModule", "GitRepo", None, None),
    ]
    return (
        spark.createDataFrame(users, GIT_USERS_SCHEMA),
        spark.createDataFrame(repos, GIT_REPOS_SCHEMA),
        spark.createDataFrame(modules, NODE_MODULES_SCHEMA),
        spark.createDataFrame(edges, ENTITY_EDGES_SCHEMA),
    )
