#!/usr/bin/env python
"""Isolated per-query timing with the noop sink (guide §1.4).

Usage:
    python tools/time_queries.py <query> [<query> ...]

Times each named registry query with df.write.format("noop") — every
column of every row computed, nothing written — after one warmup pass,
labelled via setJobDescription. Prints one line per query:
    <name> noop_median=<s> samples=[...]
Env: SPARK_GRAFT_TIME_PASSES (default 5), SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_CPUS. Passes are round-robin across the requested queries
(the bench's interleaving discipline) so an ambient burst lands on one
pass of every query, which the median rejects.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    names = sys.argv[1:]
    passes = int(os.environ.get("SPARK_GRAFT_TIME_PASSES", "5"))

    from github_miner_spark import registry
    from github_miner_spark.session import get_spark

    spark = get_spark(
        app_name="time-queries",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
        ),
    )
    specs = registry.all_specs()
    unknown = [n for n in names if n not in specs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    from github_miner_spark.graph.store import materialize_graph

    materialize_graph(spark, SF_DIR)

    def noop(name: str) -> float:
        spark.sparkContext.setJobDescription(f"time: {name}")
        df = specs[name].spark(spark, SF_DIR)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        return round(dt, 3)

    for name in names:  # warmup
        noop(name)
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(passes):
        for name in names:
            samples[name].append(noop(name))
    for name in names:
        ts = samples[name]
        print(
            f"{name} noop_median={round(statistics.median(ts), 3)} "
            f"samples={ts}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
