#!/usr/bin/env python
"""Split each headline query's bench-protocol time into plan-build
(DataFrame construction: py4j + analysis) and execute (.count())."""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from github_miner_spark import registry
from github_miner_spark.session import get_spark
from bench import HEADLINE

spark = get_spark(app_name="build-exec-profile", master="local[32]", shuffle_partitions=32)
specs = registry.all_specs()
names = [n for n in HEADLINE if n in specs]

from github_miner_spark.graph.store import materialize_graph
materialize_graph(spark, SF_DIR)

for n in names:  # warmup
    specs[n].spark(spark, SF_DIR).count()

passes = int(os.environ.get("PASSES", "3"))
build = {n: [] for n in names}
execu = {n: [] for n in names}
for _ in range(passes):
    for n in names:
        spark.sparkContext.setJobDescription(f"profile: {n}")
        t0 = time.perf_counter()
        df = specs[n].spark(spark, SF_DIR)
        t1 = time.perf_counter()
        df.count()
        t2 = time.perf_counter()
        build[n].append(round(t1 - t0, 3))
        execu[n].append(round(t2 - t1, 3))
        spark.sparkContext.setJobDescription(None)

out = {
    n: {
        "build": round(statistics.median(build[n]), 3),
        "exec": round(statistics.median(execu[n]), 3),
        "build_samples": build[n],
        "exec_samples": execu[n],
    }
    for n in names
}
with open("/tmp/build_exec_profile.json", "w") as f:
    json.dump(out, f, indent=1)
rows = sorted(out.items(), key=lambda kv: -(kv[1]["build"] + kv[1]["exec"]))
print(f"{'total':>7} {'build':>7} {'exec':>7}  query")
for n, v in rows:
    print(f"{v['build']+v['exec']:7.3f} {v['build']:7.3f} {v['exec']:7.3f}  {n}")
spark.stop()
