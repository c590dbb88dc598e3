#!/usr/bin/env python
"""Bench-methodology subset runner: min over 3 interleaved passes."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("UVDB_STREAM_REPLAY_FILES", "2")

from unified_vector_database_spark import registry
from unified_vector_database_spark.session import get_spark

registry.load_all()
names = sys.argv[1:]
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("uvdb-minibench")
registry.QUERIES["get_by_id"](spark, sf).collect()
times = {}
for p in range(3):
    for name in names:
        fn = registry.QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf).collect()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        if name not in times or dt < times[name]:
            times[name] = dt
for k in names:
    print(f"{k:32s} {times[k]:7.2f}", flush=True)
print("TOTAL", round(sum(times.values()), 2))
spark.stop()
