"""Preloading Python-worker daemon (`spark.python.daemon.module`).

PySpark forks one worker process per task from a small daemon; each
FRESH worker then pays the full `import pandas / numpy / pyarrow` cost
(~2-4 s of CPU) before its first batch. With 32 cores that is 32
simultaneous cold imports whenever the pool has to grow — measured
9-24 s stalls on the first mapInPandas stage after a pool flush
(worker churn traced with ps: 32 new pids at 100% CPU, RSS climbing
58→126 MB, pure import work).

The fix is the documented custom-daemon hook: import the heavy
modules ONCE in the daemon, then hand control to the stock
`pyspark.daemon.manager()` loop. Every forked worker inherits the
already-initialized modules copy-on-write, so a cold worker costs a
fork (~ms), not an import storm — and 32 workers share one resident
copy of pandas instead of holding 32 private ones.

Import failures must never take the daemon down with it — a worker
can still import lazily — hence the blanket try/except around the
preload block only.
"""

try:  # preload: forked workers inherit these copy-on-write
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
    import pyarrow.pandas_compat  # noqa: F401  (arrow<->pandas bridge)
    # the package's kernel modules unpickle by reference; importing
    # them here saves each fresh worker the zipimport + module-exec
    import unified_vector_database_spark.registry  # noqa: F401
    unified_vector_database_spark.registry.load_all()
except Exception:  # pragma: no cover - defensive: preload is optional
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
