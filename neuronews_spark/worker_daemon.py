"""Custom PySpark worker daemon: preload heavy imports before forking.

Stock workers fork from a daemon that has only pyspark loaded, so every
worker pays the pandas + pyarrow + numpy import (~1.5-2.5 s) on its first
pandas-UDF task; with 32 workers importing concurrently the first UDF stage
of a job loses tens of seconds of wall clock (measured: the
mention-extraction stage went 8.7 s → 21.3 s from local[8] to local[32]
purely from cold-worker imports). Importing them in the daemon makes every
forked worker inherit the loaded modules copy-on-write — zero per-worker
import cost.

Enable with::

    spark.python.daemon.module = neuronews_spark.worker_daemon

(set by ``neuronews_spark.session.get_spark`` and ``bench.py``). Imports
are best-effort: a worker environment without this package on PYTHONPATH
still starts — it just loses the preload benefit.
"""

from __future__ import annotations

for _mod in (
    "numpy",
    "pandas",
    "pyarrow",
    "pyarrow.pandas_compat",
    "difflib",
    "neuronews_spark.functions.simtext",
    "neuronews_spark.operators.mentions",
):
    try:
        __import__(_mod)
    except Exception:  # noqa: BLE001 - preload is best-effort by design
        pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
