"""Custom PySpark worker daemon that preloads heavy modules.

Python workers are forked from the daemon per task; in this environment
the JVM-side worker pool does not reuse them across tasks, so every task
pays the pandas/pyarrow/numpy (+ kernel module) import cost — measured
~200 forks and hundreds of CPU-seconds of import churn per UDF-heavy
query.  Importing those modules HERE, before the daemon starts forking,
lets every worker inherit them via copy-on-write: the per-task fork
becomes milliseconds.

Enabled via ``spark.python.daemon.module = ocr_spark.daemon``
(ocr_spark/session.py).  The kernel imports are best-effort: if
ocr_spark is not importable in the daemon's environment the daemon still
works, workers just import lazily as before.
"""

import importlib

for _mod in (
    "numpy",
    "pandas",
    "pyarrow",
    "pyspark.worker",
    "ocr_spark.core.extract",
    "ocr_spark.core.fields",
    "ocr_spark.fixtures.invoice",
):
    try:
        importlib.import_module(_mod)
    except Exception:  # pragma: no cover - best-effort preload
        pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
