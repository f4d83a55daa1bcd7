"""SparkSession factory with the scale-tuned defaults for this engine.

Testing runs on local[N] in a single JVM; the configuration is written for a
multi-executor cluster (AQE, skew-join handling, Arrow batch sizing) so the
same job submits unchanged via spark-submit --py-files.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch sizing: media OCR cost is dominated by per-image work inside
# the UDF, so batches of ~256 exploded media rows keep python-worker memory
# flat while amortizing Arrow transfer (the reference's OCR_BATCH_SIZE=16 is
# the *model* micro-batch, applied inside the kernel, not the Arrow batch).
ARROW_BATCH_ROWS = 256


def iceberg_configs(warehouse: str, catalog: str = "ice") -> dict[str, str]:
    """Spark confs registering a hadoop-type Iceberg catalog at ``warehouse``.

    Kept as a pure function so the wiring is testable without the
    iceberg-spark-runtime jar (absent in this sandbox): the catalog impl
    class only loads when a query touches ``<catalog>.<table>``, so
    setting these on a builder is safe jar-less, but reads require the
    jar on the cluster classpath (see README quickstart)."""
    return {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def iceberg_runtime_available() -> bool:
    """True when an iceberg-spark-runtime jar is reachable in THIS
    environment: either ``$SPARK_GRAFT_ICEBERG_JAR`` points at one, or
    one already sits in pyspark's bundled jars directory.  The live
    read/write round-trip test (tests/test_session.py) keys on this —
    skip-if-absent today, auto-enabled the moment a jar lands."""
    env = os.environ.get("SPARK_GRAFT_ICEBERG_JAR")
    if env and os.path.exists(env):
        return True
    try:
        import pyspark

        jars_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
        return any(
            n.startswith("iceberg-spark-runtime") and n.endswith(".jar")
            for n in os.listdir(jars_dir)
        )
    except OSError:
        return False


def get_spark(
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    app_name: str = "ocr_spark",
    iceberg_warehouse: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    cores: int N -> local[N]; '*' -> local[*]; None -> $SPARK_GRAFT_CPUS or 32.
    iceberg_warehouse: when set, registers a hadoop-type Iceberg catalog
    named ``ice`` at that path (production input per the target spec;
    requires the iceberg-spark-runtime jar on the cluster — not bundled in
    this sandbox, where tests read the same schemas from plain parquet).
    """
    # One BLAS thread per python worker: the recognition kernel's matmul
    # otherwise spawns ncpu OpenBLAS threads in EVERY worker (ncpu^2 threads
    # at local[ncpu] — measured 4x slowdown at local[32]).  Set before the
    # JVM launches so daemons/workers inherit it.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
                "VECLIB_MAXIMUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, "1")

    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cores) if str(cores).isdigit() else 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS)
        )
        .config("spark.python.worker.reuse", "true")
        # per-task worker forks pay full import cost otherwise — see
        # ocr_spark/daemon.py (preloads numpy/pandas/pyarrow + kernels)
        .config("spark.python.daemon.module", "ocr_spark.daemon")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        # Console progress bars flood the combined output the bench driver
        # tail-captures; the JSON machine line must stay the last thing in
        # that window.
        .config("spark.ui.showConsoleProgress", "false")
    )
    if iceberg_warehouse:
        for k, v in iceberg_configs(iceberg_warehouse).items():
            builder = builder.config(k, v)
        # opportunistic jar wiring: when the environment provides the
        # runtime jar via $SPARK_GRAFT_ICEBERG_JAR, ship it to the JVM so
        # the catalog path goes LIVE (fresh JVM required — spark.jars and
        # spark.sql.extensions are static confs; see README quickstart)
        jar = os.environ.get("SPARK_GRAFT_ICEBERG_JAR")
        if jar and os.path.exists(jar):
            builder = builder.config("spark.jars", jar)
    return builder.getOrCreate()
