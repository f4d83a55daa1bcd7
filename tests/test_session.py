"""Session-factory wiring, Iceberg catalog registration in particular.

The iceberg-spark-runtime jar is absent in this sandbox, so live reads
through the catalog cannot be exercised; what IS testable jar-less is
the exact conf wiring ``spark-submit`` would carry to a real cluster
(SURVEY §1.2 names ``spark.read.format("iceberg")`` as the production
source — catalog confs are plain SQL confs, only resolved to the impl
class when a query touches ``ice.<table>``).
"""

from __future__ import annotations

from ocr_spark.session import get_spark, iceberg_configs


def test_iceberg_configs_shape():
    confs = iceberg_configs("/tmp/warehouse")
    assert confs["spark.sql.catalog.ice"] == "org.apache.iceberg.spark.SparkCatalog"
    assert confs["spark.sql.catalog.ice.type"] == "hadoop"
    assert confs["spark.sql.catalog.ice.warehouse"] == "/tmp/warehouse"
    assert "IcebergSparkSessionExtensions" in confs["spark.sql.extensions"]


def test_iceberg_configs_custom_catalog_name():
    confs = iceberg_configs("s3://bucket/wh", catalog="prod")
    assert confs["spark.sql.catalog.prod"] == "org.apache.iceberg.spark.SparkCatalog"
    assert confs["spark.sql.catalog.prod.warehouse"] == "s3://bucket/wh"


def test_get_spark_applies_iceberg_catalog_confs(spark):
    """Catalog confs are runtime-modifiable SQL confs: even against an
    existing session, get_spark(iceberg_warehouse=...) must land them on
    the session conf (the static spark.sql.extensions conf is the one
    piece that genuinely needs a fresh JVM, documented in README)."""
    s = get_spark(cores=8, iceberg_warehouse="/tmp/ice_wh_test")
    assert s.conf.get("spark.sql.catalog.ice") == (
        "org.apache.iceberg.spark.SparkCatalog"
    )
    assert s.conf.get("spark.sql.catalog.ice.type") == "hadoop"
    assert s.conf.get("spark.sql.catalog.ice.warehouse") == "/tmp/ice_wh_test"


def test_iceberg_live_roundtrip_when_jar_present(tmp_path):
    """LIVE Iceberg write/read round-trip — auto-enabled the moment the
    environment provides an iceberg-spark-runtime jar (via pyspark's
    jars dir or $SPARK_GRAFT_ICEBERG_JAR), skipped cleanly until then.
    Runs in a SUBPROCESS because spark.sql.extensions / spark.jars are
    static confs needing a fresh JVM."""
    import subprocess
    import sys
    import textwrap

    import pytest

    from ocr_spark.session import iceberg_runtime_available

    if not iceberg_runtime_available():
        pytest.skip("iceberg-spark-runtime jar absent in this environment")

    script = textwrap.dedent(
        f"""
        from ocr_spark.session import get_spark

        spark = get_spark(
            cores=2, app_name="ice-rt", iceberg_warehouse="{tmp_path}/wh"
        )
        spark.sql(
            "create table ice.db.t (doc_id string, n int) using iceberg"
        )
        spark.sql("insert into ice.db.t values ('a', 1), ('b', 2)")
        rows = sorted(
            (r["doc_id"], r["n"])
            for r in spark.read.format("iceberg").load("ice.db.t").collect()
        )
        assert rows == [("a", 1), ("b", 2)], rows
        print("ICEBERG_ROUNDTRIP_OK")
        spark.stop()
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=600,
    )
    assert "ICEBERG_ROUNDTRIP_OK" in out.stdout, out.stderr[-2000:]
