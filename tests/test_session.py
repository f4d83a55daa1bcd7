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
