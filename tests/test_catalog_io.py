"""TableIO format adapter: parquet fallback path (no Iceberg jars in this
container) — write/read/exists round-trip and catalog detection."""

import pandas as pd

from string_grouper_spark.sources.catalog import TableIO, catalog_configured


def test_parquet_roundtrip(spark, tmp_path):
    io = TableIO(spark, str(tmp_path))
    assert io.catalog is None  # sandbox: no catalog configured
    pdf = pd.DataFrame({"doc_id": range(5), "text": list("abcde")})
    io.write(spark.createDataFrame(pdf), "docs")
    assert io.exists("docs")
    assert not io.exists("missing")
    back = io.read("docs").toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, pdf)


def test_catalog_detection(spark):
    assert not catalog_configured(spark, "nonexistent_cat")
    # an unconfigured catalog name passed to TableIO falls back to parquet
    io = TableIO(spark, "/tmp/x", catalog="nonexistent_cat")
    assert io.catalog is None


def _iceberg_on_classpath(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def test_iceberg_catalog_branch_smoke(spark, tmp_path):
    """VERDICT r2 #8: exercise TableIO's writeTo(...).using('iceberg')
    branch whenever the runtime exists; skipped (not silently untested)
    in containers without the jars."""
    import pytest

    from string_grouper_spark.sources.catalog import TableIO

    if not _iceberg_on_classpath(spark):
        pytest.skip("iceberg-spark-runtime not on the classpath")
    spark.conf.set(
        "spark.sql.catalog.sg_ice", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.sg_ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.sg_ice.warehouse", f"{tmp_path}/wh")
    io = TableIO(spark, str(tmp_path), catalog="sg_ice")
    assert io.catalog == "sg_ice"
    df = spark.range(5).withColumnRenamed("id", "doc_id")
    assert not io.exists("smoke_tbl")
    io.write(df, "smoke_tbl")
    assert io.exists("smoke_tbl")
    got = sorted(r["doc_id"] for r in io.read("smoke_tbl").collect())
    assert got == [0, 1, 2, 3, 4]


def test_table_io_contract_parity_on_parquet_fallback(spark, tmp_path):
    # the SAME TableIO call sequence the iceberg smoke test runs, on the
    # parquet fallback — the two branches share one behavioral contract
    from string_grouper_spark.sources.catalog import TableIO

    io = TableIO(spark, str(tmp_path), catalog="not_configured_anywhere")
    assert io.catalog is None  # unconfigured catalog -> parquet fallback
    df = spark.range(5).withColumnRenamed("id", "doc_id")
    assert not io.exists("smoke_tbl")
    io.write(df, "smoke_tbl")
    assert io.exists("smoke_tbl")
    got = sorted(r["doc_id"] for r in io.read("smoke_tbl").collect())
    assert got == [0, 1, 2, 3, 4]
