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
