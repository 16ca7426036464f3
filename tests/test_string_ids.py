"""Non-integral id columns (the input_hint's natural ``url`` key) on every
scale-path entry point: deterministic xxhash64 mapping, min-original-id
component labels, checkpoint resume stability."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from string_grouper_spark.config import MatchConfig
from string_grouper_spark.operators.dedup import (
    near_duplicate_clusters_scale,
    run_with_long_ids,
)
from string_grouper_spark.plans.fast_dedup import fast_lsh_dedup
from string_grouper_spark.sources.pages import generate_pages

KW = dict(num_perm=128, num_bands=32, max_bucket_size=None)


@pytest.fixture(scope="module")
def pages(spark):
    return generate_pages(spark, 120, dup_fraction=0.5).persist()


def _expected_url_labels(pages, numeric_labels):
    # numeric run's components, relabelled to min(url) per component
    j = numeric_labels.join(
        pages.select(F.col("page_id").alias("doc_id"), "url"), "doc_id"
    )
    rep = j.groupBy("component").agg(F.min("url").alias("comp_url"))
    return (
        j.join(rep, "component")
        .select("url", F.col("comp_url").alias("component"))
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )


def test_fast_lsh_dedup_string_ids(spark, pages):
    cfg = MatchConfig(min_similarity=0.8)
    got = (
        fast_lsh_dedup(pages, cfg, id_col="url", **KW)
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    num = fast_lsh_dedup(
        pages.select(F.col("page_id").alias("doc_id"), "text"), cfg, **KW
    )
    pd.testing.assert_frame_equal(got, _expected_url_labels(pages, num))
    # labels live in the ORIGINAL id space
    assert got["component"].str.startswith("https://").all()


def test_scale_union_string_ids(spark, pages):
    cfg = MatchConfig(min_similarity=0.8)
    gens = ("minhash", "suffix")
    got = (
        near_duplicate_clusters_scale(
            pages, cfg, generators=gens, id_col="url", anchor_len=16, **KW
        )
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    num = near_duplicate_clusters_scale(
        pages.select(F.col("page_id").alias("doc_id"), "text"),
        cfg, generators=gens, anchor_len=16, **KW,
    )
    pd.testing.assert_frame_equal(got, _expected_url_labels(pages, num))


def test_checkpointed_union_string_ids_resume(spark, pages, tmp_path):
    from string_grouper_spark.checkpoint import checkpointed_union_dedup_pipeline

    cfg = MatchConfig(min_similarity=0.8)
    r1 = (
        checkpointed_union_dedup_pipeline(
            spark, pages, cfg, str(tmp_path), generators=("minhash",),
            id_col="url", **KW,
        )
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    r2 = (
        checkpointed_union_dedup_pipeline(
            spark, pages, cfg, str(tmp_path), generators=("minhash",),
            id_col="url", **KW,
        )
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(r1, r2)
    assert list(r1.columns) == ["url", "component"]


def test_integral_ids_pass_through_untouched(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1, 2], "text": ["a", "b"]}))
    seen = {}

    def run(d, lid):
        seen["id_col"] = lid
        seen["cols"] = d.columns
        return d.select(F.col(lid), F.lit(1).alias("component"))

    run_with_long_ids(df, "doc_id", run)
    assert seen["id_col"] == "doc_id"
    assert "_sg_lid" not in seen["cols"]


def test_null_string_ids_raise(spark):
    """xxhash64(NULL) is the seed for every null row — without the guard,
    all null-id docs would silently merge into one document."""
    df = spark.createDataFrame(
        pd.DataFrame({"url": ["a", None, None], "text": ["x", "y", "z"]})
    )
    with pytest.raises(ValueError) as ei:
        run_with_long_ids(
            df, "url", lambda d, lid: d.select(F.col(lid), F.lit(1).alias("component"))
        )
    assert "NULL" in str(ei.value) and "url" in str(ei.value)
