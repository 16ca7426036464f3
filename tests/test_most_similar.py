"""match_most_similar + compute_pairwise_similarities goldens
(reference test_string_grouper.py:364-394, 815-939)."""

import numpy as np
import pandas as pd
import pandas.testing as pdt

from string_grouper_spark import compute_pairwise_similarities, match_most_similar


def test_compute_pairwise_similarities(spark, customers_df):
    # TSG:364-385 — exact golden values
    df1 = customers_df["Customer Name"]
    df2 = pd.Series(
        [
            "Mega Enterprises Corporation",
            "Hyper Startup Inc.",
            "Hyper Startup Inc.",
            "Hyper Startup Inc.",
            "Hyper Hyper Inc.",
            "Mega Enterprises Corporation",
        ],
        name="group_rep_Customer Name",
    )
    got = compute_pairwise_similarities(df1, df2)
    expected = pd.Series(
        [1.0, 0.6336195351561589, 1.0000000000000004, 1.0000000000000004, 1.0, 0.826462625999832],
        name="similarity",
    )
    assert got.name == "similarity"
    np.testing.assert_allclose(got.to_numpy(), expected.to_numpy(), atol=1e-9)


def test_pairwise_unequal_lengths_raise(spark, customers_df):
    import pytest

    with pytest.raises(Exception):
        compute_pairwise_similarities(
            customers_df["Customer Name"], customers_df["Customer Name"][:-2]
        )


def test_match_most_similar_basic(spark):
    # docstring example (SG:95-110): master [foooo, bar, baz]; dupes [foooob, bar, new]
    master = pd.Series(["foooo", "bar", "baz"])
    dupes = pd.Series(["foooob", "bar", "new"])
    got = match_most_similar(master, dupes, ignore_index=True)
    expected = pd.Series(["foooo", "bar", "new"], name="most_similar_master")
    pdt.assert_series_equal(expected, got)


def test_match_most_similar_echo_unmatched(spark, customers_df):
    # TSG:909-939-style: a duplicate with no master above threshold echoes itself
    master = customers_df["Customer Name"]
    dupes = pd.Series(["Hyper Startup Inc.", "dooz"])
    got = match_most_similar(master, dupes, ignore_index=True)
    expected = pd.Series(["Hyper Startup Inc.", "dooz"], name="most_similar_Customer Name")
    pdt.assert_series_equal(expected, got)


def test_match_most_similar_tie_breaks_to_min_master(spark):
    # TSG:880-907-style: equal-similarity tie -> lowest master index (SG:806-807)
    master = pd.Series(["foo", "foo", "bar"])
    dupes = pd.Series(["foo"])
    got = match_most_similar(master, dupes, ignore_index=False)
    # winner must be master index 0
    assert got["most_similar_index"].iloc[0] == 0


def test_match_most_similar_with_ids(spark):
    master = pd.Series(["foooo", "bar", "baz"])
    master_id = pd.Series(["M0", "M1", "M2"])
    dupes = pd.Series(["foooob", "bar", "new"])
    dupes_id = pd.Series(["D0", "D1", "D2"])
    got = match_most_similar(
        master, dupes, master_id=master_id, duplicates_id=dupes_id, ignore_index=True
    )
    expected = pd.DataFrame(
        {
            "most_similar_master_id": ["M0", "M1", "D2"],
            "most_similar_master": ["foooo", "bar", "new"],
        }
    )
    pdt.assert_frame_equal(expected, got)


def test_match_most_similar_replace_na_index(spark):
    # TSG:866-878-style: replace_na fills missing master index with dupe index
    master = pd.Series(["foooo", "bar", "baz"], index=[10, 11, 12])
    dupes = pd.Series(["foooob", "new"], index=[20, 21])
    got = match_most_similar(master, dupes, replace_na=True)
    assert list(got.index) == [20, 21]
    assert got["most_similar_index"].tolist() == [10, 21]
