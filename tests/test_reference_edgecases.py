"""Reference edge-case parity: add/remove match, corpus-reuse methods,
float32 dtype, nullable Int64 ids, option validation, config updates
(reference test_string_grouper.py:338-362, 451-476, 846-864, 949-1044)."""

import numpy as np
import pandas as pd
import pandas.testing as pdt
import pytest

from string_grouper_spark import (
    SparkStringGrouper,
    group_similar_strings,
    match_most_similar,
    match_strings,
)


def test_add_match_merges_groups(spark):
    # TSG:1027-1044: the three MS-Office strings converge into one group
    s = pd.Series(
        ["microsoft office", "microsoft word", "microsoft excel", "unrelated thing"]
    )
    sg = SparkStringGrouper(s, min_similarity=0.8).fit()
    before = sg.get_groups(ignore_index=True)
    assert before.nunique() == 4  # nothing merges at 0.8
    sg = sg.add_match("microsoft office", "microsoft word")
    sg = sg.add_match("microsoft word", "microsoft excel")
    after = sg.get_groups(ignore_index=True)
    assert after[0] == after[1] == after[2]
    assert after[3] == "unrelated thing"


def test_add_match_is_symmetric_for_self_join(spark):
    s = pd.Series(["aaa bbb", "ccc ddd"])
    sg = SparkStringGrouper(s, min_similarity=0.8).fit().add_match("aaa bbb", "ccc ddd")
    ml = sg._matches_list
    assert ((ml.master_side == 0) & (ml.dupe_side == 1)).any()
    assert ((ml.master_side == 1) & (ml.dupe_side == 0)).any()


def test_remove_match_both_directions(spark):
    s = pd.Series(["foo bar", "foo bar!", "baz"])
    sg = SparkStringGrouper(s, min_similarity=0.5).fit()
    groups = sg.get_groups(ignore_index=True)
    assert groups[0] == groups[1]
    sg = sg.remove_match("foo bar", "foo bar!")
    groups = sg.get_groups(ignore_index=True)
    assert groups[0] != groups[1]


def test_corpus_reuse_methods(spark, customers_df):
    names = customers_df["Customer Name"]
    sg = SparkStringGrouper(names, min_similarity=0.6)
    g1 = sg.group_similar_strings(names, min_similarity=0.6, ignore_index=True)
    m1 = sg.match_strings(names, min_similarity=0.6)
    assert len(m1) > 6
    p1 = sg.compute_pairwise_similarities(names, names)
    np.testing.assert_allclose(p1.to_numpy(), np.ones(6), atol=1e-9)
    top1 = sg.match_most_similar(names, pd.Series(["Mega Enterprises Corp"]), ignore_index=True)
    assert top1.iloc[0] == "Mega Enterprises Corp."


def test_float32_dtype_accepted(spark):
    s = pd.Series(["foo", "bar", "baz", "foo"])
    out = match_strings(s, tfidf_matrix_dtype=np.float32)
    assert len(out) == 6
    out64 = match_strings(s, tfidf_matrix_dtype=np.float64)
    pdt.assert_frame_equal(
        out.sort_values(["left_index", "right_index"]).reset_index(drop=True),
        out64.sort_values(["left_index", "right_index"]).reset_index(drop=True),
        check_exact=False,
        atol=1e-6,
    )


def test_invalid_dtype_rejected(spark):
    s = pd.Series(["foo", "bar"])
    for bad in (None, 0, "whatever"):
        with pytest.raises(Exception):
            match_strings(s, tfidf_matrix_dtype=bad)


def test_nullable_int64_ids(spark):
    # TSG:846-864: nullable Int64 master ids survive the unmatched-fallback
    master = pd.Series(["foooo", "bar"])
    master_id = pd.Series([1, 2], dtype="Int64")
    dupes = pd.Series(["foooob", "nomatch"])
    dupes_id = pd.Series([11, 12], dtype="Int64")
    got = match_most_similar(
        master, dupes, master_id=master_id, duplicates_id=dupes_id, ignore_index=True
    )
    assert got["most_similar_master_id"].tolist() == [1, 12]
    assert got["most_similar_master_id"].dtype == master_id.dtype


def test_update_options_revalidates(spark):
    sg = SparkStringGrouper(pd.Series(["foo", "bar"]))
    with pytest.raises(Exception):
        sg.update_options(group_rep="bogus")
    sg.update_options(min_similarity=0.3)
    assert sg._config.min_similarity == 0.3
    assert sg.is_build is False


def test_unknown_option_rejected(spark):
    with pytest.raises(TypeError):
        SparkStringGrouper(pd.Series(["foo"]), not_an_option=1)


def test_multiindex_carried_through(spark):
    # reference carries (Multi)Index values into outputs (SG:933-937)
    idx = pd.MultiIndex.from_tuples(
        [("a", 1), ("a", 2), ("b", 1)], names=["grp", "num"]
    )
    s = pd.Series(["foo", "foo", "bar"], index=idx)
    out = match_strings(s, min_similarity=0.5)
    assert "left_grp" in out.columns and "left_num" in out.columns
    assert "right_grp" in out.columns and "right_num" in out.columns


def test_group_similar_strings_empty_and_singleton(spark):
    got = group_similar_strings(pd.Series(["onlyone"]), ignore_index=True)
    assert got.tolist() == ["onlyone"]
