"""Group-rep re-selection goldens (reference test_string_grouper_utils.py)
for both the pandas-parity wrappers and the Spark window implementations."""

import pandas as pd
import pandas.testing as pdt
from pyspark.sql import functions as F

from string_grouper_spark.operators.group_rep import (
    group_rep_by_completeness,
    group_rep_by_earliest_timestamp,
    group_rep_by_highest_weight,
    new_group_rep_by_completeness,
    new_group_rep_by_earliest_timestamp,
    new_group_rep_by_highest_weight,
)


def fixture_df(customers_df):
    # reference TSGU:10-27-style grouped frame: mixed-tz ISO timestamp strings
    df = customers_df.copy()
    df["timestamp"] = [
        "2014-12-30 10:55:00-02:00",
        "1998-04-14 09:21:11+00:00",
        "2001-07-01 00:00:00+01:00",
        "2017-02-28 07:17:01+00:00",
        "2011-11-11 11:11:11-05:00",
        "1995-05-18 18:25:13+00:00",
    ]
    df["group_id"] = ["G0", "G1", "G1", "G1", "G2", "G0"]
    return df


def test_pandas_earliest_timestamp(customers_df):
    df = fixture_df(customers_df)
    got = new_group_rep_by_earliest_timestamp(
        df, "group_id", "Customer ID", "timestamp", record_name_col="Customer Name"
    )
    # G0: 1995 row (EE059082Q); G1: 1998 row (CC082744L); G2: itself
    expected_ids = ["EE059082Q", "CC082744L", "CC082744L", "CC082744L", "HH072982K", "EE059082Q"]
    assert got.iloc[:, 0].tolist() == expected_ids


def test_pandas_earliest_timestamp_fuzzy_formats(customers_df):
    # dateutil-grade parsing (reference SGU:139-155): mixed non-ISO formats,
    # incl. a fuzzy sentence (needs fuzzy=True forwarded to dateutil.parse)
    df = fixture_df(customers_df)
    df["timestamp"] = [
        "30 December 2014 10:55 am",
        "April 14, 1998 9:21:11",
        "the 1st of July 2001 at noon",   # fuzzy
        "28/02/2017 07:17",               # dayfirst-able
        "11 Nov 2011 11:11AM",
        "May 18th 1995, 6:25 pm",
    ]
    got = new_group_rep_by_earliest_timestamp(
        df, "group_id", "Customer ID", "timestamp", fuzzy=True
    )
    expected = ["EE059082Q", "CC082744L", "CC082744L", "CC082744L", "HH072982K", "EE059082Q"]
    assert got.tolist() == expected


def test_pandas_earliest_timestamp_parserinfo(customers_df):
    # a custom parserinfo changes interpretation: dayfirst=True flips
    # 04/07/2001 from April 7 to July 4
    from dateutil.parser import parserinfo

    df = fixture_df(customers_df)
    df["group_id"] = ["GX"] * 6
    df["timestamp"] = [
        "04/07/2001",  # dayfirst: 4 Jul; monthfirst: 7 Apr
        "2001-06-01",
        "2001-08-01",
        "2001-09-01",
        "2001-10-01",
        "2001-11-01",
    ]
    default = new_group_rep_by_earliest_timestamp(df, "group_id", "Customer ID", "timestamp")
    assert default.tolist() == ["BB016741P"] * 6  # Apr 7 is earliest
    flipped = new_group_rep_by_earliest_timestamp(
        df, "group_id", "Customer ID", "timestamp", parserinfo=parserinfo(dayfirst=True)
    )
    assert flipped.tolist() == ["CC082744L"] * 6  # Jun 1 beats Jul 4


def test_pandas_timestamp_bad_strings_raise(customers_df):
    import pytest

    df = fixture_df(customers_df)
    df["timestamp"] = ["not a date at all"] + df["timestamp"].tolist()[1:]
    with pytest.raises(Exception, match="date-like"):
        new_group_rep_by_earliest_timestamp(df, "group_id", "Customer ID", "timestamp")


def test_spark_earliest_timestamp_dateutil_parser(spark, customers_df):
    # the DataFrame-layer operator handles fuzzy formats too when asked
    df = fixture_df(customers_df)
    df["timestamp"] = [
        "30 December 2014 10:55 am",
        "April 14, 1998 9:21:11",
        "the 1st of July 2001 at noon",
        "28/02/2017 07:17",
        "11 Nov 2011 11:11AM",
        "May 18th 1995, 6:25 pm",
    ]
    df["pos"] = range(len(df))
    sdf = spark.createDataFrame(df.rename(columns={"Customer ID": "cid"}))
    out = (
        group_rep_by_earliest_timestamp(
            sdf, "group_id", "cid", "timestamp",
            pos_col="pos", timestamp_parser="dateutil", fuzzy=True,
        )
        .toPandas()
        .sort_values("pos")
    )
    assert out["new_cid"].tolist() == [
        "EE059082Q", "CC082744L", "CC082744L", "CC082744L", "HH072982K", "EE059082Q"
    ]


def test_pandas_highest_weight(customers_df):
    df = fixture_df(customers_df)
    got = new_group_rep_by_highest_weight(df, "group_id", "Customer ID", "weight")
    # G0: weight 1.0 (EE059082Q); G1: 0.5 (CC082744L); G2: HH072982K
    expected = ["EE059082Q", "CC082744L", "CC082744L", "CC082744L", "HH072982K", "EE059082Q"]
    assert got.tolist() == expected


def test_pandas_completeness(customers_df):
    df = fixture_df(customers_df)
    got = new_group_rep_by_completeness(
        df, "group_id", "Customer ID", tested_cols=["Address", "Tel", "Description"]
    )
    # row 1 (CC082744L) has empty Address+Description -> loses to AA098762D
    expected = ["BB016741P", "AA098762D", "AA098762D", "AA098762D", "HH072982K", "BB016741P"]
    assert got.tolist() == expected


def test_spark_matches_pandas(spark, customers_df):
    df = fixture_df(customers_df)
    df["pos"] = range(len(df))
    sdf = spark.createDataFrame(
        df.rename(columns={"Customer ID": "cid", "Customer Name": "cname"})
    )
    out = (
        group_rep_by_earliest_timestamp(sdf, "group_id", "cid", "timestamp", pos_col="pos")
        .toPandas()
        .sort_values("pos")
    )
    assert out["new_cid"].tolist() == [
        "EE059082Q", "CC082744L", "CC082744L", "CC082744L", "HH072982K", "EE059082Q"
    ]
    out = (
        group_rep_by_highest_weight(sdf, "group_id", "cid", "weight", pos_col="pos")
        .toPandas()
        .sort_values("pos")
    )
    assert out["new_cid"].tolist() == [
        "EE059082Q", "CC082744L", "CC082744L", "CC082744L", "HH072982K", "EE059082Q"
    ]
    out = (
        group_rep_by_completeness(
            sdf, "group_id", "cid", ["Address", "Tel", "Description"], pos_col="pos"
        )
        .toPandas()
        .sort_values("pos")
    )
    assert out["new_cid"].tolist() == [
        "BB016741P", "AA098762D", "AA098762D", "AA098762D", "HH072982K", "BB016741P"
    ]
