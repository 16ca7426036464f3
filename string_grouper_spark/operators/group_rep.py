"""Post-hoc group-representative re-selection (reference A8-A11,
/root/reference/string_grouper_utils/string_grouper_utils.py:11-127).

Spark-native: each selector is one window argmin/argmax over
``Window.partitionBy(group)`` joined back — replacing the reference's
groupby-transform + iloc re-select.  Also ships pandas wrappers with the
reference's exact signatures for parity tests.
"""

from __future__ import annotations

from typing import List, Optional, Union

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _rep_by_weight(
    df: DataFrame,
    group_col: str,
    weight: Column,
    ascending: bool,
    out_cols: List[str],
) -> DataFrame:
    """One row per input row: the representative's ``out_cols`` values.

    Tie-break = first row in frame order; we require a deterministic
    ``_pos`` ordering column (caller attaches it), mirroring pandas
    idxmin/idxmax first-occurrence semantics (SGU:116-117).
    """
    order = [weight.asc() if ascending else weight.desc(), F.col("_pos").asc()]
    w = Window.partitionBy(group_col).orderBy(*order)
    reps = (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(group_col, *[F.col(c).alias(f"_rep_{c}") for c in out_cols])
    )
    out = df.join(reps, group_col)
    for c in out_cols:
        out = out.withColumn(f"new_{c}", F.col(f"_rep_{c}")).drop(f"_rep_{c}")
    return out


def _with_pos(df: DataFrame, pos_col: Optional[str]) -> DataFrame:
    if pos_col is not None:
        return df.withColumn("_pos", F.col(pos_col))
    w = Window.orderBy(F.monotonically_increasing_id())
    return df.withColumn("_pos", F.row_number().over(w))


def group_rep_by_earliest_timestamp(
    df: DataFrame,
    group_col: str,
    record_id_col: str,
    timestamp_col: str,
    record_name_col: Optional[str] = None,
    pos_col: Optional[str] = None,
) -> DataFrame:
    """Rep = row with min timestamp per group (SGU:11-41).

    ``timestamp_col`` may be a timestamp or a parseable string (ISO handled
    by ``to_timestamp``; fuzzier formats should be pre-parsed by the caller
    via the pandas wrapper which uses dateutil).
    """
    df = _with_pos(df, pos_col)
    ts = F.col(timestamp_col)
    if dict(df.dtypes)[timestamp_col] == "string":
        ts = F.to_timestamp(ts)
    out_cols = [record_id_col] + ([record_name_col] if record_name_col else [])
    return _rep_by_weight(df, group_col, ts, True, out_cols).drop("_pos")


def group_rep_by_highest_weight(
    df: DataFrame,
    group_col: str,
    record_id_col: str,
    weight_col: str,
    record_name_col: Optional[str] = None,
    pos_col: Optional[str] = None,
) -> DataFrame:
    """Rep = row with max user weight per group (SGU:81-103)."""
    df = _with_pos(df, pos_col)
    out_cols = [record_id_col] + ([record_name_col] if record_name_col else [])
    return _rep_by_weight(df, group_col, F.col(weight_col), False, out_cols).drop("_pos")


def group_rep_by_completeness(
    df: DataFrame,
    group_col: str,
    record_id_col: str,
    tested_cols: List[str],
    record_name_col: Optional[str] = None,
    pos_col: Optional[str] = None,
) -> DataFrame:
    """Rep = row with most non-null / non-empty fields (SGU:44-78)."""
    df = _with_pos(df, pos_col)
    weight = sum(
        F.when(F.col(c).isNotNull() & (F.col(c).cast("string") != ""), 1).otherwise(0)
        for c in tested_cols
    )
    out_cols = [record_id_col] + ([record_name_col] if record_name_col else [])
    return _rep_by_weight(df, group_col, weight, False, out_cols).drop("_pos")


# ---------------------------------------------------------------------------
# pandas wrappers with the reference's exact signatures + output shapes
# ---------------------------------------------------------------------------

def _get_column(col, data: pd.DataFrame):
    if isinstance(col, str):
        return data.loc[:, col]
    if isinstance(col, int):
        return data.iloc[:, col]
    if isinstance(col, list):
        return pd.concat([_get_column(m, data) for m in col], axis=1)
    raise TypeError(col)


def _parse_timestamps(timestamps: pd.Series) -> pd.Series:
    """Reference parse_timestamps (SGU:139-155) without dateutil dependency:
    pandas' mixed-format parser covers the reference fixtures (mixed-tz ISO
    strings, Timestamps, datetimes, numbers)."""
    from numbers import Number

    if timestamps.map(lambda x: isinstance(x, str)).all():
        parsed = pd.to_datetime(timestamps, utc=True, format="mixed")
        return parsed
    if timestamps.map(lambda x: isinstance(x, Number)).all():
        return timestamps
    return pd.to_datetime(timestamps, utc=True, format="mixed")


def _group_rep_transform(method, weights, grouped_data, group_col, record_id_col, record_name_col):
    """Reference group_rep_transform (SGU:106-127)."""
    stashed_index = grouped_data.index
    groups = _get_column(group_col, grouped_data).reset_index(drop=True).rename("raw_group_id")
    frame = groups.to_frame()
    frame["weight"] = weights.reset_index(drop=True)
    frame["group_rep"] = frame.groupby("raw_group_id", sort=False)["weight"].transform(method)
    record_ids = _get_column(record_id_col, grouped_data)
    new_rep = record_ids.iloc[frame.group_rep].reset_index(drop=True).rename(None)
    if record_name_col is None:
        output = new_rep
    else:
        names = _get_column(record_name_col, grouped_data)
        new_rep_name = names.iloc[frame.group_rep].reset_index(drop=True).rename(None)
        output = pd.concat([new_rep, new_rep_name], axis=1)
    output.index = stashed_index
    return output


def new_group_rep_by_earliest_timestamp(
    grouped_data: pd.DataFrame,
    group_col,
    record_id_col,
    timestamps,
    record_name_col=None,
    parserinfo=None,
    **kwargs,
) -> Union[pd.DataFrame, pd.Series]:
    if isinstance(timestamps, pd.Series):
        if len(grouped_data) != len(timestamps):
            raise Exception("Both grouped_data and timestamps must be pandas.Series of the same length.")
    else:
        timestamps = _get_column(timestamps, grouped_data)
    weights = _parse_timestamps(timestamps)
    return _group_rep_transform("idxmin", weights, grouped_data, group_col, record_id_col, record_name_col)


def new_group_rep_by_completeness(
    grouped_data: pd.DataFrame,
    group_col,
    record_id_col,
    record_name_col=None,
    tested_cols=None,
) -> Union[pd.DataFrame, pd.Series]:
    if isinstance(tested_cols, pd.DataFrame):
        if len(grouped_data) != len(tested_cols):
            raise Exception("Both grouped_data and tested_cols must be pandas.DataFrame of the same length.")
    elif tested_cols is not None:
        tested_cols = _get_column(tested_cols, grouped_data)
    else:
        tested_cols = grouped_data

    def filled(x):
        return 0 if (x == "" or pd.isnull(x)) else 1

    weights = tested_cols.map(filled).sum(axis=1)
    return _group_rep_transform("idxmax", weights, grouped_data, group_col, record_id_col, record_name_col)


def new_group_rep_by_highest_weight(
    grouped_data: pd.DataFrame,
    group_col,
    record_id_col,
    weights,
    record_name_col=None,
) -> Union[pd.DataFrame, pd.Series]:
    if isinstance(weights, pd.Series):
        if len(grouped_data) != len(weights):
            raise Exception("Both grouped_data and weights must be pandas.Series of the same length.")
    else:
        weights = _get_column(weights, grouped_data)
    return _group_rep_transform("idxmax", weights, grouped_data, group_col, record_id_col, record_name_col)
