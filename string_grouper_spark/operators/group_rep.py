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

    Implemented as ONE min/max-of-struct aggregation + join back, not a
    ``row_number`` window over the group: a boilerplate megagroup would
    sort inside a single window task, while the aggregation combines
    map-side and the join is AQE-splittable.  Ordering equivalence: the
    struct compares (weight, ±_pos) lexicographically — ``_pos`` is unique,
    so the carried payload never participates — and Spark's total order
    places NULL smallest, reproducing the window's nulls-first-asc /
    nulls-last-desc placement exactly (max-of-struct with negated _pos
    flips the tie-break back to first-occurrence).
    """
    payload = F.struct(*[F.col(c).alias(c) for c in out_cols]).alias("_vals")
    if ascending:
        pick = F.min(
            F.struct(weight.alias("_w"), F.col("_pos").alias("_p"), payload)
        )
    else:
        pick = F.max(
            F.struct(weight.alias("_w"), (-F.col("_pos")).alias("_p"), payload)
        )
    reps = (
        df.groupBy(group_col)
        .agg(pick.alias("_pick"))
        .select(
            group_col,
            *[F.col(f"_pick._vals.{c}").alias(f"_rep_{c}") for c in out_cols],
        )
    )
    out = df.join(reps, group_col)
    for c in out_cols:
        out = out.withColumn(f"new_{c}", F.col(f"_rep_{c}")).drop(f"_rep_{c}")
    return out


def _with_pos(df: DataFrame, pos_col: Optional[str]) -> DataFrame:
    """Attach the deterministic tie-break position column.

    Without ``pos_col`` positions are derived zipWithIndex-style (partition
    sizes counted once, then a per-partition running number offset by the
    cumulative size) — NEVER via an unpartitioned global window, which would
    funnel the whole table through one task.
    """
    if pos_col is not None:
        return df.withColumn("_pos", F.col(pos_col))
    # Multiple jobs read df (offset collect + position tagging + the caller's
    # agg/join-back); localCheckpoint pins ONE partition layout across all of
    # them — without it AQE re-planning or lazy re-computation could shift
    # partition ids between the jobs and the offsets would label the wrong
    # partitions.  localCheckpoint (not persist): eager, truncates lineage so
    # downstream can never recompute the layout-sensitive scan, and its
    # blocks are released by the ContextCleaner when the plan is dropped —
    # persist() leaked a CacheManager entry for the session lifetime because
    # no caller could safely unpersist a lazily-consumed result.
    df = df.localCheckpoint()
    sizes = (
        df.select(F.spark_partition_id().alias("_pid"))
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .toPandas()
        .sort_values("_pid")
    )
    offsets = dict(zip(sizes["_pid"], sizes["_cnt"].cumsum() - sizes["_cnt"]))
    spark = df.sparkSession
    offsets_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
        )
    )
    w = Window.partitionBy("_pid").orderBy(F.monotonically_increasing_id())
    # LEFT join + hard error on a missing offset: an inner join would
    # SILENTLY DROP every row of a partition id absent from the collected
    # offsets (coalesce short-circuits, so the error fires only on null)
    missing = F.raise_error(
        F.lit("_with_pos: partition layout changed between jobs")
    ).cast("long")
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .withColumn("_rn", F.row_number().over(w))
        .join(offsets_df, "_pid", "left")
        .withColumn("_pos", F.coalesce(F.col("_off"), missing) + F.col("_rn"))
        .drop("_pid", "_rn", "_off")
    )


def _dateutil_parse_udf(parserinfo=None, **kwargs):
    """Arrow-vectorized dateutil parser column: arbitrary date-like strings
    -> UTC timestamps (reference SGU:139-155 semantics on the Spark layer).
    Unparseable strings raise, matching the reference's hard error."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import TimestampType

    @pandas_udf(TimestampType())
    def parse_ts(s: pd.Series) -> pd.Series:
        from datetime import timezone

        from dateutil.parser import parse

        return s.map(
            lambda x: None
            if x is None
            else parse(x, parserinfo, **kwargs).astimezone(timezone.utc)
        )

    return parse_ts


def group_rep_by_earliest_timestamp(
    df: DataFrame,
    group_col: str,
    record_id_col: str,
    timestamp_col: str,
    record_name_col: Optional[str] = None,
    pos_col: Optional[str] = None,
    timestamp_parser: str = "iso",
    parserinfo=None,
    **parse_kwargs,
) -> DataFrame:
    """Rep = row with min timestamp per group (SGU:11-41).

    ``timestamp_col`` may be a timestamp or a parseable string.  String
    parsing: ``timestamp_parser='iso'`` uses the JVM ``to_timestamp``
    (codegen, no Python); ``'dateutil'`` routes through an Arrow-vectorized
    dateutil parser for arbitrary/fuzzy formats, honoring ``parserinfo`` and
    dateutil kwargs (e.g. ``fuzzy=True``) — same grammar as the pandas
    wrapper ``new_group_rep_by_earliest_timestamp``.
    """
    df = _with_pos(df, pos_col)
    ts = F.col(timestamp_col)
    if dict(df.dtypes)[timestamp_col] == "string":
        if timestamp_parser == "dateutil":
            ts = _dateutil_parse_udf(parserinfo, **parse_kwargs)(ts)
        else:
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


def _parse_timestamps(timestamps: pd.Series, parserinfo=None, **kwargs) -> pd.Series:
    """Reference parse_timestamps semantics (SGU:139-155): dateutil-grade
    parsing of arbitrary date-like strings (fuzzy formats like
    '11 August 2016 at 3:00pm' included), with an optional ``parserinfo``
    forwarded to ``dateutil.parser.parse``; pandas Timestamps, datetimes and
    plain numbers pass through as comparable weights."""
    from datetime import datetime, timezone
    from numbers import Number

    from dateutil.parser import parse

    error_msg = (
        "timestamps must be a Series of date-like or datetime-like strings"
        " or datetime datatype or pandas Timestamp datatype or numbers"
    )

    def _all(tp) -> bool:
        return not timestamps.map(lambda x: not isinstance(x, tp)).any()

    def _is_date(s: str) -> bool:
        try:
            parse(s, parserinfo, **kwargs)
            return True
        except (ValueError, OverflowError):
            return False

    if _all(str):
        if timestamps.map(_is_date).all():
            return timestamps.transform(
                lambda x: parse(x, parserinfo, **kwargs).astimezone(timezone.utc)
            )
    elif _all(type(pd.Timestamp("15-1-2000"))):
        return timestamps.transform(lambda x: x.to_numpy())
    elif _all(datetime):
        return timestamps.transform(lambda x: x.astimezone(timezone.utc))
    elif _all(Number):
        return timestamps
    raise Exception(error_msg)


def _group_rep_transform(method, weights, grouped_data, group_col, record_id_col, record_name_col):
    """Per-group argmin/argmax re-selection (semantics of the reference's
    group_rep_transform, string_grouper_utils.py:106-127, derived from its
    golden fixtures — not a transcription).

    Implementation: one stable sort by weight + ``drop_duplicates`` per
    group picks each group's representative ROW POSITION — the first
    occurrence of the extreme weight in frame order, exactly pandas
    idxmin/idxmax tie-break — then every row takes its group rep's id/name.
    """
    positions = pd.RangeIndex(len(grouped_data))
    groups = _get_column(group_col, grouped_data).reset_index(drop=True)
    frame = pd.DataFrame({"g": groups, "w": weights.reset_index(drop=True), "pos": positions})
    best = (
        frame.sort_values("w", ascending=(method == "idxmin"), kind="stable")
        .drop_duplicates("g")
        .set_index("g")["pos"]
    )
    rep_pos = groups.map(best).to_numpy()

    def take(col):
        return _get_column(col, grouped_data).iloc[rep_pos].reset_index(drop=True).rename(None)

    output = take(record_id_col)
    if record_name_col is not None:
        output = pd.concat([output, take(record_name_col)], axis=1)
    output.index = grouped_data.index
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
    weights = _parse_timestamps(timestamps, parserinfo, **kwargs)
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
