"""Aggregation operators: count, pivot, timeline.

All three are hash aggregates — Catalyst plans them as partial (map-side)
+ final aggregation, so the shuffle carries only group keys + partial
states, not rows. That is the property that makes them survive a 100×
scale-up; nothing here collects to the driver.
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qsvspark.ops.helpers import (
    parse_interval_ms,
    ts_column,
    require_columns,
    resolve_colspec,
)


def count(df: DataFrame) -> DataFrame:
    """Group by ALL columns, append a ``count`` column, sort desc.

    Reference: /root/reference/src/operations/chainables/count.rs:4-26
    (group/agg/sort :19-25). Tie order among equal counts is unspecified
    in the reference too.
    """
    cols = df.columns
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.col("count").desc())
    )


_PIVOT_AGGS = {
    "sum": F.sum,
    "mean": F.mean,
    "avg": F.mean,
    "count": F.count,
    "min": F.min,
    "max": F.max,
    "median": F.median,
    "std": F.stddev_samp,  # reference uses ddof=1 (pivot.rs:56 `.std(1)`)
}


def pivot(
    df: DataFrame,
    rows: str | list[str],
    cols: str | list[str],
    values: str,
    agg: str = "sum",
) -> DataFrame:
    """Grouped aggregation keyed on rows ⊕ cols (NOT a true cross-tab).

    Reference: chainables/pivot.rs:4-80 — explicitly "simplified"
    (:35-36): groups by rows+cols together (:43-46), aggregates the values
    column (:49-63), names the output ``{values}_{agg}`` (:69); unknown
    agg warns and falls back to sum (matching the reference's behavior).
    """
    row_cols = resolve_colspec(df.columns, rows)
    col_cols = resolve_colspec(df.columns, cols)
    require_columns(df, [values])
    if agg not in _PIVOT_AGGS:
        warnings.warn(f"unknown agg '{agg}', falling back to sum", stacklevel=2)
        agg = "sum"
    fn = _PIVOT_AGGS[agg]
    out = f"{values}_{agg}"
    return df.groupBy(*row_cols, *col_cols).agg(fn(values).alias(out))


def _bucket_expr(ts: Column, interval_ms: int) -> Column:
    """Floor a timestamp to an interval boundary (epoch-aligned, like the
    reference's integer floor of epoch units, timeline.rs:41-64)."""
    if interval_ms % 1000 == 0:
        sec = interval_ms // 1000
        return F.timestamp_seconds(
            (F.floor(F.unix_timestamp(ts) / sec) * sec).cast("long")
        )
    return F.timestamp_millis(
        (F.floor(F.unix_millis(ts) / interval_ms) * interval_ms).cast("long")
    )


_TIMELINE_AGGS = {
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "std": F.stddev_samp,
}


def timeline(
    df: DataFrame,
    time_column: str,
    interval: str = "1h",
    agg: str | None = None,
    agg_column: str | None = None,
) -> DataFrame:
    """Bucket rows by time interval; always emit ``count``; optionally one
    of sum/avg/min/max/std over a value column (cast to double).

    Reference: chainables/timeline.rs:5-170 — bucket closure :41-64 (a
    per-row Rust closure; here it is a codegen'd floor expression), agg
    exprs :66-104, group+sort :106-110, multi-format parse incl. Apache
    log + unix epoch :136-157 (see helpers.parse_ts_any). Output bucket
    column is named ``timeline_{interval}`` and formatted
    ``yyyy-MM-dd HH:mm:ss`` (proven by tests/test_chainables_timeline.py:14).
    """
    require_columns(df, [time_column])
    ms = parse_interval_ms(interval)
    bucket_name = f"timeline_{interval}"
    fmt = "yyyy-MM-dd HH:mm:ss.SSS" if ms % 1000 else "yyyy-MM-dd HH:mm:ss"
    bucket = F.date_format(_bucket_expr(ts_column(df, time_column), ms), fmt)
    aggs = [F.count(F.lit(1)).alias("count")]
    if agg is not None:
        if agg not in _TIMELINE_AGGS:
            raise ValueError(f"unknown timeline agg '{agg}' (one of {list(_TIMELINE_AGGS)})")
        if agg_column is None:
            raise ValueError("timeline agg requires a value column")
        require_columns(df, [agg_column])
        aggs.append(
            _TIMELINE_AGGS[agg](F.col(agg_column).cast("double")).alias(f"{agg}_{agg_column}")
        )
    return (
        df.withColumn(bucket_name, bucket)
        .groupBy(bucket_name)
        .agg(*aggs)
        .orderBy(bucket_name)
    )
