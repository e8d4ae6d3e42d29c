"""Scalar value-transform operators (native Spark expressions only —
the pandas-UDF transforms live in ops/udf.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qsvspark.errors import InvalidArgumentError
from qsvspark.ops.helpers import as_string, require_columns, ts_column


def sed(
    df: DataFrame,
    pattern: str,
    replacement: str,
    column: str | None = None,
    ignorecase: bool = False,
) -> DataFrame:
    """Regex replace-all in one column or EVERY column (cast to string).

    Reference: /root/reference/src/operations/chainables/sed.rs:4-65 —
    single-column path :26-41, all-columns path :42-63, ``(?i)`` flag.
    ``regexp_replace`` is codegen'd; the all-columns form rewrites the
    projection in one pass (``withColumns``), not N sequential plans.
    """
    pat = ("(?i)" if ignorecase else "") + pattern
    if column is not None:
        require_columns(df, [column])
        targets = [column]
    else:
        targets = df.columns
    return df.withColumns(
        {c: F.regexp_replace(as_string(c), pat, replacement) for c in targets}
    )


# unit → (date_trunc unit, output format) — the reference emits a
# unit-specific short string (timeround.rs:9-20): y→'2023', M→'2023-01',
# d→'2023-01-01', h→'2023-01-01 12', m→'…12:34', s→'…12:34:56'.
_TIMEROUND_UNITS = {
    "y": ("year", "yyyy"),
    "M": ("month", "yyyy-MM"),
    "d": ("day", "yyyy-MM-dd"),
    "h": ("hour", "yyyy-MM-dd HH"),
    "m": ("minute", "yyyy-MM-dd HH:mm"),
    "s": ("second", "yyyy-MM-dd HH:mm:ss"),
}


def timeround(df: DataFrame, column: str, unit: str, output: str | None = None) -> DataFrame:
    """Truncate a datetime-string column to a unit and re-format.

    Reference: chainables/timeround.rs:2-38. Fully native:
    date_format(date_trunc(unit, to_timestamp(col)), fmt).
    """
    require_columns(df, [column])
    if unit not in _TIMEROUND_UNITS:
        raise InvalidArgumentError(
            f"invalid timeround unit '{unit}' (expected one of {list(_TIMEROUND_UNITS)})"
        )
    trunc_unit, fmt = _TIMEROUND_UNITS[unit]
    expr = F.date_format(F.date_trunc(trunc_unit, ts_column(df, column)), fmt)
    return df.withColumn(output or column, expr)
