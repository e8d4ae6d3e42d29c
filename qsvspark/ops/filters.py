"""Row-filter operators. All predicates are built-in Column expressions —
JVM-side, whole-stage-codegen'd, and pushdown-eligible (a filter on a
parquet-backed column lands in PushedFilters / row-group pruning)."""

from __future__ import annotations

import re
from functools import reduce
from operator import or_

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qsvspark.ops.helpers import as_string, require_columns, ts_column

_CANONICAL_INT = re.compile(r"^-?(0|[1-9]\d*)$")


def isin(df: DataFrame, column: str, values: list) -> DataFrame:
    """Keep rows where column equals any value, compared AS STRINGS.

    Reference: /root/reference/src/operations/chainables/isin.rs:4-55 —
    numeric columns are cast to string and compared against string literals
    (:31-44); an empty value list yields an empty result (:22-25).

    Scale note: ``cast(c as string) IN (...)`` cannot push into a parquet
    scan. When the column is integral and every value is a canonical
    integer rendering, the native ``c IN (ints)`` predicate is provably
    equivalent (int→string rendering is bijective on canonical forms), so
    we rewrite to it — that lands in PushedFilters / row-group pruning.
    """
    require_columns(df, [column])
    if not values:
        return df.filter(F.lit(False))
    svals = [str(v) for v in values]
    dtype = df.schema[column].dataType
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)) and all(
        _CANONICAL_INT.match(s) for s in svals
    ):
        return df.filter(F.col(column).isin([int(s) for s in svals]))
    return df.filter(as_string(column).isin(svals))


def contains(df: DataFrame, column: str, pattern: str, ignorecase: bool = False) -> DataFrame:
    """Keep rows whose column contains the literal substring.

    Reference: chainables/contains.rs:5-40 — case-insensitive mode
    regex-escapes the literal and prepends (?i) (:26-30).
    """
    require_columns(df, [column])
    if ignorecase:
        return df.filter(as_string(column).rlike("(?i)" + re.escape(pattern)))
    return df.filter(as_string(column).contains(pattern))


def grep(df: DataFrame, pattern: str, ignorecase: bool = False, invert: bool = False) -> DataFrame:
    """Keep rows where ANY column regex-matches; nulls never match.

    Reference: chainables/grep.rs:4-45 — OR-reduce over all columns
    (:28-38) with fill_null(false) (:35) so the invert of "some column
    matched" is "no column matched", nulls included.
    """
    pat = ("(?i)" if ignorecase else "") + pattern
    preds = [F.coalesce(as_string(c).rlike(pat), F.lit(False)) for c in df.columns]
    matched = reduce(or_, preds)
    return df.filter(~matched if invert else matched)


def timeslice(
    df: DataFrame,
    column: str,
    start: str | None = None,
    end: str | None = None,
) -> DataFrame:
    """Filter rows to [start, end], both ends inclusive, on a
    datetime-string column.

    Reference: chainables/timeslice.rs:4-84 — parses the column to a temp
    datetime (:34-45), >= start (:60-62), <= end (:77-79). We express the
    same thing as a single filter on a parsed expression; no temp column
    materializes (Catalyst keeps it an expression).
    """
    require_columns(df, [column])
    ts = ts_column(df, column)
    pred = F.lit(True)
    if start is not None:
        pred = pred & (ts >= F.to_timestamp(F.lit(start)))
    if end is not None:
        pred = pred & (ts <= F.to_timestamp(F.lit(end)))
    return df.filter(pred)
