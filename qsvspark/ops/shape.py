"""Projection / ordering / sampling / dedup operators.

Scale notes: ``sort`` is a total order → range-partition exchange (one
shuffle, unavoidable for the semantics). ``head`` is a ``limit`` which
Catalyst pushes into the scan (CollectLimit). ``tail`` and stable ``uniq``
need an ingest-order key — order is a file-order notion that a distributed
engine must materialize explicitly; we use ``monotonically_increasing_id``
which encodes (partition, offset) and therefore preserves scan order
without any shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qsvspark.ops.helpers import require_columns, resolve_colspec

_ORDER = "__qsv_ingest_order__"


def select(df: DataFrame, colspec: str | list[str]) -> DataFrame:
    """Project columns by name / 1-based index / ranges.

    Reference: /root/reference/src/operations/chainables/select.rs:4-178.
    Resolution is driver-side Python over df.columns (no job); the projection
    itself prunes columns all the way into the parquet scan (ReadSchema).
    """
    cols = resolve_colspec(df.columns, colspec)
    return df.select(*cols)


def renamecol(df: DataFrame, old: str, new: str) -> DataFrame:
    """Rename one column, order preserved.
    Reference: /root/reference/src/operations/chainables/renamecol.rs:4-35."""
    require_columns(df, [old])
    return df.withColumnRenamed(old, new)


def sort(df: DataFrame, colspec: str | list[str], desc: bool = False) -> DataFrame:
    """Multi-column total sort; single desc flag applies to all keys.
    Reference: /root/reference/src/operations/chainables/sort.rs:4-28."""
    cols = resolve_colspec(df.columns, colspec)
    keys = [F.col(c).desc() if desc else F.col(c).asc() for c in cols]
    return df.orderBy(*keys)


def head(df: DataFrame, n: int = 5) -> DataFrame:
    """First N rows. Reference: chainables/head.rs:3-6 (default 5,
    src/main.rs:329). Spark ``limit`` → CollectLimit, early-terminating."""
    return df.limit(n)


def tail(df: DataFrame, n: int = 5) -> DataFrame:
    """Last N rows in ingest order. Reference: chainables/tail.rs:3-6.

    ``monotonically_increasing_id`` encodes (partition_id << 33) + row
    position, so it is monotone in scan order; last-N = top-N by that id
    descending, which Catalyst executes as TakeOrderedAndProject — a
    per-partition top-N + driver merge of N×partitions candidates. Fully
    distributed: no single-partition window, no global sort, works at any
    table size (the old implementation ranked through an unpartitioned
    window — one executor ordering the whole table).
    """
    with_id = df.withColumn(_ORDER, F.monotonically_increasing_id())
    last = with_id.orderBy(F.col(_ORDER).desc()).limit(n)
    return last.orderBy(_ORDER).drop(_ORDER)


def uniq(df: DataFrame, stable: bool = True) -> DataFrame:
    """Drop duplicate rows over all columns, keep first occurrence.

    Reference: chainables/uniq.rs:3-6 (``unique_stable(None, KeepFirst)``).
    stable=True reproduces keep-first *order* by min-ingest-id per group
    (one hash-aggregate shuffle, partial agg map-side). stable=False is a
    plain ``dropDuplicates`` — same row *set*, cheaper, use at scale when
    downstream doesn't depend on order.
    """
    if not stable:
        return df.dropDuplicates()
    cols = df.columns
    with_id = df.withColumn(_ORDER, F.monotonically_increasing_id())
    return (
        with_id.groupBy(*cols)
        .agg(F.min(_ORDER).alias(_ORDER))
        .orderBy(_ORDER)
        .drop(_ORDER)
    )
