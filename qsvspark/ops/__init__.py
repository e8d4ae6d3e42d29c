"""Chainable operators — each is a pure function DataFrame -> DataFrame,
mirroring the reference's ``&LazyFrame -> LazyFrame`` chainables
(/root/reference/src/controllers/dataframe.rs:42-196), expressed through
the Spark DataFrame API so Catalyst optimizes the whole chain."""

from qsvspark.ops.shape import head, renamecol, select, sort, tail, uniq
from qsvspark.ops.filters import contains, grep, isin, timeslice
from qsvspark.ops.transform import sed, timeround
from qsvspark.ops.agg import count, pivot, timeline
from qsvspark.ops.udf import changetz, convert

__all__ = [
    "select", "renamecol", "sort", "head", "tail", "uniq",
    "isin", "contains", "grep", "timeslice",
    "sed", "timeround",
    "count", "pivot", "timeline",
    "changetz", "convert",
]
