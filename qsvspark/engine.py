"""The fluent chainable API — the engine's equivalent of the reference's
``qsv <init> - <chainable> … - <finalizer>`` surface
(/root/reference/src/controllers/command.rs:127-272, dataframe.rs:42-256),
re-expressed as a Python builder over a lazy Spark DataFrame:

    Q.load(spark, "events.parquet").isin("event_type", ["error"]) \
        .sort("ts").head(3).show()

Every chainable returns a NEW ``Q`` wrapping a new lazy plan; nothing
executes until a finalizer (Spark action). Column existence is validated
eagerly per op from ``df.columns`` (metadata-only — mirrors the
reference's collect_schema() checks) so errors surface at build time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from qsvspark import ops
from qsvspark.io import load as _load
from qsvspark.io import sinks


class Q:
    def __init__(self, df: DataFrame):
        self.df = df

    # -- initializers -------------------------------------------------

    @classmethod
    def load(
        cls,
        spark: SparkSession,
        paths: str | list[str],
        separator: str | None = None,
        no_headers: bool = False,
        infer_schema: bool = True,
    ) -> "Q":
        return cls(_load(spark, paths, separator, no_headers, infer_schema))

    @classmethod
    def from_df(cls, df: DataFrame) -> "Q":
        return cls(df)

    # -- chainables ----------------------------------------------------

    def select(self, colspec) -> "Q":
        return Q(ops.select(self.df, colspec))

    def renamecol(self, old: str, new: str) -> "Q":
        return Q(ops.renamecol(self.df, old, new))

    def sort(self, colspec, desc: bool = False) -> "Q":
        return Q(ops.sort(self.df, colspec, desc))

    def head(self, n: int = 5) -> "Q":
        return Q(ops.head(self.df, n))

    def tail(self, n: int = 5) -> "Q":
        return Q(ops.tail(self.df, n))

    def uniq(self, stable: bool = True) -> "Q":
        return Q(ops.uniq(self.df, stable))

    def isin(self, column: str, values: list) -> "Q":
        return Q(ops.isin(self.df, column, values))

    def contains(self, column: str, pattern: str, ignorecase: bool = False) -> "Q":
        return Q(ops.contains(self.df, column, pattern, ignorecase))

    def grep(self, pattern: str, ignorecase: bool = False, invert: bool = False) -> "Q":
        return Q(ops.grep(self.df, pattern, ignorecase, invert))

    def timeslice(self, column: str, start: str | None = None, end: str | None = None) -> "Q":
        return Q(ops.timeslice(self.df, column, start, end))

    def sed(self, pattern: str, replacement: str, column: str | None = None,
            ignorecase: bool = False) -> "Q":
        return Q(ops.sed(self.df, pattern, replacement, column, ignorecase))

    def timeround(self, column: str, unit: str, output: str | None = None) -> "Q":
        return Q(ops.timeround(self.df, column, unit, output))

    def count(self) -> "Q":
        return Q(ops.count(self.df))

    def pivot(self, rows, cols, values: str, agg: str = "sum") -> "Q":
        return Q(ops.pivot(self.df, rows, cols, values, agg))

    def timeline(self, time_column: str, interval: str = "1h",
                 agg: str | None = None, agg_column: str | None = None) -> "Q":
        return Q(ops.timeline(self.df, time_column, interval, agg, agg_column))

    def changetz(self, column: str, from_tz: str, to_tz: str,
                 input_format: str | None = None, output_format: str | None = None,
                 ambiguous: str = "earliest") -> "Q":
        return Q(ops.changetz(self.df, column, from_tz, to_tz,
                              input_format, output_format, ambiguous))

    def convert(self, column: str, from_format: str, to_format: str) -> "Q":
        return Q(ops.convert(self.df, column, from_format, to_format))

    # natural Spark extensions beyond reference parity (SURVEY.md §2.6)
    def join(self, other: "Q | DataFrame", on, how: str = "inner",
             broadcast_small: bool = False) -> "Q":
        from pyspark.sql import functions as F

        right = other.df if isinstance(other, Q) else other
        if broadcast_small:
            right = F.broadcast(right)
        return Q(self.df.join(right, on=on, how=how))

    def concat(self, *others: "Q | DataFrame") -> "Q":
        out = self.df
        for o in others:
            out = out.unionByName(o.df if isinstance(o, Q) else o)
        return Q(out)

    # -- finalizers ------------------------------------------------------

    def show(self, file=None, batch_size: int | None = None) -> str:
        return sinks.show(self.df, file=file, batch_size=batch_size)

    def showtable(self, max_rows: int = 8, file=None) -> str:
        return sinks.showtable(self.df, max_rows, file=file)

    def headers(self, plain: bool = False) -> list[str]:
        return sinks.headers(self.df, plain)

    def stats(self) -> DataFrame:
        return sinks.stats(self.df)

    def showquery(self, extended: bool = True) -> str:
        return sinks.showquery(self.df, extended)

    def dump(self, output: str, separator: str = ",", single_file: bool = False,
             batch_size: int | None = None) -> None:
        sinks.dump(self.df, output, separator, single_file, batch_size=batch_size)

    def dumpcache(self, output: str) -> None:
        sinks.dumpcache(self.df, output)

    def partition(
        self, column: str, outdir: str, fmt: str = "parquet",
        per_key_files: bool = False,
    ) -> None:
        sinks.partition(self.df, column, outdir, fmt, per_key_files=per_key_files)

    def collect(self):
        return self.df.collect()

    def to_pandas(self):
        return self.df.toPandas()
