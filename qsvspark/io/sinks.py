"""Finalizer sinks — the actions that trigger a Spark job.

CLI-parity sinks (show/showtable) collect because their contract is
"print to stdout"; the distributed sinks (dump/dumpcache/partition) stay
executor-side via df.write — unlike the reference, which collects the
whole table to memory for partition/stats/dumpcache
(/root/reference/src/operations/finalizers/partition.rs:25-34,
stats.rs:145, dumpcache.rs:34-40).
"""

from __future__ import annotations

import io as _io
import re
import sys

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qsvspark.ops.helpers import require_columns


def show(df: DataFrame, file=None, header: bool = True) -> str:
    """Collect → CSV to stdout (header always).
    Reference: finalizers/show.rs:6-123. The reference streams batches by
    re-running the plan per slice (O(batches × plan)); a single toPandas
    (Arrow) collect replaces that. For data too big to print, use dump."""
    pdf = df.toPandas()
    buf = _io.StringIO()
    pdf.to_csv(buf, index=False, header=header)
    text = buf.getvalue()
    (file or sys.stdout).write(text)
    return text


def showtable(df: DataFrame, max_rows: int = 8, file=None) -> str:
    """Pretty table of ≤max_rows rows + a shape header; the default
    finalizer when a chain ends without one (reference src/main.rs:91-110,
    finalizers/showtable.rs:6-99, MAX_DISPLAY_ROWS=8)."""
    n = df.count()
    shown = df.limit(max_rows + 1).toPandas()
    truncated = len(shown) > max_rows
    if truncated:
        shown = shown.iloc[:max_rows]
    lines = [f"shape: ({n}, {len(df.columns)})", shown.to_string(index=False)]
    if truncated:
        lines.append("…")
    text = "\n".join(lines) + "\n"
    (file or sys.stdout).write(text)
    return text


def headers(df: DataFrame, plain: bool = False) -> list[str]:
    """Column names — schema-only, triggers no job.
    Reference: finalizers/headers.rs:6-32."""
    if plain:
        print("\n".join(df.columns))
    else:
        print("\n".join(f"{i:>2}  {c}" for i, c in enumerate(df.columns, 1)))
    return df.columns


def stats(df: DataFrame) -> DataFrame:
    """Per-column summary computed in ONE batched aggregation.

    Per column: count, null_count, dtype, then for numerics mean,
    std (ddof=1), min, max, p25/p50/p75; for strings min/max only.
    Reference: finalizers/stats.rs:5-216 (single batched select :101-145,
    quantile exprs :124-132). The reference collects the table first; here
    one distributed agg row comes back (columns × ~10 scalars).
    """
    numeric = {
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.NumericType)
    }
    exprs = []
    for c in df.columns:
        exprs.append(F.count(F.col(c)).alias(f"{c}__count"))
        exprs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"))
        if c in numeric:
            exprs += [
                F.mean(c).alias(f"{c}__mean"),
                F.stddev_samp(c).alias(f"{c}__std"),
                F.min(c).alias(f"{c}__min"),
                F.max(c).alias(f"{c}__max"),
                F.percentile(F.col(c), F.lit([0.25, 0.5, 0.75])).alias(f"{c}__pct"),
            ]
        else:
            exprs += [
                F.min(F.col(c).cast("string")).alias(f"{c}__min"),
                F.max(F.col(c).cast("string")).alias(f"{c}__max"),
            ]
    row = df.agg(*exprs).collect()[0].asDict()
    dtypes = dict(df.dtypes)
    out_rows = []
    for c in df.columns:
        pct = row.get(f"{c}__pct")
        out_rows.append(
            {
                "column": c,
                "dtype": dtypes[c],
                "count": row[f"{c}__count"],
                "null_count": row[f"{c}__nulls"],
                "mean": float(row[f"{c}__mean"]) if c in numeric and row[f"{c}__mean"] is not None else None,
                "std": float(row[f"{c}__std"]) if c in numeric and row[f"{c}__std"] is not None else None,
                "min": str(row[f"{c}__min"]) if row[f"{c}__min"] is not None else None,
                "max": str(row[f"{c}__max"]) if row[f"{c}__max"] is not None else None,
                "p25": float(pct[0]) if pct else None,
                "p50": float(pct[1]) if pct else None,
                "p75": float(pct[2]) if pct else None,
            }
        )
    schema = T.StructType(
        [
            T.StructField("column", T.StringType()),
            T.StructField("dtype", T.StringType()),
            T.StructField("count", T.LongType()),
            T.StructField("null_count", T.LongType()),
            T.StructField("mean", T.DoubleType()),
            T.StructField("std", T.DoubleType()),
            T.StructField("min", T.StringType()),
            T.StructField("max", T.StringType()),
            T.StructField("p25", T.DoubleType()),
            T.StructField("p50", T.DoubleType()),
            T.StructField("p75", T.DoubleType()),
        ]
    )
    return df.sparkSession.createDataFrame(out_rows, schema)


def showquery(df: DataFrame, extended: bool = True) -> str:
    """Logical + optimized + physical plan text.
    Reference: finalizers/showquery.rs:3-19 (Polars plan dump)."""
    text = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "extended" if extended else "simple"
    )
    print(text)
    return text


def dump(
    df: DataFrame,
    output: str,
    separator: str = ",",
    single_file: bool = False,
    mode: str = "overwrite",
) -> None:
    """Write CSV. Distributed directory-of-parts by default (the scale
    path); single_file=True gives reference-style one-file output for
    CLI parity (collects via Arrow — small data only).
    Reference: finalizers/dump.rs:9-171."""
    if single_file:
        df.toPandas().to_csv(output, index=False, sep=separator)
        return
    df.write.mode(mode).option("header", "true").option("sep", separator).csv(output)


def dumpcache(df: DataFrame, output: str, mode: str = "overwrite") -> None:
    """Write Snappy Parquet, reloadable by load().
    Reference: finalizers/dumpcache.rs:7-72 (snappy :45-47)."""
    df.write.mode(mode).parquet(output, compression="snappy")


_SANITIZE = re.compile(r"[^A-Za-z0-9_.\-]")


def sanitize_key(value) -> str:
    """Invalid filename chars → '_' (reference partition.rs:107-119)."""
    return _SANITIZE.sub("_", str(value))


def partition(
    df: DataFrame,
    column: str,
    outdir: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Fan out rows to one directory per distinct key value.

    Reference: finalizers/partition.rs:6-131 collects everything then
    splits in memory — single-node only. Here it is one distributed pass:
    ``df.write.partitionBy(key)`` (dynamic partition overwrite style), so
    each executor writes its own slice of every key; no collect, no
    per-key job loop. CSV mode is available for reference parity.
    """
    require_columns(df, [column])
    # sanitize JVM-side (regexp_replace) — no Python in the write path
    out = df.withColumn(
        "__part_key__",
        F.regexp_replace(F.col(column).cast("string"), _SANITIZE.pattern, "_"),
    )
    writer = out.write.mode(mode).partitionBy("__part_key__")
    if fmt == "parquet":
        writer.parquet(outdir)
    else:
        writer.option("header", "true").csv(outdir)
