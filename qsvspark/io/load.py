"""Load initializer: CSV/TSV/TXT (+.gz) and Parquet, glob-expanded.

Reference: /root/reference/src/operations/initializers/load.rs:5-81 and
src/controllers/csv.rs. Differences by design:
  - Spark reads globs, multi-file lists, and .gz natively (a .gz CSV is a
    single non-splittable partition — same limitation the reference works
    around with chunked decompression; at scale, prefer parquet).
  - The reference rejects mixing CSV and Parquet in one load
    (load.rs:41-44); we keep that rule.
  - ``--no-headers`` names columns column_1..column_N (1-based — proven by
    reference tests/test_initializers_load.py:76-85).
  - Schema inference keeps datetime-looking columns as strings (the
    reference disables date parsing, csv.rs:64-65); Spark's inferSchema
    does not parse timestamps unless asked, matching.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession

from qsvspark.errors import LoadError

_CSV_EXTS = (".csv", ".tsv", ".txt", ".csv.gz", ".tsv.gz", ".txt.gz", ".gz")
_PARQUET_EXTS = (".parquet", ".pq")


def _expand(paths: list[str]) -> list[str]:
    out: list[str] = []
    for p in paths:
        if any(ch in p for ch in "*?["):
            hits = sorted(_glob.glob(p))
            if not hits:
                raise LoadError(f"no files match glob '{p}'")
            out.extend(hits)
        else:
            if not os.path.exists(p):
                raise LoadError(f"file not found: {p}")
            out.append(p)
    return out


def _kind(path: str) -> str:
    low = path.lower()
    if low.endswith(_PARQUET_EXTS):
        return "parquet"
    return "csv"


def load(
    spark: SparkSession,
    paths: str | list[str],
    separator: str | None = None,
    no_headers: bool = False,
    infer_schema: bool = True,
) -> DataFrame:
    """Load one or more files into a single lazy DataFrame."""
    plist = _expand([paths] if isinstance(paths, str) else list(paths))
    kinds = {_kind(p) for p in plist}
    if len(kinds) > 1:
        raise LoadError("cannot mix CSV and Parquet files in one load")
    kind = kinds.pop()
    if kind == "parquet":
        return spark.read.parquet(*plist)
    sep = separator
    if sep is None:
        sep = "\t" if any(".tsv" in p.lower() for p in plist) else ","
    df = (
        spark.read.option("sep", sep)
        .option("header", str(not no_headers).lower())
        .option("inferSchema", str(infer_schema).lower())
        # keep datetimes as strings like the reference (csv.rs:64-65)
        .option("timestampFormat", "'__never__'")
        .option("dateFormat", "'__never__'")
        .csv(plist)
    )
    if no_headers:
        df = df.toDF(*[f"column_{i + 1}" for i in range(len(df.columns))])
    return df
