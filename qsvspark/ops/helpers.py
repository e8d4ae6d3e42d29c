"""Shared operator helpers: column validation, colspec resolution, the
cast-to-string comparison semantics, and multi-format timestamp parsing.

The reference's CSV-first worldview compares values as strings in several
operators (isin /root/reference/src/operations/chainables/isin.rs:31-44,
contains contains.rs:28-34, grep grep.rs:31-34, sed sed.rs:36-38). We keep
typed columns but replicate the observable semantics with an explicit
``cast("string")`` — which Catalyst folds into codegen, so it's free.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qsvspark.errors import ColumnNotFoundError, InvalidArgumentError

_IDX_RANGE = re.compile(r"^(\d+)[:\-](\d+)$")
_NAME_RANGE = re.compile(r"^([^:]+):([^:]+)$")


def require_columns(df: DataFrame, cols: list[str] | tuple[str, ...]) -> None:
    """Eager schema validation (metadata-only, no job) — the reference
    validates against collect_schema() before every op (select.rs:53-58)."""
    available = df.columns
    for c in cols:
        if c not in available:
            raise ColumnNotFoundError(c, available)


def as_string(col: str) -> Column:
    """The string-compare view of a column (see module docstring)."""
    return F.col(col).cast("string")


def _split_colspec(spec: str) -> list[str]:
    """Split a comma-separated colspec, honoring double-quoted tokens
    (reference CLI supports quoted ranges, src/main.rs:122-179)."""
    out: list[str] = []
    buf: list[str] = []
    in_q = False
    for ch in spec:
        if ch == '"':
            in_q = not in_q
        elif ch == "," and not in_q:
            out.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    if buf:
        out.append("".join(buf).strip())
    return [t for t in out if t]


def resolve_colspec(columns: list[str], spec: str | list[str]) -> list[str]:
    """Resolve a reference-style column spec to concrete column names.

    Supports: plain names, 1-based indexes (``2``), index ranges (``2:4`` /
    ``2-4``, inclusive), name ranges (``col1:col3``), quoted tokens, and
    comma-separated mixes — semantics from
    /root/reference/src/operations/chainables/select.rs:77-178.
    """
    tokens = _split_colspec(spec) if isinstance(spec, str) else list(spec)
    resolved: list[str] = []
    for tok in tokens:
        if tok in columns:  # exact name always wins
            resolved.append(tok)
            continue
        if tok.isdigit():  # 1-based index
            i = int(tok)
            if not 1 <= i <= len(columns):
                raise ColumnNotFoundError(tok, columns)
            resolved.append(columns[i - 1])
            continue
        m = _IDX_RANGE.match(tok)
        if m:
            lo, hi = int(m.group(1)), int(m.group(2))
            if not (1 <= lo <= hi <= len(columns)):
                raise ColumnNotFoundError(tok, columns)
            resolved.extend(columns[lo - 1 : hi])
            continue
        m = _NAME_RANGE.match(tok)
        if m:
            a, b = m.group(1).strip(), m.group(2).strip()
            if a in columns and b in columns:
                ia, ib = columns.index(a), columns.index(b)
                if ia > ib:
                    raise InvalidArgumentError(f"range '{tok}' is reversed")
                resolved.extend(columns[ia : ib + 1])
                continue
        # name ranges with '-' separator (col1-col3)
        if "-" in tok:
            a, _, b = tok.partition("-")
            a, b = a.strip(), b.strip()
            if a in columns and b in columns:
                ia, ib = columns.index(a), columns.index(b)
                if ia > ib:
                    raise InvalidArgumentError(f"range '{tok}' is reversed")
                resolved.extend(columns[ia : ib + 1])
                continue
        raise ColumnNotFoundError(tok, columns)
    return resolved


# Formats the reference's auto-parser accepts (timeline.rs:136-157 parses
# ISO, space-separated, Apache CLF, and unix epoch). try_to_timestamp
# returns NULL instead of raising, so coalesce walks the ladder — all
# JVM-side, whole-stage-codegen'd.
_TS_FORMATS = [
    "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "yyyy-MM-dd HH:mm:ss.SSS",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy/MM/dd HH:mm:ss",
    "dd/MMM/yyyy:HH:mm:ss Z",   # Apache common log
    "dd/MMM/yyyy:HH:mm:ss",
    "yyyy-MM-dd",
]


def ts_column(df, column: str) -> Column:
    """The column as a timestamp expression. Already-typed timestamp/date
    columns pass through UNWRAPPED — a bare column comparison pushes down
    to the parquet scan (row-group min/max pruning skips whole time ranges
    at scale), while any wrapping expression would force a full scan. The
    multi-format parse ladder applies only to string columns (the
    reference's CSV-everything-is-text data model)."""
    from pyspark.sql import types as T

    dt = df.schema[column].dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return F.col(column)
    return parse_ts_any(F.col(column))


def parse_ts_any(col: Column) -> Column:
    """Best-effort multi-format string→timestamp (NULL when unparseable)."""
    s = col.cast("string")
    attempts = [F.try_to_timestamp(s, F.lit(fmt)) for fmt in _TS_FORMATS]
    # unix epoch seconds / millis (all-digit strings)
    digits = F.when(s.rlike(r"^\d{10}$"), F.timestamp_seconds(s.cast("long"))).when(
        s.rlike(r"^\d{13}$"), F.timestamp_millis(s.cast("long"))
    )
    # native timestamp/date columns pass through via plain cast
    return F.coalesce(F.try_to_timestamp(s), *attempts, digits)


_INTERVAL = re.compile(r"^(\d+)(ms|s|m|h|d)$")
_UNIT_MS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000, "d": 86_400_000}


def parse_interval_ms(interval: str) -> int:
    """'30m' → 1_800_000 ms (reference timeline.rs:112-133)."""
    m = _INTERVAL.match(interval.strip())
    if not m:
        raise InvalidArgumentError(
            f"invalid interval '{interval}' (expected e.g. 500ms, 30s, 5m, 1h, 1d)"
        )
    return int(m.group(1)) * _UNIT_MS[m.group(2)]
