"""The only Python-execution operators in the engine: changetz and convert.

Both are Arrow-batched pandas UDFs (vectorized per ~10k-row batch), never
per-row Python — the reference implements these as per-row Rust closures
(changetz.rs:227-252, convert.rs:28-50) which is exactly the pattern that
does NOT survive on Spark; a pandas UDF keeps the data in Arrow buffers
and amortizes the Python boundary per batch.
"""

from __future__ import annotations

import json
from zoneinfo import ZoneInfo

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qsvspark.errors import InvalidArgumentError
from qsvspark.ops.helpers import require_columns

_DEFAULT_OUT_FMT = "__iso8601_micros_colon_offset__"  # sentinel


def _validate_tz(name: str, which: str) -> None:
    if name == "local":
        return
    try:
        ZoneInfo(name)
    except Exception:
        raise InvalidArgumentError(f"Invalid {which} timezone: {name}") from None


def changetz(
    df: DataFrame,
    column: str,
    from_tz: str,
    to_tz: str,
    input_format: str | None = None,
    output_format: str | None = None,
    ambiguous: str = "earliest",
) -> DataFrame:
    """Parse datetime strings, localize in from_tz, convert to to_tz, format.

    Reference: /root/reference/src/operations/chainables/changetz.rs:193-253.
    Semantics proven by tests/test_chainables_changetz.py:
      - default output format is ISO8601 with microseconds and colon offset,
        ``2023-01-01T12:00:00.000000+00:00`` (changetz.rs:186-191);
      - ``--ambiguous earliest`` resolves fall-back overlap to the first
        (DST) occurrence, ``latest`` to the second (standard) occurrence;
      - spring-forward wall times outside the gap parse normally; times in
        the gap shift forward (pandas ``nonexistent='shift_forward'``).

    input/output formats are strftime-style (the reference uses chrono's
    strftime dialect). input_format=None → pandas mixed-format auto parse
    (the reference's dtparse+fallback ladder, changetz.rs:26-96).
    """
    require_columns(df, [column])
    _validate_tz(from_tz, "source")
    _validate_tz(to_tz, "target")
    out_fmt = output_format or _DEFAULT_OUT_FMT
    amb_flag = ambiguous == "earliest"  # pandas: True = DST (first occurrence)

    @F.pandas_udf(T.StringType())
    def _changetz(s: pd.Series) -> pd.Series:
        parsed = pd.to_datetime(
            s, format=input_format or "mixed", errors="coerce"
        )
        src = None if from_tz == "local" else from_tz
        localized = parsed.dt.tz_localize(
            src, ambiguous=amb_flag, nonexistent="shift_forward"
        )
        converted = localized.dt.tz_convert(to_tz)
        if out_fmt == _DEFAULT_OUT_FMT:
            txt = converted.dt.strftime("%Y-%m-%dT%H:%M:%S.%f%z")
            txt = txt.str.replace(r"([+-]\d{2})(\d{2})$", r"\1:\2", regex=True)
        else:
            txt = converted.dt.strftime(out_fmt)
        return txt.where(parsed.notna(), s)  # unparseable cells pass through

    return df.withColumn(column, _changetz(F.col(column).cast("string")))


# --- convert -----------------------------------------------------------

def _clean_json_text(text: str) -> str:
    """Malformed-JSON cleanup: strip wrapping quotes, unescape doubled
    quotes, basic HTML entities (reference convert.rs:190-233)."""
    t = text.strip()
    if len(t) >= 2 and t[0] == '"' and t[-1] == '"':
        t = t[1:-1]
    t = t.replace('""', '"').replace("&quot;", '"').replace("&amp;", "&")
    return t


def _parse_cell(text: str, fmt: str):
    if fmt == "json":
        try:
            return json.loads(text)
        except json.JSONDecodeError:
            return json.loads(_clean_json_text(text))
    if fmt == "yaml":
        import yaml

        return yaml.safe_load(text)
    if fmt == "xml":
        import xml.etree.ElementTree as ET

        def walk(el):
            kids = list(el)
            if not kids:
                return el.text
            return {k.tag: walk(k) for k in kids}

        try:
            root = ET.fromstring(text)
        except ET.ParseError:
            # bare fragments / multiple roots (the reference's flat
            # <k>v</k><k2>v2</k2> form) — wrap and unwrap
            root = ET.fromstring(f"<root>{text}</root>")
            return {k.tag: walk(k) for k in root}
        return {root.tag: walk(root)}
    raise InvalidArgumentError(f"unknown convert format '{fmt}'")


def _xml_scalar(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _to_xml(obj) -> str:
    """Flat <key>value</key> writer, sorted keys (reference
    convert.rs:234-260; golden: tests/test_chainables_convert.py:58-61)."""
    if isinstance(obj, dict):
        return "".join(
            f"<{k}>{_to_xml(obj[k]) if isinstance(obj[k], (dict, list)) else _xml_scalar(obj[k])}</{k}>"
            for k in sorted(obj)
        )
    if isinstance(obj, list):
        return "".join(f"<item>{_to_xml(v)}</item>" for v in obj)
    return _xml_scalar(obj)


def _render_cell(obj, fmt: str) -> str:
    if fmt == "json":
        return json.dumps(obj, indent=2, sort_keys=True, ensure_ascii=False)
    if fmt == "yaml":
        import yaml

        return yaml.safe_dump(obj, sort_keys=True, default_flow_style=False).rstrip("\n")
    if fmt == "xml":
        return _to_xml(obj)
    raise InvalidArgumentError(f"unknown convert format '{fmt}'")


def convert(df: DataFrame, column: str, from_format: str, to_format: str) -> DataFrame:
    """Per-cell format conversion among JSON/YAML/XML (9 pairs incl.
    same-format prettify); conversion errors become ``# ... error`` comment
    strings in the cell rather than failing the job.

    Reference: /root/reference/src/operations/chainables/convert.rs:7-75.
    """
    require_columns(df, [column])
    for f_ in (from_format, to_format):
        if f_ not in ("json", "yaml", "xml"):
            raise InvalidArgumentError(f"unknown convert format '{f_}'")

    @F.pandas_udf(T.StringType())
    def _convert(s: pd.Series) -> pd.Series:
        def one(text):
            if text is None or (isinstance(text, float) and pd.isna(text)):
                return text
            try:
                return _render_cell(_parse_cell(str(text), from_format), to_format)
            except Exception as e:  # noqa: BLE001 — cell-level error capture
                return f"# {e} error"

        return s.map(one)

    return df.withColumn(column, _convert(F.col(column).cast("string")))
