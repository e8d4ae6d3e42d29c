"""The only Python-execution operators in the engine: changetz and convert.

Both are Arrow-batched pandas UDFs (vectorized per ~10k-row batch), never
per-row Python — the reference implements these as per-row Rust closures
(changetz.rs:227-252, convert.rs:28-50) which is exactly the pattern that
does NOT survive on Spark; a pandas UDF keeps the data in Arrow buffers
and amortizes the Python boundary per batch.
"""

from __future__ import annotations

import json
import re
from datetime import datetime
from zoneinfo import ZoneInfo

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qsvspark.errors import InvalidArgumentError
from qsvspark.ops.helpers import require_columns

_DEFAULT_OUT_FMT = "__iso8601_micros_colon_offset__"  # sentinel

# ---------------------------------------------------------------------
# "auto" datetime parsing ladder — semantics ported from the reference
# (/root/reference/src/operations/chainables/changetz.rs:9-145):
#   1. flexible parser (dtparse there, pandas 'mixed' + dateutil here)
#   2. fuzzy regex EXTRACTION of a datetime embedded in free text,
#      ordinal/"at" cleanup, then re-parse with dedicated formats
#   3. a ladder of ~25 explicit fallback formats (ISO/US/EU/log/unix)
# The batch-vectorized pass handles well-formed data; only the failed
# remainder walks the per-cell ladder.

_FUZZY_DATETIME_PATTERNS = [re.compile(p) for p in [
    # Month name with day and year: "January 15th, 2023 at 2:30 PM"
    r"(?i)(?:on\s+)?(?:january|february|march|april|may|june|july|august|september|october|november|december)\s+\d{1,2}(?:st|nd|rd|th)?,?\s+\d{4}(?:\s+at\s+)?\d{1,2}:\d{2}(?::\d{2})?\s*(?:AM|PM)?",
    # Short month: "Jan 15, 2023 2:30 PM"
    r"(?i)(?:on\s+)?(?:jan|feb|mar|apr|may|jun|jul|aug|sep|oct|nov|dec)\s+\d{1,2},?\s+\d{4}\s+\d{1,2}:\d{2}(?::\d{2})?\s*(?:AM|PM)?",
    # ISO-like in text: "2023-01-15 14:30:00"
    r"\d{4}-\d{1,2}-\d{1,2}\s+\d{1,2}:\d{2}(?::\d{2})?",
    # US date format: "1/15/2023 2:30 PM"
    r"\d{1,2}/\d{1,2}/\d{4}\s+\d{1,2}:\d{2}(?::\d{2})?\s*(?:AM|PM)?",
    # Day month year: "Friday Jan 13 2023 9:00 AM"
    r"(?i)(?:monday|tuesday|wednesday|thursday|friday|saturday|sunday)\s+(?:jan|feb|mar|apr|may|jun|jul|aug|sep|oct|nov|dec)\s+\d{1,2}\s+\d{4}\s+\d{1,2}:\d{2}(?::\d{2})?\s*(?:AM|PM)?",
]]

_EXTRACTED_FORMATS = [
    "%B %d, %Y %I:%M:%S %p", "%B %d, %Y %I:%M %p",
    "%b %d, %Y %I:%M:%S %p", "%b %d, %Y %I:%M %p",
    "%Y-%m-%d %H:%M:%S", "%Y-%m-%d %H:%M",
    "%m/%d/%Y %I:%M:%S %p", "%m/%d/%Y %I:%M %p",
    "%A %b %d %Y %I:%M:%S %p", "%A %b %d %Y %I:%M %p",
]

_FALLBACK_FORMATS = [
    "%Y-%m-%dT%H:%M:%S.%f", "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d",
    "%m/%d/%Y %H:%M:%S.%f", "%m/%d/%Y %H:%M:%S", "%m/%d/%Y",
    "%d/%m/%Y %H:%M:%S.%f", "%d/%m/%Y %H:%M:%S", "%d/%m/%Y",
    "%Y/%m/%d %H:%M:%S.%f", "%Y/%m/%d %H:%M:%S", "%Y/%m/%d",
    "%d %b %Y %H:%M:%S", "%b %d %Y %H:%M:%S",
    "%d %B %Y %H:%M:%S", "%B %d %Y %H:%M:%S",
    "%d-%b-%Y %H:%M:%S", "%d %b %Y", "%b %d %Y",
    "%a %b %d %H:%M:%S %Y", "%a, %d %b %Y %H:%M:%S",
    "%m/%d/%Y %I:%M:%S %p", "%Y-%m-%d %I:%M:%S %p",
]

# Ordinal suffixes are stripped only when they FOLLOW a digit ("15th" →
# "15"). The reference does blind substring replaces (changetz.rs:110-118,
# `.replace("st ", " ")` etc.), which mangles "August 1" → "Augu 1" and
# breaks every fuzzy extraction containing August — a reference bug we
# deliberately do not reproduce.
_ORDINAL_RE = re.compile(r"(?<=\d)(?:st|nd|rd|th)\b", re.IGNORECASE)
_AT_RE = re.compile(r"\s+at\s+")


def _parse_one_auto(text):
    """Per-cell slow path for values the vectorized pass could not parse:
    dateutil → fuzzy extraction → explicit formats → unix epoch."""
    from dateutil import parser as _du

    t = str(text).strip()
    if not t:
        return pd.NaT
    try:
        return pd.Timestamp(_du.parse(t))
    except (ValueError, OverflowError):
        pass
    for rx in _FUZZY_DATETIME_PATTERNS:
        m = rx.search(t)
        if not m:
            continue
        cleaned = _AT_RE.sub(" ", _ORDINAL_RE.sub("", m.group(0)))
        try:
            return pd.Timestamp(_du.parse(cleaned))
        except (ValueError, OverflowError):
            pass
        for fmt in _EXTRACTED_FORMATS:
            try:
                return pd.Timestamp(datetime.strptime(cleaned, fmt))
            except ValueError:
                pass
        break
    for fmt in _FALLBACK_FORMATS:
        try:
            return pd.Timestamp(datetime.strptime(t, fmt))
        except ValueError:
            pass
    # unix timestamps (the reference's chrono '%s' / '%s%.f' arms)
    if re.fullmatch(r"-?\d{9,11}", t):
        return pd.Timestamp(int(t), unit="s")
    if re.fullmatch(r"-?\d{9,11}\.\d+", t):
        return pd.Timestamp(float(t), unit="s")
    return pd.NaT


def _parse_auto(s: pd.Series) -> pd.Series:
    parsed = pd.to_datetime(s, format="mixed", errors="coerce")
    bad = parsed.isna() & s.notna() & (s.astype(str).str.strip() != "")
    if bad.any():
        parsed = parsed.copy()
        # The slow ladder runs once per DISTINCT failing value: telemetry
        # timestamps repeat at second granularity, so the dedup factor on
        # real log batches is large and the worst case (all unique) costs
        # only one pd.unique pass.
        hard = s[bad]
        memo = {t: _parse_one_auto(t) for t in pd.unique(hard)}
        parsed.loc[bad] = hard.map(memo)
    return parsed


def _validate_tz(name: str, which: str) -> None:
    if name == "local":
        return
    try:
        ZoneInfo(name)
    except Exception:
        raise InvalidArgumentError(f"Invalid {which} timezone: {name}") from None


# ---------------------------------------------------------------------
# Native (JVM-side, codegen'd) fast path for changetz.
#
# When the input format is FIXED and both zones keep a constant UTC
# offset over the sampled range (UTC, Etc/GMT±N, Asia/Tokyo, ...), the
# whole operator is parse → constant interval shift → format: pure
# Catalyst expressions, no Python workers, full whole-stage codegen and
# cluster scaling. DST zones and the "auto" ladder keep the pandas UDF —
# their ambiguous/nonexistent-time policies need tzdata logic per row.

# strftime directives shared by chrono (the reference dialect), pandas,
# and Java's DateTimeFormatter with identical meaning. Restricted to the
# numeric core for PARSING (where JVM/pandas leniency could diverge);
# formatting additionally allows month/day names and 12-hour forms.
_STRF_PARSE = {
    "%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH",
    "%M": "mm", "%S": "ss", "%f": "SSSSSS", "%.f": ".SSSSSS",
}
_STRF_FORMAT = {
    **_STRF_PARSE,
    "%y": "yy", "%b": "MMM", "%B": "MMMM", "%a": "EEE", "%A": "EEEE",
    "%I": "hh", "%p": "a", "%j": "DDD",
}


def _strftime_to_jvm(fmt: str, table: dict[str, str]) -> str | None:
    """Translate a strftime format to a Java datetime pattern, or None if
    any directive falls outside the shared-semantics subset."""
    out: list[str] = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%":
            for probe in (fmt[i : i + 3], fmt[i : i + 2]):  # %.f is 3 chars
                if probe in table:
                    out.append(table[probe])
                    i += len(probe)
                    break
            else:
                return None
        elif fmt[i] == "'":
            out.append("''")
            i += 1
        elif fmt[i].isalpha():
            out.append(f"'{fmt[i]}'")  # bare letters are pattern chars in Java
            i += 1
        else:
            out.append(fmt[i])
            i += 1
    return "".join(out)


def _fixed_offset_seconds(tz_name: str) -> int | None:
    """The zone's constant UTC offset in seconds, or None if it ever
    changes (DST or historical realignment) across 1970-2034, sampled
    quarterly every year. Pre-epoch history is deliberately out of scope:
    a zone stable since 1970 (e.g. Asia/Tokyo, whose DST ended in 1951)
    takes the native path, and pre-1970 wall times in such zones format
    with the modern offset — log/telemetry data does not predate Unix."""
    if tz_name == "local":
        return None
    from datetime import datetime as _dt
    from datetime import timezone as _utc_tz

    tz = ZoneInfo(tz_name)
    offsets = {
        _dt(y, m, 1, 12, tzinfo=_utc_tz.utc).astimezone(tz).utcoffset()
        for y in range(1970, 2035)
        for m in (1, 4, 7, 10)
    }
    if len(offsets) != 1:
        return None
    return int(offsets.pop().total_seconds())


def _session_tz_fixed_offset(spark) -> int | None:
    """The SESSION zone's constant offset, or None if it has DST/history.

    The native changetz expression parses and re-formats wall times in the
    session zone; the zone only cancels out of parse→shift→format when its
    offset never changes. A DST session zone (e.g. America/New_York) makes
    the shift wrong whenever it crosses one of that zone's transitions and
    mis-parses wall times inside its spring-forward gap — so the native
    path must treat the session zone exactly like from_tz/to_tz and fall
    back to the pandas UDF (which never touches the session zone) when it
    is not fixed-offset."""
    import re as _re

    name = spark.conf.get("spark.sql.session.timeZone", "") or ""
    m = _re.fullmatch(r"(?:GMT|UTC)?([+-])(\d{1,2}):?(\d{2})?", name)
    if m:  # literal-offset ids ("+09:00", "GMT+8") ZoneInfo can't load
        sign = 1 if m.group(1) == "+" else -1
        return sign * (int(m.group(2)) * 3600 + int(m.group(3) or 0) * 60)
    try:
        return _fixed_offset_seconds(name)
    except Exception:  # noqa: BLE001 — unknown zone id → pandas path
        return None


def _offset_text(seconds: int, colon: bool) -> str:
    sign = "+" if seconds >= 0 else "-"
    mins = abs(seconds) // 60
    return f"{sign}{mins // 60:02d}{':' if colon else ''}{mins % 60:02d}"


def _native_changetz(
    column: str,
    from_tz: str,
    to_tz: str,
    input_format: str,
    output_format: str | None,
):
    """The Catalyst expression for the fixed-format fixed-offset case, or
    None when semantics require the pandas path."""
    from_off = _fixed_offset_seconds(from_tz)
    to_off = _fixed_offset_seconds(to_tz)
    if from_off is None or to_off is None:
        return None
    in_pat = _strftime_to_jvm(input_format, _STRF_PARSE)
    if in_pat is None:
        return None
    if output_format:
        # offset directives become literals (the target offset is constant)
        out_f = output_format.replace("%:z", _offset_text(to_off, True)).replace(
            "%z", _offset_text(to_off, False)
        )
        out_pat = _strftime_to_jvm(out_f, _STRF_FORMAT)
        if out_pat is None:
            return None
        render = lambda ts: F.date_format(ts, out_pat)  # noqa: E731
    else:
        suffix = F.lit(_offset_text(to_off, True))
        render = lambda ts: F.concat(  # noqa: E731
            F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"), suffix
        )
    s = F.col(column).cast("string")
    # try_to_timestamp parses the wall time in the SESSION zone and
    # date_format prints in it; the zone cancels out of parse→shift→format
    # ONLY when its offset is constant, which the caller guarantees via
    # _session_tz_fixed_offset — a DST session zone would corrupt shifts
    # crossing its transitions, so those sessions use the pandas UDF.
    shifted = F.try_to_timestamp(s, F.lit(in_pat)) + F.make_dt_interval(
        secs=F.lit(to_off - from_off)
    )
    # parity with the UDF path: unparseable → null, empty stays empty
    return F.when(F.trim(s) == "", F.lit("")).otherwise(render(shifted))


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
      - spring-forward wall times outside the gap parse normally; times
        INSIDE the gap do not exist and become null (chrono
        ``LocalResult::None`` → ``None`` in changetz.rs:244-252);
      - unparseable non-empty cells become null, empty cells stay empty
        (changetz.rs:236-239).

    input/output formats are strftime-style (the reference uses chrono's
    strftime dialect). input_format=None or "auto" → the full auto-parse
    ladder (vectorized mixed-format pass + the reference's fuzzy-regex
    extraction and ~25 fallback formats, changetz.rs:9-145).

    Execution strategy: a FIXED input format between two fixed-offset
    zones — under a fixed-offset SESSION timezone, checked per call —
    compiles to pure Catalyst expressions (parse → constant
    interval shift → format; whole-stage codegen, no Python workers —
    ~10× on the headline bench and removes the Python boundary at
    cluster scale). The auto ladder and DST zones use the Arrow-batched
    pandas UDF, whose ambiguous/nonexistent-time policy needs tzdata.
    """
    require_columns(df, [column])
    _validate_tz(from_tz, "source")
    _validate_tz(to_tz, "target")
    out_fmt = output_format or _DEFAULT_OUT_FMT
    amb_flag = ambiguous == "earliest"  # pandas: True = DST (first occurrence)
    auto = input_format in (None, "auto")

    if not auto and _session_tz_fixed_offset(df.sparkSession) is not None:
        native = _native_changetz(column, from_tz, to_tz, input_format, output_format)
        if native is not None:
            return df.withColumn(column, native)

    @F.pandas_udf(T.StringType())
    def _changetz(s: pd.Series) -> pd.Series:
        if auto:
            parsed = _parse_auto(s)
        else:
            parsed = pd.to_datetime(s, format=input_format, errors="coerce")
        src = None if from_tz == "local" else from_tz
        localized = parsed.dt.tz_localize(src, ambiguous=amb_flag, nonexistent="NaT")
        converted = localized.dt.tz_convert(to_tz)
        if out_fmt == _DEFAULT_OUT_FMT:
            txt = converted.dt.strftime("%Y-%m-%dT%H:%M:%S.%f%z")
            txt = txt.str.replace(r"([+-]\d{2})(\d{2})$", r"\1:\2", regex=True)
        else:
            txt = converted.dt.strftime(out_fmt)
        # reference parity: unparseable / nonexistent → null (strftime of
        # NaT is already NaN); empty input cells stay empty strings
        empty = s.notna() & (s.astype(str).str.strip() == "")
        return txt.where(~empty, "")

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
            try:
                return _render_cell(_parse_cell(str(text), from_format), to_format)
            except Exception as e:  # noqa: BLE001 — cell-level error capture
                return f"# {e} error"

        # Parse/render each DISTINCT payload once per batch: structured log
        # props are categorical (few templates, many rows), so the memo
        # collapses most of the Python work; nulls stay null via map().
        memo = {text: one(text) for text in pd.unique(s.dropna())}
        return s.map(memo)

    return df.withColumn(column, _convert(F.col(column).cast("string")))
