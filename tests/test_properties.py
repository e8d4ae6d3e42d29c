"""Property-based tests (hypothesis) for the pure-Python surfaces: the
colspec resolver, CLI grammar, batch-size/interval parsers, the changetz
auto-parse ladder, and convert round-trips. These run without a
SparkSession — they pin the parsing/validation semantics the reference
implements in Rust (select.rs, command.rs, changetz.rs, convert.rs)
against randomized inputs, a test mode the reference itself lacks
(SURVEY.md §5: no property-based testing upstream).
"""

from __future__ import annotations

import json
import string
from datetime import datetime

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from qsvspark.cli import Command, parse_batch_size, parse_commands, validate
from qsvspark.errors import ColumnNotFoundError, InvalidArgumentError, QsvError
from qsvspark.ops.helpers import parse_interval_ms, resolve_colspec
from qsvspark.ops.udf import _parse_one_auto, _parse_cell, _render_cell

SETTINGS = settings(max_examples=60, deadline=None)

# identifier-ish column names: no commas/quotes/colons/dashes, not all digits
_name = st.from_regex(r"[a-z][a-z0-9_]{0,9}", fullmatch=True)
_columns = st.lists(_name, min_size=1, max_size=12, unique=True)


class TestColspec:
    @SETTINGS
    @given(_columns, st.data())
    def test_exact_names_resolve_identically(self, cols, data):
        picks = data.draw(st.lists(st.sampled_from(cols), min_size=1, max_size=5))
        assert resolve_colspec(cols, ",".join(picks)) == picks

    @SETTINGS
    @given(_columns, st.data())
    def test_index_range_is_inclusive_slice(self, cols, data):
        lo = data.draw(st.integers(1, len(cols)))
        hi = data.draw(st.integers(lo, len(cols)))
        for sep in (":", "-"):
            assert resolve_colspec(cols, f"{lo}{sep}{hi}") == cols[lo - 1 : hi]

    @SETTINGS
    @given(_columns, st.data())
    def test_name_range_equals_index_range(self, cols, data):
        ia = data.draw(st.integers(0, len(cols) - 1))
        ib = data.draw(st.integers(ia, len(cols) - 1))
        spec = f"{cols[ia]}:{cols[ib]}"
        assert resolve_colspec(cols, spec) == cols[ia : ib + 1]

    @SETTINGS
    @given(_columns, st.data())
    def test_reversed_name_range_rejected(self, cols, data):
        if len(cols) < 2:
            return
        ia = data.draw(st.integers(1, len(cols) - 1))
        ib = data.draw(st.integers(0, ia - 1))
        with pytest.raises(InvalidArgumentError):
            resolve_colspec(cols, f"{cols[ia]}:{cols[ib]}")

    @SETTINGS
    @given(_columns)
    def test_out_of_range_index_rejected(self, cols):
        with pytest.raises(ColumnNotFoundError):
            resolve_colspec(cols, str(len(cols) + 1))
        with pytest.raises(ColumnNotFoundError):
            resolve_colspec(cols, "0")  # 1-based: 0 is never valid

    @SETTINGS
    @given(_columns, _name)
    def test_unknown_name_rejected(self, cols, tok):
        if tok in cols:
            return
        with pytest.raises(QsvError):
            resolve_colspec(cols, tok)


class TestBatchSizeAndInterval:
    @SETTINGS
    @given(st.integers(0, 10**14))
    def test_batch_size_always_clamped(self, n):
        v = parse_batch_size(f"{n}B")
        assert 1024**2 <= v <= 10 * 1024**3

    @SETTINGS
    @given(st.integers(1, 8192))
    def test_batch_size_suffixes_scale(self, n):
        mb, gb = parse_batch_size(f"{n}MB"), parse_batch_size(f"{n}GB")
        assert mb == min(max(n * 1024**2, 1024**2), 10 * 1024**3)
        assert gb == min(n * 1024**3, 10 * 1024**3)

    @SETTINGS
    @given(st.text(alphabet=string.ascii_letters + "!@# ", min_size=1, max_size=8))
    def test_batch_size_garbage_rejected(self, junk):
        with pytest.raises(InvalidArgumentError):
            parse_batch_size(junk)

    @SETTINGS
    @given(st.integers(1, 10**6), st.sampled_from(["ms", "s", "m", "h", "d"]))
    def test_interval_is_exact_multiple(self, n, unit):
        ms = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000, "d": 86_400_000}
        assert parse_interval_ms(f"{n}{unit}") == n * ms[unit]

    @SETTINGS
    @given(st.sampled_from(["", "5", "m5", "5 m", "5x", "-5m", "5.5s"]))
    def test_interval_garbage_rejected(self, junk):
        with pytest.raises(InvalidArgumentError):
            parse_interval_ms(junk)


_arg = st.from_regex(r"[a-z0-9_.][a-z0-9_.]{0,7}", fullmatch=True)


class TestCliGrammar:
    @SETTINGS
    @given(st.lists(st.tuples(_name, st.lists(_arg, max_size=3)),
                    min_size=1, max_size=5))
    def test_chain_splits_on_dash(self, chain):
        argv: list[str] = []
        for i, (cmd, args) in enumerate(chain):
            if i:
                argv.append("-")
            argv.extend([cmd, *args])
        cmds = parse_commands(argv)
        assert [(c.name, c.args) for c in cmds] == [list(t) and t for t in chain]

    @SETTINGS
    @given(_arg)
    def test_fused_short_option_value(self, val):
        c = parse_commands(["load", "x.csv", f"-s{val}"])[0]
        assert c.options["-s"] == val
        c2 = parse_commands(["load", "x.csv", "-s", val])[0]
        assert c2.options["-s"] == val
        c3 = parse_commands(["load", "x.csv", f"-s={val}"])[0]
        assert c3.options["-s"] == val

    def test_validate_rejects_midchain_finalizer(self):
        cmds = [Command("load", ["x.csv"]), Command("show"), Command("sort", ["a"])]
        with pytest.raises(InvalidArgumentError):
            validate(cmds)

    def test_validate_rejects_missing_arity(self):
        with pytest.raises(InvalidArgumentError):
            validate([Command("load", ["x.csv"]), Command("select")])

    def test_validate_rejects_missing_required_opts(self):
        with pytest.raises(InvalidArgumentError):
            validate([Command("load", ["x.csv"]),
                      Command("convert", ["c"], {"--from": "json"})])

    @SETTINGS
    @given(_name)
    def test_validate_rejects_unknown_commands(self, cmd):
        from qsvspark.cli import _VALID_OPTS
        if cmd in _VALID_OPTS:
            return
        with pytest.raises(InvalidArgumentError):
            validate([Command(cmd)])


_dt = st.datetimes(min_value=datetime(1980, 1, 2), max_value=datetime(2099, 12, 30))


class TestChangetzAutoLadder:
    @SETTINGS
    @given(_dt)
    def test_iso_and_fallback_formats_roundtrip(self, dt):
        dt = dt.replace(microsecond=0)
        for fmt in ("%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S",
                    "%Y/%m/%d %H:%M:%S", "%d %b %Y %H:%M:%S"):
            parsed = _parse_one_auto(dt.strftime(fmt))
            assert parsed == dt, (fmt, dt)

    @SETTINGS
    @given(_dt)
    def test_fuzzy_extraction_from_prose(self, dt):
        dt = dt.replace(second=0, microsecond=0)
        text = f"The incident occurred on {dt.strftime('%B')} {dt.day}, {dt.year} at {dt.strftime('%I:%M %p').lstrip('0')} exactly"
        parsed = _parse_one_auto(text)
        assert parsed == dt, text

    @SETTINGS
    @given(st.integers(10**9, 2 * 10**9))
    def test_unix_epoch_seconds(self, epoch):
        # dateutil can't parse a bare 10-digit number; the epoch arm must
        assert _parse_one_auto(str(epoch)).timestamp() == epoch

    @SETTINGS
    @given(st.text(alphabet="xyz!@#$%^&*", min_size=1, max_size=12))
    def test_garbage_is_nat_not_exception(self, junk):
        import pandas as pd
        assert _parse_one_auto(junk) is pd.NaT


_json_scalar = st.one_of(
    st.integers(-10**9, 10**9), st.booleans(),
    st.text(alphabet=string.ascii_letters + " _", max_size=12),
)
_json_obj = st.dictionaries(_name, st.one_of(
    _json_scalar, st.lists(_json_scalar, max_size=3),
    st.dictionaries(_name, _json_scalar, max_size=3),
), min_size=1, max_size=5)


class TestConvertRoundTrip:
    @SETTINGS
    @given(_json_obj)
    def test_json_yaml_json_identity(self, obj):
        as_yaml = _render_cell(obj, "yaml")
        back = _parse_cell(as_yaml, "yaml")
        assert back == obj

    @SETTINGS
    @given(_json_obj)
    def test_json_prettify_is_stable(self, obj):
        pretty = _render_cell(_parse_cell(json.dumps(obj), "json"), "json")
        assert _render_cell(_parse_cell(pretty, "json"), "json") == pretty

    @SETTINGS
    @given(st.dictionaries(_name, st.integers(-999, 999), min_size=1, max_size=5))
    def test_flat_dict_xml_roundtrip(self, obj):
        xml = _render_cell(obj, "xml")
        back = _parse_cell(xml, "xml")
        # XML carries no types: values come back as strings
        assert back == {k: str(v) for k, v in obj.items()}
