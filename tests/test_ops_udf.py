"""changetz / convert — the pandas-UDF operators, against the reference's
DST and format-conversion goldens (tests/test_chainables_changetz.py,
tests/test_chainables_convert.py)."""

from __future__ import annotations

import json

import pytest

from qsvspark import Q
from qsvspark.errors import InvalidArgumentError


class TestChangetz:
    def test_utc_identity(self, simple_df):
        q = Q(simple_df).changetz("datetime", from_tz="UTC", to_tz="UTC")
        got = [r["datetime"] for r in q.df.collect()]
        assert got == [
            "2023-01-01T12:00:00.000000+00:00",
            "2023-01-01T13:00:00.000000+00:00",
            "2023-01-01T14:00:00.000000+00:00",
        ]

    def test_to_losangeles(self, simple_df):
        q = Q(simple_df).changetz("datetime", "UTC", "America/Los_Angeles")
        assert q.df.collect()[0]["datetime"] == "2023-01-01T04:00:00.000000-08:00"

    def test_to_tokyo_with_output_format(self, simple_df):
        q = Q(simple_df).changetz(
            "datetime", "UTC", "Asia/Tokyo", output_format="%Y-%m-%d %H:%M:%S"
        )
        assert [r["datetime"] for r in q.df.collect()] == [
            "2023-01-01 21:00:00",
            "2023-01-01 22:00:00",
            "2023-01-01 23:00:00",
        ]

    def test_input_format(self, simple_df):
        q = Q(simple_df).changetz(
            "datetime", "UTC", "Asia/Tokyo", input_format="%Y-%m-%d %H:%M:%S"
        )
        assert q.df.collect()[0]["datetime"] == "2023-01-01T21:00:00.000000+09:00"

    def test_dst_earliest(self, spark, dst_csv):
        # reference golden: tests/test_chainables_changetz.py:57-71
        q = Q.load(spark, dst_csv).changetz(
            "datetime", "America/Los_Angeles", "UTC",
            input_format="%Y-%m-%d %H:%M:%S", ambiguous="earliest",
        )
        assert [r["datetime"] for r in q.df.collect()] == [
            "2023-11-05T07:30:00.000000+00:00",
            "2023-11-05T08:30:00.000000+00:00",  # 1st (PDT) occurrence
            "2023-11-05T08:45:00.000000+00:00",
            "2023-11-05T10:30:00.000000+00:00",
            "2023-03-12T09:30:00.000000+00:00",  # 01:30 is PST (pre-gap)
            "2023-03-12T10:30:00.000000+00:00",
        ]

    def test_dst_latest(self, spark, dst_csv):
        q = Q.load(spark, dst_csv).changetz(
            "datetime", "America/Los_Angeles", "UTC",
            input_format="%Y-%m-%d %H:%M:%S", ambiguous="latest",
        )
        assert [r["datetime"] for r in q.df.collect()] == [
            "2023-11-05T07:30:00.000000+00:00",
            "2023-11-05T09:30:00.000000+00:00",  # 2nd (PST) occurrence
            "2023-11-05T09:45:00.000000+00:00",
            "2023-11-05T10:30:00.000000+00:00",
            "2023-03-12T09:30:00.000000+00:00",
            "2023-03-12T10:30:00.000000+00:00",
        ]

    def test_auto_parse_ladder(self, spark):
        """The reference's auto ladder (changetz.rs:9-145): flexible
        parse, fuzzy extraction from free text, explicit fallback
        formats, unix epoch — exercised through UTC→UTC identity."""
        cases = [
            ("January 15th, 2023 at 2:30 PM", "2023-01-15 14:30:00"),
            ("Meeting on March 5th, 2023 at 9:15 AM was moved", "2023-03-05 09:15:00"),
            ("Jan 15, 2023 2:30 PM", "2023-01-15 14:30:00"),
            ("1/15/2023 2:30 PM", "2023-01-15 14:30:00"),
            ("Friday Jan 13 2023 9:00 AM", "2023-01-13 09:00:00"),
            ("15-Jan-2023 14:30:25", "2023-01-15 14:30:25"),
            ("Mon Jan 15 14:30:25 2023", "2023-01-15 14:30:25"),
            ("1674659425", "2023-01-25 15:10:25"),  # unix epoch seconds
            ("2023-01-15T14:30:00.250000", "2023-01-15 14:30:00"),
        ]
        df = spark.createDataFrame([(i, c[0]) for i, c in enumerate(cases)], ["i", "dt"])
        got = {
            r["i"]: r["dt"]
            for r in Q(df).changetz(
                "dt", "UTC", "UTC", input_format="auto",
                output_format="%Y-%m-%d %H:%M:%S",
            ).df.collect()
        }
        for i, (_, want) in enumerate(cases):
            assert got[i] == want, f"case {i}: {cases[i][0]!r} -> {got[i]!r}"

    def test_unparseable_null_empty_kept_gap_null(self, spark):
        """Reference parity: unparseable → null, empty → empty
        (changetz.rs:236-239); a true DST-gap wall time (2023-03-12
        02:30 America/Los_Angeles does not exist) → null
        (LocalResult::None, changetz.rs:244-252)."""
        df = spark.createDataFrame(
            [(0, "not a datetime at all"), (1, ""), (2, "2023-03-12 02:30:00")],
            ["i", "dt"],
        )
        got = {
            r["i"]: r["dt"]
            for r in Q(df).changetz("dt", "America/Los_Angeles", "UTC").df.collect()
        }
        assert got[0] is None
        assert got[1] == ""
        assert got[2] is None

    def test_invalid_tz_raises(self, simple_df):
        with pytest.raises(InvalidArgumentError, match="Invalid source timezone"):
            Q(simple_df).changetz("datetime", "Invalid/Timezone", "UTC")
        with pytest.raises(InvalidArgumentError, match="Invalid target timezone"):
            Q(simple_df).changetz("datetime", "UTC", "Invalid/Timezone")


class TestConvert:
    # reference goldens: tests/test_chainables_convert.py
    @pytest.fixture(scope="class")
    def json_df(self, spark):
        return spark.createDataFrame(
            [
                ('{"name": "Alice", "age": 25, "city": "Tokyo"}',),
                ('{"product": "laptop", "price": 89999, "in_stock": true}',),
            ],
            ["json"],
        )

    def test_json_to_json_pretty_sorted(self, json_df):
        got = Q(json_df).convert("json", "json", "json").df.collect()
        assert got[0]["json"] == '{\n  "age": 25,\n  "city": "Tokyo",\n  "name": "Alice"\n}'

    def test_json_to_yaml(self, json_df):
        got = Q(json_df).convert("json", "json", "yaml").df.collect()
        assert got[0]["json"] == "age: 25\ncity: Tokyo\nname: Alice"
        assert got[1]["json"] == "in_stock: true\nprice: 89999\nproduct: laptop"

    def test_json_to_xml(self, json_df):
        got = Q(json_df).convert("json", "json", "xml").df.collect()
        assert got[0]["json"] == "<age>25</age><city>Tokyo</city><name>Alice</name>"
        assert got[1]["json"] == "<in_stock>true</in_stock><price>89999</price><product>laptop</product>"

    def test_yaml_roundtrip(self, spark):
        df = spark.createDataFrame([("a: 1\nb: two",)], ["y"])
        got = Q(df).convert("y", "yaml", "json").df.collect()[0]["y"]
        assert json.loads(got) == {"a": 1, "b": "two"}

    def test_xml_to_json(self, spark):
        df = spark.createDataFrame([("<name>Alice</name><age>25</age>",)], ["x"])
        got = Q(df).convert("x", "xml", "json").df.collect()[0]["x"]
        assert json.loads(got) == {"name": "Alice", "age": "25"}

    def test_malformed_json_cleanup(self, spark):
        # doubled quotes from CSV-quoted JSON (convert.rs:190-233)
        df = spark.createDataFrame([('"{""a"": 1}"',)], ["j"])
        got = Q(df).convert("j", "json", "json").df.collect()[0]["j"]
        assert json.loads(got) == {"a": 1}

    def test_error_becomes_comment(self, spark):
        df = spark.createDataFrame([("not json at all {",)], ["j"])
        got = Q(df).convert("j", "json", "json").df.collect()[0]["j"]
        assert got.startswith("#") and got.endswith("error")

    def test_unknown_format_raises(self, json_df):
        with pytest.raises(InvalidArgumentError):
            Q(json_df).convert("json", "json", "toml")

    def test_memoized_batch_repeats_and_nulls(self, spark):
        # per-batch memoization must be transparent: repeated payloads all
        # get the rendered value, nulls stay null, errors stay per-cell
        rows = [('{"k": 1}',), (None,), ('{"k": 1}',), ("bad {",), ('{"k": 2}',)]
        df = spark.createDataFrame(rows, ["j"]).coalesce(1)
        got = [r["j"] for r in Q(df).convert("j", "json", "json").df.collect()]
        assert got[0] == got[2] == '{\n  "k": 1\n}'
        assert got[1] is None
        assert got[3].startswith("#") and got[3].endswith("error")
        assert got[4] == '{\n  "k": 2\n}'


class TestChangetzNativePath:
    """The fixed-format fixed-offset case runs as pure Catalyst
    expressions (no Python workers); these pin byte-parity with the
    pandas-UDF path and that the dispatch picks each path correctly."""

    CASES = [
        ("2023-01-01 12:00:00", ),
        ("2023-06-15 23:59:59", ),
        ("not a date", ),
        ("", ),
        (None, ),
    ]

    def _both_paths(self, spark, monkeypatch, **kw):
        from qsvspark.ops import udf as udfmod

        df = spark.createDataFrame(self.CASES, ["t"])
        native = Q(df).changetz("t", **kw).df.collect()
        monkeypatch.setattr(udfmod, "_native_changetz", lambda *a: None)
        pandas_path = Q(df).changetz("t", **kw).df.collect()
        return [r["t"] for r in native], [r["t"] for r in pandas_path]

    def test_parity_default_output(self, spark, monkeypatch):
        n, p = self._both_paths(
            spark, monkeypatch, from_tz="UTC", to_tz="Asia/Tokyo",
            input_format="%Y-%m-%d %H:%M:%S",
        )
        assert n == p
        assert n[0] == "2023-01-01T21:00:00.000000+09:00"
        assert n[2] is None and n[3] == "" and n[4] is None

    def test_parity_custom_output_with_offset(self, spark, monkeypatch):
        n, p = self._both_paths(
            spark, monkeypatch, from_tz="Etc/GMT+5", to_tz="UTC",
            input_format="%Y-%m-%d %H:%M:%S", output_format="%Y/%m/%d %H:%M:%S %z",
        )
        assert n == p
        assert n[0] == "2023/01/01 17:00:00 +0000"

    def test_parity_fraction_input(self, spark, monkeypatch):
        from qsvspark.ops import udf as udfmod

        df = spark.createDataFrame(
            [("2023-01-01 12:00:00.123456",), ("2023-01-01 12:00:00",)], ["t"]
        )
        kw = dict(from_tz="UTC", to_tz="Etc/GMT-9",
                  input_format="%Y-%m-%d %H:%M:%S.%f")
        native = [r["t"] for r in Q(df).changetz("t", **kw).df.collect()]
        monkeypatch.setattr(udfmod, "_native_changetz", lambda *a: None)
        pandas_path = [r["t"] for r in Q(df).changetz("t", **kw).df.collect()]
        assert native == pandas_path
        assert native[0] == "2023-01-01T21:00:00.123456+09:00"
        assert native[1] is None  # strict format: missing fraction fails

    def test_dst_zone_keeps_pandas_path(self):
        from qsvspark.ops.udf import _fixed_offset_seconds, _native_changetz

        assert _fixed_offset_seconds("America/Los_Angeles") is None
        assert _native_changetz(
            "t", "America/Los_Angeles", "UTC", "%Y-%m-%d %H:%M:%S", None
        ) is None

    def test_fixed_offset_detection(self):
        from qsvspark.ops.udf import _fixed_offset_seconds

        assert _fixed_offset_seconds("UTC") == 0
        assert _fixed_offset_seconds("Asia/Tokyo") == 9 * 3600
        assert _fixed_offset_seconds("Etc/GMT+5") == -5 * 3600
        assert _fixed_offset_seconds("local") is None

    def test_unsupported_directive_falls_back(self):
        from qsvspark.ops.udf import _native_changetz

        # %s (unix epoch) is outside the shared-parse subset
        assert _native_changetz("t", "UTC", "UTC", "%s", None) is None

    def test_native_plan_has_no_python(self, spark):
        df = spark.createDataFrame([("2023-01-01 12:00:00",)], ["t"])
        q = Q(df).changetz("t", from_tz="UTC", to_tz="Asia/Tokyo",
                           input_format="%Y-%m-%d %H:%M:%S")
        plan = q.df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            q.df._jdf.queryExecution(), "simple"
        )
        assert "Python" not in plan

    def test_dst_session_tz_gates_native_path(self, spark):
        """The native parse→shift→format cancels the session zone out
        ONLY when that zone is fixed-offset. Under a DST session zone
        (America/New_York) a UTC→Tokyo shift crossing the session zone's
        spring-forward transition must still be exact — which requires
        changetz to fall back to the pandas path (the native expression
        would return 10:00 instead of 09:00, and gap wall times would
        mis-parse)."""
        from qsvspark.ops.udf import _session_tz_fixed_offset

        df = spark.createDataFrame(
            [("2023-03-12 00:00:00",), ("2023-03-12 02:30:00",)], ["t"]
        )
        orig = spark.conf.get("spark.sql.session.timeZone")
        try:
            spark.conf.set("spark.sql.session.timeZone", "America/New_York")
            assert _session_tz_fixed_offset(spark) is None
            out = [
                r["t"]
                for r in Q(df).changetz(
                    "t", from_tz="UTC", to_tz="Asia/Tokyo",
                    input_format="%Y-%m-%d %H:%M:%S",
                    output_format="%Y-%m-%d %H:%M:%S",
                ).df.collect()
            ]
        finally:
            spark.conf.set("spark.sql.session.timeZone", orig)
        assert out == ["2023-03-12 09:00:00", "2023-03-12 11:30:00"]

    def test_session_tz_fixed_offset_detection(self, spark):
        from qsvspark.ops.udf import _session_tz_fixed_offset

        orig = spark.conf.get("spark.sql.session.timeZone")
        try:
            for name, want in [
                ("UTC", 0), ("Etc/GMT+5", -5 * 3600), ("+09:00", 9 * 3600),
                ("GMT+8", 8 * 3600), ("-03:30", -(3 * 3600 + 30 * 60)),
            ]:
                spark.conf.set("spark.sql.session.timeZone", name)
                assert _session_tz_fixed_offset(spark) == want, name
        finally:
            spark.conf.set("spark.sql.session.timeZone", orig)
