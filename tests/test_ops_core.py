"""Operator-level parity tests — each golden assertion re-expressed from
the reference test suite (SURVEY.md §5.1) as DataFrame-level checks."""

from __future__ import annotations

import pytest

from qsvspark import Q
from qsvspark.errors import ColumnNotFoundError


def tuples(q):
    return [tuple(r) for r in q.df.collect()]


ROW1 = ("2023-01-01 12:00:00", 1, 2, 3, "foo")
ROW2 = ("2023-01-01 13:00:00", 4, 5, 6, "bar")
ROW3 = ("2023-01-01 14:00:00", 7, 8, 9, "baz")


class TestSelect:
    # reference: tests/test_chainables_select.py:6-123
    def test_names(self, simple_df):
        q = Q(simple_df).select("col1,col3")
        assert q.df.columns == ["col1", "col3"]
        assert sorted(tuples(q)) == [(1, 3), (4, 6), (7, 9)]

    def test_name_range(self, simple_df):
        q = Q(simple_df).select("col1:col3")
        assert q.df.columns == ["col1", "col2", "col3"]

    def test_dash_range(self, simple_df):
        assert Q(simple_df).select("col1-col3").df.columns == ["col1", "col2", "col3"]

    def test_index_range(self, simple_df):
        # 1-based: 2:4 → col1,col2,col3
        assert Q(simple_df).select("2:4").df.columns == ["col1", "col2", "col3"]

    def test_single_index(self, simple_df):
        assert Q(simple_df).select("5").df.columns == ["str"]

    def test_mixed(self, simple_df):
        assert Q(simple_df).select("datetime,col2:col3").df.columns == [
            "datetime", "col2", "col3",
        ]

    def test_missing_column_raises(self, simple_df):
        with pytest.raises(ColumnNotFoundError):
            Q(simple_df).select("nope")


class TestIsin:
    # reference: tests/test_chainables_isin.py
    def test_single(self, simple_df):
        assert tuples(Q(simple_df).isin("str", ["foo"])) == [ROW1]

    def test_multiple(self, simple_df):
        assert sorted(tuples(Q(simple_df).isin("str", ["foo", "bar"]))) == sorted([ROW1, ROW2])

    def test_numeric_as_string(self, simple_df):
        # int column matched against string literals (isin.rs:31-44)
        assert sorted(tuples(Q(simple_df).isin("col1", ["1", "7"]))) == sorted([ROW1, ROW3])
        assert sorted(tuples(Q(simple_df).isin("col1", [1, 7]))) == sorted([ROW1, ROW3])

    def test_datetime_value(self, simple_df):
        assert tuples(Q(simple_df).isin("datetime", ["2023-01-01 12:00:00"])) == [ROW1]

    def test_empty_values_empty_result(self, simple_df):
        assert tuples(Q(simple_df).isin("str", [])) == []


class TestContains:
    # reference: tests/test_chainables_contains.py
    def test_literal(self, simple_df):
        assert tuples(Q(simple_df).contains("str", "ba")) == [ROW2, ROW3]

    def test_case_sensitive_miss(self, simple_df):
        assert tuples(Q(simple_df).contains("str", "BA")) == []

    def test_ignorecase(self, simple_df):
        assert tuples(Q(simple_df).contains("str", "BA", ignorecase=True)) == [ROW2, ROW3]

    def test_numeric_column(self, simple_df):
        assert tuples(Q(simple_df).contains("col1", "4")) == [ROW2]


class TestGrep:
    # reference: tests/test_chainables_grep.py:6-106
    def test_any_column(self, simple_df):
        assert tuples(Q(simple_df).grep("ba")) == [ROW2, ROW3]

    def test_matches_numeric_col(self, simple_df):
        assert tuples(Q(simple_df).grep("^4$")) == [ROW2]

    def test_ignorecase(self, simple_df):
        assert tuples(Q(simple_df).grep("BAZ", ignorecase=True)) == [ROW3]

    def test_invert(self, simple_df):
        assert tuples(Q(simple_df).grep("ba", invert=True)) == [ROW1]

    def test_regex_alternation(self, simple_df):
        assert tuples(Q(simple_df).grep("foo|baz")) == [ROW1, ROW3]


class TestSed:
    # reference: tests/test_chainables_sed.py:42-64
    def test_single_column(self, simple_df):
        q = Q(simple_df).sed("foo", "FOO", column="str")
        assert [t[4] for t in tuples(q)] == ["FOO", "bar", "baz"]

    def test_all_columns(self, simple_df):
        q = Q(simple_df).sed("1", "X")
        rows = tuples(q)
        # datetime strings hit too: 2023-01-01 12:.. → 2023-0X-0X X2:..
        assert rows[0][0] == "2023-0X-0X X2:00:00"
        assert rows[0][1] == "X"

    def test_ignorecase(self, simple_df):
        q = Q(simple_df).sed("FOO", "hit", column="str", ignorecase=True)
        assert [t[4] for t in tuples(q)] == ["hit", "bar", "baz"]


class TestSortHeadTail:
    # reference: tests/test_chainables_sort.py:6-65, head.rs, tail.rs
    def test_sort_asc(self, simple_df):
        assert [t[1] for t in tuples(Q(simple_df).sort("col1"))] == [1, 4, 7]

    def test_sort_desc(self, simple_df):
        assert [t[1] for t in tuples(Q(simple_df).sort("col1", desc=True))] == [7, 4, 1]

    def test_sort_multi(self, simple_df):
        assert [t[4] for t in tuples(Q(simple_df).sort("str,col1"))] == ["bar", "baz", "foo"]

    def test_head(self, simple_df):
        assert tuples(Q(simple_df).head(2)) == [ROW1, ROW2]

    def test_head_default_5(self, simple_df):
        assert len(tuples(Q(simple_df).head())) == 3

    def test_tail(self, simple_df):
        assert tuples(Q(simple_df).tail(2)) == [ROW2, ROW3]


class TestUniqCount:
    # reference: tests/test_chainables_uniq.py:6-24, test_chainables_count.py:6-25
    def test_uniq_keep_first_stable(self, spark):
        df = spark.createDataFrame(
            [("a", 1), ("b", 2), ("a", 1), ("c", 3), ("b", 2)], ["k", "v"]
        )
        got = [tuple(r) for r in Q(df).uniq().df.collect()]
        assert got == [("a", 1), ("b", 2), ("c", 3)]

    def test_uniq_unstable_same_set(self, spark):
        df = spark.createDataFrame([("a", 1), ("a", 1), ("b", 2)], ["k", "v"])
        assert sorted(tuple(r) for r in Q(df).uniq(stable=False).df.collect()) == [
            ("a", 1), ("b", 2),
        ]

    def test_count_desc(self, spark):
        df = spark.createDataFrame([("x",), ("x",), ("x",), ("y",)], ["k"])
        got = [tuple(r) for r in Q(df).count().df.collect()]
        assert got == [("x", 3), ("y", 1)]
        assert Q(df).count().df.columns == ["k", "count"]


class TestPivot:
    # reference: tests/test_chainables_pivot.py — grouped agg, not cross-tab
    def test_sum(self, spark):
        df = spark.createDataFrame(
            [("N", "A", 10), ("N", "A", 5), ("S", "B", 7)], ["region", "prod", "sales"]
        )
        q = Q(df).pivot(rows="region", cols="prod", values="sales", agg="sum")
        assert q.df.columns == ["region", "prod", "sales_sum"]
        assert sorted(tuple(r) for r in q.df.collect()) == [("N", "A", 15), ("S", "B", 7)]

    def test_unknown_agg_falls_back_to_sum(self, spark):
        df = spark.createDataFrame([("N", "A", 10)], ["r", "c", "v"])
        with pytest.warns(UserWarning):
            q = Q(df).pivot("r", "c", "v", agg="bogus")
        assert q.df.columns == ["r", "c", "v_sum"]

    def test_std_is_sample_std(self, spark):
        df = spark.createDataFrame([("N", "A", 1.0), ("N", "A", 3.0)], ["r", "c", "v"])
        got = Q(df).pivot("r", "c", "v", agg="std").df.collect()[0]["v_std"]
        assert abs(got - 1.4142135623730951) < 1e-12  # ddof=1


class TestTimeline:
    # reference: tests/test_chainables_timeline.py:11-30
    def test_hourly_counts(self, spark, timeline_csv):
        q = Q.load(spark, timeline_csv).timeline("datetime", "1h")
        rows = [tuple(r) for r in q.df.collect()]
        assert q.df.columns == ["timeline_1h", "count"]
        assert rows == [
            (f"2023-01-01 {h:02d}:00:00", h + 1) for h in range(13)
        ]

    def test_30m_buckets(self, spark, timeline_csv):
        q = Q.load(spark, timeline_csv).timeline("datetime", "30m")
        assert q.df.columns == ["timeline_30m", "count"]

    def test_sum_agg(self, spark, timeline_csv):
        q = Q.load(spark, timeline_csv).timeline("datetime", "1h", agg="sum", agg_column="value")
        assert q.df.columns == ["timeline_1h", "count", "sum_value"]
        first = q.df.collect()[0]
        assert first["sum_value"] == 0.0  # hour 0: single row value 0


class TestTimeslice:
    # reference: tests/test_chainables_timeslice.py:11-76 (inclusive bounds)
    def test_inclusive_bounds(self, simple_df):
        q = Q(simple_df).timeslice(
            "datetime", start="2023-01-01 12:00:00", end="2023-01-01 13:00:00"
        )
        assert tuples(q) == [ROW1, ROW2]

    def test_start_only(self, simple_df):
        assert tuples(Q(simple_df).timeslice("datetime", start="2023-01-01 13:30:00")) == [ROW3]

    def test_end_only(self, simple_df):
        assert tuples(Q(simple_df).timeslice("datetime", end="2023-01-01 12:00:00")) == [ROW1]


class TestTimeround:
    # reference: tests/test_chainables_timeround.py (unit-specific formats)
    @pytest.mark.parametrize(
        "unit,expected",
        [
            ("y", "2023"),
            ("M", "2023-01"),
            ("d", "2023-01-01"),
            ("h", "2023-01-01 12"),
            ("m", "2023-01-01 12:00"),
            ("s", "2023-01-01 12:00:00"),
        ],
    )
    def test_units(self, simple_df, unit, expected):
        q = Q(simple_df).timeround("datetime", unit)
        assert q.df.collect()[0]["datetime"] == expected

    def test_output_column(self, simple_df):
        q = Q(simple_df).timeround("datetime", "d", output="day")
        assert "day" in q.df.columns
        assert q.df.collect()[0]["datetime"] == "2023-01-01 12:00:00"  # original kept


class TestRenamecol:
    def test_rename(self, simple_df):
        q = Q(simple_df).renamecol("str", "name")
        assert q.df.columns == ["datetime", "col1", "col2", "col3", "name"]
