"""CLI front-end tests — golden assertions mirroring the reference's
end-to-end style (tests shell the grammar through parse+execute with an
in-process SparkSession instead of a subprocess; same coverage shape as
reference tests/test_base.py:32-47 golden-stdout checks)."""

from __future__ import annotations

import io
import os

import pytest

from qsvspark.cli import Command, execute, parse_batch_size, parse_commands, validate
from qsvspark.errors import InvalidArgumentError, QsvError

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
SIMPLE = os.path.join(FIX, "simple.csv")


def run_cli(spark, *argv: str) -> str:
    buf = io.StringIO()
    execute(parse_commands(list(argv)), spark=spark, out=buf)
    return buf.getvalue()


class TestParser:
    def test_split_on_dash(self):
        cmds = parse_commands(["load", "a.csv", "-", "isin", "c", "1,2", "-", "show"])
        assert [c.name for c in cmds] == ["load", "isin", "show"]
        assert cmds[1].args == ["c", "1,2"]

    def test_short_opt_fusion(self):
        for argv in (["load", "x.csv", "-s", ";"],
                     ["load", "x.csv", "-s;"],
                     ["load", "x.csv", "-s=;"]):
            c = parse_commands(argv)[0]
            assert c.options["-s"] == ";"

    def test_long_opt_equals(self):
        c = parse_commands(["timeline", "t", "--interval=2h"])[0]
        assert c.options["--interval"] == "2h"

    def test_flag_options(self):
        c = parse_commands(["grep", "pat", "-i", "-v"])[0]
        assert c.options == {"-i": True, "-v": True}

    def test_missing_positional_is_usage_error(self):
        # 'load f.csv - select' must raise the CLI error type (exit 1 +
        # "Error: ..." in main), never a bare IndexError traceback
        for argv in (["load", "f.csv", "-", "select"],
                     ["load", "f.csv", "-", "sed", "x"],
                     ["load", "f.csv", "-", "renamecol", "only_one"],
                     ["load"]):
            with pytest.raises(InvalidArgumentError, match="requires at least"):
                validate(parse_commands(argv))

    def test_missing_required_options(self):
        with pytest.raises(InvalidArgumentError, match="requires option"):
            validate(parse_commands(["load", "f.csv", "-", "pivot", "--rows", "r"]))
        with pytest.raises(InvalidArgumentError, match="requires option"):
            validate(parse_commands(["load", "f.csv", "-", "changetz", "dt"]))

    def test_finalizer_must_end_chain(self):
        with pytest.raises(InvalidArgumentError, match="must be the last"):
            validate(parse_commands(["load", "f.csv", "-", "show", "-", "sort", "c"]))

    def test_negative_values_not_options(self):
        c = parse_commands(["isin", "col", "-1,5"])[0]
        assert c.args == ["col", "-1,5"]

    def test_validate_rejects_unknown_option(self):
        with pytest.raises(InvalidArgumentError):
            validate([Command("sort", options={"-i": True})])

    def test_validate_rejects_unknown_command(self):
        with pytest.raises(InvalidArgumentError):
            validate([Command("explode")])

    def test_batch_size_units_and_clamp(self):
        assert parse_batch_size("2MB") == 2 * 1024**2
        assert parse_batch_size("1GB") == 1024**3
        assert parse_batch_size("1KB") == 1024**2  # clamped up to 1MB
        assert parse_batch_size("99GB") == 10 * 1024**3  # clamped down
        with pytest.raises(InvalidArgumentError):
            parse_batch_size("lots")


class TestExecute:
    def test_flagship_chain(self, spark):
        # README.md:34-style chain: load - isin - sort - head - show
        out = run_cli(
            spark, "load", SIMPLE, "-", "isin", "col1", "1,7",
            "-", "sort", "datetime", "-", "head", "2", "-", "show",
        )
        lines = out.strip().splitlines()
        assert lines[0] == "datetime,col1,col2,col3,str"
        assert lines[1].startswith("2023-01-01 12:00:00,1,2,3,foo")
        assert lines[2].startswith("2023-01-01 14:00:00,7,8,9,baz")

    def test_implicit_showtable(self, spark):
        out = run_cli(spark, "load", SIMPLE, "-", "head", "1")
        assert "shape:" in out  # showtable banner, no explicit finalizer

    def test_headers_plain(self, spark):
        out = run_cli(spark, "load", SIMPLE, "-", "headers", "-p")
        assert out.strip().splitlines() == ["datetime", "col1", "col2", "col3", "str"]

    def test_tsv_and_gz_match_csv(self, spark):
        base = run_cli(spark, "load", SIMPLE, "-", "show")
        tsv = run_cli(spark, "load", os.path.join(FIX, "simple.tsv"), "-", "show")
        gz = run_cli(spark, "load", SIMPLE + ".gz", "-", "show")
        assert base == tsv == gz

    def test_no_headers_names_columns_1_based(self, spark):
        out = run_cli(
            spark, "load", os.path.join(FIX, "simple_noheader.csv"),
            "--no-headers", "-", "headers", "-p",
        )
        assert out.strip().splitlines() == [f"column_{i}" for i in range(1, 6)]

    def test_grep_invert_ci(self, spark):
        out = run_cli(spark, "load", SIMPLE, "-", "grep", "FOO", "-i", "-v", "-", "show")
        body = out.strip().splitlines()[1:]
        assert len(body) == 2 and all("foo" not in l for l in body)

    def test_sed_all_columns(self, spark):
        out = run_cli(spark, "load", SIMPLE, "-", "sed", "[0-9]", "#", "-", "head", "1", "-", "show")
        assert "####-##-## ##:##:##,#,#,#,foo" in out

    def test_count_desc(self, spark):
        out = run_cli(spark, "load", SIMPLE, "-", "select", "str", "-", "count", "-", "show")
        lines = out.strip().splitlines()
        assert lines[0] == "str,count"
        assert all(l.endswith(",1") for l in lines[1:])

    def test_chain_must_start_with_load(self, spark):
        with pytest.raises(QsvError):
            run_cli(spark, "sort", "x")

    def test_dump_roundtrip(self, spark, tmp_path):
        dest = str(tmp_path / "out_csv")
        run_cli(spark, "load", SIMPLE, "-", "select", "col1,str",
                "-", "dump", "-o", dest)
        back = spark.read.option("header", "true").csv(dest)
        assert sorted(r["str"] for r in back.collect()) == ["bar", "baz", "foo"]

    def test_dump_batch_size_streams_single_file(self, spark, tmp_path):
        """--batch-size is no longer validate-and-ignore: it routes the
        dump through the toLocalIterator single-file stream, producing
        bytes identical to the library's single-file dump."""
        from qsvspark.io import load as _load
        from qsvspark.io.sinks import dump as _dump

        batched = str(tmp_path / "batched.csv")
        run_cli(spark, "load", SIMPLE, "-", "dump", "--batch-size", "1MB",
                "-o", batched)
        single = str(tmp_path / "single.csv")
        _dump(_load(spark, SIMPLE), single, single_file=True)
        assert os.path.isfile(batched)
        assert open(batched, "rb").read() == open(single, "rb").read()
