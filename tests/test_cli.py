"""CLI surface tests (M3)."""

import glob

import pytest

from hdfs2cass_spark.cli import build_parser, main


def test_parser_flags():
    args = build_parser().parse_args(
        [
            "--input", "/a", "--input", "/b",
            "--output", "cql://h/ks/t",
            "--rowkey", "k", "--timestamp", "ts", "--ttl", "ttl",
            "--ignore", "x", "--ignore", "y",
        ]
    )
    assert args.input == ["/a", "/b"]
    assert args.ignore == ["x", "y"]
    assert args.format == "parquet"


def test_required_flags():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["--input", "/a"])  # missing --output


def test_cli_end_to_end(spark, sf_dir, tmp_path):
    # spark fixture keeps the session alive; cli's getOrCreate reuses it
    out = str(tmp_path / "sink")
    rc = main(
        [
            "--input", f"{sf_dir}/nation.parquet",
            "--input", f"{sf_dir}/nation.parquet",
            "--rowkey", "n_name",
            "--output", "cql://h/ks/nation?reducers=2",
            "--simulated-path", out,
            "--now-ms", "42",
        ]
    )
    assert rc == 0
    assert len(glob.glob(f"{out}/bucket=*")) >= 1
