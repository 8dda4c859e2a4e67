"""End-to-end CLI tests: dry-run default, result sinks, --execute apply,
--since time filter (SURVEY §3.1 lifecycle parity)."""

from __future__ import annotations

import os

from trino_adaptive_partitioning_tool_spark.cli import main

SF = "/root/testdata/sf0.001"


def test_cli_dry_run_writes_results(spark, tmp_path, capsys):
    out = str(tmp_path / "results")
    assert main(["--sf-dir", SF, "--out", out]) == 0
    captured = capsys.readouterr().out
    assert "Partition recommendations" in captured
    assert "Dry run" in captured
    for key in ("usage", "recommendations", "column_scores"):
        assert os.path.isdir(os.path.join(out, key)), key
    assert not os.path.isdir(os.path.join(out, "applied"))


def test_cli_execute_applies_partitioned_rewrite(spark, tmp_path, capsys):
    out = str(tmp_path / "results")
    assert main(["--sf-dir", SF, "--out", out, "--execute"]) == 0
    applied = os.path.join(out, "applied")
    assert os.path.isdir(applied)
    tables = os.listdir(applied)
    assert tables, "expected at least one applied table"
    # identity partition keys appear as partition directories
    first = os.path.join(applied, sorted(tables)[0])
    assert any("=" in d for d in os.listdir(first)), os.listdir(first)


def test_cli_since_filters_log(spark, tmp_path, capsys):
    out = str(tmp_path / "r2")
    assert main(["--sf-dir", SF, "--out", out, "--since", "2025-07-01"]) == 0
    captured = capsys.readouterr().out
    # only July fixture queries remain; q_0005 (May, the 100-scorer) gone
    assert "q_0005" not in captured
