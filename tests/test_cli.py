# -*- coding: utf-8 -*-
"""CLI surface tests (flag parity with reference __main__.py:28-39)."""
from click.testing import CliRunner

from illufly_tts_tpu.__main__ import cli


def test_serve_help_lists_all_flags():
    result = CliRunner().invoke(cli, ["serve", "--help"])
    assert result.exit_code == 0
    for flag in (
        "--host", "--port", "--repo-id", "--voices-dir", "--device",
        "--batch-size", "--max-wait-time", "--chunk-size", "--output-dir",
        "--debug-output", "--zh-dict", "--en-dict",
    ):
        assert flag in result.output, flag


def test_cli_group_help():
    result = CliRunner().invoke(cli, ["--help"])
    assert result.exit_code == 0
    assert "serve" in result.output
    assert "synth" in result.output


def test_synth_help():
    result = CliRunner().invoke(cli, ["synth", "--help"])
    assert result.exit_code == 0
    for flag in ("--output", "--voice-id", "--speed", "--segment"):
        assert flag in result.output
