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
    for flag in ("--output", "--voice-id", "--speed", "--segment",
                 "--stream", "--timestamps"):
        assert flag in result.output


def test_split_deployment_commands():
    """server / api / client restore the reference README's split
    deployment surface (README.md:44-66)."""
    result = CliRunner().invoke(cli, ["--help"])
    for cmd in ("server", "api", "client"):
        assert cmd in result.output, cmd

    result = CliRunner().invoke(cli, ["server", "--help"])
    assert result.exit_code == 0
    for flag in ("--transport", "--port", "--repo-id", "--voices-dir",
                 "--batch-size", "--max-wait-time", "--chunk-size"):
        assert flag in result.output, flag

    result = CliRunner().invoke(cli, ["api", "--help"])
    assert result.exit_code == 0
    for flag in ("--server-host", "--server-port", "--process-command"):
        assert flag in result.output, flag
    # api without a target is a usage error, not a crash
    result = CliRunner().invoke(cli, ["api"])
    assert result.exit_code != 0
    assert "server-host" in result.output

    result = CliRunner().invoke(cli, ["client", "--help"])
    assert result.exit_code == 0
    assert "speak" in result.output
    assert "voices" in result.output

    result = CliRunner().invoke(cli, ["client", "speak", "--help"])
    assert result.exit_code == 0
    for flag in ("--process-command", "--process-args", "--server-host",
                 "--output"):
        assert flag in result.output, flag
