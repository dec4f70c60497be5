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


def test_convert_help():
    result = CliRunner().invoke(cli, ["convert", "--help"])
    assert result.exit_code == 0
    for flag in ("--output", "--voices-dir", "--voices-output"):
        assert flag in result.output, flag


def test_convert_roundtrip(tmp_path):
    """End-to-end migration: a torch Kokoro-style checkpoint (.pt) plus
    a directory of .pt voice packs -> flax .msgpack + .npy voices; the
    msgpack must load back into a Synthesizer with identical leaves."""
    import numpy as np
    import torch

    from illufly_tts_tpu.__main__ import _tiny_cfg
    from tests.torch_twin import TwinKModel

    cfg = _tiny_cfg()
    torch.manual_seed(0)
    twin = TwinKModel(cfg)
    ckpt = tmp_path / "kokoro_tiny.pt"
    torch.save(twin.state_dict(), ckpt)
    vdir = tmp_path / "voices"
    vdir.mkdir()
    torch.save(torch.randn(8, 1, 2 * cfg.style_dim), vdir / "zf_test.pt")

    out = tmp_path / "weights.msgpack"
    result = CliRunner().invoke(cli, [
        "convert", str(ckpt), "-o", str(out),
        "--voices-dir", str(vdir), "--tiny",
    ])
    assert result.exit_code == 0, result.output
    assert out.exists()
    pack = np.load(vdir / "zf_test.npy")
    assert pack.shape == (8, 1, 2 * cfg.style_dim)
    assert pack.dtype == np.float32

    # converted weights load back bit-identically
    from illufly_tts_tpu.engine.synthesizer import Synthesizer

    s1 = Synthesizer(config=cfg)
    s1.load_params(str(ckpt))
    s2 = Synthesizer(config=cfg)
    s2.load_params(str(out))
    import jax

    leaves1 = jax.tree_util.tree_leaves(s1.params)
    leaves2 = jax.tree_util.tree_leaves(s2.params)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_voice_help():
    result = CliRunner().invoke(cli, ["train-voice", "--help"])
    assert result.exit_code == 0
    for flag in ("--data", "--output", "--steps", "--lr", "--init-voice"):
        assert flag in result.output, flag


import pytest  # noqa: E402


@pytest.mark.slow
def test_train_voice_end_to_end(tmp_path):
    """train-voice learns a pack from (wav, txt) pairs and writes the
    standard length-indexed layout that load_voice accepts."""
    import numpy as np

    from illufly_tts_tpu.audio.wav import save_wav

    d = tmp_path / "spk"
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        wave = (0.1 * np.sin(np.linspace(0, 60 + i, 4800))).astype(
            np.float32
        ) + 0.01 * rng.randn(4800).astype(np.float32)
        save_wav(str(d / f"u{i}.wav"), wave, 24000)
        (d / f"u{i}.txt").write_text(f"你好世界{i}", encoding="utf-8")

    out = tmp_path / "zf_custom.npy"
    result = CliRunner().invoke(cli, [
        "train-voice", "--data", str(d), "-o", str(out), "--tiny",
        "--steps", "6", "--batch-size", "2", "--tokens", "16",
        "--frames", "8", "--device", "cpu",
    ])
    assert result.exit_code == 0, result.output
    pack = np.load(out)
    assert pack.shape == (510, 1, 64)  # tiny cfg: 2*style_dim = 64
    assert np.isfinite(pack).all()

    # the written pack loads as a voice
    from illufly_tts_tpu.__main__ import _tiny_cfg
    from illufly_tts_tpu.engine.synthesizer import Synthesizer

    s = Synthesizer(config=_tiny_cfg(), voices_dir=str(tmp_path))
    v = s.load_voice("zf_custom")
    # load_voice squeezes the [L,1,256] pack layout to [L,256]
    # (reference kmodel.py:78-80)
    assert v.shape == (510, 64)
    np.testing.assert_array_equal(v[0], pack[0, 0])
