# -*- coding: utf-8 -*-
"""Synthesizer engine tests (tiny config, CPU)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # model-compile-heavy (see pyproject markers)

from illufly_tts_tpu.engine.synthesizer import Synthesizer
from tests.test_model import tiny_config


@pytest.fixture(scope="module")
def synth():
    s = Synthesizer(
        config=tiny_config(),
        token_buckets=(16, 32),
        frame_buckets=(32, 64, 128),
    )
    s.register_random_voice("test_voice", seed=3)
    return s


def test_single(synth):
    audio = synth.synthesize_batch(["ni→xau↓"], ["test_voice"])
    assert len(audio) == 1
    assert audio[0].dtype == np.float32
    assert audio[0].size > 0
    assert audio[0].size % synth.config.samples_per_frame == 0
    assert np.all(np.isfinite(audio[0]))


def test_batch_varied_lengths(synth):
    texts = ["ni→xau↓", "ni→xau↓ma, tsai↘tɕjɛn↘.", "a→"]
    audio = synth.synthesize_batch(texts, ["test_voice"] * 3)
    assert len(audio) == 3
    # longer phoneme strings should not produce shorter audio than a single
    # phoneme (sanity of per-item trimming)
    assert audio[1].size >= audio[2].size


def test_speed_shortens(synth):
    slow = synth.synthesize_batch(
        ["ni→xau↓tsai↘tɕjɛn↘"], ["test_voice"], [0.7]
    )[0]
    fast = synth.synthesize_batch(
        ["ni→xau↓tsai↘tɕjɛn↘"], ["test_voice"], [1.5]
    )[0]
    assert fast.size < slow.size


def test_batch_matches_single(synth):
    """Batched inference must produce the same audio as single-item calls."""
    texts = ["ni→xau↓", "tsʰɤ↘ʂɨ↘wən↗tɕjɛn↘"]
    batched = synth.synthesize_batch(texts, ["test_voice"] * 2)
    singles = [
        synth.synthesize_batch([t], ["test_voice"])[0] for t in texts
    ]
    for b, s in zip(batched, singles):
        assert b.size == s.size
        # different compiled programs reorder f32 reductions; the exp() iSTFT
        # head amplifies that to ~1e-5 relative at the audio scale
        scale = max(np.abs(s).max(), 1.0)
        np.testing.assert_allclose(b / scale, s / scale, atol=5e-4)


def test_empty_batch(synth):
    assert synth.synthesize_batch([], []) == []


def test_unknown_voice(synth):
    with pytest.raises(ValueError):
        synth.synthesize_batch(["a→"], ["nope"])


def test_compile_cache_reuse(synth):
    synth.synthesize_batch(["ni→xau↓"], ["test_voice"])
    n_a = len(synth._stage_a)
    n_b = len(synth._stage_b)
    synth.synthesize_batch(["ma→ma"], ["test_voice"])
    assert len(synth._stage_a) == n_a
    assert len(synth._stage_b) == n_b


def test_voice_pack_from_npy(tmp_path):
    """Voice packs load from voices_dir (.npy), length-indexed."""
    import numpy as np
    from tests.test_model import tiny_config
    from illufly_tts_tpu.engine.synthesizer import Synthesizer

    pack = np.random.RandomState(0).randn(510, 32).astype(np.float32) * 0.1
    np.save(str(tmp_path / "zf_test.npy"), pack)
    s = Synthesizer(
        config=tiny_config(), voices_dir=str(tmp_path),
        token_buckets=(16,), frame_buckets=(32,),
    )
    assert "zf_test" in s.list_voices()
    loaded = s.load_voice("zf_test")
    assert loaded.shape == (510, 32)
    audio = s.synthesize_batch(["ni→xau↓"], ["zf_test"])[0]
    assert audio.size > 0


def test_voice_pack_3d_squeeze(tmp_path):
    """Reference-style [L, 1, 256] packs squeeze to [L, 256]."""
    import numpy as np
    from tests.test_model import tiny_config
    from illufly_tts_tpu.engine.synthesizer import Synthesizer

    pack = np.zeros((510, 1, 32), np.float32)
    np.save(str(tmp_path / "v3d.npy"), pack)
    s = Synthesizer(config=tiny_config(), voices_dir=str(tmp_path))
    assert s.load_voice("v3d").shape == (510, 32)


def test_voice_pack_from_torch_pt(tmp_path):
    """Reference users bring torch .pt voice packs ([510, 1, 256])."""
    torch = __import__("pytest").importorskip("torch")
    import numpy as np
    from tests.test_model import tiny_config
    from illufly_tts_tpu.engine.synthesizer import Synthesizer

    pack = torch.randn(510, 1, 32) * 0.1
    torch.save(pack, str(tmp_path / "zf_ref.pt"))
    s = Synthesizer(
        config=tiny_config(), voices_dir=str(tmp_path),
        token_buckets=(16,), frame_buckets=(32,),
    )
    loaded = s.load_voice("zf_ref")
    assert loaded.shape == (510, 32)
    np.testing.assert_allclose(
        np.asarray(loaded), pack.numpy()[:, 0, :], atol=1e-6
    )
    audio = s.synthesize_batch(["ni→xau↓"], ["zf_ref"])[0]
    assert audio.size > 0


def test_voice_pack_from_hf_cache(tmp_path, monkeypatch):
    """Reference fallback (pipeline.py:86-106): voices resolve from the
    HF snapshot cache layout, searched offline — a reference user's
    existing ~/.cache/huggingface works without snapshot_download."""
    import numpy as np
    from tests.test_model import tiny_config
    from illufly_tts_tpu.engine.synthesizer import Synthesizer

    vdir = (
        tmp_path / "hub" / "models--hexgrad--Kokoro-82M-v1.1-zh"
        / "snapshots" / "abc123" / "voices"
    )
    vdir.mkdir(parents=True)
    pack = np.random.RandomState(1).randn(510, 32).astype(np.float32) * 0.1
    np.save(str(vdir / "zf_hub.npy"), pack)
    monkeypatch.setenv("HF_HOME", str(tmp_path))
    s = Synthesizer(
        config=tiny_config(), repo_id="hexgrad/Kokoro-82M-v1.1-zh",
        token_buckets=(16,), frame_buckets=(32,),
    )
    loaded = s.load_voice("zf_hub")
    assert loaded.shape == (510, 32)
    np.testing.assert_allclose(np.asarray(loaded), pack, atol=1e-6)


def test_oversize_batch_splits(synth):
    """Batches beyond the largest batch bucket are chunked, not crashed
    (ADVICE r1 #2: 65+ items used to IndexError)."""
    from illufly_tts_tpu.engine.buckets import BATCH_BUCKETS

    n = BATCH_BUCKETS[-1] + 1
    audio = synth.synthesize_batch(["ni→xau↓"] * n, ["test_voice"] * n)
    assert len(audio) == n
    assert all(a.size == audio[0].size for a in audio)
    with pytest.raises(ValueError):
        synth.dispatch(["ni→xau↓"] * n, ["test_voice"] * n)


def test_split_phase_dispatch_api(synth):
    """dispatch -> launch_decode -> collect equals the one-shot path."""
    texts = ["ni→xau↓", "tsʰɤ↘ʂɨ↘"]
    handle = synth.dispatch(texts, ["test_voice"] * 2)
    assert handle.audio is None
    synth.launch_decode(handle)
    assert handle.audio is not None
    assert handle.f_bucket in synth.frame_buckets
    staged = synth.collect(handle)
    oneshot = synth.synthesize_batch(texts, ["test_voice"] * 2)
    for a, b in zip(staged, oneshot):
        assert a.size == b.size
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_batch_bucket_narrowing(synth):
    """Serving narrows batch_buckets to the warmed inventory so a partial
    batch pads to a warm bucket instead of cold-compiling an intermediate
    shape at traffic time (api/endpoints.py startup warmup)."""
    old = synth.batch_buckets
    try:
        synth.batch_buckets = (1, 8)
        h = synth.dispatch(["ni→xau↓"] * 3, ["test_voice"] * 3)
        assert h.b_bucket == 8
        out = synth.collect(h)
        assert len(out) == 3
    finally:
        synth.batch_buckets = old


def test_collect_f32_pcm16(synth):
    """pcm16=True on an f32-dispatched handle converts on host instead of
    silently returning float32."""
    h = synth.dispatch(["ni→xau↓"], ["test_voice"], fmt="f32")
    out = synth.collect(h, pcm16=True)
    assert out[0].dtype == np.int16


def test_absorb_drain_warmed_format_with_args():
    """absorb_drain(batch=, tokens=) must hit the warmed FORMAT for that
    shape — hardcoding pcm16 would trigger the very cold compile the
    call exists to absorb (serve --audio-wire mulaw24k regression).
    Fresh instance: a server process warms exactly one format."""
    s = Synthesizer(
        config=tiny_config(), token_buckets=(16,), frame_buckets=(32, 64),
    )
    s.register_random_voice("v", seed=3)
    s.warmup(batch_sizes=(1,), token_sizes=(16,),
             frame_sizes=(32, 64), formats=("f32",))
    keys = set(s._stage_b)
    s.absorb_drain(batch=1, tokens=16)
    new = set(s._stage_b) - keys
    assert not any(
        isinstance(k[0], int) and k[3] != "f32" for k in new
    ), new


def test_absorb_drain(synth):
    """absorb_drain runs one throwaway serving call against the warmed
    inventory (remote-tunnel queue absorber; round-3 cold-start work),
    leaves no temp voice behind, and returns a duration."""
    voices_before = set(synth.list_voices())
    dt = synth.absorb_drain()
    assert isinstance(dt, float) and dt >= 0.0
    assert set(synth.list_voices()) == voices_before
    assert "__drain__" not in synth._voices
    # warmup(absorb=True) records the drain on the instance
    synth.warmup(batch_sizes=(1,), token_sizes=(16,),
                 frame_sizes=(32,), absorb=True)
    assert synth.last_drain_s is not None and synth.last_drain_s >= 0.0


class TestVoiceBlending:
    """Blend specs "a*0.6+b*0.4" mix style packs (beyond-reference
    capability; the reference loads exactly one pack per request,
    pipeline.py:196-199)."""

    def test_weighted_mix_matches_manual(self, synth):
        synth.register_random_voice("vb_a", seed=11)
        synth.register_random_voice("vb_b", seed=12)
        a = synth.load_voice("vb_a")
        b = synth.load_voice("vb_b")
        mix = synth.load_voice("vb_a*0.75+vb_b*0.25")
        np.testing.assert_allclose(mix, 0.75 * a + 0.25 * b, rtol=1e-6)

    def test_equal_weights_default_and_normalization(self, synth):
        synth.register_random_voice("vb_a", seed=11)
        synth.register_random_voice("vb_b", seed=12)
        eq = synth.load_voice("vb_a+vb_b")
        scaled = synth.blend_voices("vb_a*2+vb_b*2")  # weights normalize
        np.testing.assert_allclose(eq, scaled, rtol=1e-6)

    def test_blend_is_cached(self, synth):
        synth.register_random_voice("vb_a", seed=11)
        synth.register_random_voice("vb_b", seed=12)
        spec = "vb_a*0.5+vb_b*0.5"
        p1 = synth.load_voice(spec)
        assert spec in synth._voices
        assert synth.load_voice(spec) is p1

    def test_length_alignment(self, synth):
        synth.register_voice("vb_short", np.ones((8, 2 * synth.config.style_dim)))
        synth.register_random_voice("vb_long", seed=13)
        mix = synth.load_voice("vb_short+vb_long")
        assert mix.shape[0] == 8

    def test_bad_specs(self, synth):
        synth.register_random_voice("vb_a", seed=11)
        for spec in ("vb_a*-1", "vb_a*x+vb_a", "vb_a*0", "+vb_a", "vb_a+nope"):
            with pytest.raises(ValueError):
                synth.blend_voices(spec)

    def test_synthesis_with_blend_spec(self, synth):
        synth.register_random_voice("vb_a", seed=11)
        synth.register_random_voice("vb_b", seed=12)
        audio = synth.synthesize_batch(
            ["ni→xau↓ma"], ["vb_a*0.5+vb_b*0.5"]
        )[0]
        assert audio.size > 0 and np.all(np.isfinite(audio))
        assert synth.is_voice_loaded("vb_a*0.5+vb_b*0.5")
