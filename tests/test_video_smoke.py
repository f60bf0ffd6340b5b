"""Smoke tests across the video/audio families at tiny sizes + 10-clip eval."""

import numpy as np

import jax
import jax.numpy as jnp

import pretorched_tpu as p


def test_slowfast_modes():
    x = np.random.RandomState(0).randn(1, 3, 32, 64, 64).astype(np.float32)
    for mode in ('sf', 's', 'f'):
        m = p.models.slowfast.resnet18(mode=mode, num_classes=7, pretrained=None)
        assert m(x).shape == (1, 7), mode


def test_trn_consensus_heads():
    x = np.random.RandomState(0).randn(1, 3, 8, 64, 64).astype(np.float32)
    m = p.trn(num_classes=5, consensus='MSTRN', arch='resnet18', pretrained=None)
    assert m(x).shape == (1, 5)
    f = m.features(x)
    assert f.shape[-1] == 1024     # video_feature_dim
    assert np.asarray(m.logits(f)).shape == (1, 5)


def test_nonlocal_resnet3d_tiny():
    x = np.random.RandomState(0).randn(1, 3, 8, 32, 32).astype(np.float32)
    m = p.nonlocalresnet3d18(num_classes=6, pretrained=None)
    assert m(x).shape == (1, 6)


def test_mvresnet_and_soundnet():
    x = np.random.RandomState(0).randn(1, 3, 8, 32, 32).astype(np.float32)
    m = p.mvresnet10(num_classes=4, pretrained=None)
    assert m(x).shape == (1, 4)
    wav = np.random.RandomState(0).randn(1, 1, 67724).astype(np.float32)
    m = p.soundnet8(num_classes=11, pretrained=None)
    assert m(wav).shape == (1, 11)


def test_multi_clip_eval_sharded():
    from pretorched_tpu.parallel import make_mesh
    from pretorched_tpu.parallel.evaluate import multi_clip_eval_step

    mesh = make_mesh()
    m = p.resnet3d10(num_classes=6, pretrained=None)
    step = multi_clip_eval_step(m.module, mesh=mesh)
    clips = jnp.asarray(
        np.random.RandomState(0).randn(8, 2, 4, 32, 32, 3), jnp.float32)
    labels = jnp.asarray(np.arange(8) % 6)
    out = jax.device_get(step(m.variables, clips, labels))
    assert int(out['count']) == 8
    assert 0 <= int(out['top1']) <= 8


def test_soundnet_wav_ingestion(tmp_path):
    """WAV -> waveform -> SoundNet end to end (the reference's mp3 demo,
    soundnet.py:93-98, with a native stdlib decoder + tiling for short
    audio)."""
    import wave

    from pretorched_tpu.datasets.audio import load_audio, soundnet_input

    # synthesize a 1-second 8kHz sine, 16-bit mono
    sr, freq = 8000, 440.0
    t = np.arange(sr) / sr
    pcm = (np.sin(2 * np.pi * freq * t) * 30000).astype(np.int16)
    path = tmp_path / 'tone.wav'
    with wave.open(str(path), 'wb') as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())

    x, rate = load_audio(str(path), sample_rate=22050)
    assert rate == 22050
    assert abs(len(x) - 22050) <= 2 and x.shape[1] == 1
    assert np.abs(x).max() <= 1.0

    batch = soundnet_input(str(path), min_length=67724)
    assert batch.shape == (1, 67724, 1)
    m = p.soundnet8(num_classes=11, pretrained=None)
    out = m.module.apply(m.variables, jnp.asarray(batch))
    assert out.shape == (1, 11)
    assert np.isfinite(np.asarray(out)).all()


def test_bfloat16_propagates_to_nested_modules():
    """model.bfloat16() must switch the compute dtype of module-valued
    FIELDS too (TRN.base_module): before the recursive _replace_dtype the
    nested backbone silently stayed f32 — measured 2x slower on the TRN
    bench row."""
    m = p.trn(num_classes=5, consensus='MSTRN', arch='resnet18',
              pretrained=None)
    assert m.module.base_module.dtype is None
    m.bfloat16()
    assert m.module.dtype == jnp.bfloat16
    assert m.module.base_module.dtype == jnp.bfloat16
    x = np.random.RandomState(0).rand(1, 8, 64, 64, 3).astype(np.float32)
    out = m.module.apply(m.variables, jnp.asarray(x, jnp.bfloat16))
    assert out.shape == (1, 5)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    m.float()
    assert m.module.base_module.dtype is None
