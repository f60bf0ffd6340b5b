"""Fused bottleneck-tail Pallas kernel (ops/pallas/fused_block.py).

Criteria: kernel == jnp/XLA oracle for identity and projection residuals
(CPU interpret mode runs the very same kernel code); BN folding is exact;
the SlowFast integration (fused_blocks=N) matches the plain module's eval
forward on the same variables; training and init paths are untouched.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pretorched_tpu
from pretorched_tpu.ops.pallas.fused_block import (
    fold_bn, fused_bottleneck_tail, fused_bottleneck_tail_reference)


def _tail_args(rng, cin, cm, cout, proj, b=2, t=4, h=14, w=14,
               dtype=jnp.float32):
    y1 = jnp.asarray(rng.randn(b, t, h, w, cm), dtype) * 0.5
    xr = jnp.asarray(rng.randn(b, t, h, w, cin), dtype) * 0.5
    w2 = jnp.asarray(rng.randn(3, 3, cm, cm), jnp.float32) * 0.2
    a2 = jnp.asarray(rng.randn(2, cm), jnp.float32)
    w3 = jnp.asarray(rng.randn(cm, cout), jnp.float32) * 0.2
    a3 = jnp.asarray(rng.randn(2, cout), jnp.float32)
    wp = jnp.asarray(rng.randn(cin, cout), jnp.float32) * 0.2 if proj else None
    ap = jnp.asarray(rng.randn(2, cout), jnp.float32) if proj else None
    return y1, xr, w2, a2, w3, a3, wp, ap


@pytest.mark.parametrize('proj,cin', [(False, 32), (True, 8)])
def test_fused_tail_matches_reference(rng, proj, cin):
    args = _tail_args(rng, cin, 8, 32, proj)
    out = fused_bottleneck_tail(*args, interpret=True)
    ref = fused_bottleneck_tail_reference(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_tail_bf16_and_odd_tiling(rng):
    """bf16 operands with f32 accumulation; a bt that forces tile 1."""
    args = _tail_args(rng, 64, 16, 64, False, b=1, t=3, h=7, w=7,
                      dtype=jnp.bfloat16)
    out = fused_bottleneck_tail(*args, interpret=True)
    ref = fused_bottleneck_tail_reference(*args)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_fold_bn_matches_batchnorm(rng):
    import flax.linen as nn
    c = 8
    x = jnp.asarray(rng.randn(32, c), jnp.float32)
    scale = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(c), jnp.float32)
    mean = jnp.asarray(rng.randn(c), jnp.float32)
    var = jnp.asarray(rng.rand(c) + 0.2, jnp.float32)
    bn = nn.BatchNorm(use_running_average=True, epsilon=1e-5)
    ref = bn.apply({'params': {'scale': scale, 'bias': bias},
                    'batch_stats': {'mean': mean, 'var': var}}, x)
    s, b = fold_bn(scale, bias, mean, var)
    np.testing.assert_allclose(np.asarray(x * s + b), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_slowfast_fused_blocks_match_plain(rng):
    """SlowFast with fused_blocks=32: every stride-1 fast bottleneck runs
    the Pallas tail (interpret on CPU — same kernel code) and the full
    forward matches the plain module on the same variables."""
    m = pretorched_tpu.slowfast_resnet50(num_classes=13,
                                         pretrained=None).eval()
    clip = jnp.asarray(rng.randn(1, 32, 64, 64, 3), jnp.float32)
    ref = m.module.apply(m.variables, clip)
    fused = dataclasses.replace(m.module, fused_blocks=32)
    out = fused.apply(m.variables, clip)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_slowfast_fused_blocks_train_falls_back(rng):
    """train=True keeps the plain autodiff path (BN updates intact)."""
    m = pretorched_tpu.slowfast_resnet50(num_classes=5, pretrained=None)
    fused = dataclasses.replace(m.module, fused_blocks=32)
    clip = jnp.asarray(rng.randn(1, 32, 64, 64, 3), jnp.float32)
    out, mutated = fused.apply(m.variables, clip, train=True,
                               mutable=['batch_stats'],
                               rngs={'dropout': jax.random.key(0)})
    assert out.shape == (1, 5)
    assert 'batch_stats' in mutated


def test_fastonly_fused_matches_plain(rng):
    """FastOnly (mode='f') — the pathway the kernel targets — fused vs
    plain parity at eval."""
    m = pretorched_tpu.slowfast_resnet50(mode='f', num_classes=7,
                                         pretrained=None).eval()
    clip = jnp.asarray(rng.randn(1, 32, 64, 64, 3), jnp.float32)
    ref = m.module.apply(m.variables, clip)
    fused = dataclasses.replace(m.module, fused_blocks=32)
    out = fused.apply(m.variables, clip)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
