"""Exactness of space-to-depth stem folding vs the direct strided conv."""

import numpy as np

import jax
import jax.numpy as jnp

from pretorched_tpu.ops.space_to_depth import (fold_stem_kernel_2d,
                                               fold_stem_kernel_3d,
                                               space_to_depth_2d)


def _conv(x, k, strides, padding, dims):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=strides, padding=padding, dimension_numbers=dims)


def test_s2d_2d_exact():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 224, 224, 3), jnp.float32)
    k = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.05, jnp.float32)
    direct = _conv(x, k, (2, 2), [(3, 3), (3, 3)], ('NHWC', 'HWIO', 'NHWC'))
    xf = space_to_depth_2d(x)
    kf = fold_stem_kernel_2d(k)
    folded = _conv(xf, kf, (1, 1), [(0, 0), (0, 0)], ('NHWC', 'HWIO', 'NHWC'))
    assert folded.shape == direct.shape
    np.testing.assert_allclose(np.asarray(folded), np.asarray(direct),
                               rtol=1e-4, atol=1e-4)


def test_s2d_3d_exact():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 64, 64, 3), jnp.float32)
    k = jnp.asarray(rng.randn(7, 7, 7, 3, 16) * 0.05, jnp.float32)
    direct = _conv(x, k, (1, 2, 2), [(3, 3), (3, 3), (3, 3)],
                   ('NDHWC', 'DHWIO', 'NDHWC'))
    xf = space_to_depth_2d(x)                  # folds the trailing H, W dims
    kf = fold_stem_kernel_3d(k)
    folded = _conv(xf, kf, (1, 1, 1), [(3, 3), (0, 0), (0, 0)],
                   ('NDHWC', 'DHWIO', 'NDHWC'))
    assert folded.shape == direct.shape
    np.testing.assert_allclose(np.asarray(folded), np.asarray(direct),
                               rtol=1e-4, atol=1e-4)


def test_s2d_conv_module_odd_size_fallback():
    """SpaceToDepthConv on odd H/W (223px): the 2x2 folding can't tile, so
    the module runs the equivalent plain strided conv — same params, same
    outputs as the even-size path's math."""
    from pretorched_tpu.models.layers import SpaceToDepthConv
    rng = np.random.RandomState(0)
    mod = SpaceToDepthConv(8, 7, ndim=2)
    x_even = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
    variables = mod.init(jax.random.key(0), x_even)
    k = variables['params']['kernel']
    for size in (63, 65):
        x = jnp.asarray(rng.randn(1, size, size, 3), jnp.float32)
        got = mod.apply(variables, x)
        direct = _conv(x, k, (2, 2), [(3, 3), (3, 3)],
                       ('NHWC', 'HWIO', 'NHWC'))
        assert got.shape == direct.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(direct),
                                   rtol=1e-4, atol=1e-4)


def test_slowfast_s2d_stem_exact():
    """SlowFast with s2d_stem=True is the same function of the same
    variables (both pathways' non-cubic stems fold exactly)."""
    import dataclasses

    from pretorched_tpu.models.slowfast import SlowFast

    rng = np.random.RandomState(0)
    module = SlowFast(block='bottleneck', layers=(1, 1, 1, 1), num_classes=11)
    x = jnp.asarray(rng.randn(1, 16, 64, 64, 3), jnp.float32)
    variables = module.init(jax.random.key(0), x)
    plain = module.apply(variables, x)
    s2d = dataclasses.replace(module, s2d_stem=True).apply(variables, x)
    np.testing.assert_allclose(np.asarray(s2d), np.asarray(plain),
                               rtol=2e-5, atol=2e-5)


def test_s2d_conv_module_noncubic_kernel():
    """SpaceToDepthConv with a (kt, kh, kw) kernel (SlowFast stems: (5,7,7)
    fast, (1,7,7) slow) matches the plain stride-(1,2,2) conv exactly."""
    from pretorched_tpu.models.layers import SpaceToDepthConv

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 64, 64, 3), jnp.float32)
    for kt in (1, 5):
        mod = SpaceToDepthConv(8, (kt, 7, 7), ndim=3)
        variables = mod.init(jax.random.key(0), x)
        folded = mod.apply(variables, x)
        direct = _conv(x, variables['params']['kernel'], (1, 2, 2),
                       [(kt // 2, kt // 2), (3, 3), (3, 3)],
                       ('NDHWC', 'DHWIO', 'NDHWC'))
        assert folded.shape == direct.shape
        np.testing.assert_allclose(np.asarray(folded), np.asarray(direct),
                                   rtol=1e-4, atol=1e-4)


def test_r2plus1d_s2d_stem_exact():
    """R(2+1)D with s2d_stem=True is the same function of the same
    variables: only the factored stem's SPATIAL conv folds (the (kt,1,1)
    temporal conv and every block conv are untouched)."""
    import dataclasses

    from pretorched_tpu.models.resnet3d import VideoResNet

    rng = np.random.RandomState(0)
    module = VideoResNet(block='bottleneck', layers=(1, 1, 1, 1),
                         num_classes=11, shortcut_type='B', factored=True)
    x = jnp.asarray(rng.randn(1, 8, 64, 64, 3), jnp.float32)
    variables = module.init(jax.random.key(0), x)
    plain = module.apply(variables, x)
    s2d = dataclasses.replace(module, s2d_stem=True).apply(variables, x)
    np.testing.assert_allclose(np.asarray(s2d), np.asarray(plain),
                               rtol=2e-5, atol=2e-5)
