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


def test_fold4_exact():
    """Fold-4 (input s2d 4x4, output in 2x2 parity layout) is the exact
    stride-(1,2,2) conv — weights re-indexed, never changed."""
    from pretorched_tpu.ops.space_to_depth import (depth_to_space_2,
                                                   fold4_stem_kernel_3d,
                                                   space_to_depth_4)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 3, 24, 24, 3), jnp.float32)
    k = jnp.asarray(rng.randn(5, 7, 7, 3, 8) * 0.1, jnp.float32)
    direct = _conv(x, k, (1, 2, 2), [(2, 2), (3, 3), (3, 3)],
                   ('NDHWC', 'DHWIO', 'NDHWC'))
    y = _conv(space_to_depth_4(x), fold4_stem_kernel_3d(k), (1, 1, 1),
              [(2, 2), (0, 0), (0, 0)], ('NDHWC', 'DHWIO', 'NDHWC'))
    b, t, hh, ww, _ = y.shape
    got = depth_to_space_2(y.reshape(b, t, hh, ww, 2, 2, 8))
    assert got.shape == direct.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(direct),
                               rtol=1e-4, atol=1e-4)


def test_fold4_folded_max_pool_exact():
    """folded_max_pool_3s2 on the parity-folded map == maxpool(d2s(map))."""
    from pretorched_tpu.ops.pooling import max_pool
    from pretorched_tpu.ops.space_to_depth import (depth_to_space_2,
                                                   folded_max_pool_3s2)
    rng = np.random.RandomState(1)
    z = jnp.asarray(rng.randn(2, 3, 6, 6, 2, 2, 8), jnp.float32)
    ref = max_pool(depth_to_space_2(z), (1, 3, 3), (1, 2, 2), (0, 1, 1))
    got = folded_max_pool_3s2(z)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref))


def test_fold2x4_exact():
    """Mixed fold (H fold-2, W fold-4 parity-packed) is the exact
    stride-(1,2,2) conv — 2x output lanes over fold-2 for 1.5x FLOPs."""
    from pretorched_tpu.ops.space_to_depth import (depth_to_space_w2,
                                                   fold2x4_stem_kernel_3d,
                                                   space_to_depth_2x4)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 3, 22, 24, 3), jnp.float32)  # H%2, W%4
    k = jnp.asarray(rng.randn(7, 7, 7, 3, 8) * 0.1, jnp.float32)
    direct = _conv(x, k, (1, 2, 2), [(3, 3), (3, 3), (3, 3)],
                   ('NDHWC', 'DHWIO', 'NDHWC'))
    y = _conv(space_to_depth_2x4(x), fold2x4_stem_kernel_3d(k), (1, 1, 1),
              [(3, 3), (0, 0), (0, 0)], ('NDHWC', 'DHWIO', 'NDHWC'))
    b, t, hh, ww, _ = y.shape
    got = depth_to_space_w2(y.reshape(b, t, hh, ww, 2, 8))
    assert got.shape == direct.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(direct),
                               rtol=1e-4, atol=1e-4)


def test_s2d_conv_module_fold4():
    """SpaceToDepthConv(fold=4) == the plain conv; on H % 4 != 0 input it
    falls back to fold-2 (same params, same outputs)."""
    from pretorched_tpu.models.layers import SpaceToDepthConv
    rng = np.random.RandomState(2)
    mod = SpaceToDepthConv(8, (5, 7, 7), ndim=3, fold=4)
    x = jnp.asarray(rng.randn(1, 6, 32, 32, 3), jnp.float32)
    variables = mod.init(jax.random.key(0), x)
    k = variables['params']['kernel']
    for size in (32, 30):                      # 30 % 4 != 0 -> fold-2 path
        xs = jnp.asarray(rng.randn(1, 6, size, size, 3), jnp.float32)
        got = mod.apply(variables, xs)
        direct = _conv(xs, k, (1, 2, 2), [(2, 2), (3, 3), (3, 3)],
                       ('NDHWC', 'DHWIO', 'NDHWC'))
        assert got.shape == direct.shape, size
        np.testing.assert_allclose(np.asarray(got), np.asarray(direct),
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
