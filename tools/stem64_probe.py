#!/usr/bin/env python
"""Probe stem folds on the HEADLINE resnet3d50 stem (C3 -> O64, (7,7,7),
stride (1,2,2), b128 T16 224px bf16).

Roofline context (tools/roofline.py, ROUND_NOTES r4): stem+layer1 is 84.5 ms
of the 113.5 ms forward at 47% of its HBM roofline. Model: the fold-2 stem
conv has 64 output channels = half the MXU's 128 lanes -> lane-limited peak
~98 TF/s -> ~4.4 TFLOP/iter would take ~45 ms, i.e. most of the stage.
Mixed fold 2x4 (H fold-2, W fold-4 parity-packed) gives exactly 2*64 = 128
output lanes for 1.5x the fold-2 FLOPs -> modeled ~34 ms. Which wins on the
real chip (layout/fusion included) is empirical — this probe measures:

  plain   strided conv, no fold
  fold2   space_to_depth_2d + 4-tap stride-1 conv   (the bench path)
  fold24  space_to_depth_2x4 + (4,3)-tap conv + W depth-to-space
  fold4   space_to_depth_4 + 3-tap conv + 2x2 depth-to-space (modeled loss)

each alone and with the BN+ReLU+maxpool tail (what the model actually runs).
--check verifies fold24 exactness vs lax.conv on CPU at f32/highest.

Timing per bench.py tunnel rules: lax.scan inside one jit, carry feeds the
input and depends on the output, completion forced via device_get.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--check', action='store_true', help='CPU exactness only')
    p.add_argument('--batch', type=int, default=128)
    p.add_argument('--frames', type=int, default=16)
    p.add_argument('--size', type=int, default=224)
    p.add_argument('--out-ch', type=int, default=64)
    p.add_argument('--iters', type=int, default=10)
    p.add_argument('--variants', default='fold2,fold24,plain,fold4')
    args = p.parse_args()

    import jax
    if args.check:
        # the sandbox site hook re-exports JAX_PLATFORMS=axon; env vars set
        # here do not stick — use the config API (CLAUDE.md gotcha)
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np

    from pretorched_tpu.ops.pooling import max_pool
    from pretorched_tpu.ops.space_to_depth import (
        depth_to_space_2, depth_to_space_w2, fold2x4_stem_kernel_3d,
        fold4_stem_kernel_3d, fold_stem_kernel_3d, space_to_depth_2d,
        space_to_depth_2x4, space_to_depth_4)

    O = args.out_ch
    dn = ('NDHWC', 'DHWIO', 'NDHWC')

    def plain(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 2, 2), [(3, 3), (3, 3), (3, 3)], dimension_numbers=dn)

    def fold2(x, k):
        return jax.lax.conv_general_dilated(
            space_to_depth_2d(x), fold_stem_kernel_3d(k), (1, 1, 1),
            [(3, 3), (0, 0), (0, 0)], dimension_numbers=dn)

    def fold24(x, k):
        y = jax.lax.conv_general_dilated(
            space_to_depth_2x4(x), fold2x4_stem_kernel_3d(k), (1, 1, 1),
            [(3, 3), (0, 0), (0, 0)], dimension_numbers=dn)
        b, t, hh, ww, _ = y.shape
        return depth_to_space_w2(y.reshape(b, t, hh, ww, 2, O))

    def fold4(x, k):
        y = jax.lax.conv_general_dilated(
            space_to_depth_4(x), fold4_stem_kernel_3d(k), (1, 1, 1),
            [(3, 3), (0, 0), (0, 0)], dimension_numbers=dn)
        b, t, hh, ww, _ = y.shape
        return depth_to_space_2(y.reshape(b, t, hh, ww, 2, 2, O))

    variants = {'plain': plain, 'fold2': fold2, 'fold24': fold24,
                'fold4': fold4}

    if args.check:
        jax.config.update('jax_default_matmul_precision', 'highest')
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 3, 24, 24, 3), jnp.float32)
        k = jnp.asarray(rng.randn(7, 7, 7, 3, 8) * 0.1, jnp.float32)
        O = 8  # the fold closures read main's O at call time
        ref = plain(x, k)
        for name in ('fold2', 'fold24', 'fold4'):
            got = {'fold2': fold2, 'fold24': fold24, 'fold4': fold4}[name](x, k)
            err = float(jnp.abs(got - ref).max())
            assert got.shape == ref.shape, (name, got.shape, ref.shape)
            assert err < 1e-4, (name, err)
            print(f'{name}: exact (max|diff| {err:.2e})')
        return

    rng = np.random.RandomState(0)
    x = jnp.broadcast_to(
        jnp.asarray(rng.rand(1, args.frames, args.size, args.size, 3),
                    jnp.bfloat16),
        (args.batch, args.frames, args.size, args.size, 3))
    k = jnp.asarray(rng.randn(7, 7, 7, 3, O) * 0.05, jnp.bfloat16)
    scale = jnp.asarray(rng.rand(O) + 0.5, jnp.bfloat16)
    shift = jnp.asarray(rng.rand(O), jnp.bfloat16)

    t0 = time.perf_counter()
    jax.device_get(jax.jit(lambda v: v + 1)(jnp.zeros((8, 128))))
    print(f'# warmup {time.perf_counter() - t0:.1f}s', flush=True)

    def timed(fn, tag):
        @jax.jit
        def many(k, xb):
            def body(carry, _):
                out = fn(carry, k)
                s = jnp.sum(out.astype(jnp.float32))
                carry = carry + (s * 0).astype(carry.dtype)
                return carry, s
            _, outs = jax.lax.scan(body, xb, None, length=args.iters)
            return jnp.sum(outs)
        t0 = time.perf_counter()
        jax.device_get(many(k, x))
        print(f'# {tag} compile+first {time.perf_counter() - t0:.1f}s',
              flush=True)
        t0 = time.perf_counter()
        jax.device_get(many(k, x))
        dt = (time.perf_counter() - t0) / args.iters
        print(f'{tag}: {dt * 1e3:.1f} ms/iter', flush=True)
        return dt

    for name in args.variants.split(','):
        conv = variants[name]
        timed(conv, f'{name} conv')
        timed(lambda xx, kk, conv=conv: max_pool(
            jnp.maximum(conv(xx, kk) * scale + shift, 0), 3, 2, 1),
            f'{name} conv+bn+relu+pool')


if __name__ == '__main__':
    main()
