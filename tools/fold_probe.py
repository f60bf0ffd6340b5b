#!/usr/bin/env python
"""Probe: temporal-fold layout for the SlowFast fast pathway (VERDICT r3 #1).

Hypothesis from tools/roofline.py (r4): the fast pathway runs at 7.7% MFU —
65% of SlowFast's time for 22% of its FLOPs — because every tensor carries
C = 8..64 channels, far below the TPU's 128-lane tile. Convs there are
M-bound (millions of positions x one under-filled MXU pass), and
narrow-channel tensors pad their lane dimension in HBM.

The candidate fix folds time into channels: x (B,T,H,W,C) -> (B,H,W,T*C).
Then, exactly (same stored weights, zero retraining):
  * a temporal (kt,1,1) conv          -> a 1x1 conv2d with a block-BANDED
                                         (T*Cin, T*Cout) kernel
  * a spatial (1,kh,kw) conv          -> a (kh,kw) conv2d with a
                                         block-DIAGONAL kernel
  * BN / ReLU / residual              -> unchanged (params tiled T times)
FLOPs go UP T-fold (the off-block zeros are multiplied anyway), but the
M dimension shrinks T-fold and K/N reach 128+ lanes — on an M-bound,
lane-starved stage the cycle count should drop hard. This probe measures
fast-res2 (3 bottleneck blocks, C=8->32, T=32, 56px, b128) both ways on the
real chip, after checking bit-level equivalence on small shapes.

r3 measurement rule: a probe win here is NOT a shippable number — the full
model must be measured after wiring (fusion/layout boundaries killed the
T-fold-to-2D idea last round at exactly this step).
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, '..')


def fold_temporal_kernel(w, T):
    """(kt,1,1,C,P) conv3d kernel -> (1,1,T*C,T*P) block-banded conv2d
    kernel computing the same 'same'-padded temporal conv on the folded
    layout (channel index = t*C + c)."""
    kt, _, _, C, P = w.shape
    pad = kt // 2
    K = np.zeros((1, 1, T * C, T * P), w.dtype)
    for t_out in range(T):
        for dt in range(kt):
            t_in = t_out + dt - pad
            if 0 <= t_in < T:
                K[0, 0, t_in * C:(t_in + 1) * C,
                  t_out * P:(t_out + 1) * P] = w[dt, 0, 0]
    return K


def fold_spatial_kernel(w, T):
    """(1,kh,kw,C,P) conv3d kernel -> (kh,kw,T*C,T*P) block-diagonal."""
    _, kh, kw, C, P = w.shape
    K = np.zeros((kh, kw, T * C, T * P), w.dtype)
    for t in range(T):
        K[:, :, t * C:(t + 1) * C, t * P:(t + 1) * P] = w[0]
    return K


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=128)
    p.add_argument('--frames', type=int, default=32)
    p.add_argument('--size', type=int, default=56)
    p.add_argument('--iters', type=int, default=10)
    p.add_argument('--check-only', action='store_true',
                   help='CPU equivalence check at tiny shapes, no timing')
    args = p.parse_args()

    if args.check_only:
        import os
        os.environ['JAX_PLATFORMS'] = 'cpu'

    import jax
    import jax.numpy as jnp
    from jax import lax

    DN3 = lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1),
                                     ('NTHWC', 'THWIO', 'NTHWC'))
    DN2 = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                     ('NHWC', 'HWIO', 'NHWC'))

    rng = np.random.RandomState(0)

    # fast-res2: 3 bottleneck blocks, planes=8, expansion 4, head_conv=3
    # (slowfast.py:131: temporal (3,1,1) conv1, spatial (1,3,3) conv2,
    # 1x1x1 conv3; block 0 downsamples 8->32 channels, stride 1)
    C_in, P = 8, 8
    blocks = []
    for i in range(3):
        cin = C_in if i == 0 else 4 * P
        blk = {
            'w1': rng.randn(3, 1, 1, cin, P).astype(np.float32) * 0.1,
            'w2': rng.randn(1, 3, 3, P, P).astype(np.float32) * 0.1,
            'w3': rng.randn(1, 1, 1, P, 4 * P).astype(np.float32) * 0.1,
            'scale1': rng.rand(P).astype(np.float32) + 0.5,
            'scale2': rng.rand(P).astype(np.float32) + 0.5,
            'scale3': rng.rand(4 * P).astype(np.float32) + 0.5,
            'bias3': rng.randn(4 * P).astype(np.float32) * 0.1,
        }
        if i == 0:
            blk['wd'] = rng.randn(1, 1, 1, cin, 4 * P).astype(np.float32) * 0.1
        blocks.append(blk)

    def conv_apply(params, x):
        """Reference: 3D convs on (B,T,H,W,C). BN folded to scale/bias
        (inference form) — the probe times conv layout, not BN math."""
        for i, b in enumerate(params):
            idn = x
            h = lax.conv_general_dilated(x, b['w1'], (1, 1, 1),
                                         ((1, 1), (0, 0), (0, 0)),
                                         dimension_numbers=DN3)
            h = jax.nn.relu(h * b['scale1'])
            h = lax.conv_general_dilated(h, b['w2'], (1, 1, 1),
                                         ((0, 0), (1, 1), (1, 1)),
                                         dimension_numbers=DN3)
            h = jax.nn.relu(h * b['scale2'])
            h = lax.conv_general_dilated(h, b['w3'], (1, 1, 1),
                                         ((0, 0), (0, 0), (0, 0)),
                                         dimension_numbers=DN3)
            h = h * b['scale3'] + b['bias3']
            if i == 0:
                idn = lax.conv_general_dilated(idn, b['wd'], (1, 1, 1),
                                               ((0, 0), (0, 0), (0, 0)),
                                               dimension_numbers=DN3)
            x = jax.nn.relu(h + idn)
        return x

    def folded_params(params, T):
        out = []
        for i, b in enumerate(params):
            fb = {
                'w1': fold_temporal_kernel(b['w1'], T),
                'w2': fold_spatial_kernel(b['w2'], T),
                'w3': fold_spatial_kernel(b['w3'], T),
                'scale1': np.tile(b['scale1'], T),
                'scale2': np.tile(b['scale2'], T),
                'scale3': np.tile(b['scale3'], T),
                'bias3': np.tile(b['bias3'], T),
            }
            if i == 0:
                fb['wd'] = fold_spatial_kernel(b['wd'], T)
            out.append(fb)
        return out

    def fold_apply(params, x):
        """Same math on (B,H,W,T*C); every conv is a conv2d whose channel
        dims are T*C >= 256."""
        for i, b in enumerate(params):
            idn = x
            h = lax.conv_general_dilated(x, b['w1'], (1, 1), ((0, 0), (0, 0)),
                                         dimension_numbers=DN2)
            h = jax.nn.relu(h * b['scale1'])
            h = lax.conv_general_dilated(h, b['w2'], (1, 1), ((1, 1), (1, 1)),
                                         dimension_numbers=DN2)
            h = jax.nn.relu(h * b['scale2'])
            h = lax.conv_general_dilated(h, b['w3'], (1, 1), ((0, 0), (0, 0)),
                                         dimension_numbers=DN2)
            h = h * b['scale3'] + b['bias3']
            if i == 0:
                idn = lax.conv_general_dilated(idn, b['wd'], (1, 1),
                                               ((0, 0), (0, 0)),
                                               dimension_numbers=DN2)
            x = jax.nn.relu(h + idn)
        return x

    # ------------------------------------------------- equivalence check
    T = 8 if args.check_only else args.frames
    xs = rng.randn(2, T, 12, 12, C_in).astype(np.float32)
    ref = np.asarray(jax.jit(conv_apply)(blocks, jnp.asarray(xs)))
    fp = folded_params(blocks, T)
    # (B,T,H,W,C) -> (B,H,W,T*C)
    xf = jnp.asarray(np.moveaxis(xs, 1, 3).reshape(2, 12, 12, T * C_in))
    got = np.asarray(jax.jit(fold_apply)(fp, xf))
    got = np.moveaxis(got.reshape(2, 12, 12, T, 4 * P), 3, 1)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    print('# folded == conv3d on small shapes OK', flush=True)
    if args.check_only:
        return

    # ------------------------------------------------------------ timing
    import jax.numpy as jnp
    T, H, B = args.frames, args.size, args.batch
    dt = jnp.bfloat16
    x3 = jnp.broadcast_to(jnp.asarray(rng.rand(1, T, H, H, C_in), dt),
                          (B, T, H, H, C_in))
    xfo = jnp.broadcast_to(jnp.asarray(rng.rand(1, H, H, T * C_in), dt),
                           (B, H, H, T * C_in))
    b3 = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dt), blocks)
    bf = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dt),
                                folded_params(blocks, T))

    t0 = time.perf_counter()
    jax.device_get(jax.jit(lambda x: x + 1)(jnp.zeros((8, 128))))
    print(f'# cold path: {time.perf_counter() - t0:.1f}s', flush=True)

    def timed(fn, params, x, tag):
        @jax.jit
        def many(v, xb):
            def body(carry, _):
                out = fn(v, carry)
                s = jnp.sum(out.astype(jnp.float32))
                return carry + (s * 0).astype(carry.dtype), s
            _, outs = jax.lax.scan(body, xb, None, length=args.iters)
            return jnp.sum(outs)
        t0 = time.perf_counter()
        jax.device_get(many(params, x))
        print(f'# {tag} compile+first: {time.perf_counter() - t0:.1f}s',
              flush=True)
        t0 = time.perf_counter()
        jax.device_get(many(params, x))
        return (time.perf_counter() - t0) / args.iters

    t_conv = timed(conv_apply, b3, x3, 'conv3d fast-res2')
    t_fold = timed(fold_apply, bf, xfo, 'folded fast-res2')
    print(f'fast-res2 b{B} T{T} {H}px bf16: conv3d {t_conv * 1e3:.1f} ms, '
          f'folded {t_fold * 1e3:.1f} ms -> {t_conv / t_fold:.2f}x', flush=True)


if __name__ == '__main__':
    main()
