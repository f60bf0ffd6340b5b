#!/usr/bin/env python
"""Decompose the SlowFast fast-pathway stem (the largest single segment of
the SlowFast bench row: 38.6 ms of 156.8, at 34% of its HBM roofline per
tools/fast_decomp.py) and probe a deeper space-to-depth fold.

Variants timed on the real fast-stem shapes (b128, T32, 224px, bf16):

  full   SpaceToDepthConv (s2d fold-2 + conv) + maxpool  == bench path
  conv   SpaceToDepthConv only
  s2d    the space_to_depth_2d input transform only
  fconv  the folded (5,4,4,12->8) conv only, input pre-folded
  pool   max_pool (1,3,3)/(1,2,2) on the stem output only
  plain  plain strided conv, no fold (the pre-r3 path)
  fold4  NEW: input folded 4x4 (48ch), output computed in s2d-2 layout
         (4*Cout=32 channels at 56x56) then depth-to-space to 112x112.
         Exactly the same math as the stride-2 conv (weights re-indexed,
         never changed) -- 4x more MXU output lanes than fold-2 at the
         cost of ~2.25x zero-tap FLOPs. Which effect wins is empirical.

--check runs the fold4 path against lax.conv on CPU at f32/highest and
asserts exactness (same derivation style as ops/space_to_depth.py).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def fold4_kernel_1d(wp, cells=3):
    """(k+1 padded taps, ...) -> (cells, 4, 2, ...) per-dim fold-4 kernel.

    wp is W' (left-padded by one zero tap: wp[0]=0, wp[j]=W[j-1]).
    K[c, r, p] = wp[4c + r - 2p] where in range else 0. Traceable (jnp)."""
    import jax.numpy as jnp
    kp = wp.shape[0]
    zero = jnp.zeros_like(wp[0])
    rows = []
    for c in range(cells):
        for r in range(4):
            for p in range(2):
                j = 4 * c + r - 2 * p
                rows.append(wp[j] if 0 <= j < kp else zero)
    return jnp.stack(rows).reshape((cells, 4, 2) + wp.shape[1:])


def fold4_kernel_3d(kernel):
    """(kt, 7, 7, C, O) stride-(1,2,2) kernel -> (kt, 3, 3, 16C, 4O)
    stride-1 fold-4 kernel. Input channel order (r_h, r_w, c); output
    channel order (p_h, p_w, o). Traceable (jnp)."""
    import jax.numpy as jnp
    kt, kh, kw, c, o = kernel.shape
    assert kh == kw == 7, (kh, kw)
    w = jnp.pad(kernel, [(0, 0), (1, 0), (1, 0), (0, 0), (0, 0)])
    # fold h: (kt, 8, 8, c, o) -> (3ch, 4rh, 2ph, kt, 8w, c, o)
    w = jnp.moveaxis(w, 1, 0)                      # (8h, kt, 8w, c, o)
    w = fold4_kernel_1d(w)                         # (3ch, 4rh, 2ph, kt, 8w, c, o)
    w = jnp.moveaxis(w, 4, 0)                      # (8w, 3ch, 4rh, 2ph, kt, c, o)
    w = fold4_kernel_1d(w)                         # (3cw, 4rw, 2pw, 3ch, 4rh, 2ph, kt, c, o)
    # -> (kt, 3ch, 3cw, (4rh, 4rw, c), (2ph, 2pw, o))
    w = jnp.transpose(w, (6, 3, 0, 4, 1, 7, 5, 2, 8))
    kt_, ch_, cw_, rh_, rw_, c_, ph_, pw_, o_ = w.shape
    return w.reshape(kt_, ch_, cw_, rh_ * rw_ * c_, ph_ * pw_ * o_)


def space_to_depth_4(x):
    """(..., H, W, C) -> (..., (H+8)/4, (W+8)/4, 16C), pads (4, 4).

    Cell q holds x[4q + r - 4]; channel order (r_h, r_w, c)."""
    import jax.numpy as jnp
    h, w = x.shape[-3], x.shape[-2]
    assert h % 4 == 0 and w % 4 == 0, (h, w)
    pad = [(0, 0)] * (x.ndim - 3) + [(4, 4), (4, 4), (0, 0)]
    x = jnp.pad(x, pad)
    *lead, hh, ww, c = x.shape
    x = x.reshape(*lead, hh // 4, 4, ww // 4, 4, c)
    x = jnp.moveaxis(x, -4, -3)
    return x.reshape(*lead, hh // 4, ww // 4, 16 * c)


def fold4_conv(x, kernel, kt):
    """Exact replacement for conv3d(kernel, stride=(1,2,2), pad same-7)."""
    import jax
    import jax.numpy as jnp
    b, t, h, w, c = x.shape
    xf = space_to_depth_4(x)
    kf = jnp.asarray(fold4_kernel_3d(kernel), x.dtype)
    y = jax.lax.conv_general_dilated(
        xf, kf, (1, 1, 1), [(kt // 2, kt // 2), (0, 0), (0, 0)],
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
    # depth-to-space: (b,t,h/4,w/4,(2ph,2pw,o)) -> (b,t,h/2,w/2,o)
    bb, tt, hh, ww, _ = y.shape
    o = kernel.shape[-1]
    y = y.reshape(bb, tt, hh, ww, 2, 2, o)   # (..., hh, ww, ph, pw, o)
    y = jnp.transpose(y, (0, 1, 2, 4, 3, 5, 6))  # (..., hh, ph, ww, pw, o)
    return y.reshape(bb, tt, hh * 2, ww * 2, o)


def fold4_conv_folded(x, kernel, kt):
    """fold4 conv WITHOUT the final depth-to-space: returns
    (b, t, H/2/2, W/2/2, 2ph, 2pw, o)."""
    import jax
    import jax.numpy as jnp
    xf = space_to_depth_4(x)
    kf = jnp.asarray(fold4_kernel_3d(kernel), x.dtype)
    y = jax.lax.conv_general_dilated(
        xf, kf, (1, 1, 1), [(kt // 2, kt // 2), (0, 0), (0, 0)],
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
    bb, tt, hh, ww, _ = y.shape
    return y.reshape(bb, tt, hh, ww, 2, 2, kernel.shape[-1])


def folded_max_pool(z):
    """(1,3,3)/(1,2,2)/pad(0,1,1) max pool applied to a parity-folded map.

    z: (b, t, Ho, Wo, 2ph, 2pw, C) where natural x[2m+p] == z[..., m, p].
    Pool taps per dim: y[h'] = max(u[h'-1,1], u[h',0], u[h',1]) with the
    h'=-1 element being the -inf pad. Output: (b, t, Ho, Wo, C) natural."""
    import jax.numpy as jnp
    neg = jnp.asarray(-jnp.inf, z.dtype)
    # fold h: (..., Ho, Wo, 2ph, 2pw, C) -> (..., Ho, Wo, 2pw, C)
    a, b = z[..., 0, :, :], z[..., 1, :, :]
    b_up = jnp.concatenate(
        [jnp.full_like(b[:, :, :1], neg), b[:, :, :-1]], axis=2)
    m = jnp.maximum(jnp.maximum(a, b), b_up)
    # fold w: (..., Ho, Wo, 2pw, C) -> (..., Ho, Wo, C)
    a, b = m[..., 0, :], m[..., 1, :]
    b_left = jnp.concatenate(
        [jnp.full_like(b[:, :, :, :1], neg), b[:, :, :, :-1]], axis=3)
    return jnp.maximum(jnp.maximum(a, b), b_left)


def check():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_default_matmul_precision', 'highest')
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 3, 24, 24, 3), jnp.float32)
    k = jnp.asarray(rng.randn(5, 7, 7, 3, 8), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 2, 2), [(2, 2), (3, 3), (3, 3)],
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
    got = fold4_conv(x, k, kt=5)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f'fold4 exactness: max|diff| = {err:.2e} '
          f'(ref mag {float(jnp.max(jnp.abs(ref))):.2f})')
    assert err < 1e-4, err

    from pretorched_tpu.ops.pooling import max_pool
    ref_p = max_pool(ref, (1, 3, 3), (1, 2, 2), (0, 1, 1))
    got_p = folded_max_pool(fold4_conv_folded(x, k, kt=5))
    err_p = float(jnp.max(jnp.abs(ref_p - got_p)))
    print(f'fold4+folded-pool exactness: max|diff| = {err_p:.2e}')
    assert err_p < 1e-4, err_p
    print('OK')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=128)
    p.add_argument('--frames', type=int, default=32)
    p.add_argument('--size', type=int, default=224)
    p.add_argument('--iters', type=int, default=10)
    p.add_argument('--kt', type=int, default=5)
    p.add_argument('--cout', type=int, default=8)
    p.add_argument('--check', action='store_true')
    p.add_argument('--cpu', action='store_true')
    p.add_argument('--only', type=str, default=None,
                   help='comma-separated variant subset')
    args = p.parse_args()

    if args.check:
        check()
        return
    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pretorched_tpu.models.layers import SpaceToDepthConv
    from pretorched_tpu.ops.pooling import max_pool
    from pretorched_tpu.ops.space_to_depth import (fold_stem_kernel_3d,
                                                   space_to_depth_2d)

    B, T, H = args.batch, args.frames, args.size
    KT, CO = args.kt, args.cout
    rng = np.random.RandomState(0)
    kernel = jnp.asarray(rng.randn(KT, 7, 7, 3, CO) * 0.1, jnp.float32)
    mod = SpaceToDepthConv(CO, (KT, 7, 7), ndim=3, dtype=jnp.bfloat16,
                           name='stem')
    variables = {'params': {'kernel': kernel}}

    def v_full(v, x):
        y = mod.apply(v, x)
        return max_pool(y, (1, 3, 3), (1, 2, 2), (0, 1, 1))

    def v_conv(v, x):
        return mod.apply(v, x)

    def v_s2d(v, x):
        return space_to_depth_2d(x, lpad=4, rpad=2)

    def v_fconv(v, xf):
        kf = fold_stem_kernel_3d(v['params']['kernel']).astype(jnp.bfloat16)
        return jax.lax.conv_general_dilated(
            xf, kf, (1, 1, 1), [(KT // 2, KT // 2), (0, 0), (0, 0)],
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))

    def v_pool(v, y):
        return max_pool(y, (1, 3, 3), (1, 2, 2), (0, 1, 1))

    def v_plain(v, x):
        k = v['params']['kernel'].astype(jnp.bfloat16)
        return jax.lax.conv_general_dilated(
            x, k, (1, 2, 2), [(KT // 2, KT // 2), (3, 3), (3, 3)],
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))

    def v_fold4(v, x):
        return fold4_conv(x, v['params']['kernel'].astype(jnp.bfloat16), kt=KT)

    def v_fold4_pool(v, x):
        y = fold4_conv(x, v['params']['kernel'].astype(jnp.bfloat16), kt=KT)
        return max_pool(y, (1, 3, 3), (1, 2, 2), (0, 1, 1))

    def v_fold4_fpool(v, x):
        z = fold4_conv_folded(x, v['params']['kernel'].astype(jnp.bfloat16),
                              kt=KT)
        return folded_max_pool(z)

    x_in = (B, T, H, H, 3)
    x_folded = (B, T, (H + 6) // 2, (H + 6) // 2, 12)
    x_out = (B, T, H // 2, H // 2, CO)
    variants = [
        ('full', v_full, x_in), ('conv', v_conv, x_in),
        ('s2d', v_s2d, x_in), ('fconv', v_fconv, x_folded),
        ('pool', v_pool, x_out), ('plain', v_plain, x_in),
        ('fold4', v_fold4, x_in), ('fold4+pool', v_fold4_pool, x_in),
        ('fold4+fpool', v_fold4_fpool, x_in),
    ]
    if args.only:
        keep = set(args.only.split(','))
        variants = [v for v in variants if v[0] in keep]

    t0 = time.perf_counter()
    jax.device_get(jax.jit(lambda x: x + 1)(jnp.zeros((8, 128))))
    print(f'# cold path: {time.perf_counter() - t0:.1f}s', flush=True)

    print(f'\n### fast-stem probe (b{B} T{T} {H}px bf16)\n')
    print('| variant | ms/iter | GFLOP | GB | TF/s | GB/s |')
    print('|---|---|---|---|---|---|')
    for name, fn, shape in variants:
        x = jnp.broadcast_to(jnp.asarray(rng.rand(1, *shape[1:]),
                                         jnp.bfloat16), shape)

        @jax.jit
        def many(v, xb, fn=fn):
            def body(carry, _):
                out = fn(v, carry)
                s = jnp.sum(out.astype(jnp.float32))
                return carry + (s * 0).astype(carry.dtype), s
            _, outs = jax.lax.scan(body, xb, None, length=args.iters)
            return jnp.sum(outs)

        t0 = time.perf_counter()
        jax.device_get(many(variables, x))
        print(f'# {name} compile+first: {time.perf_counter() - t0:.1f}s',
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        jax.device_get(many(variables, x))
        dt = (time.perf_counter() - t0) / args.iters
        try:
            ca = jax.jit(fn).lower(variables, x).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            f = float(ca.get('flops', 0.0))
            bts = float(ca.get('bytes accessed', 0.0))
        except Exception:
            f = bts = 0.0
        print(f'| {name} | {dt * 1e3:.1f} | {f / 1e9:.0f} | {bts / 1e9:.1f} '
              f'| {f / dt / 1e12:.1f} | {bts / dt / 1e9:.0f} |', flush=True)
        del x


if __name__ == '__main__':
    main()
