#!/usr/bin/env python
"""Per-segment decomposition of the SlowFast FAST pathway (VERDICT r3 #1).

tools/roofline.py (r4) showed the fast pathway at 7.7% MFU eating ~65% of
SlowFast's time; tools/fold_probe.py showed res2 is only ~16ms of its
~101ms and that temporal folding loses. This times each fast segment
(stem+pool, res2..res5) in isolation on its real input shape to find where
the ~101ms actually goes, using flax method-apply on the real module (same
weights, same names — no reimplementation drift).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=128)
    p.add_argument('--frames', type=int, default=32,
                   help='fast-pathway frames (64-frame clip / stride 2)')
    p.add_argument('--size', type=int, default=224)
    p.add_argument('--iters', type=int, default=10)
    p.add_argument('--cpu', action='store_true')
    args = p.parse_args()

    if args.cpu:
        os.environ['JAX_PLATFORMS'] = 'cpu'

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    import pretorched_tpu as pretorched
    from pretorched_tpu.models.slowfast import SlowFast
    from pretorched_tpu.ops.pooling import max_pool

    sf = pretorched.slowfast_resnet50(mode='f', num_classes=400,
                                      pretrained=None)
    sf.bfloat16()
    variables = sf.variables

    # subclass: same helpers, same explicit param names — __call__ runs ONE
    # fast segment, so the base model's variables apply unchanged
    STAGES = {'res2': (8, 3, 1, 8), 'res3': (16, 4, 2, 32),
              'res4': (32, 6, 2, 64), 'res5': (64, 3, 2, 128)}

    class FastSeg(SlowFast):
        seg: str = 'stem'

        @nn.compact
        def __call__(self, x):          # noqa: D102
            if self.seg == 'stem':
                x = self._cbr(x, 8, (5, 7, 7), 'fast.conv1',
                              stride=(1, 2, 2), padding=(2, 3, 3),
                              train=False, s2d=self.s2d_stem)
                return max_pool(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
            planes, blocks, stride, inplanes = STAGES[self.seg]
            return self._stage(x, f'fast.{self.seg}', planes, blocks,
                               stride, 3, inplanes, train=False)[0]

    def seg_module(name):
        return FastSeg(block='bottleneck', layers=(3, 4, 6, 3), mode='f',
                       s2d_stem=True, dtype=jnp.bfloat16, seg=name)

    T, H, B = args.frames, args.size, args.batch
    segs = [
        ('stem', (B, T, H, H, 3)),
        ('res2', (B, T, H // 4, H // 4, 8)),
        ('res3', (B, T, H // 4, H // 4, 32)),
        ('res4', (B, T, H // 8, H // 8, 64)),
        ('res5', (B, T, H // 16, H // 16, 128)),
    ]

    t0 = time.perf_counter()
    jax.device_get(jax.jit(lambda x: x + 1)(jnp.zeros((8, 128))))
    print(f'# cold path: {time.perf_counter() - t0:.1f}s', flush=True)

    rng = np.random.RandomState(0)
    print(f'\n### FastOnly per-segment (b{B} T{T} {H}px bf16, isolated)\n')
    print('| segment | ms/iter | GFLOP | GB | MFU | roofline% (bound) |')
    print('|---|---|---|---|---|---|')
    total = 0.0
    for name, shape in segs:
        x = jnp.broadcast_to(jnp.asarray(rng.rand(1, *shape[1:]),
                                         jnp.bfloat16), shape)
        module = seg_module(name)

        def fwd(v, c, module=module):
            return module.apply(v, c)

        @jax.jit
        def many(v, xb):
            def body(carry, _):
                out = fwd(v, carry)
                s = jnp.sum(out.astype(jnp.float32))
                return carry + (s * 0).astype(carry.dtype), s
            _, outs = jax.lax.scan(body, xb, None, length=args.iters)
            return jnp.sum(outs)

        t0 = time.perf_counter()
        jax.device_get(many(variables, x))
        print(f'# {name} compile+first: {time.perf_counter() - t0:.1f}s',
              file=sys.stderr)
        t0 = time.perf_counter()
        jax.device_get(many(variables, x))
        dt = (time.perf_counter() - t0) / args.iters
        total += dt
        try:
            ca = jax.jit(fwd).lower(variables, x).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            f = float(ca.get('flops', 0.0))
            bts = float(ca.get('bytes accessed', 0.0))
        except Exception:
            f = bts = 0.0
        t_roof = max(f / 197e12, bts / 819e9)
        bound = 'MXU' if f / 197e12 > bts / 819e9 else 'HBM'
        print(f'| {name} | {dt * 1e3:.1f} | {f / 1e9:.0f} | {bts / 1e9:.1f} '
              f'| {f / dt / 197e12 * 100:.1f}% | '
              f'{t_roof / dt * 100:.0f}% ({bound}) |', flush=True)
    print(f'| **sum** | **{total * 1e3:.1f}** | | | | |')


if __name__ == '__main__':
    main()
