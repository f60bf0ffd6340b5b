#!/usr/bin/env python
"""On-chip A/B of the fused bottleneck-tail kernel (ops/pallas/fused_block).

Measures the FULL SlowFast graph (the r3 rule: isolated-op wins do not
compose on XLA) with fused_blocks=0 (plain XLA) vs the requested thresholds,
plus the FastOnly pathway where the C<=32 segments live. Timing follows
bench.py's tunnel discipline (scan-in-one-jit, carry feeds input and depends
on output, device_get of a scalar forces completion; variables as jit args).

Usage: python tools/fused_probe.py [--batch 128] [--frames 64]
                                   [--thresholds 0,32,64] [--modes sf,f]
"""

import argparse
import dataclasses
import gc
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=128)
    p.add_argument('--frames', type=int, default=64)
    p.add_argument('--size', type=int, default=224)
    p.add_argument('--iters', type=int, default=10)
    # consecutive thresholds isolate each fast stage's contribution in the
    # FULL graph: <=8 fuses res2 only, <=16 +res3, <=32 +res4, <=64 +res5
    # (and slow res2 in sf mode)
    p.add_argument('--thresholds', default='0,8,16,32,64')
    p.add_argument('--modes', default='f,sf')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import pretorched_tpu as pretorched

    t0 = time.perf_counter()
    jax.device_get(jax.jit(lambda x: x + 1)(jnp.zeros((8, 128))))
    print(f'# cold-path warmup: {time.perf_counter() - t0:.1f}s', flush=True)

    rng = np.random.RandomState(0)

    def rand_batch(shape, dtype=jnp.bfloat16):
        one = jnp.asarray(rng.rand(1, *shape[1:]), dtype)
        return jnp.broadcast_to(one, tuple(shape))

    def timed_scan(apply_fn, variables, x, iters, tag):
        @jax.jit
        def many(v, xb):
            def body(carry, _):
                out = apply_fn(v, carry)
                s = jnp.sum(out.astype(jnp.float32))
                carry = carry + (s * 0).astype(carry.dtype)
                return carry, s
            _, outs = jax.lax.scan(body, xb, None, length=iters)
            return jnp.sum(outs)

        t0 = time.perf_counter()
        first = jax.device_get(many(variables, x))
        print(f'# {tag} compile+first: {time.perf_counter() - t0:.1f}s',
              flush=True)
        t0 = time.perf_counter()
        jax.device_get(many(variables, x))
        return (time.perf_counter() - t0) / iters, first

    for mode in args.modes.split(','):
        m = pretorched.slowfast_resnet50(mode=mode, num_classes=400,
                                         pretrained=None)
        m.bfloat16()
        clip = rand_batch((args.batch, args.frames, args.size, args.size, 3))
        results = {}
        for thr in [int(t) for t in args.thresholds.split(',')]:
            module = dataclasses.replace(m.module, s2d_stem=True,
                                         fused_blocks=thr)

            def fwd(v, c, module=module):
                return module.apply(v, c)

            try:
                dt, chk = timed_scan(fwd, m.variables, clip, args.iters,
                                     f'{mode} fused<={thr}')
            except Exception as e:
                print(f'{mode} fused<={thr}: FAILED {type(e).__name__}: '
                      f'{str(e).splitlines()[0][:200]}', flush=True)
                continue
            results[thr] = (dt, chk)
            # the ratio needs the measured thr=0 baseline; falling back to
            # this row's own dt would fabricate a "1.000x vs plain"
            if 0 in results:
                ratio = f'{results[0][0] / dt:.3f}x vs plain'
            else:
                ratio = 'no plain baseline'
            print(f'{mode} fused<={thr}: {dt * 1e3:.1f} ms/iter '
                  f'({args.batch / dt:.1f} clips/s, {ratio}) '
                  f'checksum={chk:.6g}', flush=True)
        if 0 in results:
            # the checksum is a near-cancelling sum of ~5M signed random-
            # init logits, so a purely relative tolerance can collapse to
            # ~0; floor it at an absolute scale of per-element noise
            tol = 3e-3 * abs(results[0][1]) + 1e-2
            for thr, (dt, chk) in results.items():
                if thr and abs(chk - results[0][1]) > tol:
                    print(f'# WARNING {mode} fused<={thr} checksum drifts: '
                          f'{chk} vs {results[0][1]}', flush=True)
        del m, clip
        gc.collect()

    print('# done', flush=True)


if __name__ == '__main__':
    main()
