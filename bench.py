#!/usr/bin/env python
"""Benchmark: resnet3d50 video inference throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config matches BASELINE.json's headline metric: resnet3d50 (Kinetics
architecture), 16-frame 224x224 clips, bf16 compute, channels-last, jit.
The reference publishes no throughput numbers (BASELINE.md), so
``vs_baseline`` is measured against VS_BASELINE_CLIPS_PER_SEC — a documented
estimate of the PyTorch reference on a datacenter GPU (V100-class, fp32,
cuDNN benchmark mode): ~100 clips/s for this model/clip size. The north-star
target is >=10x (BASELINE.json).

Measurement notes (this sandbox): the axon TPU tunnel has a ~15min cold
device->host path and an unreliable block_until_ready, so the timed loop runs
*inside* one jit via lax.scan (sequential by carry dependency) and completion
is forced with jax.device_get of a scalar checksum.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

VS_BASELINE_CLIPS_PER_SEC = 100.0

BATCH = int(os.environ.get('BENCH_BATCH', '128'))
FRAMES = int(os.environ.get('BENCH_FRAMES', '16'))
SIZE = int(os.environ.get('BENCH_SIZE', '224'))
ITERS = int(os.environ.get('BENCH_ITERS', '20'))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import pretorched_tpu as pretorched

    # warm the device->host path first (one-time ~15min on the axon tunnel)
    t0 = time.perf_counter()
    jax.device_get(jax.jit(lambda x: x + 1)(jnp.zeros((8, 128))))
    print(f'# cold-path warmup: {time.perf_counter() - t0:.1f}s',
          file=sys.stderr)

    import dataclasses

    model = pretorched.resnet3d50(num_classes=400, pretrained=None)
    model.bfloat16()
    # exact space-to-depth stem folding: +5% on v5e, bit-identical outputs
    module = dataclasses.replace(model.module, s2d_stem=True)
    variables = model.variables

    @jax.jit
    def forward_many(variables, clip):
        def body(carry, _):
            out = module.apply(variables, carry)
            # scalar data dependency so iterations cannot overlap/elide
            carry = carry + (out[0, 0] * 0).astype(carry.dtype)
            return carry, out[0, 0]
        _, outs = jax.lax.scan(body, clip, None, length=ITERS)
        return jnp.sum(outs.astype(jnp.float32))

    batch = BATCH
    while True:
        clip = jnp.asarray(
            np.random.RandomState(0).rand(batch, FRAMES, SIZE, SIZE, 3),
            jnp.bfloat16)
        try:
            t0 = time.perf_counter()
            jax.device_get(forward_many(variables, clip))  # compile + first
            print(f'# b{batch} compile+first: {time.perf_counter() - t0:.1f}s',
                  file=sys.stderr)
            break
        except Exception as e:  # noqa: BLE001 — OOM insurance: halve batch
            if batch <= 4:
                raise
            print(f'# b{batch} failed ({type(e).__name__}); retrying b{batch//2}',
                  file=sys.stderr)
            batch //= 2

    t0 = time.perf_counter()
    jax.device_get(forward_many(variables, clip))
    dt = (time.perf_counter() - t0) / ITERS

    clips_per_sec = batch / dt
    print(json.dumps({
        'metric': f'resnet3d50 {FRAMES}f{SIZE}px bf16 clips/sec/chip',
        'value': round(clips_per_sec, 2),
        'unit': 'clips/s',
        'vs_baseline': round(clips_per_sec / VS_BASELINE_CLIPS_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()
