#!/usr/bin/env python
"""Per-model profiling CLI: XLA cost analysis + hot-op shapes + optional
TensorBoard device trace.

The deep version of the reference's introspection demo
(examples/visu_arch.py:75-92 forward hooks printing sizes) for performance
work: what the compiler sees (FLOPs, bytes), where they go (per-op conv/dot
shapes), and — with ``--trace`` — a device timeline for XProf.

Usage:
    python tools/profile_model.py -a resnet3d50 -b 8 --frames 16
    python tools/profile_model.py -a resnet50 -b 32 --trace /tmp/jax-trace
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--arch', '-a', default='resnet3d50')
    ap.add_argument('-b', '--batch-size', default=8, type=int)
    ap.add_argument('--frames', default=16, type=int,
                    help='clip length for video models')
    ap.add_argument('--size', default=224, type=int)
    ap.add_argument('--num-classes', default=400, type=int)
    ap.add_argument('--bf16', action='store_true')
    ap.add_argument('--train', action='store_true',
                    help='profile the SGD train step instead of inference')
    ap.add_argument('--trace', default=None, metavar='LOGDIR',
                    help='capture a TensorBoard device trace of 3 steps')
    ap.add_argument('--ops', default=8, type=int,
                    help='print the N largest conv/dot ops')
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np

    import pretorched_tpu as pretorched

    model = pretorched.__dict__[args.arch](num_classes=args.num_classes,
                                           pretrained=None)
    if args.bf16:
        model.bfloat16()
    ndim = getattr(model, 'input_ndim', 4)
    rng = np.random.RandomState(0)
    if ndim == 5:
        x = jnp.asarray(rng.rand(args.batch_size, args.frames, args.size,
                                 args.size, 3), jnp.float32)
    elif ndim == 3:
        x = jnp.asarray(rng.rand(args.batch_size, 67724, 1), jnp.float32)
    else:
        x = jnp.asarray(rng.rand(args.batch_size, args.size, args.size, 3),
                        jnp.float32)

    if args.train:
        import optax

        from pretorched_tpu.parallel import make_train_step
        tx = optax.sgd(0.1, momentum=0.9)
        step = make_train_step(model.module, tx)
        params = model.variables['params']
        stats = model.variables.get('batch_stats')
        opt_state = tx.init(params)
        labels = jnp.asarray(np.arange(args.batch_size) % args.num_classes)
        call_args = (params, stats, opt_state, x, labels, 0)
        fn = step

        def run(a):
            p, s, o, m = fn(*a)
            return (p, s, o, a[3], a[4], a[5]), m['loss']
    else:
        fn = jax.jit(lambda v, x: model.module.apply(v, x))
        call_args = (model.variables, x)

        def run(a):
            out = fn(*a)
            return a, out[0, 0]

    lowered = fn.lower(*call_args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get('flops', 0.0))
    byts = float(ca.get('bytes accessed', 0.0))
    print(f'arch={args.arch} mode={"train" if args.train else "infer"} '
          f'batch={args.batch_size} input={tuple(x.shape)} '
          f'dtype={"bf16" if args.bf16 else "f32"}')
    print(f'cost analysis: {flops / 1e9:.1f} GFLOP/call '
          f'({flops / args.batch_size / 1e9:.2f} GF/item), '
          f'{byts / 1e9:.2f} GB accessed, arithmetic intensity '
          f'{flops / max(byts, 1):.1f} FLOP/byte')
    try:
        mem = compiled.memory_analysis()
        print(f'memory: argument {mem.argument_size_in_bytes / 1e9:.2f} GB, '
              f'output {mem.output_size_in_bytes / 1e9:.2f} GB, '
              f'temp {mem.temp_size_in_bytes / 1e9:.2f} GB')
    except Exception:
        pass

    if not args.train:
        from pretorched_tpu.utils.profiling import op_shapes
        shapes = op_shapes(lambda v, xx: model.module.apply(v, xx),
                           model.variables, x)
        import collections
        sizes = collections.Counter()
        for name, shape in shapes:
            sizes[(name, tuple(shape))] += 1
        print(f'{len(shapes)} conv/dot ops; largest {args.ops} by output '
              f'element count:')
        ranked = sorted(sizes.items(),
                        key=lambda kv: -np.prod(kv[0][1]) * kv[1])
        for (name, shape), n in ranked[:args.ops]:
            print(f'  {n:3d} x {name:22s} -> {shape}')

    # timed steps (+ optional trace)
    a = call_args
    a, dep = run(a)          # warm/compile
    jax.device_get(dep)
    ctx = None
    if args.trace:
        from pretorched_tpu.utils.profiling import trace
        ctx = trace(args.trace)
        ctx.__enter__()
    t0 = time.perf_counter()
    for _ in range(3):
        a, dep = run(a)
    jax.device_get(dep)
    dt = (time.perf_counter() - t0) / 3
    if ctx is not None:
        ctx.__exit__(None, None, None)
        print(f'device trace written to {args.trace}')
    print(f'{dt * 1e3:.2f} ms/step = {args.batch_size / dt:.1f} items/s; '
          f'{flops / dt / 1e12:.1f} TFLOP/s sustained')
    return 0


if __name__ == '__main__':
    sys.exit(main())
