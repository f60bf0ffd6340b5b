#!/usr/bin/env python
"""Online-serving demo/loadtest CLI for the dynamic-batching executor.

Beyond the reference's scope (its deployment story is offline scripts);
this drives ``pretorched_tpu.serving.InferenceServer`` the way a model
server would: N client threads submit single examples concurrently, the
batcher coalesces them onto power-of-two buckets, and the tool reports
throughput plus latency percentiles and the bucket sizes actually compiled.

Usage:
    python examples/serve.py -a resnet50 --requests 256 --clients 8
    python examples/serve.py -a resnet3d50 --frames 16 --size 112 \
        --max-batch 32 --max-wait-ms 5
"""

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser(description='serving loadtest')
    p.add_argument('--arch', '-a', default='resnet50')
    p.add_argument('--pretrained', default='none')
    p.add_argument('--requests', type=int, default=128)
    p.add_argument('--clients', type=int, default=8)
    p.add_argument('--size', type=int, default=224)
    p.add_argument('--frames', type=int, default=16,
                   help='clip length for video archs')
    p.add_argument('--max-batch', type=int, default=64)
    p.add_argument('--max-wait-ms', type=float, default=2.0)
    p.add_argument('--resolver-threads', type=int, default=1,
                   help='concurrent device->host readbacks; raise only for '
                        'large outputs on a slow link (serving.py docstring '
                        'has the measured trade-off)')
    p.add_argument('--bf16', action='store_true',
                   help='bf16 compute (f32 params)')
    p.add_argument('--cpu', action='store_true', help='force CPU backend')
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    import pretorched_tpu as pretorched
    from pretorched_tpu.serving import serve_model

    pretrained = None if args.pretrained == 'none' else args.pretrained
    model = pretorched.__dict__[args.arch](pretrained=pretrained).eval()
    if args.bf16:
        model.bfloat16()
    video = getattr(model, 'input_ndim', 4) == 5
    shape = ((args.frames, args.size, args.size, 3) if video
             else (args.size, args.size, 3))
    rng = np.random.RandomState(0)
    dtype = np.float32

    lat = []
    lock = threading.Lock()

    with serve_model(model, max_batch=args.max_batch,
                     max_wait_ms=args.max_wait_ms,
                     resolver_threads=args.resolver_threads) as srv:
        # warm every bucket the traffic can hit (compile outside the clock)
        b = 1
        while b <= args.max_batch:
            srv(rng.rand(b, *shape).astype(dtype))
            b *= 2

        # distribute the remainder so exactly --requests are issued
        per_client = [args.requests // args.clients +
                      (1 if i < args.requests % args.clients else 0)
                      for i in range(args.clients)]

        def client(n_req):
            for _ in range(n_req):
                x = rng.rand(*shape).astype(dtype)
                t0 = time.perf_counter()
                srv.submit(x).result()
                dt = time.perf_counter() - t0
                with lock:
                    lat.append(dt)

        t0 = time.perf_counter()
        threads = [threading.Thread(target=client, args=(n,))
                   for n in per_client]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0

    lat_ms = np.sort(np.asarray(lat)) * 1000
    n = len(lat_ms)
    if n == 0:
        print('no requests issued (--requests 0)')
        return
    print(f'{n} requests, {args.clients} clients, wall {wall:.2f}s '
          f'-> {n / wall:.1f} req/s')
    print(f'latency ms: p50 {lat_ms[n // 2]:.1f}  '
          f'p90 {lat_ms[int(n * 0.9)]:.1f}  p99 {lat_ms[int(n * 0.99)]:.1f}')
    print(f'buckets compiled: {sorted(srv.bucket_compiles)}')


if __name__ == '__main__':
    main()
