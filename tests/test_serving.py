"""Dynamic-batching inference server (pretorched_tpu/serving.py).

Criteria: results are exactly the per-request forward outputs regardless of
how requests were coalesced/padded; bucket sizes are bounded; errors
propagate; close() drains."""

import threading
import time

import numpy as np
import pytest

import jax.numpy as jnp

import pretorched_tpu
from pretorched_tpu.serving import InferenceServer, serve_model


def _linear_apply(variables, x):
    return x.reshape(x.shape[0], -1) @ variables['w'] + variables['b']


def _vars(rng, d_in=12, d_out=5):
    return {'w': jnp.asarray(rng.randn(d_in, d_out), jnp.float32),
            'b': jnp.asarray(rng.randn(d_out), jnp.float32)}


def test_serving_single_and_batch_requests(rng):
    variables = _vars(rng)
    with InferenceServer(_linear_apply, variables, max_batch=8,
                         max_wait_ms=5.0, example_ndim=2) as srv:
        xs = [rng.randn(3, 4).astype(np.float32) for _ in range(7)]
        futs = [srv.submit(x) for x in xs]                 # singles
        xb = rng.randn(4, 3, 4).astype(np.float32)
        fb = srv.submit(xb)                                # a batch
        ref = np.asarray(_linear_apply(
            variables, jnp.asarray(np.stack(xs))))
        for f, r in zip(futs, ref):
            np.testing.assert_allclose(f.result(timeout=60), r,
                                       rtol=1e-5, atol=1e-5)
        refb = np.asarray(_linear_apply(variables, jnp.asarray(xb)))
        np.testing.assert_allclose(fb.result(timeout=60), refb,
                                   rtol=1e-5, atol=1e-5)
    # buckets are powers of two bounded by max_batch
    assert srv.bucket_compiles <= {1, 2, 4, 8}


def test_serving_concurrent_submitters(rng):
    variables = _vars(rng)
    srv = InferenceServer(_linear_apply, variables, max_batch=16,
                          max_wait_ms=2.0, example_ndim=2)
    results = {}
    lock = threading.Lock()

    def client(i):
        x = np.full((3, 4), float(i), np.float32)
        y = srv.submit(x).result(timeout=60)
        with lock:
            results[i] = y

    threads = [threading.Thread(target=client, args=(i,)) for i in range(24)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    srv.close()
    for i in range(24):
        x = jnp.full((1, 3, 4), float(i), jnp.float32)
        ref = np.asarray(_linear_apply(variables, x))[0]
        np.testing.assert_allclose(results[i], ref, rtol=1e-5, atol=1e-5)


def test_serving_resolver_pool_correctness(rng):
    """With a resolver pool (readbacks may complete out of dispatch order),
    every future still resolves to exactly its own request's output."""
    variables = _vars(rng)
    srv = InferenceServer(_linear_apply, variables, max_batch=4,
                          max_wait_ms=0.0, example_ndim=2,
                          resolver_threads=4)
    # max_wait 0 + small buckets => many in-flight buckets racing resolvers
    xs = [np.full((3, 4), float(i), np.float32) for i in range(64)]
    futs = [srv.submit(x) for x in xs]
    for i, f in enumerate(futs):
        ref = np.asarray(_linear_apply(variables, jnp.asarray(xs[i][None])))[0]
        np.testing.assert_allclose(f.result(timeout=60), ref,
                                   rtol=1e-5, atol=1e-5)
    srv.close()


def test_serving_resolver_pool_error_propagates(rng):
    """A RESOLVER thread dying (error during device->host readback, not a
    trace-time error in the batcher) still fails every outstanding future
    and close() reports the death. The failure is injected at readback —
    monkeypatching the instance's _split_outputs, which only the resolver
    calls — so this exercises _resolve_loop -> _die specifically (a
    bad apply_fn raises at jit trace time inside the BATCHER instead,
    which test_serving_error_propagates already covers)."""
    variables = _vars(rng)
    srv = InferenceServer(_linear_apply, variables, max_batch=4,
                          max_wait_ms=0.0, example_ndim=2,
                          resolver_threads=3)

    def exploding_split(out, start, stop):
        raise RuntimeError('injected readback failure')

    srv._split_outputs = exploding_split
    futs = [srv.submit(np.ones((3, 4), np.float32)) for _ in range(8)]
    for f in futs:
        with pytest.raises(RuntimeError, match='injected readback'):
            f.result(timeout=60)
    with pytest.raises(RuntimeError):
        srv.close()
    assert srv._pending == 0        # exactly-once accounting held


def test_serving_cancelled_future_does_not_kill_server(rng):
    """A client cancelling a queued Future must not crash the resolver
    (set_result on a cancelled future raises InvalidStateError) nor corrupt
    the _pending admission count (ADVICE r4)."""
    gate = threading.Event()

    def gated_apply(variables, x):
        gate.wait(30)
        return _linear_apply(variables, x)

    variables = _vars(rng)
    srv = InferenceServer(gated_apply, variables, max_batch=2,
                          max_wait_ms=0.0, example_ndim=2, max_queue=8)
    try:
        x = rng.randn(3, 4).astype(np.float32)
        first = srv.submit(x)        # occupies the batcher at the gate
        victim = srv.submit(x)       # still queued
        assert victim.cancel()       # client walks away
        gate.set()
        first.result(timeout=60)
        # server is alive and admission accounting is exact
        y = srv.submit(x).result(timeout=60)
        assert y.shape == (5,)
        deadline = time.monotonic() + 10
        while srv._pending != 0 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert srv._pending == 0
    finally:
        gate.set()
        srv.close()


def test_serving_single_resolver_still_works(rng):
    variables = _vars(rng)
    with InferenceServer(_linear_apply, variables, max_batch=8,
                         max_wait_ms=2.0, example_ndim=2,
                         resolver_threads=1) as srv:
        x = rng.randn(3, 4).astype(np.float32)
        ref = np.asarray(_linear_apply(variables, jnp.asarray(x[None])))[0]
        np.testing.assert_allclose(srv(x), ref, rtol=1e-5, atol=1e-5)


def test_serving_error_propagates(rng):
    variables = _vars(rng)

    def bad_apply(variables, x):
        return x.reshape(x.shape[0], -1) @ variables['w'][:2]  # shape bug

    srv = InferenceServer(bad_apply, variables, max_batch=4,
                          max_wait_ms=0.0, example_ndim=2)
    fut = srv.submit(np.zeros((3, 4), np.float32))
    with pytest.raises(Exception):
        fut.result(timeout=60)
    with pytest.raises(RuntimeError, match='died'):
        srv.close()                 # a dead batcher is fatal and loud


def test_serving_rejects_oversized_and_closed(rng):
    variables = _vars(rng)
    srv = InferenceServer(_linear_apply, variables, max_batch=4,
                          example_ndim=2)
    with pytest.raises(ValueError, match='max_batch'):
        srv.submit(np.zeros((5, 3, 4), np.float32))
    srv.close()
    with pytest.raises(RuntimeError, match='closed'):
        srv.submit(np.zeros((3, 4), np.float32))


def test_serve_model_zoo_integration(rng):
    model = pretorched_tpu.resnet18(num_classes=13, pretrained=None).eval()
    x = rng.randn(2, 32, 32, 3).astype(np.float32)       # channels-last
    with serve_model(model, max_batch=4, max_wait_ms=1.0) as srv:
        y0 = srv(x[0])                                   # one example
        yb = srv(x)                                      # a batch
    ref = np.asarray(model.module.apply(model.variables, jnp.asarray(x)))
    np.testing.assert_allclose(y0, ref[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(yb, ref, rtol=1e-4, atol=1e-4)


def test_serving_with_sharded_apply(rng):
    """The executor is sharding-agnostic: an apply_fn that constrains its
    batch onto a 'data' mesh axis serves unchanged (the deployment shape
    for DP serving on a pod slice)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()[:8]), ('data',))
    variables = _vars(rng)

    def sharded_apply(variables, x):
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P('data')))
        return _linear_apply(variables, x)

    with InferenceServer(sharded_apply, variables, max_batch=8,
                         max_wait_ms=5.0, example_ndim=2) as srv:
        xs = [rng.randn(3, 4).astype(np.float32) for _ in range(8)]
        futs = [srv.submit(x) for x in xs]
        ref = np.asarray(_linear_apply(variables,
                                       jnp.asarray(np.stack(xs))))
        for f, r in zip(futs, ref):
            np.testing.assert_allclose(f.result(timeout=60), r,
                                       rtol=1e-5, atol=1e-5)


def test_serving_rejects_mismatched_request_not_kills_server(rng):
    """A malformed request fails ITS caller with ValueError; the server
    keeps serving everyone else (no batcher death)."""
    variables = _vars(rng)
    with InferenceServer(_linear_apply, variables, max_batch=8,
                         max_wait_ms=1.0, example_ndim=2) as srv:
        good = srv.submit(rng.randn(3, 4).astype(np.float32))
        with pytest.raises(ValueError, match='signature'):
            srv.submit(rng.randn(3, 5).astype(np.float32))   # wrong shape
        with pytest.raises(ValueError, match='signature'):
            srv.submit(rng.randn(3, 4).astype(np.float64))   # wrong dtype
        assert good.result(timeout=60).shape == (5,)
        again = srv.submit(rng.randn(3, 4).astype(np.float32))
        assert again.result(timeout=60).shape == (5,)


def test_serving_rejects_empty_batch(rng):
    """A zero-row batch fails its caller (it would blow up the batcher's
    pad-to-bucket broadcast and kill the server for everyone)."""
    variables = _vars(rng)
    with InferenceServer(_linear_apply, variables, max_batch=8,
                         max_wait_ms=1.0, example_ndim=2) as srv:
        with pytest.raises(ValueError, match='empty batch'):
            srv.submit(np.empty((0, 3, 4), np.float32))   # 0-example batch
        assert srv.submit(rng.randn(3, 4).astype(np.float32)) \
            .result(timeout=60).shape == (5,)


def test_serving_pinned_signature(rng):
    """example_shape/example_dtype pin the served signature at
    construction: a malformed FIRST request is rejected instead of
    poisoning the signature for all later (correct) traffic."""
    variables = _vars(rng)
    with InferenceServer(_linear_apply, variables, max_batch=8,
                         max_wait_ms=1.0, example_ndim=2,
                         example_shape=(3, 4),
                         example_dtype=np.float32) as srv:
        with pytest.raises(ValueError, match='signature'):
            srv.submit(rng.randn(3, 5).astype(np.float32))  # wrong 1st req
        assert srv.submit(rng.randn(3, 4).astype(np.float32)) \
            .result(timeout=60).shape == (5,)


def test_serving_close_retry_joins_again(rng):
    """A second close() call must actually wait again (join), per its own
    error message's advice — not raise instantly."""
    variables = _vars(rng)
    srv = InferenceServer(_linear_apply, variables, max_batch=4,
                          max_wait_ms=1.0, example_ndim=2)
    srv.submit(rng.randn(3, 4).astype(np.float32)).result(timeout=60)
    srv.close(timeout=60)
    srv.close(timeout=60)      # idempotent; second call must not raise


def test_serving_uint8_payload(rng):
    """payload='uint8': raw 256px uint8 requests, fused resize/crop/
    normalize ON DEVICE inside the served program — results match the
    offline fused_preprocess -> forward reference exactly."""
    from pretorched_tpu.transforms.fused import fused_preprocess

    model = pretorched_tpu.resnet18(num_classes=11, pretrained=None).eval()
    raw = rng.randint(0, 255, (3, 256, 256, 3)).astype(np.uint8)
    with serve_model(model, max_batch=4, max_wait_ms=1.0,
                     payload='uint8') as srv:
        # default decode geometry = pre-crop resize size (224/0.875 = 256)
        assert srv._example_shape == (256, 256, 3)
        y0 = srv(raw[0])
        yb = srv(raw)
    x = fused_preprocess(raw, model.settings or model)
    ref = np.asarray(model.module.apply(model.variables, x))
    np.testing.assert_allclose(y0, ref[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(yb, ref, rtol=1e-4, atol=1e-4)
    # f32 requests are rejected at the caller, not the batcher
    with pytest.raises(ValueError, match='signature'):
        srv2 = serve_model(model, max_batch=4, payload='uint8')
        try:
            srv2.submit(raw[0].astype(np.float32))
        finally:
            srv2.close()


def test_serving_uint8_payload_rejects_conflicting_signature():
    """uint8/jpeg payloads pin the served signature to decode_shape; a
    conflicting explicit example_shape/example_dtype must raise at
    construction instead of being silently overwritten (the caller's
    traffic would otherwise be rejected at runtime)."""
    model = pretorched_tpu.resnet18(num_classes=5, pretrained=None).eval()
    with pytest.raises(ValueError, match='decode_shape'):
        serve_model(model, payload='uint8', example_shape=(224, 224, 3))
    with pytest.raises(ValueError, match='uint8'):
        serve_model(model, payload='uint8', example_dtype=np.float32)
    # a MATCHING explicit signature is fine (harmless redundancy)
    srv = serve_model(model, payload='uint8', example_shape=(256, 256, 3),
                      example_dtype=np.uint8)
    try:
        assert srv._example_shape == (256, 256, 3)
    finally:
        srv.close()


def test_serving_jpeg_payload(rng):
    """payload='jpeg': encoded bytes in, logits out; oracle is the same
    decode (datasets.native) + fused preprocess + forward offline."""
    import io

    from PIL import Image

    from pretorched_tpu.datasets.native import decode_jpeg_batch
    from pretorched_tpu.transforms.fused import fused_preprocess

    model = pretorched_tpu.resnet18(num_classes=7, pretrained=None).eval()
    # smooth gradient image: compresses like a natural photo
    yy, xx = np.mgrid[0:256, 0:256]
    img = np.stack([yy, xx, (yy + xx) // 2], -1).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format='JPEG', quality=90)
    jpeg = buf.getvalue()

    with serve_model(model, max_batch=4, max_wait_ms=1.0,
                     payload='jpeg') as srv:
        y1 = srv(jpeg)                       # one encoded image
        y2 = srv([jpeg, jpeg])               # a batch of encoded images
    decoded = decode_jpeg_batch([jpeg])[0]
    assert decoded.shape == (256, 256, 3)
    x = fused_preprocess(decoded[None], model.settings or model)
    ref = np.asarray(model.module.apply(model.variables, x))[0]
    np.testing.assert_allclose(y1, ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(y2[0], ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(y2[1], ref, rtol=1e-4, atol=1e-4)


def test_serving_jpeg_payload_odd_geometry(rng):
    """An off-signature JPEG (tall 300x200) is fitted host-side (short-side
    resize + center crop) instead of rejected — the server keeps a single
    static signature while accepting arbitrary client uploads."""
    import io

    from PIL import Image

    model = pretorched_tpu.resnet18(num_classes=5, pretrained=None).eval()
    yy, xx = np.mgrid[0:300, 0:200]
    img = np.stack([yy % 256, xx % 256, (yy + xx) % 256], -1).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format='JPEG', quality=90)
    with serve_model(model, max_batch=2, max_wait_ms=1.0,
                     payload='jpeg') as srv:
        y = srv(buf.getvalue())
    assert y.shape == (5,) and np.all(np.isfinite(y))


def test_fit_uint8_geometry():
    from pretorched_tpu.serving import _fit_uint8

    img = np.arange(300 * 200 * 3, dtype=np.uint8).reshape(300, 200, 3)
    out = _fit_uint8(img, (256, 256, 3))
    assert out.shape == (256, 256, 3) and out.dtype == np.uint8
    same = np.zeros((256, 256, 3), np.uint8)
    assert _fit_uint8(same, (256, 256, 3)) is same      # hot path: no copy


def test_serving_overload_shedding(rng):
    """max_queue: submit raises ServerOverloaded at admission once the
    queued-example budget is full; capacity frees as requests resolve."""
    from pretorched_tpu.serving import ServerOverloaded

    gate = threading.Event()

    def slow_apply(variables, x):
        gate.wait(30)
        return _linear_apply(variables, x)

    variables = _vars(rng)
    srv = InferenceServer(slow_apply, variables, max_batch=2, max_wait_ms=0.0,
                          example_ndim=2, max_queue=2)
    try:
        xs = rng.randn(3, 4).astype(np.float32)            # one example
        futs = [srv.submit(xs) for _ in range(2)]          # fills max_queue
        with pytest.raises(ServerOverloaded):
            srv.submit(xs)
        gate.set()                                         # unblock batcher
        for f in futs:
            f.result(timeout=60)
        # capacity freed: admission works again
        srv.submit(xs).result(timeout=60)
    finally:
        gate.set()
        srv.close()


def test_serving_request_timeout_expires_stale(rng):
    """request_timeout_ms: requests that sat queued past the deadline fail
    with TimeoutError instead of consuming device time; fresh requests
    afterwards still succeed."""
    gate = threading.Event()
    calls = []

    def slow_apply(variables, x):
        calls.append(x.shape[0])
        gate.wait(30)
        return _linear_apply(variables, x)

    variables = _vars(rng)
    srv = InferenceServer(slow_apply, variables, max_batch=2, max_wait_ms=0.0,
                          example_ndim=2, request_timeout_ms=150.0)
    try:
        xs = rng.randn(3, 4).astype(np.float32)            # one example
        first = srv.submit(xs)           # enters the batcher, blocks on gate
        import time
        time.sleep(0.05)
        stale = srv.submit(xs)           # sits in the queue past 150ms
        time.sleep(0.3)
        gate.set()                       # first resolves; stale has expired
        first.result(timeout=60)
        with pytest.raises(TimeoutError):
            stale.result(timeout=60)
        # a fresh request is served normally
        np.testing.assert_allclose(
            srv.submit(xs).result(timeout=60),
            np.asarray(_linear_apply(variables, jnp.asarray(xs[None])))[0],
            rtol=1e-5, atol=1e-5)
    finally:
        gate.set()
        srv.close()
