"""Online inference serving: a dynamic-batching executor for the zoo.

The reference deploys its models behind ad-hoc scripts (one
``model(batch)`` at a time, examples/imagenet_eval.py:118-133); serving
many concurrent, individually-arriving requests on a TPU needs the piece
torch gets from its serving frameworks: **dynamic batching onto static
shapes**. XLA compiles one program per batch size, so a naive
per-request forward both recompiles and wastes the MXU at batch 1.

``InferenceServer`` is the TPU-native executor:

* Requests (single examples or small batches) enter a queue and return a
  ``Future`` immediately.
* A background batcher thread coalesces whatever is queued — up to
  ``max_batch``, waiting at most ``max_wait_ms`` for stragglers — and pads
  the coalesced batch up to a power-of-two **bucket**, so any traffic
  pattern hits a bounded compile set ({1, 2, 4, ..., max_batch} at most).
  Padding rows are compute waste only; they are sliced off before the
  futures resolve, so results are exactly the single-request outputs.
* The forward is one jitted function with variables passed as an argument
  (weights live on device; the compiled program carries only shapes), and
  dispatch is async — the batcher thread enqueues the next bucket while
  the device still computes the previous one, overlapping host batching
  with TPU compute.
* Results travel back on a dedicated **resolver pool**: the batcher only
  dispatches (never blocks on the device), the resolvers do the
  ``device_get`` + future fan-out. Measured on the r3 loadtest (axon
  tunnel, p50 332ms / p99 1108ms): with batching and resolution on ONE
  thread, a request arriving while a bucket's device->host readback is in
  flight waits for that readback before it can even be *batched* — on a
  high-RTT link the tail stacks up to ~3x the median. Decoupling removes
  the head-of-line blocking; the p99/p50 ratio is regression-tracked by
  bench.py's serving row. A pool (``resolver_threads``, default 1)
  additionally overlaps the readbacks themselves; each bucket's futures
  resolve independently, so out-of-order completion across buckets is
  harmless. Raise it only when per-bucket readback time (output bytes /
  link bandwidth + RTT) exceeds the inter-bucket interval — i.e. large
  outputs on a slow host<->device link. Measured on the axon tunnel (r4
  A/B, 256 req x 8 clients, 224px resnet50): with classifier-sized
  outputs the loadtest is *input-upload*-bound (602KB/request vs a
  ~13MB/s tunnel; wall == the link floor) and extra resolvers only steal
  tunnel bandwidth from uploads — 1 resolver 24.2 req/s vs 4 resolvers
  19.4. On a real PCIe host both transfers are microseconds and the
  setting is moot.

* Requests need not be preprocessed tensors: ``serve_model(payload=...)``
  also serves **uint8 images** (device-side fused resize/crop/normalize —
  4x smaller requests) and **encoded JPEG bytes** (native libjpeg decode in
  the submitting thread — ~10-30x smaller). The r4 loadtest proved the
  wire format IS the throughput knob on an ingress-limited deployment:
  req/s == link bandwidth / request bytes no matter how good the batching.

Single-process, single-module executor by design: shard the model over a
mesh *inside* ``apply_fn`` (e.g. with the ``parallel`` layer's shardings)
and this server scales to a pod slice unchanged — the queue/bucket logic
is host-side and sharding-agnostic.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


class ServerOverloaded(RuntimeError):
    """Raised by ``submit`` when the queue holds ``max_queue`` examples —
    load-shedding at admission instead of unbounded latency growth."""


class InferenceServer:
    """Dynamic-batching executor over one jittable forward.

    Args:
      apply_fn: ``(variables, batch) -> outputs`` with outputs' leading axis
        matching the batch's. Jitted internally (one compile per bucket).
      variables: the model's variable pytree (device-resident is best).
      max_batch: upper bucket bound (also the largest coalesced batch).
      max_wait_ms: how long the batcher waits for more requests once it has
        at least one (latency/throughput knob; 0 = greedy drain only).
      example_ndim: rank of ONE example (e.g. 4 for a video clip THWC);
        ``submit`` accepts one example or a batch (rank +1) of them.
      example_shape / example_dtype: pin the served signature up front.
        When omitted, the FIRST request defines it — convenient, but a
        wrong-shaped first request then rejects all correct traffic for
        the server's lifetime, so production callers should pin it.
      max_queue: admission bound in EXAMPLES — ``submit`` raises
        :class:`ServerOverloaded` once this many are queued (load shedding;
        ``None`` = unbounded).
      request_timeout_ms: a request still queued after this long is failed
        with ``TimeoutError`` when the batcher reaches it, instead of
        consuming device time its caller has likely stopped waiting for
        (``None`` = never expire). In-flight batches are not cancelled.
      resolver_threads: readback concurrency — how many dispatched buckets
        can be in device->host transfer at once. Default 1 (serialized
        readbacks); raise only when outputs are large relative to the
        host<->device link (see the module docstring for the measured
        trade-off).
      request_transform: optional callable applied to every raw request in
        the SUBMITTING thread before validation/queueing — how compressed
        payload modes (JPEG bytes -> uint8 array) plug in without touching
        the batcher; host decode work parallelizes across client threads.
    """

    def __init__(self, apply_fn: Callable, variables, *, max_batch: int = 64,
                 max_wait_ms: float = 2.0, example_ndim: Optional[int] = None,
                 example_shape: Optional[tuple] = None, example_dtype=None,
                 max_queue: Optional[int] = None,
                 request_timeout_ms: Optional[float] = None,
                 resolver_threads: int = 1,
                 request_transform: Optional[Callable] = None):
        self._fn = jax.jit(apply_fn)
        self._transform = request_transform
        self._variables = variables
        self.max_batch = int(max_batch)
        self.max_wait = max_wait_ms / 1000.0
        self.example_ndim = example_ndim
        self.max_queue = max_queue
        self._timeout = (None if request_timeout_ms is None
                         else request_timeout_ms / 1000.0)
        self._pending = 0          # queued examples (admission accounting)
        self._q: queue.Queue = queue.Queue()
        self._closed = False
        self._exc: Optional[BaseException] = None
        # guards the submit-put vs close/death transition: once _closed or
        # _exc is observed under the lock, no new item can slip into the
        # queue after the final drain (a lock-free check-then-put would
        # leave such a request's Future hanging forever)
        self._lock = threading.Lock()
        self._example_shape = (None if example_shape is None
                               else tuple(example_shape))
        self._example_dtype = (None if example_dtype is None
                               else np.dtype(example_dtype))
        self.bucket_compiles: set = set()      # batch sizes seen (telemetry)
        # dispatched-but-unresolved buckets flow batcher -> resolver here;
        # admission is still bounded in examples by max_queue (_pending is
        # only decremented at resolution)
        self._resolve_q: queue.Queue = queue.Queue()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name='pretorched-serving-batcher')
        self._resolvers = [
            threading.Thread(target=self._resolve_loop, daemon=True,
                             name=f'pretorched-serving-resolver-{i}')
            for i in range(max(int(resolver_threads), 1))]
        self._thread.start()
        for r in self._resolvers:
            r.start()

    # ------------------------------------------------------------- client
    def submit(self, x) -> Future:
        """Enqueue one example (example_ndim) or a batch of them; returns a
        Future resolving to the corresponding output (leading axis dropped
        for single examples).

        When the server has a ``request_transform`` (e.g. the JPEG payload
        mode), it runs here — in the CALLER's thread, so expensive host work
        like JPEG decode parallelizes across client threads instead of
        serializing in the batcher."""
        if self._transform is not None:
            x = self._transform(x)
        x = np.asarray(x)
        single = self.example_ndim is not None and x.ndim == self.example_ndim
        if single:
            x = x[None]
        if x.shape[0] > self.max_batch:
            raise ValueError(f'batch {x.shape[0]} > max_batch '
                             f'{self.max_batch}; split the request')
        if x.shape[0] == 0:
            # a zero-row batch would blow up the batcher's pad-to-bucket
            # broadcast and kill the server for everyone — fail its caller
            raise ValueError('empty batch (0 examples)')
        with self._lock:
            if self._closed:
                raise RuntimeError('server is closed')
            if self._exc is not None:
                raise RuntimeError('server batcher died') from self._exc
            # validate against the served signature (pinned at construction
            # or defined by the first request) so ONE malformed request
            # fails here, at its caller — not inside the batcher's
            # np.concatenate, which would kill the server for everyone
            if self._example_shape is None:
                self._example_shape = x.shape[1:]
            if self._example_dtype is None:
                self._example_dtype = x.dtype
            if x.shape[1:] != self._example_shape or \
                    x.dtype != self._example_dtype:
                raise ValueError(
                    f'request shape/dtype {x.shape[1:]}/{x.dtype} does not '
                    f'match the served signature '
                    f'{self._example_shape}/{self._example_dtype}')
            if (self.max_queue is not None
                    and self._pending + x.shape[0] > self.max_queue):
                raise ServerOverloaded(
                    f'{self._pending} examples queued; admitting '
                    f'{x.shape[0]} more would exceed max_queue '
                    f'{self.max_queue}')
            self._pending += x.shape[0]
            fut: Future = Future()
            # the trailing [False] cell marks the request FINISHED (future
            # resolved + _pending decremented) — _finish flips it exactly
            # once no matter how many paths see the item
            self._q.put((x, single, fut, time.monotonic(), [False]))
        return fut

    def _dec_pending(self, k: int):
        with self._lock:
            self._pending -= k

    def _finish(self, item, *, result=None, exc=None):
        """Resolve one request EXACTLY ONCE: decrement the admission count
        and set the future, tolerating a client-side ``Future.cancel()``.
        The fin cell makes double-resolution impossible when a bucket dies
        halfway through ``_resolve`` and its items reappear in ``_die``'s
        in-flight sweep — that path used to double-decrement ``_pending``
        (loosening max_queue admission) and a cancelled future's
        ``set_result`` raising InvalidStateError inside a resolver used to
        kill the whole server (ADVICE r4)."""
        x, _, fut, _, fin = item
        if fin[0]:
            return
        fin[0] = True
        self._dec_pending(x.shape[0])
        try:
            if exc is not None:
                fut.set_exception(exc)
            else:
                fut.set_result(result)
        except Exception:   # InvalidStateError: the client cancel()ed a
            pass            # queued request; nothing is owed to it

    def __call__(self, x):
        """Synchronous convenience: submit + wait."""
        return self.submit(x).result()

    def close(self, timeout: float = 30.0):
        """Drain outstanding requests and stop the batcher thread."""
        with self._lock:
            first = not self._closed
            self._closed = True
        if first:
            self._q.put(None)                  # wake the batcher
        deadline = time.monotonic() + timeout
        for t in (self._thread, *self._resolvers):
            if t.is_alive():
                # join on EVERY call (not just the first): the documented
                # recovery for a drain timeout is calling close() again with
                # a larger timeout, which must actually wait again
                t.join(max(deadline - time.monotonic(), 0.001))
        if self._exc is not None:
            raise RuntimeError('server batcher died') from self._exc
        if self._thread.is_alive() or any(r.is_alive()
                                          for r in self._resolvers):
            raise RuntimeError(
                f'batcher did not drain within {timeout}s (a cold-bucket '
                f'compile can take that long on a slow backend); call '
                f'close(timeout=...) again with a larger timeout')

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------------ batcher
    def _expired(self, item) -> bool:
        """Fail a request that sat queued past request_timeout_ms."""
        if self._timeout is None:
            return False
        if time.monotonic() - item[3] <= self._timeout:
            return False
        self._finish(item, exc=TimeoutError(
            f'request expired after {self._timeout * 1000:.0f} ms in queue '
            f'(request_timeout_ms; the server is overloaded)'))
        return True

    def _take_batch(self):
        """Collect queued requests up to max_batch. Returns None on
        shutdown, or [] when it only expired stale requests and the queue
        drained — the loop must get a chance to resolve the in-flight
        bucket instead of blocking here while its futures wait."""
        while True:
            item = self._q.get()
            if item is None:
                return None
            if not self._expired(item):
                break
            if self._q.empty():
                return []
        items = [item]
        n = item[0].shape[0]
        t_end = time.monotonic() + self.max_wait
        while n < self.max_batch:
            try:
                timeout = t_end - time.monotonic()
                nxt = self._q.get(timeout=max(timeout, 0)) \
                    if timeout > 0 else self._q.get_nowait()
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)              # re-signal shutdown
                break
            if self._expired(nxt):
                continue
            if n + nxt[0].shape[0] > self.max_batch:
                # doesn't fit this bucket: run it in the next one
                self._q.put(nxt)
                break
            items.append(nxt)
            n += nxt[0].shape[0]
        return items

    def _loop(self):
        """Batcher: coalesce -> pad to bucket -> async dispatch. Never
        blocks on the device — readback is the resolver thread's job, so a
        request arriving mid-readback still gets batched immediately (the
        r3 p99 fix; see the module docstring)."""
        items = None                            # batch being dispatched
        try:
            while True:
                items = self._take_batch()
                if items is None:
                    break
                if not items:                   # only expired stale requests
                    continue
                if self._exc is not None:       # resolver died: fail fast
                    raise self._exc
                xs = np.concatenate([it[0] for it in items], axis=0)
                n = xs.shape[0]
                bucket = min(_next_pow2(n), self.max_batch)
                if bucket > n:                  # pad with the last row
                    pad = np.broadcast_to(xs[-1:],
                                          (bucket - n,) + xs.shape[1:])
                    xs = np.concatenate([xs, pad], axis=0)
                self.bucket_compiles.add(bucket)
                # async dispatch: the device queues the bucket; the resolver
                # blocks on its result while the next bucket is batched here
                out = self._fn(self._variables, jnp.asarray(xs))
                self._resolve_q.put((items, n, out))
                items = None
        except BaseException as e:              # propagate to clients
            self._die(e, list(items or []))
        finally:
            for _ in self._resolvers:           # each resolver drains what
                self._resolve_q.put(None)       # it holds, then stops

    def _resolve_loop(self):
        """Resolver: device_get a dispatched bucket and fan results out to
        the requests' futures. The pool runs several of these; buckets
        resolve independently (possibly out of dispatch order)."""
        entry = None
        try:
            while True:
                entry = self._resolve_q.get()
                if entry is None:
                    return
                self._resolve(*entry)
                entry = None
        except BaseException as e:              # execution errors land here
            self._die(e, list(entry[0]) if entry is not None else [])

    def _die(self, e: BaseException, in_flight: list):
        """Record the fatal error (new submits are rejected from here on)
        and fail every queued or dispatched request's future."""
        with self._lock:
            if self._exc is None:
                self._exc = e   # under the lock: no submit can now pass the
                #                 check and put after the drain below
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                in_flight.append(item)
        while True:
            try:
                entry = self._resolve_q.get_nowait()
            except queue.Empty:
                break
            if entry is not None:
                in_flight.extend(entry[0])
        for item in in_flight:
            self._finish(item, exc=self._exc)

    @staticmethod
    def _split_outputs(out, start, stop):
        return jax.tree_util.tree_map(lambda o: o[start:stop], out)

    def _resolve(self, items, n, out):
        out = jax.device_get(self._split_outputs(out, 0, n))
        off = 0
        for item in items:
            x, single = item[0], item[1]
            k = x.shape[0]
            piece = self._split_outputs(out, off, off + k)
            if single:
                piece = jax.tree_util.tree_map(lambda o: o[0], piece)
            self._finish(item, result=piece)
            off += k


def _fit_uint8(img: np.ndarray, shape) -> np.ndarray:
    """Host-side fit of a decoded image onto the pinned uint8 signature:
    short-side resize + center crop (PIL bilinear). No-op when the decode
    already matches — the hot path; the *real* (antialiased, settings-
    faithful) resize happens on device in ``transforms.fused``."""
    if img.shape == tuple(shape):
        return img
    from PIL import Image
    th, tw = shape[:2]
    h, w = img.shape[:2]
    s = max(th / h, tw / w)
    nh, nw = max(int(round(h * s)), th), max(int(round(w * s)), tw)
    arr = np.asarray(Image.fromarray(img).resize((nw, nh), Image.BILINEAR))
    top, left = (nh - th) // 2, (nw - tw) // 2
    return arr[top:top + th, left:left + tw]


def _jpeg_transform(decode_shape, threads: int):
    """request_transform decoding JPEG bytes (or a list of them) to uint8
    arrays on the pinned decode geometry, in the submitting thread.

    Uses the native libjpeg pool (datasets/native.py) with a batch-wide DCT
    ``scale_denom`` — the largest power-of-two downscale that keeps every
    image's short side at or above the pinned size, so oversized uploads
    never cost full-resolution host decode."""
    from .datasets.native import decode_jpeg_batch, jpeg_short_side
    target_short = min(decode_shape[:2])

    def transform(req):
        if isinstance(req, (bytes, bytearray, memoryview)):
            bufs, single = [bytes(req)], True
        elif (isinstance(req, (list, tuple)) and req
              and isinstance(req[0], (bytes, bytearray, memoryview))):
            bufs, single = [bytes(b) for b in req], False
        else:
            return req          # already decoded: flows down the uint8 path
        denom = 8
        for b in bufs:
            s = jpeg_short_side(b)
            if s is None:
                denom = 1
                break
            while denom > 1 and s // denom < target_short:
                denom //= 2
        imgs = decode_jpeg_batch(bufs, threads=threads, scale_denom=denom)
        arr = np.stack([_fit_uint8(im, decode_shape) for im in imgs])
        return arr[0] if single else arr

    return transform


def serve_model(model, *, mode: str = 'forward', max_batch: int = 64,
                max_wait_ms: float = 2.0, example_shape: Optional[tuple] = None,
                example_dtype=None, max_queue: Optional[int] = None,
                request_timeout_ms: Optional[float] = None,
                resolver_threads: int = 1, payload: str = 'tensor',
                decode_shape: Optional[tuple] = None,
                preprocess_dtype: str = 'float32',
                jpeg_threads: int = 4) -> InferenceServer:
    """InferenceServer over a zoo ``PretrainedModel`` (channels-last input).

    ``mode`` follows the module contract ('forward' | 'features' |
    'logits'). Pass ``example_shape`` (channels-last, e.g. ``(224,224,3)``,
    from ``model.input_size`` CHW metadata) in production so a malformed
    first request can never define the served signature; when omitted the
    first request defines it, which keeps fully-convolutional models
    servable at any resolution.

    ``payload`` picks the request wire format — the r4 loadtest proved any
    ingress-limited deployment is bound by request bytes, not server code
    (a 224px f32 image is 602 KB; the axon tunnel moved ~13 MB/s, so req/s
    == link/0.602 regardless of batching):

    * ``'tensor'`` — preprocessed float tensors, the classic path.
    * ``'uint8'`` — raw uint8 HWC images at ``decode_shape`` (default: the
      model's pre-crop resize size, e.g. 256px for 224px models at
      scale=0.875); the fused resize->crop->normalize chain
      (``transforms.fused``) runs ON DEVICE inside the served program.
      4x smaller requests than f32 at equal resolution.
    * ``'jpeg'`` — encoded JPEG bytes (one ``bytes`` or a list of them);
      decoded on the host by the native libjpeg pool in the SUBMITTING
      thread (parallel across clients), then the uint8 path. ~10-30x
      smaller requests for natural images.

    uint8/jpeg payloads pin the served signature to ``decode_shape``
    automatically. Video models (input_ndim=5) must pass ``decode_shape``
    explicitly, e.g. ``(16, 256, 256, 3)``. ``preprocess_dtype='bfloat16'``
    runs the device preprocess at half HBM traffic (pair with a bf16
    model)."""
    module = model.module
    # one example = the model's batched input rank minus the batch axis
    # (video models stamp input_ndim=5: B,T,H,W,C -> a clip is rank 4)
    example_ndim = (getattr(model, 'input_ndim', None) or 4) - 1
    request_transform = None

    if payload == 'tensor':
        def apply_fn(variables, x):
            return module.apply(variables, x, mode=mode)
    elif payload in ('uint8', 'jpeg'):
        from .transforms.fused import _fused, _settings_tuple
        src = model.settings if model.settings is not None else model
        if not (isinstance(src, dict) or hasattr(src, 'mean')):
            raise ValueError(
                'uint8/jpeg payloads need preprocessing settings; this '
                'model carries no mean/std metadata')
        spec = _settings_tuple(src)
        if decode_shape is None:
            if example_ndim != 3:
                raise ValueError(
                    'video models need an explicit decode_shape, e.g. '
                    '(frames, 256, 256, 3)')
            short = int(np.floor(max(spec[0]) / spec[5]))  # crop/scale
            decode_shape = (short, short, 3)
        # these payloads pin the served signature to decode_shape/uint8; a
        # conflicting explicit example_shape/example_dtype must fail HERE,
        # not be silently overwritten (the caller's preprocessed-tensor
        # traffic would otherwise be rejected at runtime)
        if example_shape is not None \
                and tuple(example_shape) != tuple(decode_shape):
            raise ValueError(
                f'payload={payload!r} pins the served signature to '
                f'decode_shape {tuple(decode_shape)}; got conflicting '
                f'example_shape {tuple(example_shape)} — pass decode_shape= '
                f'instead')
        if example_dtype is not None and np.dtype(example_dtype) != np.uint8:
            raise ValueError(
                f'payload={payload!r} serves uint8 requests; got '
                f'example_dtype {np.dtype(example_dtype)}')
        example_shape = tuple(decode_shape)
        example_dtype = np.uint8

        def apply_fn(variables, x_u8):
            x = x_u8
            if x.ndim == 5:     # video clips: preprocess per frame
                b, t = x.shape[:2]
                x = x.reshape((b * t,) + x.shape[2:])
            x = _fused(x, spec, dtype=preprocess_dtype)
            if x_u8.ndim == 5:
                x = x.reshape((b, t) + x.shape[1:])
            return module.apply(variables, x, mode=mode)

        if payload == 'jpeg':
            if example_ndim != 3:
                raise ValueError('jpeg payload serves single images only')
            request_transform = _jpeg_transform(decode_shape, jpeg_threads)
    else:
        raise ValueError(f"payload must be 'tensor'|'uint8'|'jpeg', "
                         f"got {payload!r}")

    return InferenceServer(apply_fn, model.variables, max_batch=max_batch,
                           max_wait_ms=max_wait_ms,
                           example_ndim=example_ndim,
                           example_shape=example_shape,
                           example_dtype=example_dtype,
                           max_queue=max_queue,
                           request_timeout_ms=request_timeout_ms,
                           resolver_threads=resolver_threads,
                           request_transform=request_transform)
