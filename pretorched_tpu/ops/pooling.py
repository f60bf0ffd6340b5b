"""Pooling ops with PyTorch-exact semantics, on channels-last layouts.

The reference model zoo leans on subtle PyTorch pooling behavior that XLA's
stock reductions do not reproduce out of the box:

* ``ceil_mode`` max/avg pooling (reference: senet.py:279-282, bninception.py) —
  including the rule that a pooling window is dropped if it would *start* in
  the right padding region.
* ``count_include_pad`` semantics for average pooling (reference: dpn.py,
  polynet.py, nasnet.py) — explicit zero-padding counts toward the divisor,
  but implicit ceil-mode padding never does.
* adaptive pooling with PyTorch's floor/ceil window split
  (reference: dpn.py:407-428 ``adaptive_avgmax_pool2d``).

Everything here takes channels-last input — ``(N, H, W, C)`` for 2D or
``(N, T, H, W, C)`` for 3D — the TPU-preferred layout, and works for any
number of spatial dims. All shape logic is static Python so XLA sees fixed
shapes and fuses the (constant) divisor math away.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    'max_pool', 'avg_pool',
    'max_pool2d', 'avg_pool2d', 'max_pool3d', 'avg_pool3d',
    'adaptive_avg_pool', 'adaptive_max_pool',
    'adaptive_avg_pool2d', 'adaptive_max_pool2d', 'adaptive_avg_pool3d',
    'adaptive_avgmax_pool2d', 'global_avg_pool',
]


def _tuplify(v, n: int):
    if isinstance(v, (tuple, list)):
        if len(v) != n:
            raise ValueError(f'expected {n} values, got {v}')
        return tuple(int(x) for x in v)
    return (int(v),) * n


def _pool_out_size(size: int, k: int, s: int, p: int, ceil_mode: bool) -> int:
    """PyTorch pooling output-size formula (incl. the start-in-padding rule)."""
    if ceil_mode:
        out = math.ceil((size + 2 * p - k) / s) + 1
        # torch drops the last window if it starts inside the right padding
        if (out - 1) * s >= size + p:
            out -= 1
    else:
        out = math.floor((size + 2 * p - k) / s) + 1
    return out


def _window_plan(spatial: Sequence[int], kernel, stride, padding, ceil_mode):
    """Per-dim (out, pad_lo, pad_hi, k, s, p) so reduce_window yields exactly
    torch's output count. pad_hi may differ from p due to ceil_mode."""
    n = len(spatial)
    ks = _tuplify(kernel, n)
    ss = _tuplify(stride if stride is not None else kernel, n)
    ps = _tuplify(padding, n)
    plan = []
    for size, k, s, p in zip(spatial, ks, ss, ps):
        out = _pool_out_size(size, k, s, p, ceil_mode)
        pad_hi = (out - 1) * s + k - size - p  # exact cover; may be <0 or >p
        plan.append((out, p, pad_hi, k, s, p))
    return plan


def _reduce_window(x, plan, init, op):
    """reduce_window over the spatial dims (all but first and last axis)."""
    ndim = x.ndim
    window = [1] + [pl[3] for pl in plan] + [1]
    strides = [1] + [pl[4] for pl in plan] + [1]
    padding = [(0, 0)] + [(pl[1], pl[2]) for pl in plan] + [(0, 0)]
    # lax.reduce_window supports negative (truncating) padding.
    return lax.reduce_window(x, init, op, window, strides, padding)


def max_pool(x, kernel, stride=None, padding=0, ceil_mode: bool = False):
    """Channels-last N-d max pool matching ``torch.nn.functional.max_poolNd``."""
    plan = _window_plan(x.shape[1:-1], kernel, stride, padding, ceil_mode)
    # scalar -inf init so jax specializes to the differentiable
    # reduce_window_max primitive
    neg = -np.inf if jnp.issubdtype(x.dtype, jnp.floating) else np.iinfo(
        np.dtype(x.dtype)).min
    return _reduce_window(x, plan, neg, lax.max)


def avg_pool(x, kernel, stride=None, padding=0, ceil_mode: bool = False,
             count_include_pad: bool = True):
    """Channels-last N-d average pool matching ``torch.nn.functional.avg_poolNd``.

    ``count_include_pad=True`` counts explicit zero padding toward the divisor
    but never the implicit padding ceil_mode adds (torch semantics).
    """
    plan = _window_plan(x.shape[1:-1], kernel, stride, padding, ceil_mode)
    sums = _reduce_window(x.astype(jnp.float32), plan, 0.0, lax.add)
    # Static per-dim divisor counts, outer-multiplied and broadcast.
    div = np.ones([pl[0] for pl in plan], np.float32)
    for axis, (out, pad_lo, _pad_hi, k, s, p) in enumerate(plan):
        size = x.shape[1 + axis]
        idx = np.arange(out)
        start = idx * s
        if count_include_pad:
            cnt = np.minimum(start + k, size + 2 * p) - start
        else:
            cnt = np.minimum(start + k, pad_lo + size) - np.maximum(start, pad_lo)
        cnt = np.maximum(cnt, 1).astype(np.float32)
        shape = [1] * len(plan)
        shape[axis] = out
        div = div * cnt.reshape(shape)
    out = sums / jnp.asarray(div)[None, ..., None]
    return out.astype(x.dtype)


max_pool2d = max_pool
avg_pool2d = avg_pool
max_pool3d = max_pool
avg_pool3d = avg_pool


def _adaptive_bounds(size: int, out: int):
    starts = [(i * size) // out for i in range(out)]
    ends = [-(-((i + 1) * size) // out) for i in range(out)]  # ceil div
    return starts, ends


def adaptive_avg_pool(x, output_size):
    """Channels-last adaptive average pool (torch floor/ceil window split).

    Implemented as one small constant matmul per spatial dim — MXU-friendly
    and exact (reference behavior: ``nn.AdaptiveAvgPool2d``).
    """
    spatial = x.shape[1:-1]
    outs = _tuplify(output_size, len(spatial))
    xf = x.astype(jnp.float32)
    for axis, (size, out) in enumerate(zip(spatial, outs)):
        starts, ends = _adaptive_bounds(size, out)
        m = np.zeros((out, size), np.float32)
        for i, (s0, e0) in enumerate(zip(starts, ends)):
            m[i, s0:e0] = 1.0 / (e0 - s0)
        # 'highest' precision: this tiny constant matmul must be exact even on
        # TPU (default matmul precision there is bf16).
        xf = jnp.tensordot(jnp.asarray(m), xf, axes=[[1], [1 + axis]],
                           precision=jax.lax.Precision.HIGHEST)
        xf = jnp.moveaxis(xf, 0, 1 + axis)
    return xf.astype(x.dtype)


def adaptive_max_pool(x, output_size):
    """Channels-last adaptive max pool (static unrolled slices)."""
    spatial = x.shape[1:-1]
    outs = _tuplify(output_size, len(spatial))
    for axis, (size, out) in enumerate(zip(spatial, outs)):
        starts, ends = _adaptive_bounds(size, out)
        slices = [
            jnp.max(lax.slice_in_dim(x, s0, e0, axis=1 + axis), axis=1 + axis)
            for s0, e0 in zip(starts, ends)
        ]
        x = jnp.stack(slices, axis=1 + axis)
    return x


adaptive_avg_pool2d = adaptive_avg_pool
adaptive_max_pool2d = adaptive_max_pool
adaptive_avg_pool3d = adaptive_avg_pool


def adaptive_avgmax_pool2d(x, pool_type: str = 'avg', output_size=1):
    """DPN-style combined pooling (reference: dpn.py:407-428).

    ``avg`` | ``max`` | ``avgmax`` (mean of both) | ``avgmaxc`` (channel concat).
    """
    if pool_type == 'avgmaxc':
        return jnp.concatenate([
            adaptive_avg_pool(x, output_size), adaptive_max_pool(x, output_size)
        ], axis=-1)
    if pool_type == 'avgmax':
        return 0.5 * (adaptive_avg_pool(x, output_size).astype(jnp.float32)
                      + adaptive_max_pool(x, output_size).astype(jnp.float32)
                      ).astype(x.dtype)
    if pool_type == 'max':
        return adaptive_max_pool(x, output_size)
    return adaptive_avg_pool(x, output_size)


def global_avg_pool(x, keepdims: bool = False):
    """Mean over all spatial dims of a channels-last tensor."""
    axes = tuple(range(1, x.ndim - 1))
    return jnp.mean(x, axis=axes, keepdims=keepdims)
