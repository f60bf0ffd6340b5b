"""Local response normalization across channels (channels-last).

Reference: pretorched/models/vggm.py:24-50 ``SpatialCrossMapLRN`` — the Caffe
ACROSS_CHANNELS variant implemented there as an AvgPool3d over the channel
axis: div = (avg_{window}(x^2) * alpha + k)^beta; y = x / div. The average
divides by the full window size (count_include_pad), which we reproduce.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def spatial_cross_map_lrn(x, local_size: int = 5, alpha: float = 1e-4,
                          beta: float = 0.75, k: float = 2.0):
    """x: (..., C) channels-last."""
    pad = (local_size - 1) // 2
    sq = jnp.square(x.astype(jnp.float32))
    window = [1] * (x.ndim - 1) + [local_size]
    strides = [1] * x.ndim
    padding = [(0, 0)] * (x.ndim - 1) + [(pad, local_size - 1 - pad)]
    sums = lax.reduce_window(sq, 0.0, lax.add, window, strides, padding)
    div = (sums / local_size * alpha + k) ** beta
    return (x / div.astype(x.dtype)).astype(x.dtype)
