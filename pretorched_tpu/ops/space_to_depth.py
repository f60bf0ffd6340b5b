"""Space-to-depth folding of spatial stride-2 stem convolutions.

The zoo's stems convolve 3-channel input — 3/128 of the MXU's contraction
lanes do useful work. Folding a 2x2 space-to-depth into the conv makes it a
stride-1 conv over 12 channels with a 4-tap kernel per folded dim: **exactly**
the same math (weights are re-indexed, not changed), ~4x better lane
utilization on the stem.

Derivation (per strided dim, kernel 7 / stride 2 / pad 3):
    y[h] = sum_{i=0..6} W[i] * xpad3[2h + i]
         = sum_{j=0..7} W'[j] * xpad4[2h + j]      with W'[0]=0, W'[j]=W[j-1]
         = sum_{b=0..3} sum_{r=0,1} W'[2b+r] * u[h+b, r]
where u[m, r] = xpad4[2m + r] is the space-to-depth view (left pad 4 = the
original 3 plus one zero tap for parity, right pad 2).

Applies to any odd kernel k with pad k//2 and stride 2.
"""

from __future__ import annotations

import jax.numpy as jnp


def space_to_depth_2d(x, lpad: int = 4, rpad: int = 2):
    """(..., H, W, C) -> (..., (H+lpad+rpad)/2, (W+lpad+rpad)/2, 4C).

    Channel order: (r_h, r_w, c)."""
    pad = [(0, 0)] * (x.ndim - 3) + [(lpad, rpad), (lpad, rpad), (0, 0)]
    x = jnp.pad(x, pad)
    *lead, h, w, c = x.shape
    x = x.reshape(*lead, h // 2, 2, w // 2, 2, c)
    x = jnp.moveaxis(x, -4, -3)          # (..., h/2, w/2, 2, 2, c)
    return x.reshape(*lead, h // 2, w // 2, 4 * c)


def fold_stem_kernel_2d(kernel):
    """(kh, kw, C, O) stride-2 kernel -> (kh//2+1, kw//2+1, 4C, O) stride-1
    kernel matching ``space_to_depth_2d`` channel order. kh, kw odd."""
    kh, kw, c, o = kernel.shape
    wp = jnp.pad(kernel, [(1, (kh + 1) % 2), (1, (kw + 1) % 2), (0, 0), (0, 0)])
    nh, nw = wp.shape[0] // 2, wp.shape[1] // 2
    wp = wp.reshape(nh, 2, nw, 2, c, o)
    wp = jnp.moveaxis(wp, 1, 2)          # (nh, nw, 2, 2, c, o)
    return wp.reshape(nh, nw, 4 * c, o)


def fold_stem_kernel_3d(kernel):
    """(kt, kh, kw, C, O) kernel with stride (1, 2, 2) -> stride-1 kernel
    (kt, kh//2+1, kw//2+1, 4C, O); time dim untouched."""
    kt = kernel.shape[0]
    folded = [fold_stem_kernel_2d(kernel[t]) for t in range(kt)]
    return jnp.stack(folded, axis=0)
