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


# ---------------------------------------------------------------------------
# Fold-4: space-to-depth 4x4 on the input with the output computed in
# space-to-depth 2x2 (parity) layout. For a stride-2 conv with few output
# channels (SlowFast's fast stem: O=8), fold-2 leaves 8/128 MXU output lanes
# busy; fold-4 packs the 2x2 output parities into channels (4*O lanes) at the
# cost of ~2.25x zero-tap FLOPs. Measured on a v5e (tools/stem_probe.py,
# b128 T32 224px): fold-2 stem+pool 39.3 ms -> fold-4 31.5 ms, and 29ish with
# the pool applied directly in the folded layout. Exactly the same math:
# weights are re-indexed, never changed.
#
# Derivation (per strided dim, kernel k=7 / stride 2 / pad 3):
#   y[h] = sum_{j=0..7} W'[j] xp[2h + j - 4]   with W'[0]=0, W'[j]=W[j-1]
# Split h = 2m + p (p = output parity) and the input into 4-cells
# u[q, r] = x[4q + r - 4] (pads (4, 4)):
#   y[2m+p] = sum_{c=0..2} sum_{r=0..3} K[c, r, p] u[m + c, r]
# with K[c, r, p] = W'[4c + r - 2p] where the index is in [0, 8), else 0 —
# a VALID stride-1 conv over cells with 3 taps, 16C input channels and
# (2, 2, O) output channels.
# ---------------------------------------------------------------------------


def space_to_depth_4(x):
    """(..., H, W, C) -> (..., (H+8)/4, (W+8)/4, 16C), pads (4, 4).

    Cell q holds x[4q + r - 4]; channel order (r_h, r_w, c). H, W % 4 == 0."""
    h, w = x.shape[-3], x.shape[-2]
    assert h % 4 == 0 and w % 4 == 0, (h, w)
    pad = [(0, 0)] * (x.ndim - 3) + [(4, 4), (4, 4), (0, 0)]
    x = jnp.pad(x, pad)
    *lead, hh, ww, c = x.shape
    x = x.reshape(*lead, hh // 4, 4, ww // 4, 4, c)
    x = jnp.moveaxis(x, -4, -3)
    return x.reshape(*lead, hh // 4, ww // 4, 16 * c)


def _fold4_kernel_1d(wp, cells=3):
    """(k+1 padded taps, ...) -> (cells, 4, 2, ...) per-dim fold-4 kernel.

    wp is W' (left-padded by one zero tap). K[c, r, p] = wp[4c + r - 2p]
    where the index is in range, else 0. Traceable."""
    kp = wp.shape[0]
    zero = jnp.zeros_like(wp[0])
    rows = []
    for c in range(cells):
        for r in range(4):
            for p in range(2):
                j = 4 * c + r - 2 * p
                rows.append(wp[j] if 0 <= j < kp else zero)
    return jnp.stack(rows).reshape((cells, 4, 2) + wp.shape[1:])


def fold4_stem_kernel_3d(kernel):
    """(kt, 7, 7, C, O) stride-(1,2,2) kernel -> (kt, 3, 3, 16C, 4O)
    stride-1 fold-4 kernel. Input channel order (r_h, r_w, c); output
    channel order (p_h, p_w, o)."""
    kt, kh, kw, c, o = kernel.shape
    assert kh == kw == 7, (kh, kw)
    w = jnp.pad(kernel, [(0, 0), (1, 0), (1, 0), (0, 0), (0, 0)])
    w = jnp.moveaxis(w, 1, 0)                  # (8h, kt, 8w, c, o)
    w = _fold4_kernel_1d(w)                    # (3ch, 4rh, 2ph, kt, 8w, c, o)
    w = jnp.moveaxis(w, 4, 0)                  # (8w, 3ch, 4rh, 2ph, kt, c, o)
    w = _fold4_kernel_1d(w)                    # (3cw, 4rw, 2pw, 3ch, 4rh, 2ph, kt, c, o)
    # -> (kt, ch, cw, (rh, rw, c), (ph, pw, o))
    w = jnp.transpose(w, (6, 3, 0, 4, 1, 7, 5, 2, 8))
    kt_, ch_, cw_, rh_, rw_, c_, ph_, pw_, o_ = w.shape
    return w.reshape(kt_, ch_, cw_, rh_ * rw_ * c_, ph_ * pw_ * o_)


# ---------------------------------------------------------------------------
# Mixed fold 2x4: H folded 2 (output natural), W folded 4 (output parity-
# packed). The headline resnet3d50 stem has O=64 output channels — half the
# MXU's 128 lanes at fold-2; full fold-4 doubles lanes 4x but pays 2.25x
# zero-tap FLOPs (measured loss on 64-ch stems, tools/stem_probe). Mixed
# fold packs parities along W only: exactly 2*64 = 128 output lanes for
# 1.5x fold-2 FLOPs (48 HWCO vs 32 HWCO vs plain 24.5). Exact math, same
# derivations as fold-2 (H dim) and fold-4 (W dim) above.
#
# MEASURED NEGATIVE (tools/stem64_probe.py, v5e, b128 T16 224px bf16 O=64):
# fold2 stem+bn+relu+pool 48.7 ms vs fold24 53.7 vs plain 49.8 vs fold4
# 80.2. The 64-ch stem is HBM-bound (roofline: stem+layer1 47% of HBM
# roofline), so the extra zero-tap FLOPs cost more than the doubled output
# lanes gain. Third negative fold result — fold stays 2 for 64-ch stems and
# 4 only for SlowFast's 8-ch fast stem. Kept: exact, tested, and the probe
# documents the lane-vs-bytes tradeoff for future narrow-stem archs.
# ---------------------------------------------------------------------------


def space_to_depth_2x4(x):
    """(..., H, W, C) -> (..., (H+6)/2, (W+8)/4, 8C).

    H cells of 2 (pads 4, 2: u[q, r] = x[2q + r - 4]), W cells of 4
    (pads 4, 4: u[q, r] = x[4q + r - 4]); channel order (r_h, r_w, c).
    Requires H % 2 == 0 and W % 4 == 0."""
    h, w = x.shape[-3], x.shape[-2]
    assert h % 2 == 0 and w % 4 == 0, (h, w)
    pad = [(0, 0)] * (x.ndim - 3) + [(4, 2), (4, 4), (0, 0)]
    x = jnp.pad(x, pad)
    *lead, hh, ww, c = x.shape
    x = x.reshape(*lead, hh // 2, 2, ww // 4, 4, c)
    x = jnp.moveaxis(x, -4, -3)
    return x.reshape(*lead, hh // 2, ww // 4, 8 * c)


def _fold2_kernel_1d(wp, cells=4):
    """(k+1 padded taps, ...) -> (cells, 2, ...) per-dim fold-2 kernel.

    wp is W' (left-padded by one zero tap). K[c, r] = wp[2c + r]."""
    return wp[:2 * cells].reshape((cells, 2) + wp.shape[1:])


def fold2x4_stem_kernel_3d(kernel):
    """(kt, 7, 7, C, O) stride-(1,2,2) kernel -> (kt, 4, 3, 8C, 2O)
    stride-1 mixed-fold kernel. Input channel order (r_h, r_w, c) matching
    ``space_to_depth_2x4``; output channel order (p_w, o)."""
    kt, kh, kw, c, o = kernel.shape
    assert kh == kw == 7, (kh, kw)
    w = jnp.pad(kernel, [(0, 0), (1, 0), (1, 0), (0, 0), (0, 0)])
    w = jnp.moveaxis(w, 1, 0)                  # (8h, kt, 8w, c, o)
    w = _fold2_kernel_1d(w)                    # (4ch, 2rh, kt, 8w, c, o)
    w = jnp.moveaxis(w, 3, 0)                  # (8w, 4ch, 2rh, kt, c, o)
    w = _fold4_kernel_1d(w)                    # (3cw, 4rw, 2pw, 4ch, 2rh, kt, c, o)
    # -> (kt, ch, cw, (rh, rw, c), (pw, o))
    w = jnp.transpose(w, (5, 3, 0, 4, 1, 6, 2, 7))
    kt_, ch_, cw_, rh_, rw_, c_, pw_, o_ = w.shape
    return w.reshape(kt_, ch_, cw_, rh_ * rw_ * c_, pw_ * o_)


def depth_to_space_w2(y):
    """(b, t, H, Wc, 2pw, O) W-parity-folded map -> (b, t, H, 2Wc, O)."""
    bb, tt, hh, ww, _, o = y.shape
    return y.reshape(bb, tt, hh, ww * 2, o)


def depth_to_space_2(y):
    """(b, t, Hc, Wc, 2ph, 2pw, O) parity-folded map -> (b, t, 2Hc, 2Wc, O)."""
    bb, tt, hh, ww, _, _, o = y.shape
    y = jnp.transpose(y, (0, 1, 2, 4, 3, 5, 6))   # (..., hh, ph, ww, pw, o)
    return y.reshape(bb, tt, hh * 2, ww * 2, o)


def folded_max_pool_3s2(z):
    """(1,3,3) / stride (1,2,2) / pad (0,1,1) max pool on a parity-folded map.

    z: (b, t, Ho, Wo, 2ph, 2pw, C) with natural x[2m+p] == z[..., m, p, ...].
    Per dim: y[h'] = max(u[h'-1, 1], u[h', 0], u[h', 1]) (h'=-1 is the -inf
    pad), so the pool's stride-2 aligns exactly with the output parities and
    no depth-to-space is needed. Output: (b, t, Ho, Wo, C) natural layout."""
    neg = jnp.asarray(-jnp.inf, z.dtype)
    a, b = z[..., 0, :, :], z[..., 1, :, :]       # fold h
    b_up = jnp.concatenate(
        [jnp.full_like(b[:, :, :1], neg), b[:, :, :-1]], axis=2)
    m = jnp.maximum(jnp.maximum(a, b), b_up)
    a, b = m[..., 0, :], m[..., 1, :]             # fold w
    b_left = jnp.concatenate(
        [jnp.full_like(b[:, :, :, :1], neg), b[:, :, :, :-1]], axis=3)
    return jnp.maximum(jnp.maximum(a, b), b_left)
