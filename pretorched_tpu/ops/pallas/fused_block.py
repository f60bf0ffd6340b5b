"""Fused bottleneck-tail Pallas kernel for narrow-channel (C<=64) pathways.

**Measured verdict (r5, v5e, full-graph per the r3 rule): NEGATIVE — kept
in-tree as evidence.** The kernel is exact (on-chip maxdiff 0.0 vs the XLA
oracle) and moves 2-3x fewer HBM bytes than XLA's per-conv schedule, but
its runtime is 4-15x its own bytes-roofline: on a 128-lane machine a
channels-last C=8 buffer is LANE-PADDED 16x in VMEM, so every VPU pass
(padding, affine, relu, residual add) runs at 1/16 throughput, and the
padded footprint caps the grid tile at tt=1 (4096 pipeline steps/block).
SlowFast fast pathway b128 T32 224px: fusing res2 costs +33 ms/block vs
XLA's ~5 (16x pad), res3 +22 (8x), res4 +10 vs ~1.7 (4x) — the loss halves
exactly as the padding halves, extrapolating to a still-3x loss at the 2x
padding of C=64. Escaping the padding requires either channels-in-sublanes
transposes (2 extra HBM passes per tensor — more than the fusion saves) or
FLOP-inflating folded layouts (the r4 fold studies measured those negative
in XLA for the same reason). Conclusion in ROUND_NOTES r5: the fast
pathway's 51-72%-of-roofline at perfect-fusion bytes is the hardware
ceiling for C<=32 channels-last blocks, not a missing kernel.

Why this was built (r4 roofline, ROUND_NOTES "Roofline decompositions"):
SlowFast's fast pathway runs at 4-15% MFU, HBM-bound at 51-72% of a
*perfect-fusion-bytes* roofline — the residual gap is per-conv HBM write+read
of block intermediates, which no XLA schedule removes because conv outputs
always materialize. At C<=32 every operand of a whole residual block fits in
VMEM, so one Pallas kernel can run

    y2 = relu(bn2(conv2_3x3(y1)))          # spatial 3x3, stride 1
    y3 = bn3(conv3_1x1(y2))
    out = relu(y3 + residual(x))           # identity or 1x1 projection

keeping y2/y3 entirely on-chip: HBM traffic drops from
``2|y1|+2|y2|+2|y3|+|x|+|out|`` to ``|y1|+|x|+|out|`` for the tail.

Deliberate scope (shaped by measurement, not convenience):

* **conv1 stays in XLA.** The fast pathway's conv1 is temporal (3,1,1)
  (reference slowfast.py:62-68); fusing it would need T-halo exchanges
  between grid steps. Leaving it out keeps the kernel halo-free — conv2 is
  (1,3,3) with NO temporal extent, so the grid tiles the fused B*T axis
  with full spatial planes per step — and y1 is the *smallest* tensor in
  the block (C_mid channels), so its one round trip is the cheapest.
* **Stride-1 blocks only** (13 of the fast pathway's 16; the four stride-2
  stage entries keep XLA's conv). Projection shortcuts are supported at
  stride 1 (res2.0's 8->32).
* **Eval only**: BatchNorm is folded to per-channel scale/bias
  (``fold_bn``); training keeps the plain autodiff path.

BN folding: bn(x) = (x - mean) / sqrt(var+eps) * gamma + beta
          == x * s + b,  s = gamma/sqrt(var+eps), b = beta - mean*s.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn(scale, bias, mean, var, eps: float = 1e-5):
    """Per-channel (s, b) such that bn(x) == x*s + b (eval mode)."""
    s = scale / jnp.sqrt(var + eps)
    return s, bias - mean * s


def _kernel(y1_ref, xr_ref, w2_ref, a2_ref, w3_ref, a3_ref, out_ref,
            *, proj: bool, wp_ref=None, ap_ref=None):
    """One (Tt, H, W, *) tile: conv2(3x3 s1 p1) -> affine -> relu ->
    conv3(1x1) -> affine -> +residual -> relu. f32 accumulation on the MXU,
    bf16 (input dtype) operands."""
    tt, h, w, cm = y1_ref.shape
    cout = out_ref.shape[-1]
    y1 = y1_ref[...]
    # zero-pad H and W by 1 (conv2 padding=1); concatenation keeps
    # everything VMEM-resident
    zh = jnp.zeros((tt, 1, w, cm), y1.dtype)
    y1p = jnp.concatenate([zh, y1, zh], axis=1)
    zw = jnp.zeros((tt, h + 2, 1, cm), y1.dtype)
    y1p = jnp.concatenate([zw, y1p, zw], axis=2)

    acc = jnp.zeros((tt * h * w, cm), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = y1p[:, dy:dy + h, dx:dx + w, :].reshape(tt * h * w, cm)
            acc += jnp.dot(tap, w2_ref[dy, dx],
                           preferred_element_type=jnp.float32)
    a2 = a2_ref[...].astype(jnp.float32)
    y2 = jnp.maximum(acc * a2[0] + a2[1], 0.0).astype(y1.dtype)

    y3 = jnp.dot(y2, w3_ref[...], preferred_element_type=jnp.float32)
    a3 = a3_ref[...].astype(jnp.float32)
    y3 = y3 * a3[0] + a3[1]

    xr = xr_ref[...].reshape(tt * h * w, -1)
    if proj:
        res = jnp.dot(xr, wp_ref[...], preferred_element_type=jnp.float32)
        ap = ap_ref[...].astype(jnp.float32)
        res = res * ap[0] + ap[1]
    else:
        res = xr.astype(jnp.float32)
    out = jnp.maximum(y3 + res, 0.0)
    out_ref[...] = out.reshape(tt, h, w, cout).astype(out_ref.dtype)


def _pick_tile(bt: int, h: int, w: int, cm: int, cout: int,
               itemsize: int = 2, budget: int = 8 * 2 ** 20) -> int:
    """Largest Tt dividing bt whose tile working set fits ``budget`` bytes.

    VMEM stores the trailing dim in 128-wide lanes, so a C<32 channel dim
    is LANE-PADDED — a (..., 8) bf16 buffer occupies 16x its real bytes.
    The budget must be computed on padded footprints (measured the hard
    way: the real-bytes estimate compiled a 30 MB stack at C_mid=8 and the
    Mosaic scoped-vmem allocator rejected it). Counted per t-row: ~4 live
    C_mid-wide buffers (y1, padded y1, tap view, y2) at itemsize + the f32
    conv2 accumulator, and ~3 C_out-wide (x_res, y3 f32, out)."""
    lane = 128
    pm, po = max(cm, lane), max(cout, lane)
    per_t = h * w * (pm * (4 * itemsize + 4) + po * (2 * itemsize + 8))
    best = 1
    for tt in range(1, bt + 1):
        if bt % tt == 0 and tt * per_t <= budget:
            best = tt
    return best


@functools.partial(
    jax.jit, static_argnames=('interpret', 'tile_t'))
def fused_bottleneck_tail(y1, x_res, w2, a2, w3, a3,
                          wp: Optional[jax.Array] = None,
                          ap: Optional[jax.Array] = None,
                          interpret: bool = False,
                          tile_t: Optional[int] = None):
    """Fused eval-mode bottleneck tail.

    Args:
      y1:    (B, T, H, W, Cm)  output of relu(bn1(conv1(x))).
      x_res: (B, T, H, W, Cin) block input (residual branch).
      w2:    (3, 3, Cm, Cm)    conv2 spatial kernel (stride 1, padding 1).
      a2:    (2, Cm)           folded bn2 [scale; bias] (``fold_bn``).
      w3:    (Cm, Cout)        conv3 pointwise kernel.
      a3:    (2, Cout)         folded bn3.
      wp/ap: optional (Cin, Cout) / (2, Cout) projection shortcut (+ folded
             bn); when absent Cin must equal Cout (identity residual).
    Returns (B, T, H, W, Cout) = relu(bn3(conv3(relu(bn2(conv2(y1))))) + res).
    """
    b, t, h, w, cm = y1.shape
    cin = x_res.shape[-1]
    cout = w3.shape[-1]
    proj = wp is not None
    if not proj:
        assert cin == cout, (cin, cout)
    bt = b * t
    y1f = y1.reshape(bt, h, w, cm)
    xrf = x_res.reshape(bt, h, w, cin)
    tt = tile_t or _pick_tile(bt, h, w, cm, cout, y1.dtype.itemsize)
    grid = (bt // tt,)

    def tile_map(i):
        return (i, 0, 0, 0)

    def full(_):
        return (0, 0)

    in_specs = [
        pl.BlockSpec((tt, h, w, cm), tile_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((tt, h, w, cin), tile_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3, cm, cm), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, cm), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((cm, cout), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((2, cout), full, memory_space=pltpu.VMEM),
    ]
    args = [y1f, xrf, w2.astype(y1.dtype), a2, w3.astype(y1.dtype), a3]
    if proj:
        in_specs += [pl.BlockSpec((cin, cout), full, memory_space=pltpu.VMEM),
                     pl.BlockSpec((2, cout), full, memory_space=pltpu.VMEM)]
        args += [wp.astype(y1.dtype), ap]
        kern = functools.partial(
            _kernel, proj=True)

        def kernel(y1r, xrr, w2r, a2r, w3r, a3r, wpr, apr, outr):
            kern(y1r, xrr, w2r, a2r, w3r, a3r, outr, wp_ref=wpr, ap_ref=apr)
    else:
        def kernel(y1r, xrr, w2r, a2r, w3r, a3r, outr):
            _kernel(y1r, xrr, w2r, a2r, w3r, a3r, outr, proj=False)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tt, h, w, cout), tile_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bt, h, w, cout), y1.dtype),
        # narrow-channel buffers are lane-padded (see _pick_tile); give the
        # Mosaic allocator most of the v5e's 128 MB instead of its 16 MB
        # default so the padded stack + pipeline double-buffers fit
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20) if not interpret else None,
        interpret=interpret,
    )(*args)
    return out.reshape(b, t, h, w, cout)


def fused_bottleneck_tail_reference(y1, x_res, w2, a2, w3, a3,
                                    wp=None, ap=None):
    """jnp oracle with identical semantics (XLA convs, f32 affine)."""
    b, t, h, w, cm = y1.shape
    y2 = jax.lax.conv_general_dilated(
        y1.reshape(b * t, h, w, cm), w2.astype(y1.dtype), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32)
    y2 = jnp.maximum(y2 * a2[0].astype(jnp.float32)
                     + a2[1].astype(jnp.float32), 0.0).astype(y1.dtype)
    y3 = jnp.dot(y2.reshape(-1, cm), w3.astype(y1.dtype),
                 preferred_element_type=jnp.float32)
    y3 = y3 * a3[0].astype(jnp.float32) + a3[1].astype(jnp.float32)
    xr = x_res.reshape(b * t * h * w, -1)
    if wp is not None:
        res = jnp.dot(xr, wp.astype(y1.dtype),
                      preferred_element_type=jnp.float32)
        res = res * ap[0].astype(jnp.float32) + ap[1].astype(jnp.float32)
    else:
        res = xr.astype(jnp.float32)
    out = jnp.maximum(y3 + res, 0.0)
    return out.reshape(b, t, h, w, -1).astype(y1.dtype)
