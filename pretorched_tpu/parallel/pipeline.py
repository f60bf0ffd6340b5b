"""Pipeline parallelism: a GPipe-style executor over a 'stage' mesh axis.

The reference scales with a single data-parallel construct
(``nn.DataParallel``, reference examples/imagenet_eval.py:136); everything
deeper is out of its scope.  This module adds the TPU-native pipeline axis
for the one place a conv zoo genuinely needs it: **very deep homogeneous
trunks** (resnet3d-152/200's 36-block layer3, nonlocal towers) whose
parameters or activations exceed one chip at long clips.

Design (idiomatic JAX, per the scaling-book recipe — not a port of any
torch pipeline engine):

* The trunk is L repetitions of one block function ``block_fn(params, x)``
  with identical activation shape in and out.  Per-block parameter trees are
  stacked on a leading axis (``stack_block_params``) and sharded over the
  mesh's 'stage' axis, so each of the S stage devices holds L/S blocks —
  this is what makes pp a *memory* axis: parameter and optimizer bytes per
  device drop S-fold.
* ``pipeline_apply`` runs inside ``shard_map``: the batch is split into M
  microbatches; a ``lax.scan`` over M+S-1 ticks shifts activations stage to
  stage with ``lax.ppermute`` (one ICI hop per tick), each device applying
  its local blocks (an inner scan) to the microbatch currently resident.
  Stage 0 injects fresh microbatches; the last stage's outputs are
  broadcast back with a masked ``psum``.  The pipeline bubble is the usual
  (S-1)/(M+S-1) — choose M >= 4*S to keep it under ~20%.
* Everything is differentiable (ppermute/scan have exact VJPs), so the same
  executor serves training; with BN trunks, freeze batch stats (the usual
  GPipe caveat: per-microbatch BN is not full-batch BN — see
  ``make_train_step(accum_steps=...)`` notes in parallel/train.py).

The 'data' axis composes on top: run ``pipeline_apply`` under a
('data', 'stage') mesh with the batch sharded on 'data' — each data shard
pipelines independently over its stage group (DP x PP).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_block_params(params_list: Sequence):
    """Stack L identically-shaped per-block param trees on a new leading
    axis -> one tree of (L, ...) leaves, ready to shard on 'stage'."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_list)


def stage_sharding(mesh: Mesh, stacked_params, axis: str = 'stage'):
    """NamedSharding pytree: leading (block) axis sharded over `axis`."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda _: sh, stacked_params)


def pipeline_apply(block_fn: Callable, stacked_params, x, mesh: Mesh,
                   *, n_micro: int, stage_axis: str = 'stage',
                   batch_axes: Sequence[str] = ()):
    """Apply L stacked blocks to ``x`` pipelined over the 'stage' mesh axis.

    Args:
      block_fn: ``(one_block_params, x_micro) -> x_micro`` — same shape out
        as in (homogeneous trunk).
      stacked_params: pytree with leading axis L (see ``stack_block_params``),
        L divisible by the stage-axis size. Shard it with ``stage_sharding``
        (replicated input also works — shard_map slices it — but then pp
        saves no memory).
      x: (B, ...) batch; B divisible by ``n_micro`` (and by the 'data' axis
        size if ``batch_axes`` names one).
      n_micro: number of microbatches M. Bubble fraction = (S-1)/(M+S-1).
      batch_axes: mesh axes the batch dim is sharded over (DP composition).

    Returns (B, ...) outputs, numerically identical to applying the L blocks
    sequentially (scan order = stacking order).
    """
    S = mesh.shape[stage_axis]
    dp = 1
    for a in batch_axes:
        dp *= mesh.shape[a]
    assert x.shape[0] % (dp * n_micro) == 0, (
        f'batch {x.shape[0]} must divide by data shards ({dp}) x '
        f'microbatches ({n_micro})')

    def staged(params_local, x_local):
        # params_local: (L/S, ...) this stage's blocks; x_local: full batch
        # for this data shard.
        stage = lax.axis_index(stage_axis)
        micro = x_local.shape[0] // n_micro
        xs = x_local.reshape((n_micro, micro) + x_local.shape[1:])
        # pad the microbatch stream with S-1 dummy ticks to drain the pipe
        pad = jnp.zeros((S - 1,) + xs.shape[1:], xs.dtype)
        stream = jnp.concatenate([xs, pad], axis=0) if S > 1 else xs

        fwd = [(i, i + 1) for i in range(S - 1)]  # non-wrapping shift

        def local_blocks(h):
            def body(h, p):
                return block_fn(p, h), None
            h, _ = lax.scan(body, h, params_local)
            return h

        def tick(state, mb):
            inp = lax.ppermute(state, stage_axis, fwd) if S > 1 else state
            inp = jnp.where(stage == 0, mb, inp)
            out = local_blocks(inp)
            return out, out

        state0 = jnp.zeros(xs.shape[1:], xs.dtype)
        _, ys = lax.scan(tick, state0, stream)
        # microbatch j exits the last stage at tick S-1+j
        ys = ys[S - 1:]
        # broadcast the last stage's outputs to every stage device so the
        # shard_map output is well-defined replicated-over-'stage'.
        # jnp.where (not multiply-by-mask): warm-up/drain ticks run blocks
        # on zero-filled activations, and a block that is non-finite on
        # zeros (norm-by-magnitude, -inf masking) must not leak NaN*0
        # into the psum.
        if S > 1:
            ys = lax.psum(jnp.where(stage == S - 1, ys,
                                    jnp.zeros_like(ys)), stage_axis)
        return ys.reshape(x_local.shape)

    bspec = P(tuple(batch_axes) if batch_axes else None)
    pspec = jax.tree_util.tree_map(lambda _: P(stage_axis), stacked_params)
    fn = jax.shard_map(staged, mesh=mesh, in_specs=(pspec, bspec),
                       out_specs=bspec, check_vma=False)
    return fn(stacked_params, x)


def pipeline_apply_stages(stage_fns: Sequence[Callable], stage_params, x,
                          mesh: Mesh, *, n_micro: int,
                          stage_axis: str = 'stage',
                          batch_axes: Sequence[str] = ()):
    """GPipe over S *heterogeneous* stages — e.g. a ResNet's four resolution
    stages, whose activation shapes and parameter trees all differ.

    ``stage_fns[i](stage_params[i], x_micro) -> y_micro`` is stage i's
    forward (any shapes; chained shapes are inferred with ``eval_shape``).
    Device s of the 'stage' axis executes stage s; activations travel
    stage-to-stage as flat buffers padded to the largest boundary (a
    ``lax.ppermute`` per tick, one ICI hop), and each device picks its
    computation with ``lax.switch`` on its stage index.

    Unlike ``pipeline_apply`` (homogeneous trunk, params sharded on
    'stage'), stage params here are replicated: with heterogeneous trees
    there is no stacked axis to shard. That is the right trade for conv
    zoos — a resnet3d50 is ~46M params but tens of GB of activations at
    video shapes, so pp is an *activation*-memory axis here; each device
    only materializes its own stage's intermediates.

    The 'data' axis composes underneath exactly as in ``pipeline_apply``:
    pass ``batch_axes=('data',)`` with the batch sharded on 'data'.

    Returns the last stage's outputs for the full batch, numerically
    identical to ``stage_fns`` composed sequentially.
    """
    import numpy as np

    S = mesh.shape[stage_axis]
    assert len(stage_fns) == S == len(stage_params), (len(stage_fns), S)
    dp = 1
    for a in batch_axes:
        dp *= mesh.shape[a]
    assert x.shape[0] % (dp * n_micro) == 0, (
        f'batch {x.shape[0]} must divide by data shards ({dp}) x '
        f'microbatches ({n_micro})')
    micro = x.shape[0] // (dp * n_micro)

    # boundary ShapeDtypeStructs, chained through the stages
    bounds = [jax.ShapeDtypeStruct((micro,) + x.shape[1:], x.dtype)]
    for fn, p in zip(stage_fns, stage_params):
        bounds.append(jax.eval_shape(fn, p, bounds[-1]))
    dtypes = {b.dtype for b in bounds}
    assert len(dtypes) == 1, f'stage boundaries must share a dtype: {dtypes}'
    sizes = [int(np.prod(b.shape)) for b in bounds]
    max_flat = max(sizes)

    def staged(params_all, x_local):
        stage = lax.axis_index(stage_axis)

        def branch(i):
            def run(buf):
                h = buf[:sizes[i]].reshape(bounds[i].shape)
                y = stage_fns[i](params_all[i], h)
                y = y.reshape(-1)
                return jnp.pad(y, (0, max_flat - sizes[i + 1]))
            return run

        branches = [branch(i) for i in range(S)]
        xs = x_local.reshape((n_micro, micro) + x_local.shape[1:])
        xs = xs.reshape(n_micro, -1)
        xs = jnp.pad(xs, ((0, S - 1), (0, max_flat - sizes[0])))

        fwd = [(i, i + 1) for i in range(S - 1)]

        def tick(state, mb):
            inp = lax.ppermute(state, stage_axis, fwd) if S > 1 else state
            inp = jnp.where(stage == 0, mb, inp)
            out = lax.switch(stage, branches, inp)
            return out, out

        state0 = jnp.zeros((max_flat,), x_local.dtype)
        _, ys = lax.scan(tick, state0, xs)
        ys = ys[S - 1:]                      # microbatch j exits at tick S-1+j
        if S > 1:
            # only the last stage holds real outputs (see pipeline_apply on
            # why jnp.where, not mask-multiply)
            ys = lax.psum(jnp.where(stage == S - 1, ys, jnp.zeros_like(ys)),
                          stage_axis)
        ys = ys[:, :sizes[-1]]
        return ys.reshape((n_micro * micro,) + bounds[-1].shape[1:])

    bspec = P(tuple(batch_axes) if batch_axes else None)
    pspec = jax.tree_util.tree_map(lambda _: P(), list(stage_params))
    fn = jax.shard_map(staged, mesh=mesh, in_specs=(pspec, bspec),
                       out_specs=bspec, check_vma=False)
    return fn(list(stage_params), x)


def sequential_apply(block_fn: Callable, stacked_params, x):
    """Oracle: the same L blocks applied as a plain sequential scan."""
    def body(h, p):
        return block_fn(p, h), None
    out, _ = lax.scan(body, x, stacked_params)
    return out
