"""ZeRO-sharded optimizer state / FSDP-sharded params over the 'data' axis.

The reference's only multi-device construct replicates everything
(``nn.DataParallel``, examples/imagenet_eval.py:136) — every GPU holds a full
copy of params AND optimizer state. At production scale the replicated
momentum/Adam moments are the HBM ceiling long before activations are.

The TPU-native form is *sharding annotations, not hand-written collectives*:
place each optimizer-state leaf (ZeRO-1) — and optionally each param leaf
(ZeRO-3 / FSDP) — sharded over the 'data' axis and let GSPMD insert the
collective pattern:

* ZeRO-1 (``shard_params=False``): params stay replicated, so gradients are
  all-reduced as in plain DP; the momentum update then runs on each device's
  1/n shard (GSPMD slices the replicated gradient locally — free), and the
  sharded param *update* is all-gathered into the replicated params. Per-step
  comm is all-reduce(grads) + all-gather(updates); per-device optimizer HBM
  drops to 1/n.
* ZeRO-3 / FSDP (``shard_params=True``): params are sharded too; GSPMD
  all-gathers each layer's params where used (fwd + bwd) and produces
  *sharded* gradients via reduce-scatter. Param + optimizer HBM both drop to
  1/n at the cost of the per-layer gathers — the standard FSDP trade.

Leaves whose largest axis-divisible dimension is too small to be worth
scattering (< ``min_size`` elements — BN scales, biases) stay replicated;
correctness never depends on which leaves end up sharded.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_spec(leaf, axis: str, n: int, min_size: int) -> P:
    """PartitionSpec sharding the leaf's largest dim divisible by ``n``."""
    shape = getattr(leaf, 'shape', ())
    if np.prod(shape, dtype=np.int64) < min_size:
        return P()
    best = None
    for d, extent in enumerate(shape):
        if extent % n == 0 and (best is None or extent > shape[best]):
            best = d
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def tree_axis_shardings(mesh: Mesh, tree, axis: str = 'data',
                        min_size: int = 2 ** 12):
    """NamedSharding pytree: each leaf sharded over ``axis`` along its
    largest divisible dimension; small leaves replicated."""
    n = mesh.shape[axis]
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, axis, n, min_size)),
        tree)


def zero_init(tx, params, mesh: Mesh, axis: str = 'data',
              shard_params: bool = False, min_size: int = 2 ** 12):
    """Initialize optimizer state sharded over ``axis`` (ZeRO-1); with
    ``shard_params`` also reshard the params (ZeRO-3 / FSDP).

    Returns ``(params, opt_state)`` both placed on the mesh. Use with
    ``make_train_step(..., mesh=mesh, zero_axis=axis)`` so the *updated*
    state keeps the sharding across steps (jit would otherwise be free to
    replicate outputs)."""
    opt_state = tx.init(params)
    opt_state = jax.device_put(
        opt_state, tree_axis_shardings(mesh, opt_state, axis, min_size))
    if shard_params:
        params = jax.device_put(
            params, tree_axis_shardings(mesh, params, axis, min_size))
    else:
        params = jax.device_put(params, NamedSharding(mesh, P()))
    return params, opt_state


def constrain_tree(tree, mesh: Mesh, axis: str = 'data',
                   min_size: int = 2 ** 12):
    """Inside-jit analog of ``tree_axis_shardings``: pins each leaf of a
    traced pytree to its deterministic ZeRO sharding (same rule as
    ``zero_init``) via ``with_sharding_constraint``."""
    n = mesh.shape[axis]
    return jax.tree_util.tree_map(
        lambda leaf: jax.lax.with_sharding_constraint(
            leaf, NamedSharding(mesh, _leaf_spec(leaf, axis, n, min_size))),
        tree)


def sharded_size_bytes(tree) -> int:
    """Per-device bytes actually held for a placed pytree (sum over leaves
    of one addressable shard's nbytes) — the memory claim ZeRO makes."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        shards = getattr(leaf, 'addressable_shards', None)
        if shards:
            total += shards[0].data.size * leaf.dtype.itemsize
        else:
            total += leaf.size * leaf.dtype.itemsize
    return total
