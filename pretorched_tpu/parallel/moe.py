"""Expert parallelism: a Switch-style top-1 MoE layer sharded over experts.

The reference zoo has no mixture-of-experts; this exists to make the
framework's parallel layer complete over all five axes (dp/tp/sp/pp/ep) for
scale-out heads and adapters on top of the zoo's backbones (e.g. an MoE
classifier head over pooled video features).

TPU-native formulation (dense dispatch, the GSPMD recipe — not a port):

* Router: top-1 ``argmax(x @ router_w)`` per token, softmax gate scaling.
* Capacity: each expert processes at most C = ceil(T/E * capacity_factor)
  tokens (static shapes — XLA requirement); overflow tokens are dropped
  (output 0, the standard Switch behavior).
* Dispatch/combine are one-hot einsums: ``(T,E,C) x (T,d) -> (E,C,d)``;
  expert FFNs run batched over the leading E axis, which is sharded over
  the mesh's 'expert' axis via ``with_sharding_constraint`` — XLA inserts
  the all-to-all-style collectives from the sharding alone.
* ``aux_load_balancing_loss`` is the Switch Transformer auxiliary loss
  E * sum_e(f_e * p_e): fraction-of-tokens times mean router-prob per
  expert, summed over experts and scaled by E (== 1 at perfect balance).

Everything is jit-traceable and differentiable (straight-through the
one-hot dispatch, as standard).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def expert_sharding(mesh: Mesh, stacked_params, axis: str = 'expert'):
    """NamedSharding pytree: leading (expert) axis sharded over `axis`."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda _: sh, stacked_params)


def moe_dispatch(router_logits, capacity: int):
    """Top-1 dispatch/combine tensors from router logits.

    Returns (dispatch (T,E,C) bool-ish float, combine (T,E,C) float,
    aux metrics dict). Tokens past an expert's capacity are dropped
    (all-zero rows in both tensors)."""
    T, E = router_logits.shape
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    expert_idx = jnp.argmax(router_logits, axis=-1)            # (T,)
    onehot = jax.nn.one_hot(expert_idx, E, dtype=jnp.float32)  # (T, E)
    # position of each token within its expert's queue (0-based)
    position = jnp.cumsum(onehot, axis=0) * onehot - onehot    # (T, E)
    pos = jnp.sum(position, axis=-1).astype(jnp.int32)         # (T,)
    keep = (pos < capacity).astype(jnp.float32)
    dispatch = (onehot * keep[:, None])[:, :, None] * \
        jax.nn.one_hot(pos, capacity, dtype=jnp.float32)[:, None, :]
    gate = jnp.sum(probs * onehot, axis=-1)                    # (T,)
    combine = dispatch * gate[:, None, None]
    metrics = {
        'fraction_dropped': 1.0 - jnp.mean(keep),
        'router_probs': probs,
        'expert_onehot': onehot,
    }
    return dispatch, combine, metrics


def aux_load_balancing_loss(metrics) -> jnp.ndarray:
    """Switch Transformer load-balancing loss: E * sum_e(f_e * p_e).

    f_e = fraction of tokens routed to expert e, p_e = mean router prob of
    expert e; equals 1 at perfectly uniform routing, larger when skewed."""
    probs, onehot = metrics['router_probs'], metrics['expert_onehot']
    E = probs.shape[-1]
    f = jnp.mean(onehot, axis=0)      # fraction of tokens per expert
    p = jnp.mean(probs, axis=0)       # mean router prob per expert
    return E * jnp.sum(f * p)


def moe_apply(expert_fn: Callable, stacked_params, x, router_w,
              mesh: Optional[Mesh] = None, *, expert_axis: str = 'expert',
              capacity_factor: float = 1.25):
    """Top-1 MoE over tokens ``x`` (T, d) with E stacked experts.

    Args:
      expert_fn: ``(one_expert_params, (C, d)) -> (C, d_out)``.
      stacked_params: pytree with leading axis E (``stack_block_params``
        from parallel.pipeline works), shard with ``expert_sharding``.
      router_w: (d, E) router weights.
      mesh: when given, the expert compute is sharding-constrained onto its
        `expert_axis` so each device runs only its local experts.
      capacity_factor: C = ceil(T/E * factor); tokens past C are dropped.

    Returns (y (T, d_out), aux_loss scalar, metrics dict).
    """
    T = x.shape[0]
    E = router_w.shape[-1]
    capacity = int(math.ceil(T / E * capacity_factor))
    logits = x @ router_w
    dispatch, combine, metrics = moe_dispatch(logits, capacity)

    expert_in = jnp.einsum('tec,td->ecd', dispatch,
                           x.astype(jnp.float32))              # (E, C, d)
    if mesh is not None and mesh.shape.get(expert_axis, 1) > 1:
        expert_in = jax.lax.with_sharding_constraint(
            expert_in, NamedSharding(mesh, P(expert_axis)))
    expert_out = jax.vmap(expert_fn)(stacked_params, expert_in)  # (E, C, do)
    if mesh is not None and mesh.shape.get(expert_axis, 1) > 1:
        expert_out = jax.lax.with_sharding_constraint(
            expert_out, NamedSharding(mesh, P(expert_axis)))
    y = jnp.einsum('tec,ecd->td', combine, expert_out)
    return y.astype(x.dtype), aux_load_balancing_loss(metrics), {
        'fraction_dropped': metrics['fraction_dropped'],
        'capacity': capacity,
    }


def moe_reference(expert_fn, stacked_params, x, router_w,
                  capacity_factor: float = 1.25):
    """Per-token oracle (plain Python loop; test-sized inputs only)."""
    import numpy as np
    T = x.shape[0]
    E = router_w.shape[-1]
    capacity = int(math.ceil(T / E * capacity_factor))
    logits = np.asarray(x @ router_w)
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    params_list = [jax.tree_util.tree_map(lambda l: l[e], stacked_params)
                   for e in range(E)]
    counts = [0] * E
    outs = []
    for t in range(T):
        e = int(np.argmax(logits[t]))
        if counts[e] >= capacity:
            outs.append(None)
            continue
        counts[e] += 1
        y = expert_fn(params_list[e], x[t:t + 1])[0]
        outs.append(np.asarray(y) * float(probs[t, e]))
    d_out = next(o for o in outs if o is not None).shape[-1]
    return np.stack([o if o is not None else np.zeros(d_out, np.float32)
                     for o in outs]).astype(np.asarray(x).dtype)
