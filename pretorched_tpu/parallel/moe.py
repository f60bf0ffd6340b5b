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


# ---------------------------------------------------------------------------
# Expert-parallel MSTRN relation head — expert parallelism on a REAL zoo model
# (reference trn.py:59-113), not a synthetic MLP.

def mstrn_expert_spec(num_inputs: int, num_relations: int = 3,
                      pad_experts_to: Optional[int] = None):
    """Static dispatch spec treating MultiScaleRelation as heterogeneous
    experts with DETERMINISTIC routing.

    MSTRN's per-scale relation MLPs (scale k = n..2, models/trn.py
    ``MultiScaleRelation``; reference trn.py:59-113) are a mixture of
    experts where the router is the scale structure itself: expert ``si``
    is the 2-layer MLP for scale ``k_si`` and its tokens are each video's
    first-``min(num_relations, C(n,k))`` k-frame combinations (the module's
    deterministic no-rng path). Scales have heterogeneous widths (k*d
    concat), so inputs and first-layer kernels are zero-padded to the
    widest (n*d) — exact, because ``Relation`` applies relu before its
    first dense and the padded kernel rows are zero.

    Returns static numpy tables: ``sel`` (E,K,n) frame indices,
    ``frame_mask``/``token_mask`` zeroing padded slots/combinations,
    ``scales`` (live experts), and E/K/num_inputs. ``pad_experts_to``
    appends all-zero experts so E divides a mesh's expert axis."""
    import numpy as np
    scales = list(range(num_inputs, 1, -1))
    E = pad_experts_to or len(scales)
    assert E >= len(scales), (E, scales)
    K = max(min(num_relations, math.comb(num_inputs, k)) for k in scales)
    sel = np.zeros((E, K, num_inputs), np.int32)
    fmask = np.zeros((E, K, num_inputs), np.float32)
    tmask = np.zeros((E, K), np.float32)
    import itertools
    for si, k in enumerate(scales):
        combos = list(itertools.combinations(range(num_inputs), k))
        for j in range(min(num_relations, len(combos))):
            sel[si, j, :k] = combos[j]
            fmask[si, j, :k] = 1.0
            tmask[si, j] = 1.0
    return {'sel': sel, 'frame_mask': fmask, 'token_mask': tmask,
            'scales': scales, 'E': E, 'K': K, 'num_inputs': num_inputs}


def mstrn_expert_params(msr_params, spec):
    """Stack + zero-pad the per-scale Relation MLPs to one (E, ...) pytree.

    ``msr_params``: the ``temporal_relation`` subtree of a TRN's params —
    ``{'relations.{si}': {'relate.1': {kernel,bias}, 'relate.3': ...}}``.
    Traceable (pure jnp), so it can run inside the jitted forward with
    variables as an argument."""
    E, n = spec['E'], spec['num_inputs']
    k0 = spec['scales'][0]
    r0 = msr_params['relations.0']['relate.1']['kernel']
    d = r0.shape[0] // k0
    bott = r0.shape[1]
    out = msr_params['relations.0']['relate.3']['kernel'].shape[1]
    w1 = jnp.zeros((E, n * d, bott), r0.dtype)
    b1 = jnp.zeros((E, bott), r0.dtype)
    w2 = jnp.zeros((E, bott, out), r0.dtype)
    b2 = jnp.zeros((E, out), r0.dtype)
    for si, k in enumerate(spec['scales']):
        p = msr_params[f'relations.{si}']
        w1 = w1.at[si, :k * d].set(p['relate.1']['kernel'])
        b1 = b1.at[si].set(p['relate.1']['bias'])
        w2 = w2.at[si].set(p['relate.3']['kernel'])
        b2 = b2.at[si].set(p['relate.3']['bias'])
    return {'w1': w1, 'b1': b1, 'w2': w2, 'b2': b2}


def mstrn_expert_apply(stacked, spec, feats, mesh: Optional[Mesh] = None,
                       expert_axis: str = 'expert'):
    """Expert-parallel MultiScaleRelation forward.

    ``feats``: (B, n, d) per-frame features -> (B, out), equal to the dense
    module's deterministic forward. Each expert's padded token block
    (K combination-concats per video) is sharding-constrained onto the
    mesh's expert axis, so device e runs only its local scales' MLPs; the
    combine is a masked sum (invalid tokens would otherwise leak the MLP's
    bias response to a zero input)."""
    B, n, d = feats.shape
    sel = jnp.asarray(spec['sel'])
    fmask = jnp.asarray(spec['frame_mask'], feats.dtype)
    tmask = jnp.asarray(spec['token_mask'], jnp.float32)
    E, K = tmask.shape
    g = jnp.take(feats, sel.reshape(-1), axis=1)          # (B, E*K*n, d)
    g = g.reshape(B, E, K, n, d) * fmask[None, :, :, :, None]
    x = jnp.transpose(g, (1, 2, 0, 3, 4)).reshape(E, K * B, n * d)
    if mesh is not None and mesh.shape.get(expert_axis, 1) > 1:
        sh = NamedSharding(mesh, P(expert_axis))
        x = jax.lax.with_sharding_constraint(x, sh)
        stacked = jax.tree_util.tree_map(
            lambda l: jax.lax.with_sharding_constraint(l, sh), stacked)
    h = jax.nn.relu(x)
    h = jax.nn.relu(jnp.einsum('etd,edh->eth', h, stacked['w1'])
                    + stacked['b1'][:, None])
    y = jnp.einsum('eth,eho->eto', h, stacked['w2']) + stacked['b2'][:, None]
    y = y.reshape(E, K, B, -1) * tmask[:, :, None, None].astype(y.dtype)
    return jnp.sum(y, axis=(0, 1))                         # (B, out)


def trn_expert_forward(model, mesh: Optional[Mesh] = None,
                       expert_axis: str = 'expert'):
    """Full TRN eval forward with the MSTRN head expert-sharded.

    Returns ``(fwd, spec)`` where ``fwd(variables, clips) -> logits``
    matches ``model.module.apply(variables, clips)`` (deterministic
    combination path, eval dropout). The expert count is padded up to a
    multiple of the mesh's expert axis automatically.

    ``fwd`` accepts an optional third argument ``stacked``: the
    pre-stacked expert pytree from ``mstrn_expert_params(
    variables['params']['temporal_relation'], spec)``. Without it the
    stack+zero-pad runs inside every call — exact, but it materializes the
    padded (E, n*d, bottleneck) kernel in HBM per forward (~0.5 GB for the
    8-segment resnet50 head; XLA cannot hoist it because ``variables`` is
    a runtime argument). Production callers should precompute it once and
    pass it as a jit argument alongside ``variables``."""
    module = model.module
    if module.consensus != 'MSTRN':
        raise ValueError(f'expert-parallel head supports MSTRN, '
                         f'got {module.consensus}')
    n = module.num_segments
    pad_to = None
    if mesh is not None and mesh.shape.get(expert_axis, 1) > 1:
        ax = mesh.shape[expert_axis]
        pad_to = -(-(n - 1) // ax) * ax
    spec = mstrn_expert_spec(n, pad_experts_to=pad_to)
    base = module.base_module

    def fwd(variables, clips, stacked=None):
        b = clips.shape[0]
        frames = clips.reshape((-1,) + clips.shape[2:])
        base_vars = {c: v['base_module'] for c, v in variables.items()
                     if 'base_module' in v}
        feats = base.apply(base_vars, frames, mode='forward', head=False,
                           train=False)
        feats = feats.reshape(b, n, -1)
        if stacked is None:
            stacked = mstrn_expert_params(
                variables['params']['temporal_relation'], spec)
        y = mstrn_expert_apply(stacked, spec, feats, mesh=mesh,
                               expert_axis=expert_axis)
        p = variables['params']['last_linear']
        return y @ p['kernel'] + p['bias']

    return fwd, spec


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
