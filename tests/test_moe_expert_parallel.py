"""Expert-parallel Switch MoE (parallel/moe.py) on the virtual mesh.

Parity criterion: the dense-dispatch einsum formulation == a per-token
Python oracle (same top-1 routing, gate scaling, capacity drops), and the
expert compute actually shards over the 'expert' mesh axis.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from pretorched_tpu.parallel.moe import (
    aux_load_balancing_loss, expert_sharding, moe_apply, moe_dispatch,
    moe_reference)
from pretorched_tpu.parallel.pipeline import stack_block_params


def _experts(rng, E, d, h):
    return stack_block_params([
        {'w1': jnp.asarray(rng.randn(d, h), jnp.float32) * 0.3,
         'w2': jnp.asarray(rng.randn(h, d), jnp.float32) * 0.3}
        for _ in range(E)])


def _expert_fn(p, x):
    return jax.nn.gelu(x @ p['w1']) @ p['w2']


def test_moe_matches_per_token_oracle(rng):
    E, d, h, T = 4, 8, 16, 32
    stacked = _experts(rng, E, d, h)
    router_w = jnp.asarray(rng.randn(d, E), jnp.float32)
    x = jnp.asarray(rng.randn(T, d), jnp.float32)
    # generous capacity: no drops -> exact parity
    y, aux, metrics = moe_apply(_expert_fn, stacked, x, router_w,
                                capacity_factor=4.0)
    ref = moe_reference(_expert_fn, stacked, x, router_w,
                        capacity_factor=4.0)
    assert float(metrics['fraction_dropped']) == 0.0
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)
    assert np.isfinite(float(aux)) and float(aux) >= 1.0  # >= 1 by Cauchy-Schwarz


def test_moe_capacity_drops_match_oracle(rng):
    E, d, h, T = 4, 8, 16, 32
    stacked = _experts(rng, E, d, h)
    # skewed router: most tokens want expert 0 -> drops at factor 1.0
    router_w = jnp.asarray(rng.randn(d, E), jnp.float32)
    router_w = router_w.at[:, 0].add(2.0)
    x = jnp.asarray(rng.randn(T, d), jnp.float32)
    y, _, metrics = moe_apply(_expert_fn, stacked, x, router_w,
                              capacity_factor=1.0)
    ref = moe_reference(_expert_fn, stacked, x, router_w,
                        capacity_factor=1.0)
    assert float(metrics['fraction_dropped']) > 0.0
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)
    # dropped tokens are exactly zero rows in both
    dropped = np.all(ref == 0, axis=-1)
    assert dropped.any()
    np.testing.assert_array_equal(np.all(np.asarray(y) == 0, -1), dropped)


def test_moe_expert_sharded_on_mesh(rng):
    E, d, h, T = 4, 8, 16, 64
    mesh = Mesh(np.asarray(jax.devices()[:4]), ('expert',))
    stacked = _experts(rng, E, d, h)
    stacked_sh = jax.device_put(stacked, expert_sharding(mesh, stacked))
    # each device holds exactly one expert's params
    leaf = jax.tree_util.tree_leaves(stacked_sh)[0]
    assert {s.data.shape for s in leaf.addressable_shards} == \
        {(1,) + leaf.shape[1:]}
    router_w = jnp.asarray(rng.randn(d, E), jnp.float32)
    x = jnp.asarray(rng.randn(T, d), jnp.float32)

    @jax.jit
    def run(params, x, rw):
        y, aux, _ = moe_apply(_expert_fn, params, x, rw, mesh=mesh,
                              capacity_factor=4.0)
        return y, aux

    with mesh:
        y, aux = run(stacked_sh, x, router_w)
    ref = moe_reference(_expert_fn, stacked, x, router_w,
                        capacity_factor=4.0)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)


def test_moe_differentiable(rng):
    E, d, h, T = 4, 8, 16, 32
    stacked = _experts(rng, E, d, h)
    router_w = jnp.asarray(rng.randn(d, E), jnp.float32)
    x = jnp.asarray(rng.randn(T, d), jnp.float32)

    def loss(params, rw):
        y, aux, _ = moe_apply(_expert_fn, params, x, rw,
                              capacity_factor=4.0)
        return jnp.mean(y ** 2) + 0.01 * aux

    g_p, g_r = jax.grad(loss, argnums=(0, 1))(stacked, router_w)
    for leaf in jax.tree_util.tree_leaves(g_p) + [g_r]:
        assert np.all(np.isfinite(np.asarray(leaf)))
    # router grad flows through both the gate and the aux loss
    assert float(jnp.abs(g_r).sum()) > 0


def test_aux_loss_uniform_routing_is_one():
    # perfectly uniform router probs and assignment -> loss == 1
    T, E = 32, 4
    logits = jnp.zeros((T, E))
    onehot = jax.nn.one_hot(jnp.arange(T) % E, E, dtype=jnp.float32)
    metrics = {'router_probs': jax.nn.softmax(logits, -1),
               'expert_onehot': onehot}
    assert abs(float(aux_load_balancing_loss(metrics)) - 1.0) < 1e-6


def test_dispatch_positions_respect_capacity():
    # 6 tokens all to expert 0, capacity 2 -> exactly 2 kept at slots 0,1
    logits = jnp.tile(jnp.asarray([[5.0, 0.0]]), (6, 1))
    dispatch, combine, metrics = moe_dispatch(logits, capacity=2)
    kept = np.asarray(dispatch.sum(axis=(1, 2)))
    np.testing.assert_array_equal(kept, [1, 1, 0, 0, 0, 0])
    slots = np.asarray(dispatch[:2, 0, :].argmax(-1))
    np.testing.assert_array_equal(slots, [0, 1])
