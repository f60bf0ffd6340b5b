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


def test_mstrn_expert_apply_matches_dense_module(rng):
    """The expert-parallel MSTRN head == the dense MultiScaleRelation
    module (deterministic first-k combination path), sharded over an
    8-device 'expert' mesh (7 live scale-experts + 1 zero pad)."""
    from pretorched_tpu.models.trn import MultiScaleRelation
    from pretorched_tpu.parallel.moe import (
        mstrn_expert_apply, mstrn_expert_params, mstrn_expert_spec)

    n, d, out, bott, B = 8, 24, 12, 16, 3
    module = MultiScaleRelation(num_inputs=n, in_features=d,
                                out_features=out, bottleneck_dim=bott)
    feats = jnp.asarray(rng.randn(B, 1, n, d), jnp.float32)
    variables = module.init(jax.random.key(0), feats)
    ref = module.apply(variables, feats).reshape(B, out)   # no rng: first-k

    mesh = Mesh(np.asarray(jax.devices()[:8]), ('expert',))
    spec = mstrn_expert_spec(n, pad_experts_to=8)
    assert spec['E'] == 8 and len(spec['scales']) == 7
    stacked = mstrn_expert_params(variables['params'], spec)
    with mesh:
        y = jax.jit(lambda s, f: mstrn_expert_apply(
            s, spec, f, mesh=mesh))(stacked, feats.reshape(B, n, d))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_mstrn_expert_params_shard_per_device(rng):
    """Each device holds only its local scale-MLPs' (padded) params."""
    from pretorched_tpu.models.trn import MultiScaleRelation
    from pretorched_tpu.parallel.moe import (
        mstrn_expert_params, mstrn_expert_spec)

    n, d = 8, 8
    module = MultiScaleRelation(num_inputs=n, in_features=d,
                                out_features=4, bottleneck_dim=8)
    variables = module.init(jax.random.key(0),
                            jnp.zeros((1, 1, n, d), jnp.float32))
    mesh = Mesh(np.asarray(jax.devices()[:8]), ('expert',))
    spec = mstrn_expert_spec(n, pad_experts_to=8)
    stacked = mstrn_expert_params(variables['params'], spec)
    stacked_sh = jax.device_put(stacked, expert_sharding(mesh, stacked))
    leaf = stacked_sh['w1']
    assert {s.data.shape for s in leaf.addressable_shards} == \
        {(1,) + leaf.shape[1:]}


def test_trn_expert_forward_full_model(rng):
    """Full zoo TRN (resnet18 backbone, MSTRN head) forward with the
    relation head expert-sharded over the mesh == the monolithic
    model.module.apply — expert parallelism on the actual registry model,
    oracle = dense forward (VERDICT r4 item 5)."""
    import pretorched_tpu
    from pretorched_tpu.parallel.moe import trn_expert_forward

    model = pretorched_tpu.trn(num_classes=11, num_segments=4,
                               consensus='MSTRN', arch='resnet18',
                               pretrained=None,
                               frame_bottleneck_dim=32,
                               video_feature_dim=16).eval()
    clips = jnp.asarray(rng.randn(2, 4, 64, 64, 3), jnp.float32)
    ref = model.module.apply(model.variables, clips)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ('expert',))
    fwd, spec = trn_expert_forward(model, mesh=mesh)
    assert spec['E'] == 8 and len(spec['scales']) == 3   # 4,3,2 + zero pad
    with mesh:
        y = jax.jit(fwd)(model.variables, clips)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_trn_expert_forward_precomputed_stack(rng):
    """fwd(variables, clips, stacked) with the expert stack precomputed
    once (the production path — avoids re-stacking ~n*d*bottleneck per
    call) is bit-identical to the default per-call stacking path."""
    import pretorched_tpu
    from pretorched_tpu.parallel.moe import (
        mstrn_expert_params, trn_expert_forward)

    model = pretorched_tpu.trn(num_classes=7, num_segments=4,
                               consensus='MSTRN', arch='resnet18',
                               pretrained=None,
                               frame_bottleneck_dim=16,
                               video_feature_dim=8).eval()
    clips = jnp.asarray(rng.randn(2, 4, 64, 64, 3), jnp.float32)
    fwd, spec = trn_expert_forward(model)
    y_default = jax.jit(fwd)(model.variables, clips)
    stacked = mstrn_expert_params(
        model.variables['params']['temporal_relation'], spec)
    y_pre = jax.jit(fwd)(model.variables, clips, stacked)
    np.testing.assert_array_equal(np.asarray(y_default), np.asarray(y_pre))


def test_dispatch_positions_respect_capacity():
    # 6 tokens all to expert 0, capacity 2 -> exactly 2 kept at slots 0,1
    logits = jnp.tile(jnp.asarray([[5.0, 0.0]]), (6, 1))
    dispatch, combine, metrics = moe_dispatch(logits, capacity=2)
    kept = np.asarray(dispatch.sum(axis=(1, 2)))
    np.testing.assert_array_equal(kept, [1, 1, 0, 0, 0, 0])
    slots = np.asarray(dispatch[:2, 0, :].argmax(-1))
    np.testing.assert_array_equal(slots, [0, 1])
