"""ZeRO-1 / FSDP sharded-optimizer training on the 8-device virtual mesh.

Numerics rule: sharding is an implementation detail — N steps with ZeRO-1
(opt state sharded) or ZeRO-3/FSDP (params sharded too) must produce the same
params/loss as the plain replicated step. Memory rule: the per-device bytes
of the placed optimizer state actually drop ~1/n for the shardable leaves.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pretorched_tpu.models.resnet3d import VideoResNet
from pretorched_tpu.parallel import (make_train_step, sharded_size_bytes,
                                     tree_axis_shardings, zero_init)

N_CLASSES = 8


def _setup(rng):
    module = VideoResNet(block='bottleneck', layers=(1, 1, 1, 1),
                         num_classes=N_CLASSES)
    x = jnp.asarray(rng.randn(8, 4, 32, 32, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, N_CLASSES, (8,)))
    variables = module.init(jax.random.key(0), x)
    return module, variables, x, labels


def _run_steps(module, variables, x, labels, mesh=None, zero=False,
               fsdp=False, n_steps=3, lr=0.1):
    tx = optax.sgd(lr, momentum=0.9)
    params = variables['params']
    bs = variables['batch_stats']
    if mesh is None:
        opt = tx.init(params)
        step = make_train_step(module, tx, donate=False)
    elif zero:
        params, opt = zero_init(tx, params, mesh, shard_params=fsdp)
        step = make_train_step(module, tx, mesh=mesh, donate=False,
                               zero_axis='data', zero_params=fsdp)
    else:
        params = jax.device_put(params, NamedSharding(mesh, P()))
        opt = tx.init(params)
        step = make_train_step(module, tx, mesh=mesh, donate=False)
    losses = []
    for i in range(n_steps):
        params, bs, opt, m = step(params, bs, opt, x, labels, i)
        losses.append(float(m['loss']))
    return jax.device_get(params), losses, opt


@pytest.fixture(scope='module')
def mesh():
    devices = jax.devices()
    assert len(devices) >= 8, 'conftest provides 8 virtual CPU devices'
    return Mesh(np.asarray(devices[:8]).reshape(8, 1), ('data', 'model'))


def test_zero1_matches_replicated(rng, mesh):
    module, variables, x, labels = _setup(rng)
    p_ref, losses_ref, _ = _run_steps(module, variables, x, labels, mesh=mesh)
    p_z, losses_z, opt_z = _run_steps(module, variables, x, labels,
                                      mesh=mesh, zero=True)
    np.testing.assert_allclose(np.asarray(losses_z), np.asarray(losses_ref),
                               rtol=1e-5, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        p_z, p_ref)
    # the momentum of a big conv kernel is actually sharded over 'data'
    momenta = [l for l in jax.tree_util.tree_leaves(opt_z) if l.size >= 2**12]
    assert momenta, 'expected shardable momentum leaves'
    for leaf in momenta:
        assert 'data' in tuple(leaf.sharding.spec), (
            leaf.shape, leaf.sharding)
        assert leaf.addressable_shards[0].data.size == leaf.size // 8


def test_fsdp_matches_replicated(rng, mesh):
    # Sharded params flip the gradient collective from all-reduce to
    # reduce-scatter, changing float summation order: same math, different
    # rounding. Train-mode BN amplifies that rounding chaotically across
    # steps (measured: 1e-6 after one step, 2e-4 by step 3 even at lr 0.01),
    # so the tight param comparison is after ONE step — where the only
    # difference IS the collective's summation order — and the multi-step
    # check is on the loss trajectory at a chaos-tolerant bound.
    module, variables, x, labels = _setup(rng)
    p_ref1, _, _ = _run_steps(module, variables, x, labels, mesh=mesh,
                              n_steps=1)
    p_f1, _, _ = _run_steps(module, variables, x, labels, mesh=mesh,
                            zero=True, fsdp=True, n_steps=1)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5),
        p_f1, p_ref1)
    _, losses_ref, _ = _run_steps(module, variables, x, labels, mesh=mesh)
    _, losses_f, _ = _run_steps(module, variables, x, labels, mesh=mesh,
                                zero=True, fsdp=True)
    np.testing.assert_allclose(np.asarray(losses_f), np.asarray(losses_ref),
                               rtol=5e-2, atol=1e-4)


def test_zero1_adam_nested_state(rng, mesh):
    """Adam's nested optax state (mu/nu trees + count scalar) shards leaf-
    wise: moments of big kernels over 'data', the step counter replicated —
    and one ZeRO step still matches the replicated step exactly."""
    module, variables, x, labels = _setup(rng)
    tx = optax.adamw(1e-3)
    params = variables['params']
    bs = variables['batch_stats']
    p_rep = jax.device_put(params, NamedSharding(mesh, P()))
    step_rep = make_train_step(module, tx, mesh=mesh, donate=False)
    p_ref, _, _, m_ref = step_rep(p_rep, bs, tx.init(params), x, labels, 0)
    pz, oz = zero_init(tx, params, mesh)
    step_z = make_train_step(module, tx, mesh=mesh, donate=False,
                             zero_axis='data')
    pz, _, oz, m_z = step_z(pz, bs, oz, x, labels, 0)
    np.testing.assert_allclose(float(m_z['loss']), float(m_ref['loss']),
                               rtol=1e-5, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        jax.device_get(pz), jax.device_get(p_ref))
    big = [l for l in jax.tree_util.tree_leaves(oz) if l.size >= 2 ** 12]
    assert big, 'expected shardable mu/nu leaves'
    for leaf in big:
        assert 'data' in tuple(leaf.sharding.spec), (leaf.shape, leaf.sharding)
    counts = [l for l in jax.tree_util.tree_leaves(oz) if l.ndim == 0]
    assert counts and all(t == P() or t == P(None)
                          for t in (l.sharding.spec for l in counts))


def test_zero_composes_with_accum_steps(rng, mesh):
    """ZeRO sharding is orthogonal to gradient accumulation: the
    accum_steps=2 ZeRO step matches the accum_steps=2 replicated step.

    Tolerance note: sharding the opt state lets GSPMD re-partition the
    scanned conv-gradient reductions (reduce-scatter instead of all-reduce,
    different intra-conv sum splits), changing f32 summation order. Measured:
    conv1-kernel diff 1.6e-3 in f32 collapses to 1.9e-13 under
    jax_enable_x64 — identical math, different rounding, amplified by
    cancellation in the 7x7x7 stem-conv grad sums. Loss stays tight (4e-7);
    params compare at a rounding-chaos bound.
    """
    module, variables, x, labels = _setup(rng)
    tx = optax.sgd(0.1, momentum=0.9)
    params = variables['params']
    bs = variables['batch_stats']
    p_rep = jax.device_put(params, NamedSharding(mesh, P()))
    step_rep = make_train_step(module, tx, mesh=mesh, donate=False,
                               accum_steps=2)
    p_ref, _, _, m_ref = step_rep(p_rep, bs, tx.init(params), x, labels, 0)
    pz, oz = zero_init(tx, params, mesh)
    step_z = make_train_step(module, tx, mesh=mesh, donate=False,
                             accum_steps=2, zero_axis='data')
    pz, _, oz, m_z = step_z(pz, bs, oz, x, labels, 0)
    np.testing.assert_allclose(float(m_z['loss']), float(m_ref['loss']),
                               rtol=1e-5, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-3),
        jax.device_get(pz), jax.device_get(p_ref))


def test_zero_memory_claim(rng, mesh):
    """Placed optimizer state holds ~1/8 of the shardable bytes per device."""
    module, variables, x, labels = _setup(rng)
    tx = optax.sgd(0.1, momentum=0.9)
    params = variables['params']
    opt_rep = jax.device_put(tx.init(params), NamedSharding(mesh, P()))
    _, opt_sh = zero_init(tx, params, mesh)
    rep = sharded_size_bytes(opt_rep)
    sh = sharded_size_bytes(opt_sh)
    # most momentum bytes live in >=4096-elem conv kernels -> close to 1/8
    assert sh < 0.3 * rep, (sh, rep)


def test_sharding_survives_the_step(rng, mesh):
    """After a donated step, the updated opt state is STILL sharded (the
    constrain_tree pin) — without it jit may replicate outputs and the
    memory win quietly evaporates after step 1."""
    module, variables, x, labels = _setup(rng)
    tx = optax.sgd(0.1, momentum=0.9)
    params, opt = zero_init(tx, params=variables['params'], mesh=mesh)
    step = make_train_step(module, tx, mesh=mesh, zero_axis='data')
    bs = variables['batch_stats']
    params, bs, opt, _ = step(params, bs, opt, x, labels, 0)
    big = [l for l in jax.tree_util.tree_leaves(opt) if l.size >= 2**12]
    assert big
    for leaf in big:
        assert 'data' in tuple(leaf.sharding.spec), (
            leaf.shape, leaf.sharding)


def test_tree_axis_shardings_rules(mesh):
    tree = {'big': jnp.zeros((64, 128)),          # sharded on dim 1 (largest)
            'odd': jnp.zeros((63, 129)),          # nothing divisible -> repl
            'tiny': jnp.zeros((8,))}              # below min_size -> repl
    sh = tree_axis_shardings(mesh, tree, min_size=2 ** 10)
    assert sh['big'].spec == P(None, 'data')
    assert sh['odd'].spec == P()
    assert sh['tiny'].spec == P()
