"""GPipe-style pipeline executor (parallel/pipeline.py) on the virtual mesh.

Parity criterion: pipeline_apply over a 'stage' axis == the plain
sequential scan of the same blocks, forward AND gradients, including
composed with data parallelism on a ('data', 'stage') mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pretorched_tpu.parallel.pipeline import (
    pipeline_apply, sequential_apply, stack_block_params, stage_sharding)


class ResidualConvBlock(nn.Module):
    """Shape-preserving conv residual block (a trunk block stand-in)."""
    ch: int = 8

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding='SAME', name='conv1')(x)
        h = nn.gelu(h)
        h = nn.Conv(self.ch, (3, 3), padding='SAME', name='conv2')(h)
        return x + 0.5 * h


def _blocks(rng, n_blocks, ch=8):
    block = ResidualConvBlock(ch=ch)
    x0 = jnp.zeros((1, 6, 6, ch))
    params = [block.init(jax.random.key(rng.randint(1 << 31)), x0)['params']
              for _ in range(n_blocks)]
    return block, stack_block_params(params)


@pytest.mark.parametrize('stages,n_micro', [(4, 4), (2, 8), (8, 8)])
def test_pipeline_forward_matches_sequential(rng, stages, n_micro):
    devices = jax.devices()[:stages]
    mesh = Mesh(np.asarray(devices), ('stage',))
    block, stacked = _blocks(rng, n_blocks=stages * 2)

    def block_fn(p, x):
        return block.apply({'params': p}, x)

    x = jnp.asarray(rng.randn(16, 6, 6, 8), jnp.float32)
    stacked_sh = jax.device_put(stacked, stage_sharding(mesh, stacked))
    out = pipeline_apply(block_fn, stacked_sh, x, mesh, n_micro=n_micro)
    ref = sequential_apply(block_fn, stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_gradients_match_sequential(rng):
    stages, n_micro = 4, 4
    mesh = Mesh(np.asarray(jax.devices()[:stages]), ('stage',))
    block, stacked = _blocks(rng, n_blocks=stages)

    def block_fn(p, x):
        return block.apply({'params': p}, x)

    x = jnp.asarray(rng.randn(8, 6, 6, 8), jnp.float32)

    def loss_pp(params, x):
        return jnp.mean(
            pipeline_apply(block_fn, params, x, mesh, n_micro=n_micro) ** 2)

    def loss_seq(params, x):
        return jnp.mean(sequential_apply(block_fn, params, x) ** 2)

    g_pp = jax.grad(loss_pp)(stacked, x)
    g_seq = jax.grad(loss_seq)(stacked, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp),
                    jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pipeline_composes_with_data_parallel(rng):
    # (data=2, stage=4) mesh: batch sharded on 'data', blocks on 'stage'.
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ('data', 'stage'))
    block, stacked = _blocks(rng, n_blocks=4)

    def block_fn(p, x):
        return block.apply({'params': p}, x)

    x = jnp.asarray(rng.randn(16, 6, 6, 8), jnp.float32)
    xb = jax.device_put(x, NamedSharding(mesh, P('data')))
    stacked_sh = jax.device_put(stacked, stage_sharding(mesh, stacked))
    out = pipeline_apply(block_fn, stacked_sh, xb, mesh, n_micro=4,
                         batch_axes=('data',))
    ref = sequential_apply(block_fn, stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_batch_guard_counts_data_shards(rng):
    # B=12 passes 12 % 4 == 0 but each of 2 data shards holds 6 rows,
    # which 4 microbatches cannot split — must fail fast with the clear
    # assert, not an opaque reshape error inside shard_map.
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ('data', 'stage'))
    block, stacked = _blocks(rng, n_blocks=4)

    def block_fn(p, x):
        return block.apply({'params': p}, x)

    x = jnp.asarray(rng.randn(12, 6, 6, 8), jnp.float32)
    xb = jax.device_put(x, NamedSharding(mesh, P('data')))
    stacked_sh = jax.device_put(stacked, stage_sharding(mesh, stacked))
    with pytest.raises(AssertionError, match='data shards'):
        pipeline_apply(block_fn, stacked_sh, xb, mesh, n_micro=4,
                       batch_axes=('data',))


def test_pipeline_masks_nonfinite_warmup_ticks(rng):
    # a block that is non-finite on the zero-filled warm-up/drain
    # activations must not leak NaN into real outputs through the
    # broadcast psum
    stages, n_micro = 4, 4
    mesh = Mesh(np.asarray(jax.devices()[:stages]), ('stage',))

    def block_fn(p, x):
        # per-sample norm (batch-decoupled, as a pipelined trunk must be);
        # NaN on the zero-filled warm-up activations
        return p['s'] * x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    stacked = {'s': jnp.ones((stages, 1))}
    x = jnp.abs(jnp.asarray(rng.randn(8, 4), jnp.float32)) + 0.1
    out = pipeline_apply(block_fn, stacked, x, mesh, n_micro=n_micro)
    ref = sequential_apply(block_fn, jax.tree_util.tree_map(lambda l: l,
                                                            stacked), x)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_stage_sharding_splits_param_memory(rng):
    stages = 4
    mesh = Mesh(np.asarray(jax.devices()[:stages]), ('stage',))
    _, stacked = _blocks(rng, n_blocks=8)
    sh = jax.device_put(stacked, stage_sharding(mesh, stacked))
    leaf = jax.tree_util.tree_leaves(sh)[0]
    # each device holds 8/4 = 2 blocks of the leading axis
    shard_shapes = {s.data.shape for s in leaf.addressable_shards}
    assert shard_shapes == {(2,) + leaf.shape[1:]}
