"""Heterogeneous-stage pipeline (pipeline_apply_stages) on a real zoo model
(VERDICT r3 #6): resnet3d's four resolution stages placed on a 'stage' mesh
axis, composed with data parallelism, against the monolithic forward.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pretorched_tpu.models.resnet3d import (
    VideoResNet, pipeline_stage_fns as make_stage_fns,
    split_stage_variables)
from pretorched_tpu.parallel.pipeline import pipeline_apply_stages


@pytest.fixture(scope='module')
def small_resnet3d():
    module = VideoResNet(block='bottleneck', layers=(1, 1, 1, 1),
                         num_classes=12)
    x = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    variables = jax.jit(module.init)(jax.random.key(0), x)
    return module, variables


def test_stage_slices_compose_to_full_forward(rng, small_resnet3d):
    module, variables = small_resnet3d
    x = jnp.asarray(rng.randn(2, 4, 32, 32, 3), jnp.float32)
    ref = module.apply(variables, x)
    h = x
    for fn, sub in zip(make_stage_fns(module),
                       split_stage_variables(variables)):
        h = fn(sub, h)
    np.testing.assert_array_equal(np.asarray(h), np.asarray(ref))


def test_stage_variables_partition_everything(small_resnet3d):
    _, variables = small_resnet3d
    subs = split_stage_variables(variables)
    total = sum(len(jax.tree_util.tree_leaves(s)) for s in subs)
    assert total == len(jax.tree_util.tree_leaves(variables))


def test_resnet3d_stage_pipeline_matches_forward(rng, small_resnet3d):
    module, variables = small_resnet3d
    mesh = Mesh(np.asarray(jax.devices()[:4]), ('stage',))
    x = jnp.asarray(rng.randn(8, 4, 32, 32, 3), jnp.float32)
    out = pipeline_apply_stages(make_stage_fns(module),
                                split_stage_variables(variables), x, mesh,
                                n_micro=4)
    ref = module.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_resnet3d_stage_pipeline_composes_with_dp(rng, small_resnet3d):
    module, variables = small_resnet3d
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ('data', 'stage'))
    x = jnp.asarray(rng.randn(8, 4, 32, 32, 3), jnp.float32)
    xb = jax.device_put(x, NamedSharding(mesh, P('data')))
    out = pipeline_apply_stages(make_stage_fns(module),
                                split_stage_variables(variables), xb, mesh,
                                n_micro=2, batch_axes=('data',))
    ref = module.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_stage_pipeline_batch_guard(rng, small_resnet3d):
    module, variables = small_resnet3d
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ('data', 'stage'))
    # B=12 passes 12 % 4 == 0 but each of 2 data shards holds 6 rows, which
    # 4 microbatches cannot split — must fail fast with the clear assert
    x = jnp.asarray(rng.randn(12, 4, 32, 32, 3), jnp.float32)
    xb = jax.device_put(x, NamedSharding(mesh, P('data')))
    with pytest.raises(AssertionError, match='data shards'):
        pipeline_apply_stages(make_stage_fns(module),
                              split_stage_variables(variables), xb, mesh,
                              n_micro=4, batch_axes=('data',))
