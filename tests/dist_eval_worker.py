"""Worker for the two-process distributed-eval integration test.

Launched twice by ``tests/test_dist.py`` (process_id 0 and 1). Each process
owns 2 virtual CPU devices; ``dist.initialize`` joins them into one 4-device
global mesh (Gloo collectives — the CPU stand-in for a multi-host TPU pod,
SURVEY §5.8). Each process feeds only its local half of the batch; the
sharded eval step's metric sums must equal a single-process oracle over the
full batch.
"""

import os
import sys

os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
PID, PORT = int(sys.argv[1]), sys.argv[2]

import jax  # noqa: E402

# the sandbox's site hook re-exports JAX_PLATFORMS; config.update sticks
jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pretorched_tpu.parallel import dist  # noqa: E402

assert dist.initialize(f'127.0.0.1:{PORT}', num_processes=2, process_id=PID)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from pretorched_tpu.models.resnet import ResNet  # noqa: E402
from pretorched_tpu.parallel import make_mesh  # noqa: E402
from pretorched_tpu.parallel.evaluate import sharded_accuracy_step  # noqa: E402

assert jax.process_count() == 2
module = ResNet(block='basic', layers=(1, 1, 1, 1), num_classes=5,
                width_per_stage=(8, 8, 8, 8))
rng = np.random.RandomState(0)
x_all = rng.randn(8, 32, 32, 3).astype(np.float32)
labels_all = (np.arange(8) % 5).astype(np.int32)
variables = module.init(jax.random.key(0), x_all[:1])   # identical per proc

mesh = make_mesh()                       # all 4 global devices on 'data'
assert mesh.devices.size == 4

step = sharded_accuracy_step(module, mesh=mesh)
bsh = NamedSharding(mesh, P('data'))
rep = NamedSharding(mesh, P())
gx = jax.make_array_from_process_local_data(
    bsh, x_all[PID * 4:(PID + 1) * 4], x_all.shape)
gl = jax.make_array_from_process_local_data(
    bsh, labels_all[PID * 4:(PID + 1) * 4], labels_all.shape)
gv = jax.device_put(variables,
                    jax.tree_util.tree_map(lambda _: rep, variables))
out = jax.device_get(step(gv, gx, gl))

# single-process oracle over the full batch
logits = np.asarray(module.apply(variables, x_all), np.float32)
top1 = int((logits.argmax(1) == labels_all).sum())
logp = logits - np.log(np.exp(logits - logits.max(1, keepdims=True)).sum(
    1, keepdims=True)) - logits.max(1, keepdims=True)
loss = float(-logp[np.arange(8), labels_all].sum())

assert int(out['count']) == 8, out
assert int(out['top1']) == top1, (int(out['top1']), top1)
np.testing.assert_allclose(float(out['loss']), loss, rtol=1e-4)
print(f'DIST-EVAL-OK proc={PID} top1={top1} loss={loss:.4f}', flush=True)

# ---- sharded TRAINING across the two processes ---------------------------
# Each process feeds its half-batch through parallel.global_batch; two
# mesh-sharded make_train_step steps must reproduce a single-process
# full-batch oracle exactly (GSPMD turns the grad/BN-stat averaging into
# psums over the 4-device global mesh).
import optax  # noqa: E402

from pretorched_tpu.parallel import global_batch, make_train_step  # noqa: E402

tx = optax.sgd(0.05, momentum=0.9)
gx2 = global_batch(mesh, x_all[PID * 4:(PID + 1) * 4])
gl2 = global_batch(mesh, labels_all[PID * 4:(PID + 1) * 4])

p = jax.device_put(variables['params'],
                   jax.tree_util.tree_map(lambda _: rep, variables['params']))
bs = jax.device_put(variables['batch_stats'],
                    jax.tree_util.tree_map(lambda _: rep,
                                           variables['batch_stats']))
ostate = tx.init(p)
step_fn = make_train_step(module, tx, mesh=mesh, donate=False)
for i in range(2):
    p, bs, ostate, metrics = step_fn(p, bs, ostate, gx2, gl2, i)

# single-process full-batch oracle (no mesh)
po, bso = variables['params'], variables['batch_stats']
oo = tx.init(po)
oracle_fn = make_train_step(module, tx, donate=False)
for i in range(2):
    po, bso, oo, om = oracle_fn(po, bso, oo, jnp.asarray(x_all),
                                jnp.asarray(labels_all), i)

flat = jax.tree_util.tree_leaves_with_path(jax.device_get(p))
flat_o = dict(jax.tree_util.tree_leaves_with_path(jax.device_get(po)))
for path, leaf in flat:
    np.testing.assert_allclose(leaf, flat_o[path], rtol=1e-4, atol=1e-5,
                               err_msg=str(path))
np.testing.assert_allclose(float(metrics['loss']), float(om['loss']),
                           rtol=1e-4)
print(f'DIST-TRAIN-OK proc={PID} loss={float(metrics["loss"]):.4f}',
      flush=True)
