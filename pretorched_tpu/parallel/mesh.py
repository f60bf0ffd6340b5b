"""Device-mesh construction and model sharding rules.

The TPU-native replacement for the reference's single multi-device construct
(``nn.DataParallel``, examples/imagenet_eval.py:136 — SURVEY §5.8): a
``jax.sharding.Mesh`` over ('data', 'model') axes. Convnet zoo models are
small relative to chips, so the default policy is:

* batch (and video-clip) axis sharded over 'data' (pure DP over ICI);
* the classifier matmul (``last_linear``) column-sharded over 'model'
  (tensor parallelism for the widest matmul — useful for the 1000+ class
  heads at large batch);
* everything else replicated.

XLA inserts the all-reduces (psum over 'data' for grads/metrics, all-gather
over 'model' for logits) from the shardings alone — no hand-written
collectives needed.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              axis_names: Sequence[str] = ('data', 'model'),
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    With no ``shape``, uses all devices on 'data' (the right default for a
    model zoo: DP scales clip throughput linearly over ICI)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    assert shape[0] * shape[1] == n, (shape, n)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def model_shardings(mesh: Mesh, variables, head_path: str = 'last_linear'):
    """NamedSharding pytree: head kernel column-sharded on 'model',
    everything else replicated."""
    replicated = NamedSharding(mesh, P())

    tp = mesh.shape.get('model', 1)

    def spec_for(path, leaf):
        keys = [getattr(p, 'key', None) for p in path]
        if head_path in keys and tp > 1:
            # column-shard only when the class dim divides the axis (a
            # 101-class fine-tune head on a tp=2 axis stays replicated)
            if keys[-1] == 'kernel' and leaf.shape[-1] % tp == 0:
                return NamedSharding(mesh, P(None, 'model'))
            if keys[-1] == 'bias' and leaf.shape[0] % tp == 0:
                return NamedSharding(mesh, P('model'))
        return replicated

    return jax.tree_util.tree_map_with_path(spec_for, variables)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P('data'))


def global_batch(mesh: Mesh, x, sharding: NamedSharding = None):
    """Place a per-process host batch onto the mesh as one global array.

    Single-process: a plain ``device_put`` (shards the local batch over the
    'data' axis). Multi-process: every process passes ITS OWN local batch
    (e.g. from ``datasets.folder.batch_iterator(shard_id=..., num_shards=
    ...)``) and the result is the global array whose batch dim concatenates
    all processes' batches — feeding a host-local array straight into a jit
    sharded over a multi-host mesh either raises or silently uses 1/nproc
    of the data, so every multi-host feed must go through this (or
    ``jax.make_array_from_process_local_data`` directly)."""
    sharding = sharding or batch_sharding(mesh)
    x = np.asarray(x)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, x)
