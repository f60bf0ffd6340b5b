"""Sharded evaluation — DP validate() over a device mesh.

Replaces the reference's DataParallel eval loop (imagenet_eval.py:211-253)
with a jit-compiled step whose batch is sharded over the mesh's 'data' axis;
XLA reduces the metric sums over ICI. Multi-clip video eval (10-clip) shards
the batch x clip product the same way.

Uneven batches: ``in_shardings=P('data')`` needs the batch divisible by the
mesh's data-axis size, but real loaders yield ragged final batches.  All
steps here treat ``label == -1`` as padding (masked out of every metric sum,
including 'count'), and ``pad_batch`` pads a host batch up to the next
multiple with -1 labels.  Padding to a fixed multiple also keeps the number
of distinct compiled shapes bounded.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import batch_sharding, model_shardings


def pad_batch(x, labels, multiple: int):
    """Pad (x, labels) along axis 0 to a multiple of ``multiple``.

    Padded rows get label -1, which every eval step here masks out.  No-op
    when already divisible. Device arrays stay on device."""
    n = len(labels)
    if multiple <= 1 or n % multiple == 0:
        return x, labels
    pad = multiple - n % multiple
    xp = jnp if isinstance(x, jax.Array) else np
    x = xp.concatenate([x, xp.zeros((pad,) + tuple(x.shape[1:]), x.dtype)])
    labels = np.concatenate([np.asarray(labels),
                             np.full((pad,), -1, np.asarray(labels).dtype)])
    return x, labels


def _masked_metrics(logits, labels, topk):
    """top-k correct sums + NLL sum + count, rows with label -1 masked out."""
    valid = labels >= 0
    safe = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    loss = -jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
    order = jnp.argsort(-logits, axis=1)[:, :max(topk)]
    correct = (order == safe[:, None]) & valid[:, None]
    out = {f'top{k}': jnp.sum(jnp.any(correct[:, :k], axis=1)) for k in topk}
    out['loss'] = jnp.sum(jnp.where(valid, loss, 0.0))
    out['count'] = jnp.sum(valid.astype(jnp.int32))
    return out


def sharded_accuracy_step(module, mesh=None, topk=(1, 5)):
    """Returns step(variables, images_channels_last, labels) ->
    (correct@k sums, loss sum, count) computed under the mesh sharding."""

    def step(variables, x, labels):
        logits = module.apply(variables, x)
        return _masked_metrics(logits, labels, topk)

    if mesh is None:
        return jax.jit(step)
    bsh = batch_sharding(mesh)
    return jax.jit(step, in_shardings=(None, bsh, bsh))


def make_eval_step(model, mesh=None, topk=(1, 5)) -> Callable:
    """Eval step bound to a PretrainedModel (channels-last input)."""
    return sharded_accuracy_step(model.module, mesh=mesh, topk=topk)


def multi_clip_eval_step(module, mesh=None, topk=(1, 5)):
    """10-clip (or N-clip) video evaluation, the batch x clip product sharded
    over the mesh's 'data' axis (BASELINE config 4; the reference has no
    multi-clip eval loop — this is the north-star capability).

    Consensus: per-clip softmax probabilities are arithmetically averaged
    over clips; accuracy and loss (NLL of the consensus probability) come
    from that average. step(variables, clips, labels): clips
    (B, N_clips, T, H, W, C); label -1 rows are padding.
    """

    def step(variables, clips, labels):
        b, n = clips.shape[:2]
        flat = clips.reshape((b * n,) + clips.shape[2:])
        logits = module.apply(variables, flat)
        logits = logits.reshape(b, n, -1).astype(jnp.float32)
        probs = jnp.mean(jax.nn.softmax(logits, axis=-1), axis=1)
        logp = jnp.log(jnp.maximum(probs, 1e-30))
        return _masked_metrics(logp, labels, topk)

    if mesh is None:
        return jax.jit(step)
    bsh = batch_sharding(mesh)
    return jax.jit(step, in_shardings=(None, bsh, bsh))


def place_model(model, mesh):
    """Shard a PretrainedModel's variables per the default policy (replicated
    params, TP classifier when mesh has a >1 'model' axis)."""
    sh = model_shardings(mesh, model.variables, model.head_path or '')
    model.variables = jax.device_put(model.variables, sh)
    return model
