"""Sharded evaluation — DP validate() over a device mesh.

Replaces the reference's DataParallel eval loop (imagenet_eval.py:211-253)
with a jit-compiled step whose batch is sharded over the mesh's 'data' axis;
XLA reduces the metric sums over ICI. Multi-clip video eval (10-clip) shards
the batch x clip product the same way.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .mesh import batch_sharding, model_shardings


def sharded_accuracy_step(module, mesh=None, topk=(1, 5)):
    """Returns step(variables, images_channels_last, labels) ->
    (correct@k sums, loss sum, count) computed under the mesh sharding."""

    def step(variables, x, labels):
        logits = module.apply(variables, x)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        loss = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
        order = jnp.argsort(-logits, axis=1)[:, :max(topk)]
        correct = order == labels[:, None]
        out = {f'top{k}': jnp.sum(jnp.any(correct[:, :k], axis=1)) for k in topk}
        out['loss'] = jnp.sum(loss)
        out['count'] = jnp.asarray(labels.shape[0], jnp.int32)
        return out

    if mesh is None:
        return jax.jit(step)
    bsh = batch_sharding(mesh)
    return jax.jit(step, in_shardings=(None, bsh, bsh))


def make_eval_step(model, mesh=None, topk=(1, 5)) -> Callable:
    """Eval step bound to a PretrainedModel (channels-last input)."""
    return sharded_accuracy_step(model.module, mesh=mesh, topk=topk)


def multi_clip_eval_step(module, mesh=None, topk=(1, 5)):
    """10-clip (or N-clip) video evaluation: logits averaged over clips per
    video, the batch x clip product sharded over the mesh's 'data' axis
    (BASELINE config 4; the reference has no multi-clip eval loop — this is
    the north-star capability).

    step(variables, clips, labels): clips (B, N_clips, T, H, W, C)."""

    def step(variables, clips, labels):
        b, n = clips.shape[:2]
        flat = clips.reshape((b * n,) + clips.shape[2:])
        logits = module.apply(variables, flat)
        logits = logits.reshape(b, n, -1).astype(jnp.float32)
        probs = jax.nn.log_softmax(logits, axis=-1)
        avg = jnp.mean(probs, axis=1)                 # consensus over clips
        order = jnp.argsort(-avg, axis=1)[:, :max(topk)]
        correct = order == labels[:, None]
        out = {f'top{k}': jnp.sum(jnp.any(correct[:, :k], axis=1)) for k in topk}
        out['count'] = jnp.asarray(b, jnp.int32)
        return out

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
