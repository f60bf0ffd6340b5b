"""Sharded training step (DP + optional TP head), optax-based.

Training-capability parity with the reference's example loop
(imagenet_eval.py:162-208: SGD momentum, CE loss, step-decay LR) expressed as
one jit-compiled function over the mesh: batch sharded on 'data', params
replicated (classifier optionally column-sharded on 'model'); XLA turns the
grad averaging into a psum over ICI.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from .mesh import batch_sharding


def cross_entropy(logits, labels):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def make_train_step(module, tx: optax.GradientTransformation, mesh=None,
                    has_batch_stats: bool = True,
                    dropout_seed: int = 0, remat: bool = False,
                    donate: bool = True, accum_steps: int = 1,
                    zero_axis: str = None,
                    zero_params: bool = False) -> Callable:
    """Returns step(params, batch_stats, opt_state, x, labels, step_idx) ->
    (params, batch_stats, opt_state, metrics).

    **Donation contract** (``donate=True``, the default): the
    params/batch_stats/opt_state *input buffers are donated to XLA* — the
    optimizer update runs in place instead of double-buffering ~3x the param
    bytes in HBM. After the first call, any other reference to the passed
    arrays (e.g. a ``model.variables`` dict the trees were pulled from) points
    at deleted device buffers on TPU; rebind such references to the returned
    trees *before* stepping, or pass ``donate=False`` to keep inputs alive
    (CPU tests ignore donation either way, so only real backends surface
    misuse — as a "donated buffer" error, never silent corruption).

    ``accum_steps > 1`` enables gradient accumulation: the batch (divisible
    by accum_steps) is split into microbatches processed sequentially by a
    ``lax.scan`` inside the one jitted step — activation memory is bounded
    by the microbatch while the optimizer sees the full-batch average
    gradient. BN statistics update per microbatch (sequentially, like
    feeding smaller batches); metrics are averaged over microbatches. The
    batch-hungry configs (SlowFast b>128, resnet3d50 b>128 at 16f 224px)
    use this to push effective batch past the HBM activation ceiling.

    ``zero_axis='data'`` (requires ``mesh``) keeps the optimizer state — and
    with ``zero_params=True`` the params — ZeRO-sharded over that mesh axis
    across steps (see ``parallel.zero``): the updated trees are pinned to the
    same deterministic shardings ``zero_init`` placed them with, so per-device
    optimizer (and param) HBM stays at 1/n instead of silently re-replicating
    on the first step.

    ``remat=True`` rematerializes per residual block when the module supports
    it (a ``remat`` field, e.g. VideoResNet): backprop stores only block
    inputs, ~4/3x FLOPs, so long clips / large batches fit. For modules
    without the field it falls back to checkpointing the whole forward, which
    bounds the *forward's* storage only — measured on v5e, that saves nearly
    nothing (the rematted backward still materializes every intermediate), so
    prefer block-level support."""
    import dataclasses
    if remat and any(f.name == 'remat' for f in dataclasses.fields(module)):
        # pass through as-is: True (all blocks) or a tuple of stage indices
        # (selective remat, e.g. (0,) = stem+layer1 only)
        module = dataclasses.replace(module, remat=remat)
        remat = False

    def loss_fn(params, batch_stats, x, labels, rng):
        mutable = ['batch_stats'] if has_batch_stats else []

        def fwd(params, x):
            variables = {'params': params}
            if has_batch_stats and batch_stats is not None:
                variables['batch_stats'] = batch_stats
            # flax returns (y, mutated) whenever mutable is a list — even []
            # (it checks `mutable is not False`, not truthiness)
            return module.apply(variables, x, train=True, mutable=mutable,
                                rngs={'dropout': rng})

        if remat:
            fwd = jax.checkpoint(fwd)
        logits, new_vars = fwd(params, x)
        loss = cross_entropy(logits, labels)
        return loss, (logits, new_vars.get('batch_stats'))

    def step(params, batch_stats, opt_state, x, labels, step_idx):
        rng = jax.random.fold_in(jax.random.key(dropout_seed), step_idx)
        if accum_steps == 1:
            (loss, (logits, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch_stats, x, labels, rng)
            top1 = jnp.mean(jnp.argmax(logits, axis=1) == labels)
        else:
            assert x.shape[0] % accum_steps == 0, (
                f'batch {x.shape[0]} not divisible by accum_steps '
                f'{accum_steps}')
            micro = x.shape[0] // accum_steps
            xs = x.reshape((accum_steps, micro) + x.shape[1:])
            ls = labels.reshape(accum_steps, micro)
            rngs = jax.random.split(rng, accum_steps)

            def body(carry, inp):
                bs, gsum = carry
                xi, li, ri = inp
                (loss_i, (logits_i, new_bs)), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, bs, xi, li, ri)
                gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
                top1_i = jnp.mean(jnp.argmax(logits_i, axis=1) == li)
                return (new_bs, gsum), (loss_i, top1_i)

            gzero = jax.tree_util.tree_map(jnp.zeros_like, params)
            (new_stats, gsum), (losses, top1s) = jax.lax.scan(
                body, (batch_stats, gzero), (xs, ls, rngs))
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, gsum)
            loss, top1 = jnp.mean(losses), jnp.mean(top1s)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if zero_axis is not None:
            from .zero import constrain_tree
            opt_state = constrain_tree(opt_state, mesh, zero_axis)
            if zero_params:
                params = constrain_tree(params, mesh, zero_axis)
        return params, new_stats, opt_state, {'loss': loss, 'top1': top1}

    donate_argnums = (0, 1, 2) if donate else ()
    if mesh is None:
        assert zero_axis is None, 'zero_axis requires a mesh'
        return jax.jit(step, donate_argnums=donate_argnums)
    bsh = batch_sharding(mesh)
    return jax.jit(step, in_shardings=(None, None, None, bsh, bsh, None),
                   donate_argnums=donate_argnums)


def finetune_mask(params, trainable_prefixes):
    """Boolean pytree: True where the top-level param prefix is trainable.

    The optax analog of the reference's ``get_fine_tuning_parameters``
    (resnet3D.py:221-239: lr=0 for frozen groups). Use with
    ``optax.masked(tx, finetune_mask(params, names))`` where ``names`` comes
    from ``models.resnet3d.get_fine_tuning_parameter_names(ft_begin_index)``;
    ``None`` means train everything."""
    if trainable_prefixes is None:
        return jax.tree_util.tree_map(lambda _: True, params)

    def leaf_trainable(path, _):
        keys = [str(getattr(p, 'key', p)) for p in path]
        return any(k.startswith(pref) for k in keys
                   for pref in trainable_prefixes)

    return jax.tree_util.tree_map_with_path(leaf_trainable, params)


def sgd_step_decay(lr: float = 0.1, momentum: float = 0.9,
                   weight_decay: float = 1e-4, decay_epochs: int = 30,
                   steps_per_epoch: int = 1) -> optax.GradientTransformation:
    """SGD with the reference's 0.1x-every-30-epochs schedule
    (imagenet_eval.py:281-285)."""
    sched = optax.exponential_decay(lr, transition_steps=decay_epochs * steps_per_epoch,
                                    decay_rate=0.1, staircase=True)
    return optax.chain(optax.add_decayed_weights(weight_decay),
                       optax.sgd(sched, momentum=momentum))
