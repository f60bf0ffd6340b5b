"""Ahead-of-time model export for serving (jax.export / StableHLO).

The reference has no serving story (models are eval'd in-process). For
production TPU deployment the natural artifact is an exported StableHLO
module: traced once, serialized with its in/out trees, reloadable in a
process that never imports this package's model code (or in another
framework via the StableHLO portable bytes).

Two artifacts per export:
* ``<path>``           — jax.export serialized bytes (callable after
                         ``load_exported``; includes the calling convention
                         + pytree defs, runs on any platform the export
                         listed via ``platforms``);
* ``<path>.params.msgpack`` — the variables pytree (flax serialization),
                         so serving only needs the two files.

Symbolic batch: ``batch='b'`` exports with a symbolic leading dimension so
one artifact serves any batch size (XLA specializes at call time).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def export_model(model, path: str, input_shape: Sequence[int],
                 batch: Optional[str] = None,
                 platforms: Sequence[str] = ('tpu', 'cpu'),
                 mode: str = 'forward', dtype=jnp.float32) -> None:
    """Serialize ``model``'s jitted forward (channels-last input) to ``path``.

    ``input_shape`` excludes the batch dim, e.g. ``(16, 224, 224, 3)`` for a
    16-frame clip. ``batch='b'`` makes the batch dimension symbolic; an int
    string like ``'8'`` (or None -> 1) pins it.
    """
    from flax import serialization
    from jax import export as jexport

    module = model.module
    variables = model.variables

    def fwd(variables, x):
        return module.apply(variables, x, mode=mode)

    if batch and not batch.isdigit():
        scope = jexport.SymbolicScope()
        (bdim,) = jexport.symbolic_shape(batch, scope=scope)
        x_spec = jax.ShapeDtypeStruct((bdim,) + tuple(input_shape), dtype)
    else:
        b = int(batch) if batch else 1
        x_spec = jax.ShapeDtypeStruct((b,) + tuple(input_shape), dtype)
    var_specs = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
        variables)

    exported = jexport.export(jax.jit(fwd), platforms=list(platforms))(
        var_specs, x_spec)
    data = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)) or '.', exist_ok=True)
    with open(path, 'wb') as f:
        f.write(data)
    with open(path + '.params.msgpack', 'wb') as f:
        f.write(serialization.to_bytes(variables))


def load_exported(path: str):
    """Returns (call, variables): ``call(variables, x)`` runs the exported
    StableHLO module; ``variables`` restored from the sidecar msgpack."""
    from flax import serialization
    from jax import export as jexport

    with open(path, 'rb') as f:
        exported = jexport.deserialize(f.read())
    with open(path + '.params.msgpack', 'rb') as f:
        variables = serialization.msgpack_restore(f.read())
    return exported.call, variables


def stablehlo_text(model, input_shape: Sequence[int], mode: str = 'forward',
                   dtype=jnp.float32) -> str:
    """The model's StableHLO MLIR text (for inspection / external toolchains)."""
    from jax import export as jexport

    module = model.module
    variables = model.variables

    def fwd(variables, x):
        return module.apply(variables, x, mode=mode)

    x_spec = jax.ShapeDtypeStruct((1,) + tuple(input_shape), dtype)
    var_specs = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
        variables)
    return jexport.export(jax.jit(fwd))(var_specs, x_spec).mlir_module()
