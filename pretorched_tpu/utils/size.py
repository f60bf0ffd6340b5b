"""Model memory estimation (reference capability: models/utils.py:5-78).

The reference's SizeEstimator runs a probe forward through each torch module
and sums parameter + 2x activation + input bits. On JAX we do it exactly and
for free with ``jax.eval_shape`` — no probe compute, no device memory.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SizeEstimator:
    """Estimate memory footprint of a PretrainedModel in MB.

    total = params + 2 * activations (fwd + grad) + input buffer, matching the
    reference's accounting (models/utils.py:60-70)."""

    def __init__(self, model, input_size: Sequence[int] = (1, 3, 224, 224),
                 bits: int = 32):
        self.model = model
        self.input_size = tuple(input_size)
        self.bits = bits

    def param_bits(self) -> int:
        n = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(self.model.variables['params']))
        return n * self.bits

    def _activation_elems(self) -> int:
        """Sum of all intermediate activation sizes via jaxpr shape analysis."""
        module = self.model.module
        variables = self.model.variables

        def fwd(x):
            return module.apply(variables, x, mode='forward')

        from ..core.wrapper import to_channels_last
        x = jax.ShapeDtypeStruct(self.input_size, jnp.float32)

        def run(x):
            return fwd(to_channels_last(x))

        jaxpr = jax.make_jaxpr(run)(x)
        total = 0
        for eqn in jaxpr.jaxpr.eqns:
            for v in eqn.outvars:
                aval = getattr(v, 'aval', None)
                if aval is not None and hasattr(aval, 'shape'):
                    total += int(np.prod(aval.shape)) if aval.shape else 1
        return total

    def estimate_size(self) -> Tuple[float, int]:
        """Returns (megabytes, total_bits)."""
        input_bits = int(np.prod(self.input_size)) * self.bits
        forward_bits = self._activation_elems() * self.bits * 2  # fwd + grad
        total_bits = self.param_bits() + forward_bits + input_bits
        return total_bits / 8 / 1024 / 1024, total_bits
