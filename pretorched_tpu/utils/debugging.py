"""Numerical-safety checks (SURVEY §5.2).

The reference relies on PyTorch for correctness and offers a debug gradient
hook (pretorched/utils.py:129-138). JAX-native equivalents:

* ``checked(fn)``: wrap a function with ``jax.experimental.checkify`` so NaN /
  inf / OOB-index errors surface as explicit errors instead of silent garbage;
* ``grad_stats(grads)``: per-leaf |grad| means — the grad-hook analog;
* ``assert_finite(tree)``: raise if any leaf contains NaN/inf.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp


def checked(fn: Callable, errors=None) -> Callable:
    """Returns g(*args) -> value, raising on NaN/inf/OOB inside fn."""
    from jax.experimental import checkify

    errors = errors if errors is not None else checkify.float_checks
    cfn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def grad_stats(grads) -> Dict[str, float]:
    """Mean |grad| per top-level param group (reference grad-hook analog)."""
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    out: Dict[str, float] = {}
    for path, leaf in flat:
        key = '.'.join(str(getattr(p, 'key', p)) for p in path[:2])
        out[key] = max(out.get(key, 0.0), float(jnp.abs(leaf).mean()))
    return out


def assert_finite(tree, name: str = 'tree') -> None:
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not bool(jnp.all(jnp.isfinite(leaf))):
            bad.append('.'.join(str(getattr(p, 'key', p)) for p in path))
    if bad:
        raise FloatingPointError(f'non-finite values in {name}: {bad[:5]}')
