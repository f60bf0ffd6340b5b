"""Persistent XLA compilation cache.

The reference's cost model has no compile step — cuDNN kernels are picked at
runtime (reference examples/imagenet_eval.py:90 `cudnn.benchmark = True`).
On TPU the analogous one-time cost is XLA compilation, which for the larger
models here runs tens of seconds per (model, batch, clip-shape) signature.
JAX ships a persistent on-disk compilation cache that makes every signature
a one-time cost *per machine* instead of per process; this module is the
one-call switch for it.

Enabled automatically when ``$PRETORCHED_COMPILE_CACHE`` is set (the value is
the cache directory; ``1``/``true`` selects the default
``~/.cache/pretorched/xla``), or explicitly via :func:`enable_compile_cache`.
The example CLIs expose ``--compile-cache [DIR]``.

Notes:
  * The cache keys include the jaxlib version, backend, and compiler flags,
    so stale entries are never reused across upgrades.
  * ``min_compile_time_secs=0`` caches everything — the models here are
    worth caching even when a single compile is fast, because eval sweeps
    re-enter the same signatures across processes.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser(os.environ.get('XDG_CACHE_HOME', '~/.cache')),
    'pretorched', 'xla')

_TRUTHY = ('1', 'true', 'yes', 'on')
_FALSY = ('0', 'false', 'no', 'off')


def default_cache_dir() -> str:
    """The default on-disk cache location (``~/.cache/pretorched/xla``)."""
    return _DEFAULT_DIR


def enable_compile_cache(directory: str | None = None) -> str:
    """Turn on JAX's persistent compilation cache; returns the directory.

    Safe to call more than once (last call wins). The directory is created
    lazily by JAX on first write.
    """
    import jax

    directory = os.path.expanduser(directory or _DEFAULT_DIR)
    jax.config.update('jax_compilation_cache_dir', directory)
    # cache every executable, however fast its compile was
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    try:
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    except AttributeError:  # renamed/absent on old jax — non-essential
        pass
    return directory


def enable_from_env(var: str = 'PRETORCHED_COMPILE_CACHE') -> str | None:
    """Enable the cache iff ``$var`` is set; returns the directory or None.

    ``$var`` may hold a directory path, or a bare truthy flag to use
    :func:`default_cache_dir`.
    """
    val = os.environ.get(var, '').strip()
    if not val or val.lower() in _FALSY:
        return None
    directory = None if val.lower() in _TRUTHY else val
    return enable_compile_cache(directory)


def enable_from_flag(value: str | None) -> str | None:
    """CLI-flag twin of :func:`enable_from_env` (``--compile-cache [DIR]``).

    ``None`` leaves the cache off; a bare truthy string selects the default
    directory; anything else is the directory.
    """
    if value is None:
        return None
    val = value.strip()
    if val.lower() in _FALSY:
        return None
    directory = None if (not val or val.lower() in _TRUTHY) else val
    return enable_compile_cache(directory)
