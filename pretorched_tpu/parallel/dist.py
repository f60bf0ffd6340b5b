"""Multi-host initialization (DCN) — thin wrapper over jax.distributed.

Reference capability: none (single-host DataParallel only); this is the
north-star multi-chip layer (SURVEY §5.8). Call ``initialize()`` once per
process on a multi-host pod; it is a safe no-op on a single host.
"""

from __future__ import annotations

import os


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize jax.distributed from args or standard env vars; no-op when
    single-process."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        'JAX_COORDINATOR_ADDRESS')
    if coordinator_address is None and num_processes is None:
        return False  # single host
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True
