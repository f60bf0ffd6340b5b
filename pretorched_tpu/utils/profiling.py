"""Tracing / profiling utilities (SURVEY §5.1).

The reference's closest artifacts are wall-clock AverageMeters
(imagenet_eval.py:163-167) and shape-printing forward hooks
(visu_arch.py:75-92). TPU-native equivalents:

* ``trace(logdir)``: context manager around ``jax.profiler`` — captures a
  TensorBoard-viewable device trace;
* ``StepTimer``: batch/data-time meters with the reference's print format;
* ``op_shapes(fn, *args)``: per-op output shapes from the traced jaxpr
  (exact, no execution) — the hook-printing analog;
* ``flops_estimate(fn, *args)``: XLA cost-analysis FLOPs for a jitted fn.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterable, List, Tuple

import jax


@contextlib.contextmanager
def trace(logdir: str = '/tmp/jax-trace', host_tracer_level: int = 2):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """batch-time / data-time meters (reference: imagenet_eval.py:163-208)."""

    def __init__(self):
        from .misc import AverageMeter
        self.batch_time = AverageMeter()
        self.data_time = AverageMeter()
        self._last = time.time()

    def data_loaded(self):
        now = time.time()
        self.data_time.update(now - self._last)
        return self

    def step_done(self):
        now = time.time()
        self.batch_time.update(now - self._last)
        self._last = now
        return self

    def __str__(self):
        return (f'Time {self.batch_time.val:.3f} ({self.batch_time.avg:.3f})\t'
                f'Data {self.data_time.val:.3f} ({self.data_time.avg:.3f})')


def op_shapes(fn: Callable, *args, ops: Iterable[str] = (
        'conv_general_dilated', 'dot_general')) -> List[Tuple[str, tuple]]:
    """(op_name, output_shape) for selected primitives in the traced fn."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    out = []
    for eqn in jaxpr.jaxpr.eqns:
        if not ops or eqn.primitive.name in ops:
            for v in eqn.outvars:
                aval = getattr(v, 'aval', None)
                if aval is not None and hasattr(aval, 'shape'):
                    out.append((eqn.primitive.name, tuple(aval.shape)))
    return out


def flops_estimate(fn: Callable, *args) -> float:
    """XLA cost-analysis FLOPs of the compiled fn (per invocation)."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return float(analysis.get('flops', float('nan')))
