"""Bounded-compilation utilities for dynamic input shapes (SURVEY §7).

XLA compiles one program per input shape. The reference freely accepts
variable spatial sizes (FBResNet, README.md:480-487) and variable clip
lengths; a naive port recompiles for every new (T, H, W) it sees. These
helpers snap shapes onto a small ladder so any stream of inputs hits a
bounded set of compilations:

* ``bucket_dim / bucket_spatial / bucket_frames`` — pure shape math;
* ``resize_to_bucket`` — bilinear-resize a channels-last image batch up to
  its bucket (resizing, not zero-padding: CNN outputs are global-pool
  reductions over real pixels, so padding would silently change results);
* ``resample_frames_to_bucket`` — uniform temporal re-sampling of a clip to
  its frame bucket (the standard video-eval protocol for length mismatch);
* ``BucketedModel`` — wraps a ``PretrainedModel`` so ``model(x)`` first
  canonicalizes the input shape.

Numerics note: bucketing trades exact native-shape evaluation for a bounded
compile set; accuracy-critical runs at a fixed size are unaffected (a shape
already on the ladder passes through untouched).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def bucket_dim(n: int, multiple: int = 32,
               ladder: Optional[Sequence[int]] = None) -> int:
    """Round ``n`` up to the next rung: the smallest ladder entry >= n, or
    the next multiple of ``multiple``. An ``n`` above every ladder rung
    falls back to the multiple rule (never silently downsized — a downsize
    would change eval numerics) with a one-time warning that the compile
    set is no longer bounded by the ladder."""
    if ladder is not None:
        for rung in sorted(ladder):
            if rung >= n:
                return rung
        import warnings
        warnings.warn(
            f'bucket_dim: {n} exceeds every ladder rung {sorted(ladder)}; '
            f'rounding up to a multiple of {multiple} instead (unbounded '
            f'compile set for such sizes)', stacklevel=2)
    return ((n + multiple - 1) // multiple) * multiple


def bucket_spatial(h: int, w: int, multiple: int = 32) -> Tuple[int, int]:
    return bucket_dim(h, multiple), bucket_dim(w, multiple)


def bucket_frames(t: int, multiple: int = 8) -> int:
    return bucket_dim(t, multiple)


def resize_to_bucket(x, multiple: int = 32):
    """Bilinear-resize a channels-last image batch (..., H, W, C) up to its
    spatial bucket. No-op when already on the ladder."""
    h, w = x.shape[-3], x.shape[-2]
    hb, wb = bucket_spatial(h, w, multiple)
    if (hb, wb) == (h, w):
        return x
    shape = x.shape[:-3] + (hb, wb, x.shape[-1])
    return jax.image.resize(x, shape, method='bilinear')


def resample_frames_to_bucket(clip, multiple: int = 8, time_axis: int = 1):
    """Uniformly re-sample a clip's time axis up to its frame bucket
    (nearest-frame duplication, the usual short-video protocol)."""
    t = clip.shape[time_axis]
    tb = bucket_frames(t, multiple)
    if tb == t:
        return clip
    idx = jnp.clip(jnp.round(jnp.linspace(0, t - 1, tb)).astype(jnp.int32),
                   0, t - 1)
    return jnp.take(clip, idx, axis=time_axis)


class BucketedModel:
    """Shape-canonicalizing front for a ``PretrainedModel``.

    ``BucketedModel(model)(x)`` resizes H/W (and re-samples T for 5-D video
    input) to the bucket ladder before the jitted forward, so arbitrary
    input shapes compile at most once per rung.
    """

    def __init__(self, model, spatial_multiple: int = 32,
                 frame_multiple: int = 8,
                 ladder: Optional[Sequence[int]] = None):
        self.model = model
        self.spatial_multiple = spatial_multiple
        self.frame_multiple = frame_multiple
        self.ladder = ladder

    def _canonicalize(self, x):
        x = jnp.asarray(x)
        cf = self.model.data_format == 'channels_first'
        video = x.ndim == 5
        if cf:
            from ..core.wrapper import to_channels_last
            x = to_channels_last(x)
        if video:
            x = resample_frames_to_bucket(x, self.frame_multiple)
        h, w = x.shape[-3], x.shape[-2]
        if self.ladder is not None:
            hb = bucket_dim(h, ladder=self.ladder)
            wb = bucket_dim(w, ladder=self.ladder)
        else:
            hb, wb = bucket_spatial(h, w, self.spatial_multiple)
        if (hb, wb) != (h, w):
            shape = x.shape[:-3] + (hb, wb, x.shape[-1])
            x = jax.image.resize(x, shape, method='bilinear')
        if cf:
            from ..core.wrapper import to_channels_first
            x = to_channels_first(x)
        return x

    def forward(self, x):
        return self.model(self._canonicalize(x))

    __call__ = forward

    def features(self, x):
        return self.model.features(self._canonicalize(x))

    def __getattr__(self, name):
        return getattr(self.model, name)
