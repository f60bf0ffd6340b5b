"""Fused device-side preprocessing (TPU path).

The reference preprocesses on the host with PIL + torchvision compose
(transforms/utils.py:34-81). Here the resize -> crop -> BGR -> range ->
normalize chain runs *on device* as one jit-compiled function (XLA fuses the
elementwise tail into the resize gather): the host only decodes JPEGs to
uint8 arrays, and full batches stream to HBM once.

`fused_preprocess` is tolerance-tested against the PIL oracle
(`transforms.utils.TransformImage`) — `jax.image.resize(antialias=True)`
matches PIL bilinear closely but not bit-exactly (SURVEY §7 'hard parts'),
so golden-accuracy runs can always fall back to the oracle path.

Also provides `ten_crop` (corners+center x hflip) and video-clip batching.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp


def _settings_tuple(settings) -> Tuple:
    get = settings.__getitem__ if isinstance(settings, dict) else \
        lambda k: getattr(settings, k)
    has = settings.__contains__ if isinstance(settings, dict) else \
        lambda k: hasattr(settings, k)
    return (tuple(get('input_size')), get('input_space'),
            tuple(get('input_range')), tuple(get('mean')), tuple(get('std')),
            get('scale') if has('scale') else 0.875)


@functools.partial(jax.jit, static_argnames=('spec', 'channels_last',
                                             'preserve_aspect_ratio', 'dtype'))
def _fused(batch_u8, spec, channels_last: bool = True,
           preserve_aspect_ratio: bool = True, dtype: str = 'float32'):
    (input_size, input_space, input_range, mean, std, scale) = spec
    crop = max(input_size)
    b, h, w, c = batch_u8.shape
    # dtype='bfloat16' runs the whole chain at half the HBM traffic and puts
    # the resize matmuls on the MXU's bf16 path. uint8 -> bf16 is exact
    # (integers <= 256 are representable); the /255 + bilinear rounding is
    # ~2^-9 relative, far inside the model's own bf16 compute noise.
    dt = jnp.dtype(dtype)
    x = batch_u8.astype(dt) / jnp.asarray(255.0, dt)

    if preserve_aspect_ratio:
        # shorter side -> floor(crop/scale), like torchvision Resize(int)
        target_short = int(math.floor(crop / scale))
        if h <= w:
            nh, nw = target_short, int(round(target_short * w / h))
        else:
            nh, nw = int(round(target_short * h / w)), target_short
    else:
        nh = int(input_size[1] / scale)
        nw = int(input_size[2] / scale)
    x = jax.image.resize(x, (b, nh, nw, c), method='bilinear', antialias=True)

    top = int(round((nh - crop) / 2.0))
    left = int(round((nw - crop) / 2.0))
    x = jax.lax.dynamic_slice(x, (0, top, left, 0), (b, crop, crop, c))

    if input_space == 'BGR':
        x = x[..., ::-1]
    if max(input_range) == 255:
        x = x * jnp.asarray(255.0, dt)
    x = (x - jnp.asarray(mean, dt)) / jnp.asarray(std, dt)
    if not channels_last:
        x = jnp.transpose(x, (0, 3, 1, 2))
    return x


def fused_preprocess(batch_u8, settings, channels_last: bool = True,
                     preserve_aspect_ratio: bool = True,
                     dtype: str = 'float32'):
    """uint8 (B, H, W, 3) host batch -> normalized device batch.

    All images in a batch must share a decoded size (bucket by size upstream);
    each distinct size compiles once. ``dtype='bfloat16'`` runs the chain in
    bf16 end-to-end (half the HBM traffic; see ``_fused``) — use it when the
    model consumes bf16 anyway.
    """
    batch_u8 = jnp.asarray(batch_u8)
    if batch_u8.ndim == 3:
        batch_u8 = batch_u8[None]
    return _fused(batch_u8, _settings_tuple(settings),
                  channels_last=channels_last,
                  preserve_aspect_ratio=preserve_aspect_ratio, dtype=dtype)


@functools.partial(jax.jit, static_argnames=('spec', 'channels_last',
                                             'preserve_aspect_ratio', 'dtype',
                                             'random_vflip'))
def _fused_train(batch_u8, key, spec, channels_last: bool = True,
                 preserve_aspect_ratio: bool = True, dtype: str = 'float32',
                 random_vflip: bool = False):
    (input_size, input_space, input_range, mean, std, scale) = spec
    crop = max(input_size)
    b, h, w, c = batch_u8.shape
    dt = jnp.dtype(dtype)
    x = batch_u8.astype(dt) / jnp.asarray(255.0, dt)

    if preserve_aspect_ratio:
        target_short = int(math.floor(crop / scale))
        if h <= w:
            nh, nw = target_short, int(round(target_short * w / h))
        else:
            nh, nw = int(round(target_short * h / w)), target_short
    else:
        nh = int(input_size[1] / scale)
        nw = int(input_size[2] / scale)
    x = jax.image.resize(x, (b, nh, nw, c), method='bilinear', antialias=True)

    # per-sample random crop position + coin-flip flips, all on device
    # (reference: TransformImage(random_crop=True, random_hflip=True) ->
    # torchvision RandomCrop/RandomHorizontalFlip on the host, one PIL image
    # at a time; here one traced program covers the whole batch)
    kt, kl, kh, kv = jax.random.split(key, 4)
    tops = jax.random.randint(kt, (b,), 0, nh - crop + 1)
    lefts = jax.random.randint(kl, (b,), 0, nw - crop + 1)
    x = jax.vmap(
        lambda img, t, l: jax.lax.dynamic_slice(img, (t, l, 0),
                                                (crop, crop, c))
    )(x, tops, lefts)
    hflip = jax.random.bernoulli(kh, 0.5, (b,))
    x = jnp.where(hflip[:, None, None, None], x[:, :, ::-1, :], x)
    if random_vflip:
        vflip = jax.random.bernoulli(kv, 0.5, (b,))
        x = jnp.where(vflip[:, None, None, None], x[:, ::-1, :, :], x)

    if input_space == 'BGR':
        x = x[..., ::-1]
    if max(input_range) == 255:
        x = x * jnp.asarray(255.0, dt)
    x = (x - jnp.asarray(mean, dt)) / jnp.asarray(std, dt)
    if not channels_last:
        x = jnp.transpose(x, (0, 3, 1, 2))
    return x


def fused_train_preprocess(batch_u8, settings, key, channels_last: bool = True,
                           preserve_aspect_ratio: bool = True,
                           dtype: str = 'float32',
                           random_vflip: bool = False):
    """Training-augmentation twin of ``fused_preprocess``: same device-fused
    resize -> crop -> normalize chain, but the crop position is uniform
    per sample and each sample is horizontally flipped with p=0.5 (plus
    optional vertical flips), driven by a JAX PRNG ``key`` — deterministic
    and reproducible, unlike the reference's global-RNG host transforms
    (transforms/utils.py:61-71 random_crop/random_hflip/random_vflip).

    uint8 (B, H, W, 3) host batch + key -> augmented normalized device batch.
    """
    batch_u8 = jnp.asarray(batch_u8)
    if batch_u8.ndim == 3:
        batch_u8 = batch_u8[None]
    return _fused_train(batch_u8, key, _settings_tuple(settings),
                        channels_last=channels_last,
                        preserve_aspect_ratio=preserve_aspect_ratio,
                        dtype=dtype, random_vflip=random_vflip)


@functools.partial(jax.jit, static_argnames=('crop',))
def ten_crop(x, crop: int):
    """Standard 10-crop eval: 4 corners + center, each with hflip.

    x: (B, H, W, C) normalized. Returns (B, 10, crop, crop, C)."""
    b, h, w, c = x.shape
    positions = [(0, 0), (0, w - crop), (h - crop, 0),
                 (h - crop, w - crop), ((h - crop) // 2, (w - crop) // 2)]
    crops = [jax.lax.dynamic_slice(x, (0, t, l, 0), (b, crop, crop, c))
             for t, l in positions]
    crops = jnp.stack(crops, axis=1)                       # (B, 5, ...)
    flipped = crops[:, :, :, ::-1, :]
    return jnp.concatenate([crops, flipped], axis=1)       # (B, 10, ...)


def preprocess_clip(frames_u8, settings, channels_last: bool = True):
    """Video clip: uint8 (T, H, W, 3) -> (1, T, S, S, 3) normalized
    (or NCTHW when channels_last=False)."""
    out = fused_preprocess(frames_u8, settings, channels_last=True)  # (T,S,S,3)
    out = out[None]
    if not channels_last:
        out = jnp.transpose(out, (0, 4, 1, 2, 3))
    return out
