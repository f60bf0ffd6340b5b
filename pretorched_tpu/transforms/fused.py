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


def _resize_target(h, w, crop, scale, preserve_aspect_ratio, input_size):
    """Resized (nh, nw) before the center/random crop."""
    if preserve_aspect_ratio:
        # shorter side -> floor(crop/scale), like torchvision Resize(int)
        target_short = int(math.floor(crop / scale))
        if h <= w:
            return target_short, int(round(target_short * w / h))
        return int(round(target_short * h / w)), target_short
    return int(input_size[1] / scale), int(input_size[2] / scale)


def _affine_consts(input_range, mean, std, dt):
    """Fold u8->[0,1] (or [0,255]) range scaling + mean/std into one FMA.

    value = (u8 * k - mean) / std  ==  u8 * (k/std) + (-mean/std), with the
    constants computed once in float64 — one elementwise pass instead of
    three, and the BGR-255 models skip the lossy u8/255*255 bf16 roundtrip.
    """
    import numpy as np
    k = 1.0 if max(input_range) == 255 else 1.0 / 255.0
    std64 = np.asarray(std, np.float64)
    mul = k / std64
    add = -np.asarray(mean, np.float64) / std64
    return jnp.asarray(mul, dt), jnp.asarray(add, dt)


def _finalize(x, input_space, input_range, mean, std, dt, channels_last):
    """Shared tail of the eval and train chains: channel order, the
    normalize FMA, and the layout transpose — one definition so the two
    jitted bodies cannot drift apart."""
    if input_space == 'BGR':
        x = x[..., ::-1]
    mul, add = _affine_consts(input_range, mean, std, dt)
    x = x * mul + add
    if not channels_last:
        x = jnp.transpose(x, (0, 3, 1, 2))
    return x


@functools.partial(jax.jit, static_argnames=('spec', 'channels_last',
                                             'preserve_aspect_ratio', 'dtype'))
def _fused(batch_u8, spec, channels_last: bool = True,
           preserve_aspect_ratio: bool = True, dtype: str = 'float32'):
    (input_size, input_space, input_range, mean, std, scale) = spec
    crop = max(input_size)
    b, h, w, c = batch_u8.shape
    # dtype='bfloat16' runs the whole chain at half the HBM traffic and puts
    # the resize matmuls on the MXU's bf16 path. uint8 -> bf16 is exact
    # (integers <= 256 are representable); the bilinear + affine rounding is
    # ~2^-9 relative, far inside the model's own bf16 compute noise.
    dt = jnp.dtype(dtype)

    nh, nw = _resize_target(h, w, crop, scale, preserve_aspect_ratio,
                            input_size)
    top = int(round((nh - crop) / 2.0))
    left = int(round((nw - crop) / 2.0))

    if (nh, nw) == (h, w):
        # identity resize (e.g. 256px decode -> 256 short side): crop the
        # uint8 window *first*, so the cast/normalize pass only touches
        # crop^2 pixels instead of h*w
        x = jax.lax.dynamic_slice(
            batch_u8, (0, top, left, 0), (b, crop, crop, c)).astype(dt)
    else:
        # fused resize+crop: compute only the crop window's output pixels.
        # jax.image.resize output pixel o samples input coord
        # (o+0.5)/s - 0.5; with translation=-top the window pixel j samples
        # (top+j+0.5)/s - 0.5 — the identical grid, so this equals
        # resize-then-slice without materializing the full resized image
        # (~1.7x less resize compute at scale=0.875).
        x = jax.image.scale_and_translate(
            batch_u8.astype(dt), (b, crop, crop, c), (1, 2),
            scale=jnp.asarray([nh / h, nw / w], jnp.float32),
            translation=jnp.asarray([-float(top), -float(left)], jnp.float32),
            method='bilinear', antialias=True)

    return _finalize(x, input_space, input_range, mean, std, dt,
                     channels_last)


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

    nh, nw = _resize_target(h, w, crop, scale, preserve_aspect_ratio,
                            input_size)
    identity_resize = (nh, nw) == (h, w)
    if identity_resize:
        x = batch_u8          # crop/flip directly on the uint8 frames
    else:
        x = jax.image.resize(batch_u8.astype(dt), (b, nh, nw, c),
                             method='bilinear', antialias=True)

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
    if identity_resize:
        x = x.astype(dt)      # cast only the crop^2 window

    return _finalize(x, input_space, input_range, mean, std, dt,
                     channels_last)


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
