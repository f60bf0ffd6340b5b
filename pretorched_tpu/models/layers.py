"""Leaf layer constructors shared by every model family.

Design rules (TPU-first):

* All modules are channels-last — ``(N, H, W, C)`` / ``(N, T, H, W, C)`` —
  the layout XLA tiles best onto the MXU. The public API edge (``core.wrapper``)
  converts from the reference's channels-first contract once per call.
* Leaf modules are given **PyTorch-style dotted names** (``layer1.0.conv1``)
  so that a converted PyTorch checkpoint maps onto the Flax param tree by a
  purely mechanical rule (see ``zoo/convert.py``): flax path == torch key
  prefix, ``kernel``↔``weight`` (+layout transpose), ``scale``↔``weight`` for
  norms, batch_stats ``mean/var``↔``running_mean/running_var``.
* Compute dtype is configurable (bf16 on TPU); params stay float32 for
  checkpoint fidelity (classic mixed precision).

Reference parity notes: torch Conv default padding is symmetric-explicit,
which maps 1:1 to ``lax.conv_general_dilated`` padding pairs; grouped conv
maps to ``feature_group_count``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

IntOrTuple = Union[int, Sequence[int]]


def _tup(v: IntOrTuple, n: int):
    if isinstance(v, (tuple, list)):
        assert len(v) == n, (v, n)
        return tuple(int(x) for x in v)
    return (int(v),) * n


# torch's default conv init: kaiming_uniform(a=sqrt(5)) == variance_scaling
# with scale 1/3, fan_in, uniform. Models that want kaiming-normal fan_out
# (resnet3D.py:195-201) pass `kernel_init=kaiming_normal_out`.
torch_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, 'fan_in', 'uniform')
kaiming_normal_out = nn.initializers.variance_scaling(2.0, 'fan_out', 'normal')


def conv(features: int, kernel_size: IntOrTuple, *, ndim: int, stride: IntOrTuple = 1,
         padding: Any = 0, dilation: IntOrTuple = 1, groups: int = 1,
         bias: bool = True, name: str, dtype: Any = None,
         kernel_init=torch_conv_init) -> nn.Conv:
    """N-d convolution with torch-style symmetric integer padding."""
    if isinstance(padding, str):
        pad = padding
    else:
        pad = [(p, p) for p in _tup(padding, ndim)]
    return nn.Conv(
        features=features,
        kernel_size=_tup(kernel_size, ndim),
        strides=_tup(stride, ndim),
        padding=pad,
        kernel_dilation=_tup(dilation, ndim),
        feature_group_count=groups,
        use_bias=bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=kernel_init,
        name=name,
    )


def conv1d(features, kernel_size, stride=1, padding=0, dilation=1, groups=1,
           bias=True, *, name, dtype=None, kernel_init=torch_conv_init):
    return conv(features, kernel_size, ndim=1, stride=stride, padding=padding,
                dilation=dilation, groups=groups, bias=bias, name=name,
                dtype=dtype, kernel_init=kernel_init)


def conv2d(features, kernel_size, stride=1, padding=0, dilation=1, groups=1,
           bias=True, *, name, dtype=None, kernel_init=torch_conv_init):
    return conv(features, kernel_size, ndim=2, stride=stride, padding=padding,
                dilation=dilation, groups=groups, bias=bias, name=name,
                dtype=dtype, kernel_init=kernel_init)


def conv3d(features, kernel_size, stride=1, padding=0, dilation=1, groups=1,
           bias=True, *, name, dtype=None, kernel_init=torch_conv_init):
    return conv(features, kernel_size, ndim=3, stride=stride, padding=padding,
                dilation=dilation, groups=groups, bias=bias, name=name,
                dtype=dtype, kernel_init=kernel_init)


def batch_norm(*, train: bool = False, momentum: float = 0.1, eps: float = 1e-5,
               affine: bool = True, name: str, dtype: Any = None) -> nn.BatchNorm:
    """BatchNorm with torch conventions.

    ``momentum`` is the *torch* momentum (new-stat weight); flax's momentum is
    the running-stat decay, i.e. ``1 - torch_momentum`` (bninception.py:33 uses
    0.9 which becomes flax 0.1).
    """
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=1.0 - momentum,
        epsilon=eps,
        use_bias=affine,
        use_scale=affine,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def dense(features: int, *, bias: bool = True, name: str, dtype: Any = None,
          kernel_init=nn.initializers.variance_scaling(1.0 / 3.0, 'fan_in', 'uniform')
          ) -> nn.Dense:
    return nn.Dense(features, use_bias=bias, dtype=dtype,
                    param_dtype=jnp.float32, kernel_init=kernel_init, name=name)


def dropout(rate: float, *, train: bool, name: Optional[str] = None):
    return nn.Dropout(rate=rate, deterministic=not train, name=name)


def relu(x):
    return jax.nn.relu(x)


class SpaceToDepthConv(nn.Module):
    """Stride-(.,2,2) stem conv evaluated via exact space-to-depth folding
    (ops/space_to_depth.py): the stored kernel keeps the torch-compatible
    shape; folding is a re-indexing done at apply time (fused by XLA). 4x
    better MXU lane utilization on 3-channel stems."""

    features: int
    kernel_size: Any = 7          # int, or (kt, kh, kw) for ndim=3 with
    #                               kh == kw odd; temporal stride stays 1
    ndim: int = 3                 # 3 -> NDHWC with stride (1,2,2); 2 -> NHWC
    fold: int = 2                 # 2 | 4 — fold-4 also packs the 2x2 output
    #                               parities into channels (4x more MXU output
    #                               lanes; wins when features is small, e.g.
    #                               SlowFast's 8-channel fast stem: 39.3 ->
    #                               31.8 ms incl. stem pool, tools/stem_probe).
    #                               Requires ndim=3, spatial kernel 7,
    #                               H/W % 4 == 0; falls back to fold-2
    #                               otherwise.
    dtype: Any = None
    kernel_init: Any = None

    @nn.compact
    def __call__(self, x):
        from ..ops.space_to_depth import (depth_to_space_2,
                                          fold4_stem_kernel_3d,
                                          fold_stem_kernel_2d,
                                          fold_stem_kernel_3d,
                                          space_to_depth_2d,
                                          space_to_depth_4)
        ks = self.kernel_size
        if isinstance(ks, int):
            ks = (ks,) * self.ndim
        assert len(ks) == self.ndim, (ks, self.ndim)
        assert ks[-2] == ks[-1] and ks[-1] % 2 == 1, (
            f'space-to-depth folding needs a square odd spatial kernel, '
            f'got {ks}')
        kt = ks[0] if self.ndim == 3 else None
        k = ks[-1]                 # spatial size (square)
        in_ch = x.shape[-1]
        shape = ((kt, k, k, in_ch, self.features) if self.ndim == 3
                 else (k, k, in_ch, self.features))
        kernel = self.param('kernel', self.kernel_init or kaiming_normal_out,
                            shape, jnp.float32)
        dtype = self.dtype or x.dtype
        if (self.fold == 4 and self.ndim == 3 and k == 7
                and x.shape[-3] % 4 == 0 and x.shape[-2] % 4 == 0):
            xf = space_to_depth_4(x.astype(dtype))
            kf = fold4_stem_kernel_3d(kernel).astype(dtype)
            y = jax.lax.conv_general_dilated(
                xf, kf, (1, 1, 1), [(kt // 2, kt // 2), (0, 0), (0, 0)],
                dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
            b, t, hh, ww, _ = y.shape
            return depth_to_space_2(y.reshape(b, t, hh, ww, 2, 2,
                                              self.features))
        lpad = k // 2 + 1
        rpad = k // 2 - 1
        if (x.shape[-3] + lpad + rpad) % 2 or (x.shape[-2] + lpad + rpad) % 2:
            # odd spatial size: the 2x2 folding doesn't tile; run the
            # equivalent plain strided conv (same kernel, same math)
            if self.ndim == 3:
                return jax.lax.conv_general_dilated(
                    x.astype(dtype), kernel.astype(dtype), (1, 2, 2),
                    [(kt // 2, kt // 2), (k // 2, k // 2), (k // 2, k // 2)],
                    dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
            return jax.lax.conv_general_dilated(
                x.astype(dtype), kernel.astype(dtype), (2, 2),
                [(k // 2, k // 2)] * 2,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        xf = space_to_depth_2d(x.astype(dtype), lpad=lpad, rpad=rpad)
        if self.ndim == 3:
            kf = fold_stem_kernel_3d(kernel).astype(dtype)
            return jax.lax.conv_general_dilated(
                xf, kf, (1, 1, 1),
                [(kt // 2, kt // 2), (0, 0), (0, 0)],
                dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
        kf = fold_stem_kernel_2d(kernel).astype(dtype)
        return jax.lax.conv_general_dilated(
            xf, kf, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class Identity(nn.Module):
    """No-op module — the reference exports this for the `last_linear = Identity()`
    feature-extraction trick (reference: models/utils.py:81-87,
    examples/voc2007_extract.py:147)."""

    @nn.compact
    def __call__(self, x):
        return x


def flatten(x):
    return x.reshape((x.shape[0], -1))


def flatten_torch_order(x):
    """Flatten a channels-last feature map in torch's CHW-major order.

    Needed wherever a converted torch Linear consumes a flattened conv map
    (alexnet/vgg classifier heads): torch flattens (C, H, W) contiguously, so
    we transpose back before reshaping to keep converted weights bit-exact."""
    if x.ndim == 4:
        x = jnp.transpose(x, (0, 3, 1, 2))
    return x.reshape((x.shape[0], -1))
