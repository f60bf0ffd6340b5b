"""MultiView ResNet — axis-aligned factored 3D convolutions.

Reference: pretorched/models/multiview.py. A single 2D-sized weight
(O, I, k, k) is *reinterpreted* as three axis-aligned 3D kernels —
(1,k,k), (k,1,k), (k,k,1) — applied as three conv3d passes whose outputs are
mixed by a learned Linear(3,1) (multiview.py:13-59). Parameter-efficient
multi-view factorization; experimental in the reference (script-style import,
not in registries).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core.registry import register_model
from .layers import dense, torch_conv_init
from .resnet3d import VideoResNet


class MultiViewConv(nn.Module):
    """Shared-weight three-view conv (channels-last NDHWC)."""

    features: int
    kernel_size: int = 3
    stride: Any = 1
    padding: Any = 0
    bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_ch = x.shape[-1]
        # flax-style (k, k, I, O); the torch converter rule maps
        # (O, I, k, k) -> (k, k, I, O) so checkpoints line up.
        kernel = self.param('kernel', torch_conv_init, (k, k, in_ch, self.features),
                            jnp.float32)
        bias = (self.param('bias', nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.bias else None)
        s = self.stride if isinstance(self.stride, (tuple, list)) else (self.stride,) * 3
        p = self.padding if isinstance(self.padding, (tuple, list)) else (self.padding,) * 3
        # reinterpret the flat (k*k) taps per the reference's .view() trick:
        # torch (O, I, k*k) -> (O, I, 1, k, k) / (O, I, k, 1, k) / (O, I, k, k, 1)
        flat = jnp.transpose(kernel, (3, 2, 0, 1)).reshape(
            self.features, in_ch, k * k)                       # (O, I, k*k)
        shapes = [(1, k, k), (k, 1, k), (k, k, 1)]
        pads = [((0, 0), (p[1], p[1]), (p[2], p[2])),
                ((p[0], p[0]), (0, 0), (p[2], p[2])),
                ((p[0], p[0]), (p[1], p[1]), (0, 0))]
        outs = []
        dtype = self.dtype or x.dtype
        for shape, pad in zip(shapes, pads):
            w = flat.reshape((self.features, in_ch) + shape)
            w = jnp.transpose(w, (2, 3, 4, 1, 0)).astype(dtype)  # DHWIO
            y = jax.lax.conv_general_dilated(
                x.astype(dtype), w, window_strides=s, padding=list(pad),
                dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
            if bias is not None:
                # the reference hands self.bias to EACH F.conv3d
                # (multiview.py:52-57), so the bias rides through the mixer
                y = y + bias.astype(dtype)
            outs.append(y)
        stacked = jnp.stack(outs, axis=-1)                      # (..., O, 3)
        return dense(1, name='linear', dtype=self.dtype)(stacked)[..., 0]


class MVResNet(VideoResNet):
    """VideoResNet whose convolutions are MultiViewConv (multiview.py:82-93).

    The 7x7 stem keeps a standard conv (the reference's MultiViewConv stem
    would reinterpret a 49-tap kernel; reference uses MVConv there too, which
    we match by shape: kernel_size 7)."""

    def _conv(self, x, out_ch, kernel, name, stride=1, padding=0, groups=1,
              train=False, plain=False, s2d=False):
        del plain  # multi-view convs are never factored
        assert not s2d  # s2d_stem folding is not defined for MVConv stems
        ksize = kernel if isinstance(kernel, int) else max(kernel)
        return MultiViewConv(features=out_ch, kernel_size=ksize, stride=stride,
                             padding=padding, bias=False, dtype=self.dtype,
                             name=name)(x)


_CONFIGS = {
    'mvresnet10': ('basic', (1, 1, 1, 1)),
    'mvresnet18': ('basic', (2, 2, 2, 2)),
    'mvresnet34': ('basic', (3, 4, 6, 3)),
    'mvresnet50': ('bottleneck', (3, 4, 6, 3)),
}


def _factory(name):
    def fn(num_classes: int = 400, pretrained=None, shortcut_type: str = 'B'):
        from ..core.factory import build_model
        block, layers = _CONFIGS[name]
        module = MVResNet(block=block, layers=layers, num_classes=num_classes,
                          expansion=1 if block == 'basic' else 4,
                          shortcut_type=shortcut_type)
        return build_model(name, module, {name: {}}, num_classes, pretrained,
                           video=True, input_shape=(1, 8, 64, 64, 3))
    fn.__name__ = name
    fn.__doc__ = f'{name}: multi-view factored 3D ResNet.'
    return register_model(fn, name=name)


mvresnet10 = _factory('mvresnet10')
mvresnet18 = _factory('mvresnet18')
mvresnet34 = _factory('mvresnet34')
mvresnet50 = _factory('mvresnet50')
