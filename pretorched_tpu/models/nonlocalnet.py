"""Non-local neural networks.

Reference: pretorched/models/nonlocalnet.py. The non-local block
(:51-243) is attention over all T*H*W positions:

* ``embedded_gaussian`` / ``gaussian``: softmax affinity -> computed with the
  blockwise Pallas kernel (ops/pallas/nonlocal_attention.py) on TPU instead
  of materializing the O(N^2) matrix;
* ``dot_product``: affinity / N — linear, evaluated in O(N*C^2) via
  associativity (never forms N x N at all);
* ``concatenation``: ReLU(w.[theta;phi]) / N — decomposes as
  ReLU(w_t.theta_i + w_p.phi_j), evaluated without the N x N concat tensor.

Parity notes: W projection's BN is zero-initialized so blocks start as
identity (nonlocalnet.py:94-101); optional ``sub_sample`` max-pools phi/g
(:126-131); NonLocalResNet3D interleaves blocks every ``blocks //
nonlocal_blocks`` within a stage (:474-485), configs 5 -> [0,2,3,0] and
10 -> [0,4,6,0] (:556-560); checkpoints load with strict=False (:564).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ..core.registry import register_model, register_settings
from ..ops.pallas.nonlocal_attention import (auto_nonlocal_attention,
                                             linear_nonlocal_attention)
from ..ops.pooling import max_pool
from .layers import batch_norm, conv, dense, relu
from .resnet3d import VideoResNet, video_settings

_NL_URLS = {
    'kinetics-400': {
        'nonlocalresnet3d50': 'http://pretorched-x.csail.mit.edu/models/resnet3d50_kinetics-aad059c9.pth',
    },
    'moments': {},
}

pretrained_settings = video_settings(['nonlocalresnet3d50'], urls=_NL_URLS)


class NonLocalBlock(nn.Module):
    """N-d non-local block on channels-last input (..., C)."""

    in_channels: int
    inter_channels: Optional[int] = None
    dimension: int = 3
    mode: str = 'embedded_gaussian'
    sub_sample: bool = False
    bn_layer: bool = True
    dtype: Any = None

    @property
    def _inter(self):
        return self.inter_channels or max(self.in_channels // 2, 1)

    def _conv1(self, x, out_ch, name):
        return conv(out_ch, 1, ndim=self.dimension, name=name,
                    dtype=self.dtype)(x)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        spatial = x.shape[1:-1]
        n = 1
        for s in spatial:
            n *= s
        inter = self._inter

        g_name = 'g.0' if self.sub_sample else 'g'
        g_x = self._conv1(x, inter, g_name)
        if self.sub_sample:
            g_x = max_pool(g_x, 2, 2)
        g_flat = g_x.reshape(b, -1, inter)

        if self.mode == 'gaussian':
            theta = x.reshape(b, n, self.in_channels)
            phi_x = max_pool(x, 2, 2) if self.sub_sample else x
            phi = phi_x.reshape(b, -1, self.in_channels)
            y = auto_nonlocal_attention(theta, phi, g_flat)
        else:
            theta = self._conv1(x, inter, 'theta').reshape(b, n, inter)
            phi_name = 'phi.0' if self.sub_sample else 'phi'
            phi_x = self._conv1(x, inter, phi_name)
            if self.sub_sample:
                phi_x = max_pool(phi_x, 2, 2)
            phi = phi_x.reshape(b, -1, inter)
            if self.mode == 'embedded_gaussian':
                y = auto_nonlocal_attention(theta, phi, g_flat)
            elif self.mode == 'dot_product':
                y = linear_nonlocal_attention(theta, phi, g_flat)
            elif self.mode == 'concatenation':
                # f_ij = ReLU(w.[theta_i; phi_j]); y = (f @ g) / N
                # (nonlocalnet.py:213-243). The 1x1 conv over the concat
                # decomposes as w_t.theta_i + w_p.phi_j, so the N x N concat
                # tensor never needs to exist: apply the conv to each half
                # (other half zeroed) and broadcast-add.
                proj = conv(1, 1, ndim=2, bias=False, name='concat_project.0',
                            dtype=self.dtype)
                zeros_t = jnp.zeros_like(theta)
                a = proj(jnp.concatenate([theta, zeros_t], -1)[:, :, None, :])
                zeros_p = jnp.zeros_like(phi)
                c = proj(jnp.concatenate([zeros_p, phi], -1)[:, :, None, :])
                f = relu(a[:, :, 0, 0][:, :, None] + c[:, :, 0, 0][:, None, :])
                m = f.shape[-1]
                y = jnp.einsum('bnm,bmc->bnc', f, g_flat) / m
            else:
                raise ValueError(self.mode)

        y = y.reshape((b,) + spatial + (inter,))
        w_name = 'W.0' if self.bn_layer else 'W'
        wy = conv(self.in_channels, 1, ndim=self.dimension, name=w_name,
                  dtype=self.dtype,
                  kernel_init=nn.initializers.zeros if not self.bn_layer
                  else nn.initializers.variance_scaling(1 / 3, 'fan_in', 'uniform'))(y)
        if self.bn_layer:
            # zero-init BN scale: the block starts as identity
            wy = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, scale_init=nn.initializers.zeros,
                              param_dtype=jnp.float32, dtype=self.dtype,
                              name='W.1')(wy)
        return wy + x


def NonLocalBlock1D(in_channels, **kw):
    return NonLocalBlock(in_channels=in_channels, dimension=1, **kw)


def NonLocalBlock2D(in_channels, **kw):
    return NonLocalBlock(in_channels=in_channels, dimension=2, **kw)


def NonLocalBlock3D(in_channels, **kw):
    return NonLocalBlock(in_channels=in_channels, dimension=3, **kw)


class MNISTNonLocalNet(nn.Module):
    """Tutorial 2D non-local net (reference: nonlocalnet.py:273-305)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..ops.pooling import max_pool as mp
        for i, ch in enumerate((32, 64, 128)):
            if i > 0:
                x = NonLocalBlock2D(x.shape[-1], dtype=self.dtype,
                                    name=f'nonlocal{i}')(x, train=train)
            x = conv(ch, 3, ndim=2, padding=1, name=f'conv{i}',
                     dtype=self.dtype)(x)
            x = batch_norm(train=train, name=f'bn{i}', dtype=self.dtype)(x)
            x = relu(x)
            x = mp(x, 2, 2)
        x = x.reshape((x.shape[0], -1))
        x = relu(dense(256, name='fc1', dtype=self.dtype)(x))
        return dense(10, name='fc2', dtype=self.dtype)(x)


class NonLocalResNet3D(VideoResNet):
    """VideoResNet with non-local blocks interleaved per stage
    (reference: nonlocalnet.py:423-508)."""

    nonlocal_layers: Sequence[int] = (0, 2, 3, 0)
    nonlocal_mode: str = 'embedded_gaussian'

    def _maybe_nonlocal(self, x, stage, i, train):
        blocks = self.layers[stage - 1]
        nl = self.nonlocal_layers[stage - 1]
        freq = blocks // nl if nl else 0
        if freq and i % freq == 0:
            x = NonLocalBlock(in_channels=x.shape[-1], dimension=3,
                              mode=self.nonlocal_mode, dtype=self.dtype,
                              name=f'layer{stage}.{i}.nonlocalblock')(x, train=train)
        return x

    @nn.compact
    def __call__(self, x, mode: str = 'forward', head: bool = True,
                 train: bool = False):
        block_fn = self._block_fn()
        if mode in ('forward', 'features'):
            x = self._conv(x, 64, 7, 'conv1', stride=(1, 2, 2), padding=3,
                           train=train)
            x = relu(self._bn(x, 'bn1', train))
            x = max_pool(x, 3, 2, 1)
            inplanes = 64
            for stage, (planes, blocks, stride) in enumerate(
                    zip(self.width_per_stage, self.layers, (1, 2, 2, 2)), start=1):
                for i in range(blocks):
                    s = stride if i == 0 else 1
                    down = s != 1 or inplanes != planes * self.expansion
                    x = block_fn(x, planes, s, down, f'layer{stage}.{i}', train)
                    inplanes = planes * self.expansion
                    x = self._maybe_nonlocal(x, stage, i, train)
            if mode == 'features':
                return x
        if mode in ('forward', 'logits'):
            from ..ops.pooling import global_avg_pool
            x = global_avg_pool(x)
            if head:
                x = dense(self.num_classes, name='last_linear', dtype=self.dtype)(x)
        return x


_CONFIGS = {
    'nonlocalresnet3d': ('basic', (1, 1, 1, 1)),
    'nonlocalresnet3d18': ('basic', (2, 2, 2, 2)),
    'nonlocalresnet3d34': ('basic', (3, 4, 6, 3)),
    'nonlocalresnet3d50': ('bottleneck', (3, 4, 6, 3)),
    'nonlocalresnet3d101': ('bottleneck', (3, 4, 23, 3)),
    'nonlocalresnet3d152': ('bottleneck', (3, 8, 36, 3)),
    'nonlocalresnet3d200': ('bottleneck', (3, 24, 36, 3)),
}


def _build(name, num_classes, pretrained, nonlocal_layers, shortcut_type='A'):
    from ..core.factory import build_model
    block, layers = _CONFIGS[name]
    module = NonLocalResNet3D(
        block=block, layers=layers, num_classes=num_classes,
        expansion=1 if block == 'basic' else 4, shortcut_type=shortcut_type,
        nonlocal_layers=nonlocal_layers)
    settings_map = pretrained_settings if name in pretrained_settings else {name: {}}
    return build_model(name, module, settings_map, num_classes, pretrained,
                       torch_renames={'last_linear': 'fc'}, video=True,
                       converter_opts={'strict': False}, check_num_classes=False,
                       input_shape=(1, 8, 112, 112, 3))


def _factory(name, nl=(0, 2, 3, 0)):
    def fn(num_classes: int = 339, pretrained=None,
           nonlocal_layers: Sequence[int] = nl, shortcut_type: str = 'A'):
        return _build(name, num_classes, pretrained, nonlocal_layers,
                      shortcut_type)
    fn.__name__ = name
    fn.__doc__ = f'Constructs a {name} model (non-local attention).'
    return register_model(fn, name=name)


nonlocalresnet3d18 = _factory('nonlocalresnet3d18')
nonlocalresnet3d34 = _factory('nonlocalresnet3d34')
nonlocalresnet3d101 = _factory('nonlocalresnet3d101')
nonlocalresnet3d152 = _factory('nonlocalresnet3d152')


@register_model
def nonlocalresnet3d50(num_classes: int = 339, num_nonlocal_blocks: int = 5,
                       pretrained='kinetics-400', shortcut_type: str = 'A'):
    """NonLocal ResNet3D-50 (nonlocalnet.py:552-568): 5 blocks -> [0,2,3,0],
    10 -> [0,4,6,0]; backbone checkpoint loads with strict=False."""
    nonlocal_layers = (0, 2, 3, 0) if num_nonlocal_blocks == 5 else (0, 4, 6, 0)
    if pretrained is not None:
        # the hosted checkpoint is the plain Kinetics resnet3d50 (400 classes)
        settings = pretrained_settings['nonlocalresnet3d50'][pretrained]
        if num_classes != settings['num_classes']:
            import warnings
            warnings.warn(
                f'nonlocalresnet3d50 checkpoint has {settings["num_classes"]} '
                f'classes; head stays randomly initialized for {num_classes}.')
    return _build('nonlocalresnet3d50', num_classes, pretrained,
                  nonlocal_layers, shortcut_type)


register_settings(pretrained_settings)
