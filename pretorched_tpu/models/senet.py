"""SENet family: senet154, se_resnet50/101/152, se_resnext50/101_32x4d.

Reference: pretorched/models/senet.py. The squeeze-excite op (:85-105) —
global pool -> 1x1 conv -> relu -> 1x1 conv -> sigmoid -> channel scale — is
left to XLA fusion (it is a tiny matmul chain on a (B,1,1,C) tensor; fusing
into the residual add is automatic on TPU).

Parity notes: caffe-compat stem max pool (3x3/2, ceil_mode, senet.py:279-282);
per-variant stem (3x 3x3 convs for senet154 vs single 7x7), grouped 3x3 convs,
SEResNet stride on conv1 (senet.py:158-183), fixed AvgPool2d(7, stride=1)
head + optional dropout (senet.py:324-326).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core.registry import image_settings, register_model, register_settings
from ..ops.pooling import avg_pool, max_pool
from .layers import batch_norm, conv2d, dense, dropout, relu

_URLS = {
    'senet154': 'http://pretorched-x.csail.mit.edu/models/senet154-c7b49a05.pth',
    'se_resnet50': 'http://pretorched-x.csail.mit.edu/models/se_resnet50-8049f9c4.pth',
    'se_resnet101': 'http://pretorched-x.csail.mit.edu/models/se_resnet101-af4def2b.pth',
    'se_resnet152': 'http://pretorched-x.csail.mit.edu/models/se_resnet152-457c373d.pth',
    'se_resnext50_32x4d': 'http://pretorched-x.csail.mit.edu/models/se_resnext50_32x4d-377ad789.pth',
    'se_resnext101_32x4d': 'http://pretorched-x.csail.mit.edu/models/se_resnext101_32x4d-bcc25309.pth',
}

pretrained_settings = {
    name: {'imagenet': image_settings(url)} for name, url in _URLS.items()
}


class SENet(nn.Module):
    block: str                       # 'se' | 'se_resnet' | 'se_resnext'
    layers: Sequence[int]
    groups: int
    reduction: int = 16
    dropout_p: float = 0.0
    inplanes: int = 128
    input_3x3: bool = True
    downsample_kernel_size: int = 3
    downsample_padding: int = 1
    num_classes: int = 1000
    dtype: Any = None
    se_identity: bool = False     # ablation: bypass every SE gate (profiling
    #                               A/B for fusion evidence; tools/roofline)

    def _se(self, x, channels, prefix, train):
        """Squeeze-excite: the channel attention the reference applies before
        every residual add (senet.py:85-105, 128-130)."""
        if self.se_identity:
            return x
        dt = self.dtype
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
        s = conv2d(channels // self.reduction, 1, name=f'{prefix}.fc1', dtype=dt)(s)
        s = relu(s)
        s = conv2d(channels, 1, name=f'{prefix}.fc2', dtype=dt)(s)
        return x * jax.nn.sigmoid(s)

    def _block(self, x, planes, stride, downsample, prefix, train):
        dt = self.dtype
        identity = x
        if self.block == 'se':            # SENet154 bottleneck (senet.py:134-156)
            w1, w2, g = planes * 2, planes * 4, self.groups
            s1, s2 = 1, stride
        elif self.block == 'se_resnet':   # caffe-style: stride on conv1
            w1, w2, g = planes, planes, 1
            s1, s2 = stride, 1
        else:                             # se_resnext
            w1 = w2 = math.floor(planes * (4 / 64)) * self.groups
            g = self.groups
            s1, s2 = 1, stride
        out = conv2d(w1, 1, stride=s1, bias=False, name=f'{prefix}.conv1', dtype=dt)(x)
        out = batch_norm(train=train, name=f'{prefix}.bn1', dtype=dt)(out)
        out = relu(out)
        out = conv2d(w2, 3, stride=s2, padding=1, groups=g, bias=False,
                     name=f'{prefix}.conv2', dtype=dt)(out)
        out = batch_norm(train=train, name=f'{prefix}.bn2', dtype=dt)(out)
        out = relu(out)
        out = conv2d(planes * 4, 1, bias=False, name=f'{prefix}.conv3', dtype=dt)(out)
        out = batch_norm(train=train, name=f'{prefix}.bn3', dtype=dt)(out)
        if downsample:
            k, p = ((self.downsample_kernel_size, self.downsample_padding)
                    if not prefix.startswith('layer1') else (1, 0))
            identity = conv2d(planes * 4, k, stride=stride, padding=p, bias=False,
                              name=f'{prefix}.downsample.0', dtype=dt)(x)
            identity = batch_norm(train=train, name=f'{prefix}.downsample.1',
                                  dtype=dt)(identity)
        out = self._se(out, planes * 4, f'{prefix}.se_module', train)
        return relu(out + identity)

    @nn.compact
    def __call__(self, x, mode: str = 'forward', head: bool = True,
                 train: bool = False):
        dt = self.dtype
        if mode in ('forward', 'features'):
            if self.input_3x3:
                x = conv2d(64, 3, stride=2, padding=1, bias=False,
                           name='layer0.conv1', dtype=dt)(x)
                x = relu(batch_norm(train=train, name='layer0.bn1', dtype=dt)(x))
                x = conv2d(64, 3, padding=1, bias=False, name='layer0.conv2', dtype=dt)(x)
                x = relu(batch_norm(train=train, name='layer0.bn2', dtype=dt)(x))
                x = conv2d(self.inplanes, 3, padding=1, bias=False,
                           name='layer0.conv3', dtype=dt)(x)
                x = relu(batch_norm(train=train, name='layer0.bn3', dtype=dt)(x))
            else:
                x = conv2d(self.inplanes, 7, stride=2, padding=3, bias=False,
                           name='layer0.conv1', dtype=dt)(x)
                x = relu(batch_norm(train=train, name='layer0.bn1', dtype=dt)(x))
            x = max_pool(x, 3, 2, 0, ceil_mode=True)  # caffe compat, senet.py:281-282
            inplanes = self.inplanes
            for stage, (planes, blocks, stride) in enumerate(
                    zip((64, 128, 256, 512), self.layers, (1, 2, 2, 2)), start=1):
                for i in range(blocks):
                    s = stride if i == 0 else 1
                    down = s != 1 or inplanes != planes * 4
                    x = self._block(x, planes, s, down, f'layer{stage}.{i}', train)
                    inplanes = planes * 4
            if mode == 'features':
                return x
        if mode in ('forward', 'logits'):
            x = avg_pool(x, 7, 1)
            if self.dropout_p:
                x = dropout(self.dropout_p, train=train)(x)
            x = x.reshape((x.shape[0], -1))
            if head:
                x = dense(self.num_classes, name='last_linear', dtype=dt)(x)
        return x


_CONFIGS = {
    'senet154': dict(block='se', layers=(3, 8, 36, 3), groups=64, dropout_p=0.2),
    'se_resnet50': dict(block='se_resnet', layers=(3, 4, 6, 3), groups=1,
                        inplanes=64, input_3x3=False,
                        downsample_kernel_size=1, downsample_padding=0),
    'se_resnet101': dict(block='se_resnet', layers=(3, 4, 23, 3), groups=1,
                         inplanes=64, input_3x3=False,
                         downsample_kernel_size=1, downsample_padding=0),
    'se_resnet152': dict(block='se_resnet', layers=(3, 8, 36, 3), groups=1,
                         inplanes=64, input_3x3=False,
                         downsample_kernel_size=1, downsample_padding=0),
    'se_resnext50_32x4d': dict(block='se_resnext', layers=(3, 4, 6, 3), groups=32,
                               inplanes=64, input_3x3=False,
                               downsample_kernel_size=1, downsample_padding=0),
    'se_resnext101_32x4d': dict(block='se_resnext', layers=(3, 4, 23, 3), groups=32,
                                inplanes=64, input_3x3=False,
                                downsample_kernel_size=1, downsample_padding=0),
}


def _factory(name):
    def fn(num_classes: int = 1000, pretrained: str = 'imagenet'):
        from ..core.factory import build_model
        module = SENet(num_classes=num_classes, **_CONFIGS[name])
        return build_model(name, module, pretrained_settings, num_classes,
                           pretrained)
    fn.__name__ = name
    fn.__doc__ = f'{name} (squeeze-and-excitation network).'
    return register_model(fn, name=name)


senet154 = _factory('senet154')
se_resnet50 = _factory('se_resnet50')
se_resnet101 = _factory('se_resnet101')
se_resnet152 = _factory('se_resnet152')
se_resnext50_32x4d = _factory('se_resnext50_32x4d')
se_resnext101_32x4d = _factory('se_resnext101_32x4d')

register_settings(pretrained_settings)
