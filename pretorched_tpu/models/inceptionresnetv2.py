"""Inception-ResNet-v2.

Reference: pretorched/models/inceptionresnetv2.py (TF port). Parity notes:
BasicConv2d = conv(bias=False) + BN(eps=0.001) + ReLU; residual blocks scale
the branch output (0.17/0.10/0.20) before the add; the final Block8 has no
ReLU; head = conv2d_7b(1536) -> AvgPool2d(8, count_include_pad=False) ->
last_linear; 1001-class checkpoint sliced for 'imagenet'
(inceptionresnetv2.py:343-350).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..core.registry import image_settings, register_model, register_settings
from ..ops.pooling import avg_pool, max_pool
from .layers import batch_norm, conv2d, dense, relu

_URL = 'http://pretorched-x.csail.mit.edu/models/inceptionresnetv2-c2ef1dee.pth'
pretrained_settings = {
    'inceptionresnetv2': {
        'imagenet': image_settings(_URL, input_size=(3, 299, 299),
                                   mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)),
        'imagenet+background': image_settings(
            _URL, input_size=(3, 299, 299), mean=(0.5, 0.5, 0.5),
            std=(0.5, 0.5, 0.5), num_classes=1001),
    }
}


class InceptionResNetV2(nn.Module):
    num_classes: int = 1000
    dtype: Any = None

    def _bc(self, x, features, kernel, name, stride=1, padding=0, train=False):
        x = conv2d(features, kernel, stride=stride, padding=padding, bias=False,
                   name=f'{name}.conv', dtype=self.dtype)(x)
        x = batch_norm(train=train, eps=0.001, name=f'{name}.bn',
                       dtype=self.dtype)(x)
        return relu(x)

    def _seq(self, x, p, specs, train):
        for j, (f, k, s, pad) in enumerate(specs):
            x = self._bc(x, f, k, f'{p}.{j}', stride=s, padding=pad, train=train)
        return x

    def _block35(self, x, p, train):
        b0 = self._bc(x, 32, 1, f'{p}.branch0', train=train)
        b1 = self._seq(x, f'{p}.branch1', [(32, 1, 1, 0), (32, 3, 1, 1)], train)
        b2 = self._seq(x, f'{p}.branch2',
                       [(32, 1, 1, 0), (48, 3, 1, 1), (64, 3, 1, 1)], train)
        out = jnp.concatenate([b0, b1, b2], axis=-1)
        out = conv2d(320, 1, name=f'{p}.conv2d', dtype=self.dtype)(out)
        return relu(out * 0.17 + x)

    def _block17(self, x, p, train):
        b0 = self._bc(x, 192, 1, f'{p}.branch0', train=train)
        b1 = self._seq(x, f'{p}.branch1',
                       [(128, 1, 1, 0), (160, (1, 7), 1, (0, 3)),
                        (192, (7, 1), 1, (3, 0))], train)
        out = jnp.concatenate([b0, b1], axis=-1)
        out = conv2d(1088, 1, name=f'{p}.conv2d', dtype=self.dtype)(out)
        return relu(out * 0.10 + x)

    def _block8(self, x, p, train, scale=0.20, final_relu=True):
        b0 = self._bc(x, 192, 1, f'{p}.branch0', train=train)
        b1 = self._seq(x, f'{p}.branch1',
                       [(192, 1, 1, 0), (224, (1, 3), 1, (0, 1)),
                        (256, (3, 1), 1, (1, 0))], train)
        out = jnp.concatenate([b0, b1], axis=-1)
        out = conv2d(2080, 1, name=f'{p}.conv2d', dtype=self.dtype)(out)
        out = out * scale + x
        return relu(out) if final_relu else out

    @nn.compact
    def __call__(self, x, mode: str = 'forward', head: bool = True,
                 train: bool = False):
        if mode in ('forward', 'features'):
            x = self._bc(x, 32, 3, 'conv2d_1a', stride=2, train=train)
            x = self._bc(x, 32, 3, 'conv2d_2a', train=train)
            x = self._bc(x, 64, 3, 'conv2d_2b', padding=1, train=train)
            x = max_pool(x, 3, 2)
            x = self._bc(x, 80, 1, 'conv2d_3b', train=train)
            x = self._bc(x, 192, 3, 'conv2d_4a', train=train)
            x = max_pool(x, 3, 2)
            # mixed_5b
            b0 = self._bc(x, 96, 1, 'mixed_5b.branch0', train=train)
            b1 = self._seq(x, 'mixed_5b.branch1', [(48, 1, 1, 0), (64, 5, 1, 2)], train)
            b2 = self._seq(x, 'mixed_5b.branch2',
                           [(64, 1, 1, 0), (96, 3, 1, 1), (96, 3, 1, 1)], train)
            b3 = avg_pool(x, 3, 1, 1, count_include_pad=False)
            b3 = self._bc(b3, 64, 1, 'mixed_5b.branch3.1', train=train)
            x = jnp.concatenate([b0, b1, b2, b3], axis=-1)
            for i in range(10):
                x = self._block35(x, f'repeat.{i}', train)
            # mixed_6a
            b0 = self._bc(x, 384, 3, 'mixed_6a.branch0', stride=2, train=train)
            b1 = self._seq(x, 'mixed_6a.branch1',
                           [(256, 1, 1, 0), (256, 3, 1, 1), (384, 3, 2, 0)], train)
            x = jnp.concatenate([b0, b1, max_pool(x, 3, 2)], axis=-1)
            for i in range(20):
                x = self._block17(x, f'repeat_1.{i}', train)
            # mixed_7a
            b0 = self._seq(x, 'mixed_7a.branch0', [(256, 1, 1, 0), (384, 3, 2, 0)], train)
            b1 = self._seq(x, 'mixed_7a.branch1', [(256, 1, 1, 0), (288, 3, 2, 0)], train)
            b2 = self._seq(x, 'mixed_7a.branch2',
                           [(256, 1, 1, 0), (288, 3, 1, 1), (320, 3, 2, 0)], train)
            x = jnp.concatenate([b0, b1, b2, max_pool(x, 3, 2)], axis=-1)
            for i in range(9):
                x = self._block8(x, f'repeat_2.{i}', train)
            x = self._block8(x, 'block8', train, scale=1.0, final_relu=False)
            x = self._bc(x, 1536, 1, 'conv2d_7b', train=train)
            if mode == 'features':
                return x
        if mode in ('forward', 'logits'):
            x = avg_pool(x, 8, count_include_pad=False)
            x = x.reshape((x.shape[0], -1))
            if head:
                x = dense(self.num_classes, name='last_linear', dtype=self.dtype)(x)
        return x


@register_model
def inceptionresnetv2(num_classes: int = 1000, pretrained: str = 'imagenet'):
    """Inception-ResNet-v2 (arXiv:1602.07261)."""
    from ..core.factory import build_model
    module = InceptionResNetV2(num_classes=num_classes)
    opts = {}
    if pretrained == 'imagenet':
        opts['background_class_keys'] = ('last_linear',)
    return build_model('inceptionresnetv2', module, pretrained_settings,
                       num_classes, pretrained, converter_opts=opts,
                       fallback_size=299)


register_settings(pretrained_settings)
