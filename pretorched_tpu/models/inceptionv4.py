"""Inception-v4.

Reference: pretorched/models/inceptionv4.py (TF port). Parity notes:
BasicConv2d = conv(bias=False) + BN(eps=0.001) + ReLU; branch avg pools are
3x3/1 pad1 with ``count_include_pad=False``; head = AvgPool2d(8,
count_include_pad=False) + last_linear(1536); checkpoint carries 1001 classes
('imagenet+background'), plain 'imagenet' slices off class 0
(inceptionv4.py:320-327).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..core.registry import image_settings, register_model, register_settings
from ..ops.pooling import avg_pool, max_pool
from .layers import batch_norm, conv2d, dense, relu

_URL = 'http://pretorched-x.csail.mit.edu/models/inceptionv4-0f7d42d3.pth'
pretrained_settings = {
    'inceptionv4': {
        'imagenet': image_settings(_URL, input_size=(3, 299, 299),
                                   mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)),
        'imagenet+background': image_settings(
            _URL, input_size=(3, 299, 299), mean=(0.5, 0.5, 0.5),
            std=(0.5, 0.5, 0.5), num_classes=1001),
    }
}


class InceptionV4(nn.Module):
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

    def _inception_a(self, x, p, train):
        b0 = self._bc(x, 96, 1, f'{p}.branch0', train=train)
        b1 = self._seq(x, f'{p}.branch1', [(64, 1, 1, 0), (96, 3, 1, 1)], train)
        b2 = self._seq(x, f'{p}.branch2',
                       [(64, 1, 1, 0), (96, 3, 1, 1), (96, 3, 1, 1)], train)
        b3 = avg_pool(x, 3, 1, 1, count_include_pad=False)
        b3 = self._bc(b3, 96, 1, f'{p}.branch3.1', train=train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)

    def _inception_b(self, x, p, train):
        b0 = self._bc(x, 384, 1, f'{p}.branch0', train=train)
        b1 = self._seq(x, f'{p}.branch1',
                       [(192, 1, 1, 0), (224, (1, 7), 1, (0, 3)),
                        (256, (7, 1), 1, (3, 0))], train)
        b2 = self._seq(x, f'{p}.branch2',
                       [(192, 1, 1, 0), (192, (7, 1), 1, (3, 0)),
                        (224, (1, 7), 1, (0, 3)), (224, (7, 1), 1, (3, 0)),
                        (256, (1, 7), 1, (0, 3))], train)
        b3 = avg_pool(x, 3, 1, 1, count_include_pad=False)
        b3 = self._bc(b3, 128, 1, f'{p}.branch3.1', train=train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)

    def _inception_c(self, x, p, train):
        b0 = self._bc(x, 256, 1, f'{p}.branch0', train=train)
        b1 = self._bc(x, 384, 1, f'{p}.branch1_0', train=train)
        b1a = self._bc(b1, 256, (1, 3), f'{p}.branch1_1a', padding=(0, 1), train=train)
        b1b = self._bc(b1, 256, (3, 1), f'{p}.branch1_1b', padding=(1, 0), train=train)
        b2 = self._bc(x, 384, 1, f'{p}.branch2_0', train=train)
        b2 = self._bc(b2, 448, (3, 1), f'{p}.branch2_1', padding=(1, 0), train=train)
        b2 = self._bc(b2, 512, (1, 3), f'{p}.branch2_2', padding=(0, 1), train=train)
        b2a = self._bc(b2, 256, (1, 3), f'{p}.branch2_3a', padding=(0, 1), train=train)
        b2b = self._bc(b2, 256, (3, 1), f'{p}.branch2_3b', padding=(1, 0), train=train)
        b3 = avg_pool(x, 3, 1, 1, count_include_pad=False)
        b3 = self._bc(b3, 256, 1, f'{p}.branch3.1', train=train)
        return jnp.concatenate([b0, b1a, b1b, b2a, b2b, b3], axis=-1)

    @nn.compact
    def __call__(self, x, mode: str = 'forward', head: bool = True,
                 train: bool = False):
        if mode in ('forward', 'features'):
            x = self._bc(x, 32, 3, 'features.0', stride=2, train=train)
            x = self._bc(x, 32, 3, 'features.1', train=train)
            x = self._bc(x, 64, 3, 'features.2', padding=1, train=train)
            # Mixed_3a
            x = jnp.concatenate([
                max_pool(x, 3, 2),
                self._bc(x, 96, 3, 'features.3.conv', stride=2, train=train)], axis=-1)
            # Mixed_4a
            b0 = self._seq(x, 'features.4.branch0',
                           [(64, 1, 1, 0), (96, 3, 1, 0)], train)
            b1 = self._seq(x, 'features.4.branch1',
                           [(64, 1, 1, 0), (64, (1, 7), 1, (0, 3)),
                            (64, (7, 1), 1, (3, 0)), (96, 3, 1, 0)], train)
            x = jnp.concatenate([b0, b1], axis=-1)
            # Mixed_5a
            x = jnp.concatenate([
                self._bc(x, 192, 3, 'features.5.conv', stride=2, train=train),
                max_pool(x, 3, 2)], axis=-1)
            for i in range(6, 10):
                x = self._inception_a(x, f'features.{i}', train)
            # Reduction_A (features.10)
            b0 = self._bc(x, 384, 3, 'features.10.branch0', stride=2, train=train)
            b1 = self._seq(x, 'features.10.branch1',
                           [(192, 1, 1, 0), (224, 3, 1, 1), (256, 3, 2, 0)], train)
            x = jnp.concatenate([b0, b1, max_pool(x, 3, 2)], axis=-1)
            for i in range(11, 18):
                x = self._inception_b(x, f'features.{i}', train)
            # Reduction_B (features.18)
            b0 = self._seq(x, 'features.18.branch0',
                           [(192, 1, 1, 0), (192, 3, 2, 0)], train)
            b1 = self._seq(x, 'features.18.branch1',
                           [(256, 1, 1, 0), (256, (1, 7), 1, (0, 3)),
                            (320, (7, 1), 1, (3, 0)), (320, 3, 2, 0)], train)
            x = jnp.concatenate([b0, b1, max_pool(x, 3, 2)], axis=-1)
            for i in range(19, 22):
                x = self._inception_c(x, f'features.{i}', train)
            if mode == 'features':
                return x
        if mode in ('forward', 'logits'):
            x = avg_pool(x, 8, count_include_pad=False)
            x = x.reshape((x.shape[0], -1))
            if head:
                x = dense(self.num_classes, name='last_linear', dtype=self.dtype)(x)
        return x


@register_model
def inceptionv4(num_classes: int = 1000, pretrained: str = 'imagenet'):
    """Inception-v4 (arXiv:1602.07261); 'imagenet' slices the TF background class."""
    from ..core.factory import build_model
    module = InceptionV4(num_classes=num_classes)
    opts = {}
    if pretrained == 'imagenet':
        opts['background_class_keys'] = ('last_linear',)
    return build_model('inceptionv4', module, pretrained_settings, num_classes,
                       pretrained, converter_opts=opts, fallback_size=299)


register_settings(pretrained_settings)
