"""SqueezeNet 1.0 / 1.1 (torchvision-weight compatible).

Reference: pretorched/models/torchvision_models.py:535-610 (modify_squeezenets
+ factories). Parity notes: squeezenets have **no** ``last_linear``
(torchvision_models.py:542-543) — the head is a 1x1 conv + ReLU + global avg
pool, so our wrapper is built with ``head_path=None``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn

from ..core.registry import image_settings, register_model, register_settings
from ..ops.pooling import adaptive_avg_pool, max_pool
from .layers import conv2d, dropout, flatten, relu

pretrained_settings = {
    'squeezenet1_0': {'imagenet': image_settings(
        'https://download.pytorch.org/models/squeezenet1_0-a815701f.pth')},
    'squeezenet1_1': {'imagenet': image_settings(
        'https://download.pytorch.org/models/squeezenet1_1-f364aa15.pth')},
}


class SqueezeNet(nn.Module):
    version: str = '1_0'
    num_classes: int = 1000
    dtype: Any = None

    def _fire(self, x, squeeze, expand, idx):
        dt = self.dtype
        x = relu(conv2d(squeeze, 1, name=f'features.{idx}.squeeze', dtype=dt)(x))
        e1 = relu(conv2d(expand, 1, name=f'features.{idx}.expand1x1', dtype=dt)(x))
        e3 = relu(conv2d(expand, 3, padding=1,
                         name=f'features.{idx}.expand3x3', dtype=dt)(x))
        import jax.numpy as jnp
        return jnp.concatenate([e1, e3], axis=-1)

    @nn.compact
    def __call__(self, x, mode: str = 'forward', head: bool = True,
                 train: bool = False):
        dt = self.dtype
        if mode in ('forward', 'features'):
            if self.version == '1_0':
                x = relu(conv2d(96, 7, stride=2, name='features.0', dtype=dt)(x))
                x = max_pool(x, 3, 2, ceil_mode=True)
                x = self._fire(x, 16, 64, 3)
                x = self._fire(x, 16, 64, 4)
                x = self._fire(x, 32, 128, 5)
                x = max_pool(x, 3, 2, ceil_mode=True)
                x = self._fire(x, 32, 128, 7)
                x = self._fire(x, 48, 192, 8)
                x = self._fire(x, 48, 192, 9)
                x = self._fire(x, 64, 256, 10)
                x = max_pool(x, 3, 2, ceil_mode=True)
                x = self._fire(x, 64, 256, 12)
            else:
                x = relu(conv2d(64, 3, stride=2, name='features.0', dtype=dt)(x))
                x = max_pool(x, 3, 2, ceil_mode=True)
                x = self._fire(x, 16, 64, 3)
                x = self._fire(x, 16, 64, 4)
                x = max_pool(x, 3, 2, ceil_mode=True)
                x = self._fire(x, 32, 128, 6)
                x = self._fire(x, 32, 128, 7)
                x = max_pool(x, 3, 2, ceil_mode=True)
                x = self._fire(x, 64, 256, 9)
                x = self._fire(x, 64, 256, 10)
                x = self._fire(x, 64, 256, 11)
                x = self._fire(x, 64, 256, 12)
            if mode == 'features':
                return x
        if mode in ('forward', 'logits'):
            x = dropout(0.5, train=train)(x)
            x = conv2d(self.num_classes, 1, name='last_conv', dtype=dt)(x)
            x = relu(x)
            x = adaptive_avg_pool(x, 1)
            x = flatten(x)
        return x


TORCH_RENAMES = {'last_conv': 'classifier.1'}


def _factory(name, version):
    def fn(num_classes: int = 1000, pretrained: str = 'imagenet'):
        from ..core.factory import build_model
        module = SqueezeNet(version=version, num_classes=num_classes)
        return build_model(name, module, pretrained_settings, num_classes,
                           pretrained, torch_renames=TORCH_RENAMES,
                           head_path=None)
    fn.__name__ = name
    fn.__doc__ = f'SqueezeNet {version.replace("_", ".")}'
    return register_model(fn, name=name)


squeezenet1_0 = _factory('squeezenet1_0', '1_0')
squeezenet1_1 = _factory('squeezenet1_1', '1_1')

register_settings(pretrained_settings)
