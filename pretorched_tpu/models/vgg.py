"""VGG 11/13/16/19 (±BN), torchvision-weight compatible.

Reference: pretorched/models/torchvision_models.py:600-725 (modify_vggs +
factories). API split parity: ``features`` = conv stack + flatten + classifier
through ``linear1`` (pre-ReLU); ``logits`` = relu -> dropout -> last_linear.

Leaf names replicate torchvision's sequential indices (``features.0`` etc.),
computed from the layer config exactly as torchvision's make_layers counts
conv/bn/relu/pool entries.
"""

from __future__ import annotations

from typing import Any, Sequence, Union

import flax.linen as nn

from ..core.registry import image_settings, register_model, register_settings
from ..ops.pooling import max_pool
from .layers import (batch_norm, conv2d, dense, dropout, flatten_torch_order,
                     relu)

model_urls = {
    'vgg11': 'https://download.pytorch.org/models/vgg11-bbd30ac9.pth',
    'vgg13': 'https://download.pytorch.org/models/vgg13-c768596a.pth',
    'vgg16': 'https://download.pytorch.org/models/vgg16-397923af.pth',
    'vgg19': 'https://download.pytorch.org/models/vgg19-dcbb9e9d.pth',
    'vgg11_bn': 'https://download.pytorch.org/models/vgg11_bn-6002323d.pth',
    'vgg13_bn': 'https://download.pytorch.org/models/vgg13_bn-abd245e5.pth',
    'vgg16_bn': 'https://download.pytorch.org/models/vgg16_bn-6c64b313.pth',
    'vgg19_bn': 'https://download.pytorch.org/models/vgg19_bn-c79401a0.pth',
}

pretrained_settings = {
    name: {'imagenet': image_settings(url)} for name, url in model_urls.items()
}

CFGS = {
    'A': (64, 'M', 128, 'M', 256, 256, 'M', 512, 512, 'M', 512, 512, 'M'),
    'B': (64, 64, 'M', 128, 128, 'M', 256, 256, 'M', 512, 512, 'M', 512, 512, 'M'),
    'D': (64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M', 512, 512, 512, 'M',
          512, 512, 512, 'M'),
    'E': (64, 64, 'M', 128, 128, 'M', 256, 256, 256, 256, 'M', 512, 512, 512,
          512, 'M', 512, 512, 512, 512, 'M'),
}


class VGG(nn.Module):
    cfg: Sequence[Union[int, str]]
    use_bn: bool = False
    num_classes: int = 1000
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mode: str = 'forward', head: bool = True,
                 train: bool = False):
        dt = self.dtype
        if mode in ('forward', 'features'):
            idx = 0
            for v in self.cfg:
                if v == 'M':
                    x = max_pool(x, 2, 2)
                    idx += 1
                else:
                    x = conv2d(v, 3, padding=1, name=f'features.{idx}', dtype=dt)(x)
                    idx += 1
                    if self.use_bn:
                        x = batch_norm(train=train, name=f'features.{idx}',
                                       dtype=dt)(x)
                        idx += 1
                    x = relu(x)
                    idx += 1
            x = flatten_torch_order(x)                         # 512*7*7
            x = dense(4096, name='linear0', dtype=dt)(x)
            x = relu(x)
            x = dropout(0.5, train=train)(x)
            x = dense(4096, name='linear1', dtype=dt)(x)
            if mode == 'features':
                return x
        if mode in ('forward', 'logits'):
            x = relu(x)
            x = dropout(0.5, train=train)(x)
            if head:
                x = dense(self.num_classes, name='last_linear', dtype=dt)(x)
        return x


TORCH_RENAMES = {
    'linear0': 'classifier.0',
    'linear1': 'classifier.3',
    'last_linear': 'classifier.6',
}

VARIANTS = {
    'vgg11': ('A', False), 'vgg11_bn': ('A', True),
    'vgg13': ('B', False), 'vgg13_bn': ('B', True),
    'vgg16': ('D', False), 'vgg16_bn': ('D', True),
    'vgg19': ('E', False), 'vgg19_bn': ('E', True),
}


def _factory(name):
    def fn(num_classes: int = 1000, pretrained: str = 'imagenet'):
        from ..core.factory import build_model
        cfg_key, use_bn = VARIANTS[name]
        module = VGG(cfg=CFGS[cfg_key], use_bn=use_bn, num_classes=num_classes)
        return build_model(name, module, pretrained_settings, num_classes,
                           pretrained, torch_renames=TORCH_RENAMES)
    fn.__name__ = name
    fn.__doc__ = f'VGG model, configuration {VARIANTS[name][0]}' + (
        ' with batch normalization' if VARIANTS[name][1] else '')
    return register_model(fn, name=name)


vgg11 = _factory('vgg11')
vgg11_bn = _factory('vgg11_bn')
vgg13 = _factory('vgg13')
vgg13_bn = _factory('vgg13_bn')
vgg16 = _factory('vgg16')
vgg16_bn = _factory('vgg16_bn')
vgg19 = _factory('vgg19')
vgg19_bn = _factory('vgg19_bn')

register_settings(pretrained_settings)
