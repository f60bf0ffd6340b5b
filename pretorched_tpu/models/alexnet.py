"""AlexNet (torchvision 'one weird trick' variant).

Reference: pretorched/models/torchvision_models.py:198-246 (modify_alexnet +
factory). API split parity: ``features`` runs the conv stack, flatten, and the
classifier up to (and including) ``linear1``; ``logits`` is ``relu ->
last_linear``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn

from ..core.registry import image_settings, register_model, register_settings
from ..ops.pooling import max_pool
from .layers import conv2d, dense, dropout, flatten_torch_order, relu

pretrained_settings = {
    'alexnet': {
        'imagenet': image_settings(
            'https://download.pytorch.org/models/alexnet-owt-4df8aa71.pth'),
        'places365': image_settings(
            'http://pretorched-x.csail.mit.edu/models/alexnet_places365-0c3a7b83.pth',
            num_classes=365),
    }
}


class AlexNet(nn.Module):
    num_classes: int = 1000
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mode: str = 'forward', head: bool = True,
                 train: bool = False):
        dt = self.dtype
        if mode in ('forward', 'features'):
            x = relu(conv2d(64, 11, stride=4, padding=2, name='features.0', dtype=dt)(x))
            x = max_pool(x, 3, 2)
            x = relu(conv2d(192, 5, padding=2, name='features.3', dtype=dt)(x))
            x = max_pool(x, 3, 2)
            x = relu(conv2d(384, 3, padding=1, name='features.6', dtype=dt)(x))
            x = relu(conv2d(256, 3, padding=1, name='features.8', dtype=dt)(x))
            x = relu(conv2d(256, 3, padding=1, name='features.10', dtype=dt)(x))
            x = max_pool(x, 3, 2)
            x = flatten_torch_order(x)                       # 256*6*6
            x = dropout(0.5, train=train)(x)
            x = dense(4096, name='linear0', dtype=dt)(x)
            x = relu(x)
            x = dropout(0.5, train=train)(x)
            x = dense(4096, name='linear1', dtype=dt)(x)
            if mode == 'features':
                return x
        if mode in ('forward', 'logits'):
            x = relu(x)
            if head:
                x = dense(self.num_classes, name='last_linear', dtype=dt)(x)
        return x


TORCH_RENAMES = {
    'linear0': 'classifier.1',
    'linear1': 'classifier.4',
    'last_linear': 'classifier.6',
}


@register_model
def alexnet(num_classes: int = 1000, pretrained: str = 'imagenet'):
    """AlexNet ('One weird trick...' arXiv:1404.5997)."""
    from ..core.factory import build_model
    module = AlexNet(num_classes=num_classes)
    return build_model('alexnet', module, pretrained_settings, num_classes,
                       pretrained, torch_renames=TORCH_RENAMES)


register_settings(pretrained_settings)
