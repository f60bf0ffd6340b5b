"""VGG-M.

Reference: pretorched/models/vggm.py (Torch7 port; not exported in the
reference's registries — we register the factory but keep it out of
``model_names`` for parity). BGR [0,255] input at 221x221; cross-map LRN after
the first two conv stages (vggm.py:24-50); ceil-mode max pools.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn

from ..core.registry import image_settings, register_model, register_settings
from ..ops.lrn import spatial_cross_map_lrn
from ..ops.pooling import max_pool
from .layers import conv2d, dense, dropout, flatten_torch_order, relu

pretrained_settings = {
    'vggm': {
        'imagenet': image_settings(
            'http://data.lip6.fr/cadene/pretrainedmodels/vggm-786f2434.pth',
            input_space='BGR', input_size=(3, 221, 221), input_range=(0, 255),
            mean=(123.68, 116.779, 103.939), std=(1, 1, 1)),
    }
}


class VGGM(nn.Module):
    num_classes: int = 1000
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mode: str = 'forward', head: bool = True,
                 train: bool = False):
        dt = self.dtype
        if mode in ('forward', 'features'):
            x = relu(conv2d(96, 7, stride=2, name='features.0', dtype=dt)(x))
            x = spatial_cross_map_lrn(x, 5, 0.0005, 0.75, 2)
            x = max_pool(x, 3, 2, ceil_mode=True)
            x = relu(conv2d(256, 5, stride=2, padding=1, name='features.4', dtype=dt)(x))
            x = spatial_cross_map_lrn(x, 5, 0.0005, 0.75, 2)
            x = max_pool(x, 3, 2, ceil_mode=True)
            x = relu(conv2d(512, 3, padding=1, name='features.8', dtype=dt)(x))
            x = relu(conv2d(512, 3, padding=1, name='features.10', dtype=dt)(x))
            x = relu(conv2d(512, 3, padding=1, name='features.12', dtype=dt)(x))
            x = max_pool(x, 3, 2, ceil_mode=True)
            if mode == 'features':
                return x
        if mode in ('forward', 'logits'):
            x = flatten_torch_order(x)                     # 18432
            x = relu(dense(4096, name='classif.0', dtype=dt)(x))
            x = dropout(0.5, train=train)(x)
            x = relu(dense(4096, name='classif.3', dtype=dt)(x))
            x = dropout(0.5, train=train)(x)
            if head:
                x = dense(self.num_classes, name='last_linear', dtype=dt)(x)
        return x


TORCH_RENAMES = {'last_linear': 'classif.6'}


@register_model
def vggm(num_classes: int = 1000, pretrained: str = 'imagenet'):
    """VGG-M (Torch7 port; BGR/255 input, LRN)."""
    from ..core.factory import build_model
    module = VGGM(num_classes=num_classes)
    return build_model('vggm', module, pretrained_settings, num_classes,
                       pretrained, torch_renames=TORCH_RENAMES)


# reference keeps vggm out of settings.py's registry (SURVEY §2.6)
register_settings(pretrained_settings, in_settings_registry=False)
