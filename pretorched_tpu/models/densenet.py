"""DenseNet 121/161/169/201 (torchvision-weight compatible).

Reference: pretorched/models/torchvision_models.py:254-378 (modify_densenets,
dotted-key checkpoint migration :288-297, factories). ``logits`` parity: relu
-> 7x7/1 average pool -> flatten -> ``last_linear`` (the reference keeps the
fixed 7x7 kernel rather than a global pool; we match it exactly).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ..core.registry import image_settings, register_model, register_settings
from ..ops.pooling import avg_pool, max_pool
from .layers import batch_norm, conv2d, dense, relu

model_urls = {
    'densenet121': 'https://download.pytorch.org/models/densenet121-241335ed.pth',
    'densenet169': 'https://download.pytorch.org/models/densenet169-6f0f7f60.pth',
    'densenet201': 'https://download.pytorch.org/models/densenet201-4c113574.pth',
    'densenet161': 'https://download.pytorch.org/models/densenet161-17b70270.pth',
}

pretrained_settings = {
    name: {'imagenet': image_settings(url)} for name, url in model_urls.items()
}
pretrained_settings['densenet161']['places365'] = image_settings(
    'http://pretorched-x.csail.mit.edu/models/densenet161_places365-62bbf0d4.pth',
    num_classes=365)

CONFIGS = {
    # (growth_rate, block_config, num_init_features)
    'densenet121': (32, (6, 12, 24, 16), 64),
    'densenet169': (32, (6, 12, 32, 32), 64),
    'densenet201': (32, (6, 12, 48, 32), 64),
    'densenet161': (48, (6, 12, 36, 24), 96),
}


class DenseNet(nn.Module):
    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    num_init_features: int = 64
    bn_size: int = 4
    num_classes: int = 1000
    dtype: Any = None

    def _dense_layer(self, x, prefix, train):
        dt = self.dtype
        out = batch_norm(train=train, name=f'{prefix}.norm1', dtype=dt)(x)
        out = relu(out)
        out = conv2d(self.bn_size * self.growth_rate, 1, bias=False,
                     name=f'{prefix}.conv1', dtype=dt)(out)
        out = batch_norm(train=train, name=f'{prefix}.norm2', dtype=dt)(out)
        out = relu(out)
        out = conv2d(self.growth_rate, 3, padding=1, bias=False,
                     name=f'{prefix}.conv2', dtype=dt)(out)
        return jnp.concatenate([x, out], axis=-1)

    def _transition(self, x, out_features, prefix, train):
        dt = self.dtype
        x = batch_norm(train=train, name=f'{prefix}.norm', dtype=dt)(x)
        x = relu(x)
        x = conv2d(out_features, 1, bias=False, name=f'{prefix}.conv', dtype=dt)(x)
        return avg_pool(x, 2, 2)

    @nn.compact
    def __call__(self, x, mode: str = 'forward', head: bool = True,
                 train: bool = False):
        dt = self.dtype
        if mode in ('forward', 'features'):
            x = conv2d(self.num_init_features, 7, stride=2, padding=3,
                       bias=False, name='features.conv0', dtype=dt)(x)
            x = batch_norm(train=train, name='features.norm0', dtype=dt)(x)
            x = relu(x)
            x = max_pool(x, 3, 2, padding=1)
            features = self.num_init_features
            for bi, layers in enumerate(self.block_config, start=1):
                for li in range(layers):
                    x = self._dense_layer(
                        x, f'features.denseblock{bi}.denselayer{li+1}', train)
                features += layers * self.growth_rate
                if bi != len(self.block_config):
                    features //= 2
                    x = self._transition(x, features,
                                         f'features.transition{bi}', train)
            x = batch_norm(train=train, name='features.norm5', dtype=dt)(x)
            if mode == 'features':
                return x
        if mode in ('forward', 'logits'):
            x = relu(x)
            x = avg_pool(x, 7, 1)  # fixed 7x7 pool, reference parity
            x = x.reshape((x.shape[0], -1))
            if head:
                x = dense(self.num_classes, name='last_linear', dtype=dt)(x)
        return x


TORCH_RENAMES = {'last_linear': 'classifier'}


def _factory(name):
    def fn(num_classes: int = 1000, pretrained: str = 'imagenet'):
        from ..core.factory import build_model
        from ..zoo.convert import densenet_key_rewrite
        growth, blocks, init = CONFIGS[name]
        module = DenseNet(growth_rate=growth, block_config=blocks,
                          num_init_features=init, num_classes=num_classes)
        return build_model(name, module, pretrained_settings, num_classes,
                           pretrained, torch_renames=TORCH_RENAMES,
                           converter_opts={'key_rewrite': densenet_key_rewrite})
    fn.__name__ = name
    fn.__doc__ = f'{name} from "Densely Connected Convolutional Networks".'
    return register_model(fn, name=name)


densenet121 = _factory('densenet121')
densenet169 = _factory('densenet169')
densenet201 = _factory('densenet201')
densenet161 = _factory('densenet161')

register_settings(pretrained_settings)
