"""DenseNet3D (121/169/201/264 video variants).

Reference: pretorched/models/densenet3D.py (not in the reference's registry;
we register factories but keep them out of model_names, SURVEY §2.6).
Stem 7x7x7 stride (1,2,2); dense layers keep the checkpoint's dotted
'norm.1'/'conv.1' naming; head = relu -> avg_pool3d over
(ceil(T/16), floor(S/32)) -> classifier (densenet3D.py:205-213).

The reference's final 'norm5' is a BatchNorm2d applied to a 5-D tensor — a
bug that would crash at runtime (SURVEY §2.6); we use the working 3D norm.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ..core.registry import register_model
from ..ops.pooling import avg_pool, max_pool
from .layers import batch_norm, conv3d, dense, dropout, relu

CONFIGS = {
    'densenet3d121': (32, (6, 12, 24, 16), 64),
    'densenet3d169': (32, (6, 12, 32, 32), 64),
    'densenet3d201': (32, (6, 12, 48, 32), 64),
    'densenet3d264': (32, (6, 12, 64, 48), 64),
}


class DenseNet3D(nn.Module):
    sample_size: int = 112
    sample_duration: int = 16
    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    num_init_features: int = 64
    bn_size: int = 4
    drop_rate: float = 0.0
    num_classes: int = 1000
    dtype: Any = None

    def _dense_layer(self, x, prefix, train):
        dt = self.dtype
        out = batch_norm(train=train, name=f'{prefix}.norm.1', dtype=dt)(x)
        out = relu(out)
        out = conv3d(self.bn_size * self.growth_rate, 1, bias=False,
                     name=f'{prefix}.conv.1', dtype=dt)(out)
        out = batch_norm(train=train, name=f'{prefix}.norm.2', dtype=dt)(out)
        out = relu(out)
        out = conv3d(self.growth_rate, 3, padding=1, bias=False,
                     name=f'{prefix}.conv.2', dtype=dt)(out)
        if self.drop_rate > 0:
            out = dropout(self.drop_rate, train=train)(out)
        return jnp.concatenate([x, out], axis=-1)

    @nn.compact
    def __call__(self, x, mode: str = 'forward', head: bool = True,
                 train: bool = False):
        dt = self.dtype
        if mode in ('forward', 'features'):
            x = conv3d(self.num_init_features, 7, stride=(1, 2, 2), padding=3,
                       bias=False, name='features.conv0', dtype=dt)(x)
            x = batch_norm(train=train, name='features.norm0', dtype=dt)(x)
            x = relu(x)
            x = max_pool(x, 3, 2, 1)
            features = self.num_init_features
            for bi, layers in enumerate(self.block_config, start=1):
                for li in range(layers):
                    x = self._dense_layer(
                        x, f'features.denseblock{bi}.denselayer{li+1}', train)
                features += layers * self.growth_rate
                if bi != len(self.block_config):
                    x = batch_norm(train=train,
                                   name=f'features.transition{bi}.norm',
                                   dtype=dt)(x)
                    x = relu(x)
                    features //= 2
                    x = conv3d(features, 1, bias=False,
                               name=f'features.transition{bi}.conv', dtype=dt)(x)
                    x = avg_pool(x, 2, 2)
            x = batch_norm(train=train, name='features.norm5', dtype=dt)(x)
            if mode == 'features':
                return x
        if mode in ('forward', 'logits'):
            x = relu(x)
            last_t = int(math.ceil(self.sample_duration / 16))
            last_s = int(math.floor(self.sample_size / 32))
            x = avg_pool(x, (last_t, last_s, last_s))
            x = x.reshape((x.shape[0], -1))
            if head:
                x = dense(self.num_classes, name='last_linear', dtype=dt)(x)
        return x


TORCH_RENAMES = {'last_linear': 'classifier'}


def _factory(name):
    def fn(num_classes: int = 1000, pretrained=None, sample_size: int = 112,
           sample_duration: int = 16):
        from ..core.factory import build_model
        growth, blocks, init = CONFIGS[name]
        module = DenseNet3D(sample_size=sample_size,
                            sample_duration=sample_duration, growth_rate=growth,
                            block_config=blocks, num_init_features=init,
                            num_classes=num_classes)
        return build_model(name, module, {name: {}}, num_classes, pretrained,
                           torch_renames=TORCH_RENAMES, video=True,
                           input_shape=(1, sample_duration, sample_size,
                                        sample_size, 3))
    fn.__name__ = name
    fn.__doc__ = f'{name}: 3D DenseNet for video.'
    return register_model(fn, name=name)


densenet3d121 = _factory('densenet3d121')
densenet3d169 = _factory('densenet3d169')
densenet3d201 = _factory('densenet3d201')
densenet3d264 = _factory('densenet3d264')
