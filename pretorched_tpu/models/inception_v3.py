"""Inception v3 (torchvision-weight compatible).

Reference: pretorched/models/torchvision_models.py:380-438 (inceptionv3
factory + method grafts). Parity notes: 299x299 input with 0.5/0.5 mean/std;
``logits`` = 8x8 avg pool -> dropout -> flatten -> ``last_linear``; auxiliary
head is computed only in training mode, in which case ``forward`` returns
``(logits, aux_logits)`` (torchvision_models.py:395-426).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..core.registry import image_settings, register_model, register_settings
from ..ops.pooling import avg_pool, max_pool
from .layers import batch_norm, conv2d, dense, dropout, relu

pretrained_settings = {
    'inceptionv3': {'imagenet': image_settings(
        'https://download.pytorch.org/models/inception_v3_google-1a9a5a14.pth',
        input_size=(3, 299, 299), mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))},
}


class InceptionV3(nn.Module):
    num_classes: int = 1000
    aux_logits: bool = True
    dtype: Any = None

    def _bconv(self, x, features, kernel, name, stride=1, padding=0, train=False):
        x = conv2d(features, kernel, stride=stride, padding=padding, bias=False,
                   name=f'{name}.conv', dtype=self.dtype)(x)
        x = batch_norm(train=train, eps=0.001, name=f'{name}.bn',
                       dtype=self.dtype)(x)
        return relu(x)

    def _inception_a(self, x, pool_features, p, train):
        b1 = self._bconv(x, 64, 1, f'{p}.branch1x1', train=train)
        b5 = self._bconv(x, 48, 1, f'{p}.branch5x5_1', train=train)
        b5 = self._bconv(b5, 64, 5, f'{p}.branch5x5_2', padding=2, train=train)
        b3 = self._bconv(x, 64, 1, f'{p}.branch3x3dbl_1', train=train)
        b3 = self._bconv(b3, 96, 3, f'{p}.branch3x3dbl_2', padding=1, train=train)
        b3 = self._bconv(b3, 96, 3, f'{p}.branch3x3dbl_3', padding=1, train=train)
        bp = avg_pool(x, 3, 1, 1)
        bp = self._bconv(bp, pool_features, 1, f'{p}.branch_pool', train=train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)

    def _inception_b(self, x, p, train):
        b3 = self._bconv(x, 384, 3, f'{p}.branch3x3', stride=2, train=train)
        bd = self._bconv(x, 64, 1, f'{p}.branch3x3dbl_1', train=train)
        bd = self._bconv(bd, 96, 3, f'{p}.branch3x3dbl_2', padding=1, train=train)
        bd = self._bconv(bd, 96, 3, f'{p}.branch3x3dbl_3', stride=2, train=train)
        bp = max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)

    def _inception_c(self, x, c7, p, train):
        b1 = self._bconv(x, 192, 1, f'{p}.branch1x1', train=train)
        b7 = self._bconv(x, c7, 1, f'{p}.branch7x7_1', train=train)
        b7 = self._bconv(b7, c7, (1, 7), f'{p}.branch7x7_2', padding=(0, 3), train=train)
        b7 = self._bconv(b7, 192, (7, 1), f'{p}.branch7x7_3', padding=(3, 0), train=train)
        bd = self._bconv(x, c7, 1, f'{p}.branch7x7dbl_1', train=train)
        bd = self._bconv(bd, c7, (7, 1), f'{p}.branch7x7dbl_2', padding=(3, 0), train=train)
        bd = self._bconv(bd, c7, (1, 7), f'{p}.branch7x7dbl_3', padding=(0, 3), train=train)
        bd = self._bconv(bd, c7, (7, 1), f'{p}.branch7x7dbl_4', padding=(3, 0), train=train)
        bd = self._bconv(bd, 192, (1, 7), f'{p}.branch7x7dbl_5', padding=(0, 3), train=train)
        bp = avg_pool(x, 3, 1, 1)
        bp = self._bconv(bp, 192, 1, f'{p}.branch_pool', train=train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)

    def _inception_d(self, x, p, train):
        b3 = self._bconv(x, 192, 1, f'{p}.branch3x3_1', train=train)
        b3 = self._bconv(b3, 320, 3, f'{p}.branch3x3_2', stride=2, train=train)
        b7 = self._bconv(x, 192, 1, f'{p}.branch7x7x3_1', train=train)
        b7 = self._bconv(b7, 192, (1, 7), f'{p}.branch7x7x3_2', padding=(0, 3), train=train)
        b7 = self._bconv(b7, 192, (7, 1), f'{p}.branch7x7x3_3', padding=(3, 0), train=train)
        b7 = self._bconv(b7, 192, 3, f'{p}.branch7x7x3_4', stride=2, train=train)
        bp = max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)

    def _inception_e(self, x, p, train):
        b1 = self._bconv(x, 320, 1, f'{p}.branch1x1', train=train)
        b3 = self._bconv(x, 384, 1, f'{p}.branch3x3_1', train=train)
        b3a = self._bconv(b3, 384, (1, 3), f'{p}.branch3x3_2a', padding=(0, 1), train=train)
        b3b = self._bconv(b3, 384, (3, 1), f'{p}.branch3x3_2b', padding=(1, 0), train=train)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = self._bconv(x, 448, 1, f'{p}.branch3x3dbl_1', train=train)
        bd = self._bconv(bd, 384, 3, f'{p}.branch3x3dbl_2', padding=1, train=train)
        bda = self._bconv(bd, 384, (1, 3), f'{p}.branch3x3dbl_3a', padding=(0, 1), train=train)
        bdb = self._bconv(bd, 384, (3, 1), f'{p}.branch3x3dbl_3b', padding=(1, 0), train=train)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = avg_pool(x, 3, 1, 1)
        bp = self._bconv(bp, 192, 1, f'{p}.branch_pool', train=train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)

    def _aux(self, x, train):
        x = avg_pool(x, 5, 3)
        x = self._bconv(x, 128, 1, 'AuxLogits.conv0', train=train)
        x = self._bconv(x, 768, 5, 'AuxLogits.conv1', train=train)
        x = x.reshape((x.shape[0], -1))
        return dense(self.num_classes, name='AuxLogits.fc', dtype=self.dtype)(x)

    @nn.compact
    def __call__(self, x, mode: str = 'forward', head: bool = True,
                 train: bool = False):
        dt = self.dtype
        aux = None
        if mode in ('forward', 'features'):
            x = self._bconv(x, 32, 3, 'Conv2d_1a_3x3', stride=2, train=train)
            x = self._bconv(x, 32, 3, 'Conv2d_2a_3x3', train=train)
            x = self._bconv(x, 64, 3, 'Conv2d_2b_3x3', padding=1, train=train)
            x = max_pool(x, 3, 2)
            x = self._bconv(x, 80, 1, 'Conv2d_3b_1x1', train=train)
            x = self._bconv(x, 192, 3, 'Conv2d_4a_3x3', train=train)
            x = max_pool(x, 3, 2)
            x = self._inception_a(x, 32, 'Mixed_5b', train)
            x = self._inception_a(x, 64, 'Mixed_5c', train)
            x = self._inception_a(x, 64, 'Mixed_5d', train)
            x = self._inception_b(x, 'Mixed_6a', train)
            x = self._inception_c(x, 128, 'Mixed_6b', train)
            x = self._inception_c(x, 160, 'Mixed_6c', train)
            x = self._inception_c(x, 160, 'Mixed_6d', train)
            x = self._inception_c(x, 192, 'Mixed_6e', train)
            if train and self.aux_logits and mode == 'forward':
                aux = self._aux(x, train)
            x = self._inception_d(x, 'Mixed_7a', train)
            x = self._inception_e(x, 'Mixed_7b', train)
            x = self._inception_e(x, 'Mixed_7c', train)
            if mode == 'features':
                return x
        if mode in ('forward', 'logits'):
            x = avg_pool(x, 8)
            x = dropout(0.5, train=train)(x)
            x = x.reshape((x.shape[0], -1))
            if head:
                x = dense(self.num_classes, name='last_linear', dtype=dt)(x)
        if aux is not None:
            return x, aux
        return x


TORCH_RENAMES = {'last_linear': 'fc'}


@register_model
def inceptionv3(num_classes: int = 1000, pretrained: str = 'imagenet'):
    """Inception v3 ("Rethinking the Inception Architecture...")."""
    from ..core.factory import build_model
    module = InceptionV3(num_classes=num_classes)
    # init with train=True so the aux-head params exist for checkpoint loading
    return build_model('inceptionv3', module, pretrained_settings, num_classes,
                       pretrained, torch_renames=TORCH_RENAMES,
                       init_kwargs={'train': True}, fallback_size=299)


register_settings(pretrained_settings)
