"""BN-Inception (Inception-v2, Caffe port).

Reference: pretorched/models/bninception.py — a machine-generated Caffe port
with ~360 hand-unrolled lines. Rebuilt here data-driven: one block function +
a config table. Parity notes:

* BGR input, range [0,255], mean [104,117,128] (bninception.py:17-21);
* all convs carry biases (Caffe), BN momentum 0.9 torch == 0.1 flax
  (bninception.py:33);
* every pool is ceil_mode (Caffe compat); inception branch pools are
  3x3/1 pad1 avg (count_include_pad) except reduction blocks (max, stride 2)
  and 5b (max, stride 1);
* branch concat order: 1x1, 3x3, double-3x3, pool-proj (bninception.py:483).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..core.registry import image_settings, register_model, register_settings
from ..ops.pooling import avg_pool, max_pool
from .layers import batch_norm, conv2d, dense, relu

pretrained_settings = {
    'bninception': {
        'imagenet': image_settings(
            'http://pretorched-x.csail.mit.edu/models/bn_inception-f8309acd.pth',
            input_space='BGR', input_range=(0, 255), mean=(104, 117, 128),
            std=(1, 1, 1)),
    }
}

# (name, 1x1, 3x3_reduce, 3x3, dbl_reduce, dbl_1, dbl_2, pool_proj, pool, stride)
# pool: 'avg' (3x3/1 pad1) | 'max' (3x3/1 pad1, block 5b) ; stride 2 blocks
# (3c, 4e) drop the 1x1 branch and pool without projection.
_BLOCKS = (
    ('3a', 64, 64, 64, 64, 96, 96, 32, 'avg', 1),
    ('3b', 64, 64, 96, 64, 96, 96, 64, 'avg', 1),
    ('3c', 0, 128, 160, 64, 96, 96, 0, 'max', 2),
    ('4a', 224, 64, 96, 96, 128, 128, 128, 'avg', 1),
    ('4b', 192, 96, 128, 96, 128, 128, 128, 'avg', 1),
    ('4c', 160, 128, 160, 128, 160, 160, 128, 'avg', 1),
    ('4d', 96, 128, 192, 160, 192, 192, 128, 'avg', 1),
    ('4e', 0, 128, 192, 192, 256, 256, 0, 'max', 2),
    ('5a', 352, 192, 320, 160, 224, 224, 128, 'avg', 1),
    ('5b', 352, 192, 320, 192, 224, 224, 128, 'max', 1),
)


class BNInception(nn.Module):
    num_classes: int = 1000
    dtype: Any = None

    def _cbr(self, x, features, kernel, name, stride=1, padding=0, train=False):
        x = conv2d(features, kernel, stride=stride, padding=padding,
                   name=name, dtype=self.dtype)(x)
        x = batch_norm(train=train, momentum=0.9, name=f'{name}_bn',
                       dtype=self.dtype)(x)
        return relu(x)

    def _inception(self, x, cfg, train):
        name, c1, r3, c3, rd, d1, d2, proj, pool, stride = cfg
        p = f'inception_{name}'
        branches = []
        if c1:
            branches.append(self._cbr(x, c1, 1, f'{p}_1x1', train=train))
        b = self._cbr(x, r3, 1, f'{p}_3x3_reduce', train=train)
        branches.append(self._cbr(b, c3, 3, f'{p}_3x3', stride=stride,
                                  padding=1, train=train))
        b = self._cbr(x, rd, 1, f'{p}_double_3x3_reduce', train=train)
        b = self._cbr(b, d1, 3, f'{p}_double_3x3_1', padding=1, train=train)
        branches.append(self._cbr(b, d2, 3, f'{p}_double_3x3_2', stride=stride,
                                  padding=1, train=train))
        if stride == 2:
            branches.append(max_pool(x, 3, 2, 0, ceil_mode=True))
        else:
            if pool == 'avg':
                bp = avg_pool(x, 3, 1, 1, ceil_mode=True)
            else:
                bp = max_pool(x, 3, 1, 1, ceil_mode=True)
            branches.append(self._cbr(bp, proj, 1, f'{p}_pool_proj', train=train))
        return jnp.concatenate(branches, axis=-1)

    @nn.compact
    def __call__(self, x, mode: str = 'forward', head: bool = True,
                 train: bool = False):
        if mode in ('forward', 'features'):
            x = self._cbr(x, 64, 7, 'conv1_7x7_s2', stride=2, padding=3, train=train)
            x = max_pool(x, 3, 2, 0, ceil_mode=True)
            x = self._cbr(x, 64, 1, 'conv2_3x3_reduce', train=train)
            x = self._cbr(x, 192, 3, 'conv2_3x3', padding=1, train=train)
            x = max_pool(x, 3, 2, 0, ceil_mode=True)
            for cfg in _BLOCKS:
                x = self._inception(x, cfg, train)
            if mode == 'features':
                return x
        if mode in ('forward', 'logits'):
            x = avg_pool(x, 7, 1, ceil_mode=True)
            x = x.reshape((x.shape[0], -1))
            if head:
                x = dense(self.num_classes, name='last_linear', dtype=self.dtype)(x)
        return x


@register_model
def bninception(num_classes: int = 1000, pretrained: str = 'imagenet'):
    """BN-Inception (arXiv:1502.03167), Caffe-port weights."""
    from ..core.factory import build_model
    module = BNInception(num_classes=num_classes)
    return build_model('bninception', module, pretrained_settings, num_classes,
                       pretrained)


register_settings(pretrained_settings)
