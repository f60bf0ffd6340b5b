"""Xception.

Reference: pretorched/models/xception.py. Parity notes: separable conv =
depthwise 3x3 (groups=C) + pointwise 1x1, both bias-free — on TPU the
depthwise conv lowers to XLA's feature_group_count path; eval resize uses the
model's own ``scale: 0.8975`` metadata (xception.py:44). Block ``rep``
sequential indices include the ReLU modules, which we reproduce so state-dict
keys line up (``block1.rep.0.conv1`` etc.).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn

from ..core.registry import image_settings, register_model, register_settings
from ..ops.pooling import global_avg_pool, max_pool
from .layers import batch_norm, conv2d, dense, relu

pretrained_settings = {
    'xception': {
        'imagenet': image_settings(
            'http://pretorched-x.csail.mit.edu/models/xception-b429252d.pth',
            input_size=(3, 299, 299), mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
            scale=0.8975),
    }
}


class Xception(nn.Module):
    num_classes: int = 1000
    dtype: Any = None

    def _sep(self, x, out_ch, name, stride=1, padding=1):
        in_ch = x.shape[-1]
        x = conv2d(in_ch, 3, stride=stride, padding=padding, groups=in_ch,
                   bias=False, name=f'{name}.conv1', dtype=self.dtype)(x)
        return conv2d(out_ch, 1, bias=False, name=f'{name}.pointwise',
                      dtype=self.dtype)(x)

    def _block(self, x, out_ch, reps, prefix, train, stride=1,
               start_with_relu=True, grow_first=True):
        inp = x
        in_ch = x.shape[-1]
        # rebuild the reference's rep list to get matching sequential indices
        steps = []                                 # ('relu',) | ('sep', ch) | ('bn', ch)
        ch = in_ch
        if grow_first:
            steps += [('relu',), ('sep', out_ch), ('bn', out_ch)]
            ch = out_ch
        for _ in range(reps - 1):
            steps += [('relu',), ('sep', ch), ('bn', ch)]
        if not grow_first:
            steps += [('relu',), ('sep', out_ch), ('bn', out_ch)]
        if not start_with_relu:
            steps = steps[1:]
        for i, step in enumerate(steps):
            if step[0] == 'relu':
                x = relu(x)
            elif step[0] == 'sep':
                x = self._sep(x, step[1], f'{prefix}.rep.{i}')
            else:
                x = batch_norm(train=train, name=f'{prefix}.rep.{i}',
                               dtype=self.dtype)(x)
        if stride != 1:
            x = max_pool(x, 3, stride, 1)
        if out_ch != in_ch or stride != 1:
            skip = conv2d(out_ch, 1, stride=stride, bias=False,
                          name=f'{prefix}.skip', dtype=self.dtype)(inp)
            skip = batch_norm(train=train, name=f'{prefix}.skipbn',
                              dtype=self.dtype)(skip)
        else:
            skip = inp
        return x + skip

    @nn.compact
    def __call__(self, x, mode: str = 'forward', head: bool = True,
                 train: bool = False):
        dt = self.dtype
        if mode in ('forward', 'features'):
            x = conv2d(32, 3, stride=2, bias=False, name='conv1', dtype=dt)(x)
            x = relu(batch_norm(train=train, name='bn1', dtype=dt)(x))
            x = conv2d(64, 3, bias=False, name='conv2', dtype=dt)(x)
            x = relu(batch_norm(train=train, name='bn2', dtype=dt)(x))
            x = self._block(x, 128, 2, 'block1', train, stride=2,
                            start_with_relu=False)
            x = self._block(x, 256, 2, 'block2', train, stride=2)
            x = self._block(x, 728, 2, 'block3', train, stride=2)
            for i in range(4, 12):
                x = self._block(x, 728, 3, f'block{i}', train)
            x = self._block(x, 1024, 2, 'block12', train, stride=2,
                            grow_first=False)
            x = self._sep(x, 1536, 'conv3')
            x = relu(batch_norm(train=train, name='bn3', dtype=dt)(x))
            x = self._sep(x, 2048, 'conv4')
            x = batch_norm(train=train, name='bn4', dtype=dt)(x)
            if mode == 'features':
                return x
        if mode in ('forward', 'logits'):
            x = relu(x)
            x = global_avg_pool(x)
            if head:
                x = dense(self.num_classes, name='last_linear', dtype=dt)(x)
        return x


TORCH_RENAMES = {'last_linear': 'fc'}


@register_model
def xception(num_classes: int = 1000, pretrained: str = 'imagenet'):
    """Xception (arXiv:1610.02357)."""
    from ..core.factory import build_model
    module = Xception(num_classes=num_classes)
    return build_model('xception', module, pretrained_settings, num_classes,
                       pretrained, torch_renames=TORCH_RENAMES,
                       fallback_size=299)


register_settings(pretrained_settings)
