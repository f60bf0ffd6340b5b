"""MobileNetV2.

Reference: pretorched/models/mobilenet.py. Inverted residuals with ReLU6;
depthwise 3x3 convs (XLA feature_group_count); head = global mean -> dropout
-> last_linear (mobilenet.py:120-124).
"""

from __future__ import annotations

from typing import Any

import jax
import flax.linen as nn

from ..core.registry import image_settings, register_model, register_settings
from ..ops.pooling import global_avg_pool
from .layers import batch_norm, conv2d, dense, dropout

pretrained_settings = {
    'mobilenetv2': {
        'imagenet': image_settings(
            'http://pretorched-x.csail.mit.edu/models/mobilenetv2-b190fe5f.pth'),
    }
}

# (expand_ratio, channels, repeats, stride) — mobilenet.py:88-96
_SETTING = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))


def relu6(x):
    return jax.numpy.minimum(jax.nn.relu(x), 6.0)


class MobileNetV2(nn.Module):
    num_classes: int = 1000
    width_mult: float = 1.0
    dtype: Any = None

    def _cbr(self, x, ch, kernel, name, stride=1, padding=0, groups=1,
             train=False, act=True):
        x = conv2d(ch, kernel, stride=stride, padding=padding, groups=groups,
                   bias=False, name=f'{name}.0', dtype=self.dtype)(x)
        x = batch_norm(train=train, name=f'{name}.1', dtype=self.dtype)(x)
        return relu6(x) if act else x

    def _inverted_residual(self, x, out_ch, stride, expand, prefix, train):
        in_ch = x.shape[-1]
        hidden = round(in_ch * expand)
        use_res = stride == 1 and in_ch == out_ch
        out = x
        # slot indices match torch's Sequential keys (mobilenet.py:48-71)
        if expand != 1:
            out = conv2d(hidden, 1, bias=False, name=f'{prefix}.conv.0',
                         dtype=self.dtype)(out)
            out = batch_norm(train=train, name=f'{prefix}.conv.1',
                             dtype=self.dtype)(out)
            out = relu6(out)
            dw_i, pw_i = 3, 6
        else:
            dw_i, pw_i = 0, 3
        out = conv2d(hidden, 3, stride=stride, padding=1, groups=hidden,
                     bias=False, name=f'{prefix}.conv.{dw_i}', dtype=self.dtype)(out)
        out = batch_norm(train=train, name=f'{prefix}.conv.{dw_i+1}',
                         dtype=self.dtype)(out)
        out = relu6(out)
        out = conv2d(out_ch, 1, bias=False, name=f'{prefix}.conv.{pw_i}',
                     dtype=self.dtype)(out)
        out = batch_norm(train=train, name=f'{prefix}.conv.{pw_i+1}',
                         dtype=self.dtype)(out)
        return x + out if use_res else out

    @nn.compact
    def __call__(self, x, mode: str = 'forward', head: bool = True,
                 train: bool = False):
        if mode in ('forward', 'features'):
            ch = int(32 * self.width_mult)
            x = self._cbr(x, ch, 3, 'features.0', stride=2, padding=1, train=train)
            idx = 1
            for t, c, n, s in _SETTING:
                out_ch = int(c * self.width_mult)
                for i in range(n):
                    x = self._inverted_residual(x, out_ch, s if i == 0 else 1,
                                                t, f'features.{idx}', train)
                    idx += 1
            last = int(1280 * self.width_mult) if self.width_mult > 1.0 else 1280
            x = self._cbr(x, last, 1, f'features.{idx}', train=train)
            if mode == 'features':
                return x
        if mode in ('forward', 'logits'):
            x = global_avg_pool(x)
            x = dropout(0.2, train=train)(x)
            if head:
                x = dense(self.num_classes, name='last_linear', dtype=self.dtype)(x)
        return x


@register_model
def mobilenetv2(num_classes: int = 1000, pretrained: str = 'imagenet'):
    """MobileNetV2 (arXiv:1801.04381)."""
    from ..core.factory import build_model
    module = MobileNetV2(num_classes=num_classes)
    return build_model('mobilenetv2', module, pretrained_settings, num_classes,
                       pretrained)


register_settings(pretrained_settings)
