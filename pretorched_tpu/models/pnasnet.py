"""PNASNet-5-Large.

Reference: pretorched/models/pnasnet.py (TF port). One cell grammar
(CellBase.cell_forward, :151-178) over stems + 12 cells with per-cell channel
configs; the same TF-SAME pad/crop tricks as NASNet (MaxPool/BranchSeparables
with ``zero_pad``, FactorizedReduction, :33-146). BN eps 0.001; head = relu ->
11x11 avg pool -> dropout -> last_linear(4320); 1001-class checkpoint sliced
for 'imagenet' (pnasnet.py:384-391).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..core.registry import image_settings, register_model, register_settings
from ..ops.pooling import avg_pool, max_pool
from .layers import batch_norm, conv2d, dense, dropout, relu

_URL = 'http://data.lip6.fr/cadene/pretrainedmodels/pnasnet5large-bf079911.pth'
pretrained_settings = {
    'pnasnet5large': {
        'imagenet': image_settings(_URL, input_size=(3, 331, 331),
                                   mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)),
        'imagenet+background': image_settings(
            _URL, input_size=(3, 331, 331), mean=(0.5, 0.5, 0.5),
            std=(0.5, 0.5, 0.5), num_classes=1001),
    }
}


def _pad_tl(x):
    return jnp.pad(x, [(0, 0), (1, 0), (1, 0), (0, 0)])


def _crop_tl(x):
    return x[:, 1:, 1:, :]


class PNASNet5Large(nn.Module):
    num_classes: int = 1000
    dtype: Any = None

    def _max_pool(self, x, stride=1, zero_pad=False):
        if zero_pad:
            x = _pad_tl(x)
        x = max_pool(x, 3, stride, 1)
        return _crop_tl(x) if zero_pad else x

    def _sep(self, x, out_ch, k, stride, prefix):
        in_ch = x.shape[-1]
        x = conv2d(in_ch, k, stride=stride, padding=k // 2, groups=in_ch,
                   bias=False, name=f'{prefix}.depthwise_conv2d',
                   dtype=self.dtype)(x)
        return conv2d(out_ch, 1, bias=False, name=f'{prefix}.pointwise_conv2d',
                      dtype=self.dtype)(x)

    def _branch_sep(self, x, out_ch, k, prefix, train, stride=1,
                    stem_cell=False, zero_pad=False):
        mid = out_ch if stem_cell else x.shape[-1]
        x = relu(x)
        if zero_pad:
            x = _pad_tl(x)
        x = self._sep(x, mid, k, stride, f'{prefix}.separable_1')
        if zero_pad:
            x = _crop_tl(x)
        x = batch_norm(train=train, eps=0.001, name=f'{prefix}.bn_sep_1',
                       dtype=self.dtype)(x)
        x = relu(x)
        x = self._sep(x, out_ch, k, 1, f'{prefix}.separable_2')
        return batch_norm(train=train, eps=0.001, name=f'{prefix}.bn_sep_2',
                          dtype=self.dtype)(x)

    def _relu_conv_bn(self, x, out_ch, prefix, train, kernel=1, stride=1):
        x = relu(x)
        x = conv2d(out_ch, kernel, stride=stride, bias=False,
                   name=f'{prefix}.conv', dtype=self.dtype)(x)
        return batch_norm(train=train, eps=0.001, name=f'{prefix}.bn',
                          dtype=self.dtype)(x)

    def _factorized_reduction(self, x, out_ch, prefix, train):
        x = relu(x)
        p1 = avg_pool(x, 1, 2, count_include_pad=False)
        p1 = conv2d(out_ch // 2, 1, bias=False, name=f'{prefix}.path_1.conv',
                    dtype=self.dtype)(p1)
        p2 = jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 0)])[:, 1:, 1:, :]
        p2 = avg_pool(p2, 1, 2, count_include_pad=False)
        p2 = conv2d(out_ch // 2, 1, bias=False, name=f'{prefix}.path_2.conv',
                    dtype=self.dtype)(p2)
        out = jnp.concatenate([p1, p2], axis=-1)
        return batch_norm(train=train, eps=0.001,
                          name=f'{prefix}.final_path_bn', dtype=self.dtype)(out)

    def _cell_stem_0(self, x, train):
        p = 'cell_stem_0'
        left, right = x, self._relu_conv_bn(x, 54, f'{p}.conv_1x1', train)
        c0l = self._branch_sep(left, 54, 5, f'{p}.comb_iter_0_left', train,
                               stride=2, stem_cell=True)
        c0r = self._max_pool(left, 2)
        c0r = conv2d(54, 1, bias=False, name=f'{p}.comb_iter_0_right.conv',
                     dtype=self.dtype)(c0r)
        c0r = batch_norm(train=train, eps=0.001,
                         name=f'{p}.comb_iter_0_right.bn', dtype=self.dtype)(c0r)
        c0 = c0l + c0r
        c1 = (self._branch_sep(right, 54, 7, f'{p}.comb_iter_1_left', train,
                               stride=2) + self._max_pool(right, 2))
        c2 = (self._branch_sep(right, 54, 5, f'{p}.comb_iter_2_left', train,
                               stride=2)
              + self._branch_sep(right, 54, 3, f'{p}.comb_iter_2_right', train,
                                 stride=2))
        c3 = (self._branch_sep(c2, 54, 3, f'{p}.comb_iter_3_left', train)
              + self._max_pool(right, 2))
        c4 = (self._branch_sep(left, 54, 3, f'{p}.comb_iter_4_left', train,
                               stride=2, stem_cell=True)
              + self._relu_conv_bn(right, 54, f'{p}.comb_iter_4_right', train,
                                   stride=2))
        return jnp.concatenate([c0, c1, c2, c3, c4], axis=-1)

    def _cell(self, x_left, x_right, out_left, out_right, p, train,
              is_reduction=False, zero_pad=False, match_prev=False):
        stride = 2 if is_reduction else 1
        if match_prev:
            left = self._factorized_reduction(x_left, out_left,
                                              f'{p}.conv_prev_1x1', train)
        else:
            left = self._relu_conv_bn(x_left, out_left, f'{p}.conv_prev_1x1',
                                      train)
        right = self._relu_conv_bn(x_right, out_right, f'{p}.conv_1x1', train)
        c0 = (self._branch_sep(left, out_left, 5, f'{p}.comb_iter_0_left',
                               train, stride=stride, zero_pad=zero_pad)
              + self._max_pool(left, stride, zero_pad))
        c1 = (self._branch_sep(right, out_right, 7, f'{p}.comb_iter_1_left',
                               train, stride=stride, zero_pad=zero_pad)
              + self._max_pool(right, stride, zero_pad))
        c2 = (self._branch_sep(right, out_right, 5, f'{p}.comb_iter_2_left',
                               train, stride=stride, zero_pad=zero_pad)
              + self._branch_sep(right, out_right, 3, f'{p}.comb_iter_2_right',
                                 train, stride=stride, zero_pad=zero_pad))
        c3 = (self._branch_sep(c2, out_right, 3, f'{p}.comb_iter_3_left', train)
              + self._max_pool(right, stride, zero_pad))
        c4 = self._branch_sep(left, out_left, 3, f'{p}.comb_iter_4_left',
                              train, stride=stride, zero_pad=zero_pad)
        if is_reduction:
            c4 = c4 + self._relu_conv_bn(right, out_right,
                                         f'{p}.comb_iter_4_right', train,
                                         stride=stride)
        else:
            c4 = c4 + right
        return jnp.concatenate([c0, c1, c2, c3, c4], axis=-1)

    @nn.compact
    def __call__(self, x, mode: str = 'forward', head: bool = True,
                 train: bool = False):
        if mode in ('forward', 'features'):
            x = conv2d(96, 3, stride=2, bias=False, name='conv_0.conv',
                       dtype=self.dtype)(x)
            x_conv0 = batch_norm(train=train, eps=0.001, name='conv_0.bn',
                                 dtype=self.dtype)(x)
            x_stem_0 = self._cell_stem_0(x_conv0, train)
            x_stem_1 = self._cell(x_conv0, x_stem_0, 108, 108, 'cell_stem_1',
                                  train, is_reduction=True, match_prev=True)
            # (prev, cur) walk with per-cell config (pnasnet.py:302-336)
            configs = [
                dict(out=216, match_prev=True),                     # cell_0
                dict(out=216), dict(out=216), dict(out=216),
                dict(out=432, is_reduction=True, zero_pad=True),    # cell_4
                dict(out=432, match_prev=True),
                dict(out=432), dict(out=432),
                dict(out=864, is_reduction=True),                   # cell_8
                dict(out=864, match_prev=True),
                dict(out=864), dict(out=864),
            ]
            prev, cur = x_stem_0, x_stem_1
            for i, cfg in enumerate(configs):
                out = cfg.pop('out')
                nxt = self._cell(prev, cur, out, out, f'cell_{i}', train, **cfg)
                prev, cur = cur, nxt
            x = cur
            if mode == 'features':
                return x
        if mode in ('forward', 'logits'):
            x = relu(x)
            x = avg_pool(x, 11, 1)
            x = x.reshape((x.shape[0], -1))
            x = dropout(0.5, train=train)(x)
            if head:
                x = dense(self.num_classes, name='last_linear', dtype=self.dtype)(x)
        return x


@register_model
def pnasnet5large(num_classes: int = 1000, pretrained: str = 'imagenet'):
    """PNASNet-5-Large (arXiv:1712.00559), 331x331."""
    from ..core.factory import build_model
    module = PNASNet5Large(num_classes=num_classes)
    opts = {}
    if pretrained == 'imagenet':
        opts['background_class_keys'] = ('last_linear',)
    return build_model('pnasnet5large', module, pretrained_settings,
                       num_classes, pretrained, converter_opts=opts,
                       fallback_size=331)


register_settings(pretrained_settings)
