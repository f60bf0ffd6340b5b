"""NASNet-A Large (6 @ 4032) and Mobile (4 @ 1056).

Reference: pretorched/models/nasnet.py and nasnet_mobile.py (TF ports). Both
share one cell grammar; the parity-critical subtleties are the asymmetric
pad/crop dances that emulate TF 'SAME' padding:

* MaxPoolPad/AvgPoolPad: zero-pad (left=1, top=1), pool 3x3/2 pad1, crop the
  first row/col (nasnet.py:32-57);
* 'specific' BranchSeparables (mobile CellStem1/ReductionCell1) and
  BranchSeparablesReduction (large/mobile ReductionCell0): pad (1,0,1,0)
  before the first depthwise conv, crop [1:,1:] after
  (nasnet_mobile.py:96-157);
* FirstCell/CellStem1 prev-path: avg_pool(1x1, stride 2) twice, the second on
  input shifted by one pixel via pad (0,1,0,1)+crop (nasnet.py:198-207);
* every branch avg pool is count_include_pad=False; BN eps 0.001.

Large: stem 96, 331x331 input, 11x11 head pool, 1001-class checkpoint sliced
for 'imagenet' (nasnet.py:618-625). Mobile: stem 32, 224x224, 7x7 head pool,
1000-class checkpoint.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..core.registry import image_settings, register_model, register_settings
from ..ops.pooling import avg_pool, max_pool
from .layers import batch_norm, conv2d, dense, dropout, relu

_L_URL = 'http://pretorched-x.csail.mit.edu/models/nasnetalarge-82673142.pth'
pretrained_settings = {
    'nasnetalarge': {
        'imagenet': image_settings(_L_URL, input_size=(3, 331, 331),
                                   mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)),
        'imagenet+background': image_settings(
            _L_URL, input_size=(3, 331, 331), mean=(0.5, 0.5, 0.5),
            std=(0.5, 0.5, 0.5), num_classes=1001),
    },
    'nasnetamobile': {
        'imagenet': image_settings(
            'http://pretorched-x.csail.mit.edu/models/nasnetamobile-5d17248c.pth',
            mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)),
    },
}


def _pad_tl(x):
    return jnp.pad(x, [(0, 0), (1, 0), (1, 0), (0, 0)])


def _crop_tl(x):
    return x[:, 1:, 1:, :]


def max_pool_pad(x):
    return _crop_tl(max_pool(_pad_tl(x), 3, 2, 1))


def avg_pool_pad(x):
    return _crop_tl(avg_pool(_pad_tl(x), 3, 2, 1, count_include_pad=False))


def _avg31(x):
    return avg_pool(x, 3, 1, 1, count_include_pad=False)


class NASNetA(nn.Module):
    num_classes: int = 1000
    stem_filters: int = 96
    penultimate_filters: int = 4032
    filters_multiplier: int = 2
    num_normal_cells: int = 6      # per stage; 4 for mobile
    specific_stem1: bool = False   # mobile uses 'specific' pads in CellStem1/Red1
    head_pool: int = 11            # 7 for mobile
    dtype: Any = None

    # ------------------------------------------------------------- primitives
    def _sep_conv(self, x, out_ch, kernel, stride, padding, prefix, train):
        in_ch = x.shape[-1]
        x = conv2d(in_ch, kernel, stride=stride, padding=padding, groups=in_ch,
                   bias=False, name=f'{prefix}.depthwise_conv2d',
                   dtype=self.dtype)(x)
        return conv2d(out_ch, 1, bias=False, name=f'{prefix}.pointwise_conv2d',
                      dtype=self.dtype)(x)

    def _branch_sep(self, x, out_ch, kernel, stride, padding, prefix, train,
                    specific=False, stem_mid=None, reduction=False):
        """BranchSeparables / ...Stem / ...Reduction (see module docstring)."""
        mid = stem_mid if stem_mid is not None else x.shape[-1]
        x = relu(x)
        if specific or reduction:
            x = _pad_tl(x)
        x = self._sep_conv(x, mid, kernel, stride, padding,
                           f'{prefix}.separable_1', train)
        if specific or reduction:
            x = _crop_tl(x)
        x = batch_norm(train=train, eps=0.001, name=f'{prefix}.bn_sep_1',
                       dtype=self.dtype)(x)
        x = relu(x)
        x = self._sep_conv(x, out_ch, kernel, 1, padding,
                           f'{prefix}.separable_2', train)
        return batch_norm(train=train, eps=0.001, name=f'{prefix}.bn_sep_2',
                          dtype=self.dtype)(x)

    def _relu_conv_bn(self, x, out_ch, prefix, train):
        x = relu(x)
        x = conv2d(out_ch, 1, bias=False, name=f'{prefix}.conv',
                   dtype=self.dtype)(x)
        return batch_norm(train=train, eps=0.001, name=f'{prefix}.bn',
                          dtype=self.dtype)(x)

    def _prev_path(self, x_prev, out_half, prefix, train):
        """The stride-2 dual-path shrink of the previous state
        (nasnet.py:198-207, 293-304)."""
        x_relu = relu(x_prev)
        p1 = avg_pool(x_relu, 1, 2, count_include_pad=False)
        p1 = conv2d(out_half, 1, bias=False, name=f'{prefix}.path_1.conv',
                    dtype=self.dtype)(p1)
        p2 = jnp.pad(x_relu, [(0, 0), (0, 1), (0, 1), (0, 0)])[:, 1:, 1:, :]
        p2 = avg_pool(p2, 1, 2, count_include_pad=False)
        p2 = conv2d(out_half, 1, bias=False, name=f'{prefix}.path_2.conv',
                    dtype=self.dtype)(p2)
        out = jnp.concatenate([p1, p2], axis=-1)
        return batch_norm(train=train, eps=0.001,
                          name=f'{prefix}.final_path_bn', dtype=self.dtype)(out)

    # ------------------------------------------------------------------ cells
    def _cell_stem_0(self, x, filters, train):
        p = 'cell_stem_0'
        x1 = self._relu_conv_bn(x, filters, f'{p}.conv_1x1', train)
        c0 = (self._branch_sep(x1, filters, 5, 2, 2, f'{p}.comb_iter_0_left', train)
              + self._branch_sep(x, filters, 7, 2, 3, f'{p}.comb_iter_0_right',
                                 train, stem_mid=filters))
        c1 = (max_pool(x1, 3, 2, 1)
              + self._branch_sep(x, filters, 7, 2, 3, f'{p}.comb_iter_1_right',
                                 train, stem_mid=filters))
        c2 = (avg_pool(x1, 3, 2, 1, count_include_pad=False)
              + self._branch_sep(x, filters, 5, 2, 2, f'{p}.comb_iter_2_right',
                                 train, stem_mid=filters))
        c3 = _avg31(c0) + c1
        c4 = (self._branch_sep(c0, filters, 3, 1, 1, f'{p}.comb_iter_4_left', train)
              + max_pool(x1, 3, 2, 1))
        return jnp.concatenate([c1, c2, c3, c4], axis=-1)

    def _cell_stem_1(self, x_conv0, x_stem_0, filters, train):
        p = 'cell_stem_1'
        sp = self.specific_stem1
        left = self._relu_conv_bn(x_stem_0, filters, f'{p}.conv_1x1', train)
        right = self._prev_path(x_conv0, filters // 2, p, train)
        mp = max_pool_pad if sp else (lambda v: max_pool(v, 3, 2, 1))
        ap = avg_pool_pad if sp else (
            lambda v: avg_pool(v, 3, 2, 1, count_include_pad=False))
        c0 = (self._branch_sep(left, filters, 5, 2, 2, f'{p}.comb_iter_0_left',
                               train, specific=sp)
              + self._branch_sep(right, filters, 7, 2, 3,
                                 f'{p}.comb_iter_0_right', train, specific=sp))
        c1 = mp(left) + self._branch_sep(right, filters, 7, 2, 3,
                                         f'{p}.comb_iter_1_right', train,
                                         specific=sp)
        c2 = ap(left) + self._branch_sep(right, filters, 5, 2, 2,
                                         f'{p}.comb_iter_2_right', train,
                                         specific=sp)
        c3 = _avg31(c0) + c1
        c4 = (self._branch_sep(c0, filters, 3, 1, 1, f'{p}.comb_iter_4_left',
                               train, specific=sp) + mp(left))
        return jnp.concatenate([c1, c2, c3, c4], axis=-1)

    def _first_cell(self, x, x_prev, out_left, out_right, p, train):
        left = self._prev_path(x_prev, out_left, p, train)
        right = self._relu_conv_bn(x, out_right, f'{p}.conv_1x1', train)
        c0 = (self._branch_sep(right, out_right, 5, 1, 2, f'{p}.comb_iter_0_left', train)
              + self._branch_sep(left, out_right, 3, 1, 1, f'{p}.comb_iter_0_right', train))
        c1 = (self._branch_sep(left, out_right, 5, 1, 2, f'{p}.comb_iter_1_left', train)
              + self._branch_sep(left, out_right, 3, 1, 1, f'{p}.comb_iter_1_right', train))
        c2 = _avg31(right) + left
        c3 = _avg31(left) + _avg31(left)
        c4 = self._branch_sep(right, out_right, 3, 1, 1,
                              f'{p}.comb_iter_4_left', train) + right
        return jnp.concatenate([left, c0, c1, c2, c3, c4], axis=-1)

    def _normal_cell(self, x, x_prev, out_left, out_right, p, train):
        left = self._relu_conv_bn(x_prev, out_left, f'{p}.conv_prev_1x1', train)
        right = self._relu_conv_bn(x, out_right, f'{p}.conv_1x1', train)
        c0 = (self._branch_sep(right, out_right, 5, 1, 2, f'{p}.comb_iter_0_left', train)
              + self._branch_sep(left, out_left, 3, 1, 1, f'{p}.comb_iter_0_right', train))
        c1 = (self._branch_sep(left, out_left, 5, 1, 2, f'{p}.comb_iter_1_left', train)
              + self._branch_sep(left, out_left, 3, 1, 1, f'{p}.comb_iter_1_right', train))
        c2 = _avg31(right) + left
        c3 = _avg31(left) + _avg31(left)
        c4 = self._branch_sep(right, out_right, 3, 1, 1,
                              f'{p}.comb_iter_4_left', train) + right
        return jnp.concatenate([left, c0, c1, c2, c3, c4], axis=-1)

    def _reduction_cell(self, x, x_prev, out_left, out_right, p, train,
                        reduction_style: bool):
        """ReductionCell0 (BranchSeparablesReduction) vs ReductionCell1
        (plain/specific separables)."""
        sp = (not reduction_style) and self.specific_stem1
        red = reduction_style
        left = self._relu_conv_bn(x_prev, out_left, f'{p}.conv_prev_1x1', train)
        right = self._relu_conv_bn(x, out_right, f'{p}.conv_1x1', train)
        if red or sp:
            mp = max_pool_pad
            ap = avg_pool_pad
        else:
            mp = lambda v: max_pool(v, 3, 2, 1)                      # noqa: E731
            ap = lambda v: avg_pool(v, 3, 2, 1, count_include_pad=False)  # noqa: E731
        c0 = (self._branch_sep(right, out_right, 5, 2, 2, f'{p}.comb_iter_0_left',
                               train, specific=sp, reduction=red)
              + self._branch_sep(left, out_right, 7, 2, 3, f'{p}.comb_iter_0_right',
                                 train, specific=sp, reduction=red))
        c1 = mp(right) + self._branch_sep(left, out_right, 7, 2, 3,
                                          f'{p}.comb_iter_1_right', train,
                                          specific=sp, reduction=red)
        c2 = ap(right) + self._branch_sep(left, out_right, 5, 2, 2,
                                          f'{p}.comb_iter_2_right', train,
                                          specific=sp, reduction=red)
        c3 = _avg31(c0) + c1
        c4 = (self._branch_sep(c0, out_right, 3, 1, 1, f'{p}.comb_iter_4_left',
                               train, specific=sp, reduction=red) + mp(right))
        return jnp.concatenate([c1, c2, c3, c4], axis=-1)

    # ---------------------------------------------------------------- forward
    @nn.compact
    def __call__(self, x, mode: str = 'forward', head: bool = True,
                 train: bool = False):
        n = self.num_normal_cells
        mult = self.filters_multiplier
        filters = self.penultimate_filters // 24
        if mode in ('forward', 'features'):
            x = conv2d(self.stem_filters, 3, stride=2, bias=False,
                       name='conv0.conv', dtype=self.dtype)(x)
            x_conv0 = batch_norm(train=train, eps=0.001, name='conv0.bn',
                                 dtype=self.dtype)(x)
            x_stem_0 = self._cell_stem_0(x_conv0, filters // (mult ** 2), train)
            x_stem_1 = self._cell_stem_1(x_conv0, x_stem_0, filters // mult, train)

            prev, cur = x_stem_0, x_stem_1
            for stage in range(3):
                f = filters * (mult ** stage)
                ci = stage * 6   # torch numbering: cells 0-5, 6-11, 12-17
                nxt = self._first_cell(cur, prev, f // 2, f, f'cell_{ci}', train)
                prev, cur = cur, nxt
                ci += 1
                for _ in range(n - 1):
                    nxt = self._normal_cell(cur, prev, f, f, f'cell_{ci}', train)
                    prev, cur = cur, nxt
                    ci += 1
                if stage < 2:
                    red = self._reduction_cell(
                        cur, prev, f * mult, f * mult,
                        f'reduction_cell_{stage}', train,
                        reduction_style=(stage == 0))
                    # mobile feeds the next FirstCell the *last* normal cell
                    # as prev (nasnet_mobile.py cell_6(x_red0, x_cell_3));
                    # large feeds the *second-to-last* (nasnet.py
                    # cell_6(x_red0, x_cell_4)).
                    prev = cur if self.specific_stem1 else prev
                    cur = red
            x = cur
            if mode == 'features':
                return x
        if mode in ('forward', 'logits'):
            x = relu(x)
            x = avg_pool(x, self.head_pool, 1)
            x = x.reshape((x.shape[0], -1))
            x = dropout(0.5, train=train)(x)
            if head:
                x = dense(self.num_classes, name='last_linear', dtype=self.dtype)(x)
        return x


@register_model
def nasnetalarge(num_classes: int = 1000, pretrained: str = 'imagenet'):
    """NASNet-A-Large (arXiv:1707.07012), 331x331."""
    from ..core.factory import build_model
    module = NASNetA(num_classes=num_classes, stem_filters=96,
                     penultimate_filters=4032, num_normal_cells=6,
                     specific_stem1=False, head_pool=11)
    opts = {}
    if pretrained == 'imagenet':
        opts['background_class_keys'] = ('last_linear',)
    return build_model('nasnetalarge', module, pretrained_settings, num_classes,
                       pretrained, converter_opts=opts, fallback_size=331)


@register_model
def nasnetamobile(num_classes: int = 1000, pretrained: str = 'imagenet'):
    """NASNet-A-Mobile (4 @ 1056), 224x224."""
    from ..core.factory import build_model
    module = NASNetA(num_classes=num_classes, stem_filters=32,
                     penultimate_filters=1056, num_normal_cells=4,
                     specific_stem1=True, head_pool=7)
    return build_model('nasnetamobile', module, pretrained_settings,
                       num_classes, pretrained)


register_settings(pretrained_settings)
