"""Dual Path Networks (dpn68/68b/92/98/131/107).

Reference: pretorched/models/dpn.py (Ross Wightman's port). Parity notes:

* pre-activation blocks (BN eps=0.001 -> ReLU -> conv), dual residual+dense
  paths carried as a channel-split pair (dpn.py:285-311);
* classifier is a 1x1 conv (not a Linear) so the test-time pooling scheme
  works: in eval with ``test_time_pool`` the head is 7x7/1 avg pool -> conv ->
  avgmax global pool; in train it's global avg pool -> conv (dpn.py:375-384);
* dpn68* use a 3x3/2 stem ('small'); unusual mean/std (dpn.py:27-28).

On TPU the channel-split is a static slice, so the dual path compiles to pure
fused elementwise ops between the grouped convs.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ..core.registry import image_settings, register_model, register_settings
from ..ops.pooling import (adaptive_avgmax_pool2d, avg_pool,
                           global_avg_pool, max_pool)
from .layers import batch_norm, conv2d, relu

_MEAN = (124 / 255, 117 / 255, 104 / 255)
_STD = (1 / (.0167 * 255),) * 3


def _s(url, **kw):
    return image_settings(url, mean=_MEAN, std=_STD, **kw)


pretrained_settings = {
    'dpn68': {'imagenet': _s('http://pretorched-x.csail.mit.edu/models/dpn68-fc785635.pth')},
    'dpn68b': {'imagenet+5k': _s('http://pretorched-x.csail.mit.edu/models/dpn68b_extra-32ce864c.pth')},
    'dpn92': {'imagenet+5k': _s('http://pretorched-x.csail.mit.edu/models/dpn92_extra-731473e5.pth')},
    'dpn98': {'imagenet': _s('http://pretorched-x.csail.mit.edu/models/dpn98-865a0af1.pth')},
    'dpn131': {'imagenet': _s('http://pretorched-x.csail.mit.edu/models/dpn131-fedf956c.pth')},
    'dpn107': {'imagenet+5k': _s('http://pretorched-x.csail.mit.edu/models/dpn107_extra-6c815f6a.pth')},
}


class DPN(nn.Module):
    small: bool = False
    num_init_features: int = 64
    k_r: int = 96
    groups: int = 32
    b: bool = False
    k_sec: Sequence[int] = (3, 4, 20, 3)
    inc_sec: Sequence[int] = (16, 32, 24, 128)
    num_classes: int = 1000
    test_time_pool: bool = False
    dtype: Any = None

    def _bn_act_conv(self, x, out_ch, kernel, name, stride=1, padding=0,
                     groups=1, train=False):
        x = batch_norm(train=train, eps=0.001, name=f'{name}.bn',
                       dtype=self.dtype)(x)
        x = relu(x)
        return conv2d(out_ch, kernel, stride=stride, padding=padding,
                      groups=groups, bias=False, name=f'{name}.conv',
                      dtype=self.dtype)(x)

    def _dual_path_block(self, pair, r, bw, inc, prefix, block_type, train):
        res, dense = pair if isinstance(pair, tuple) else (None, None)
        x_in = jnp.concatenate(pair, axis=-1) if isinstance(pair, tuple) else pair
        stride = 2 if block_type == 'down' else 1
        if block_type in ('proj', 'down'):
            wname = 'c1x1_w_s2' if stride == 2 else 'c1x1_w_s1'
            x_s = self._bn_act_conv(x_in, bw + 2 * inc, 1, f'{prefix}.{wname}',
                                    stride=stride, train=train)
            x_s1, x_s2 = x_s[..., :bw], x_s[..., bw:]
        else:
            x_s1, x_s2 = res, dense
        out = self._bn_act_conv(x_in, r, 1, f'{prefix}.c1x1_a', train=train)
        out = self._bn_act_conv(out, r, 3, f'{prefix}.c3x3_b', stride=stride,
                                padding=1, groups=self.groups, train=train)
        if self.b:
            out = batch_norm(train=train, eps=0.001, name=f'{prefix}.c1x1_c.bn',
                             dtype=self.dtype)(out)
            out = relu(out)
            o1 = conv2d(bw, 1, bias=False, name=f'{prefix}.c1x1_c1',
                        dtype=self.dtype)(out)
            o2 = conv2d(inc, 1, bias=False, name=f'{prefix}.c1x1_c2',
                        dtype=self.dtype)(out)
        else:
            out = self._bn_act_conv(out, bw + inc, 1, f'{prefix}.c1x1_c', train=train)
            o1, o2 = out[..., :bw], out[..., bw:]
        return x_s1 + o1, jnp.concatenate([x_s2, o2], axis=-1)

    @nn.compact
    def __call__(self, x, mode: str = 'forward', head: bool = True,
                 train: bool = False):
        dt = self.dtype
        if mode in ('forward', 'features'):
            k, p = (3, 1) if self.small else (7, 3)
            x = conv2d(self.num_init_features, k, stride=2, padding=p, bias=False,
                       name='features.conv1_1.conv', dtype=dt)(x)
            x = batch_norm(train=train, eps=0.001, name='features.conv1_1.bn',
                           dtype=dt)(x)
            x = relu(x)
            x = max_pool(x, 3, 2, 1)
            bw_factor = 1 if self.small else 4
            pair = x
            for stage, base in enumerate((64, 128, 256, 512), start=2):
                bw = base * bw_factor
                inc = self.inc_sec[stage - 2]
                r = (self.k_r * bw) // (64 * bw_factor)
                btype = 'proj' if stage == 2 else 'down'
                pair = self._dual_path_block(pair, r, bw, inc,
                                             f'features.conv{stage}_1', btype, train)
                for i in range(2, self.k_sec[stage - 2] + 1):
                    pair = self._dual_path_block(pair, r, bw, inc,
                                                 f'features.conv{stage}_{i}',
                                                 'normal', train)
            x = jnp.concatenate(pair, axis=-1)
            x = batch_norm(train=train, eps=0.001, name='features.conv5_bn_ac.bn',
                           dtype=dt)(x)
            x = relu(x)
            if mode == 'features':
                return x
        if mode in ('forward', 'logits'):
            if not train and self.test_time_pool:
                x = avg_pool(x, 7, 1)
                out = conv2d(self.num_classes, 1, name='classifier', dtype=dt)(x)
                out = adaptive_avgmax_pool2d(out, 'avgmax')
            else:
                x = global_avg_pool(x, keepdims=True)
                out = conv2d(self.num_classes, 1, name='classifier', dtype=dt)(x)
            x = out.reshape((out.shape[0], -1))
        return x


_CONFIGS = {
    'dpn68': dict(small=True, num_init_features=10, k_r=128, groups=32,
                  k_sec=(3, 4, 12, 3), inc_sec=(16, 32, 32, 64)),
    'dpn68b': dict(small=True, num_init_features=10, k_r=128, groups=32, b=True,
                   k_sec=(3, 4, 12, 3), inc_sec=(16, 32, 32, 64)),
    'dpn92': dict(num_init_features=64, k_r=96, groups=32,
                  k_sec=(3, 4, 20, 3), inc_sec=(16, 32, 24, 128)),
    'dpn98': dict(num_init_features=96, k_r=160, groups=40,
                  k_sec=(3, 6, 20, 3), inc_sec=(16, 32, 32, 128)),
    'dpn131': dict(num_init_features=128, k_r=160, groups=40,
                   k_sec=(4, 8, 28, 3), inc_sec=(16, 32, 32, 128)),
    'dpn107': dict(num_init_features=128, k_r=200, groups=50,
                   k_sec=(4, 8, 20, 3), inc_sec=(20, 64, 64, 128)),
}
_DEFAULT_TAG = {'dpn68': 'imagenet', 'dpn68b': 'imagenet+5k',
                'dpn92': 'imagenet+5k', 'dpn98': 'imagenet',
                'dpn131': 'imagenet', 'dpn107': 'imagenet+5k'}


def _factory(name):
    def fn(num_classes: int = 1000, pretrained: str = None):
        from ..core.factory import build_model
        pretrained = _DEFAULT_TAG[name] if pretrained == 'default' else pretrained
        module = DPN(num_classes=num_classes, test_time_pool=True,
                     **_CONFIGS[name])
        return build_model(name, module, pretrained_settings, num_classes,
                           pretrained, head_path=None)
    fn.__name__ = name
    fn.__defaults__ = (1000, _DEFAULT_TAG[name])
    fn.__doc__ = f'{name} (Dual Path Network).'
    return register_model(fn, name=name)


dpn68 = _factory('dpn68')
dpn68b = _factory('dpn68b')
dpn92 = _factory('dpn92')
dpn98 = _factory('dpn98')
dpn131 = _factory('dpn131')
dpn107 = _factory('dpn107')

register_settings(pretrained_settings)
