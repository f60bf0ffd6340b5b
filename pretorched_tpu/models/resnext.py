"""ResNeXt-101 32x4d / 64x4d.

Reference: pretorched/models/resnext.py + resnext_features/ (auto-generated
Lambda-graph Torch7 ports). Rebuilt here as a clean grouped-convolution
ResNeXt (SURVEY.md §2.2 guidance) — grouped 3x3 convs map directly onto XLA's
``feature_group_count`` and tile well on the MXU, unlike the reference's
nested Sequential/Lambda emulation.

Checkpoint compatibility: the Lambda-graph state-dict keys are meaningless
auto-indices, so conversion is *positional* — ``ordered_leaves()`` emits our
leaf names in graph-creation order and ``zoo.convert.convert_state_dict_ordered``
zips them against the checkpoint's registration order.

Architecture (from the generated graph): stem 7x7/2 conv-bn-relu + 3x3/2 pad1
max pool; stages (3,4,23,3); block = 1x1 -> grouped 3x3 (stride) -> 1x1, each
conv-bn, relu after first two and after the residual add; downsample =
strided 1x1 conv-bn; head = AvgPool2d(7,1) + last_linear(2048).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn

from ..core.registry import image_settings, register_model, register_settings
from ..ops.pooling import avg_pool, max_pool
from .layers import batch_norm, conv2d, dense, relu

pretrained_settings = {
    'resnext101_32x4d': {'imagenet': image_settings(
        'http://pretorched-x.csail.mit.edu/models/resnext101_32x4d-429f0673.pth')},
    'resnext101_64x4d': {'imagenet': image_settings(
        'http://pretorched-x.csail.mit.edu/models/resnext101_64x4d-d75443fc.pth')},
}


class ResNeXt(nn.Module):
    layers: Sequence[int] = (3, 4, 23, 3)
    cardinality: int = 32
    base_width: int = 4
    num_classes: int = 1000
    dtype: Any = None

    def _block(self, x, width, out_ch, stride, downsample, prefix, train):
        dt = self.dtype
        identity = x
        out = conv2d(width, 1, bias=False, name=f'{prefix}.conv1', dtype=dt)(x)
        out = batch_norm(train=train, name=f'{prefix}.bn1', dtype=dt)(out)
        out = relu(out)
        out = conv2d(width, 3, stride=stride, padding=1, groups=self.cardinality,
                     bias=False, name=f'{prefix}.conv2', dtype=dt)(out)
        out = batch_norm(train=train, name=f'{prefix}.bn2', dtype=dt)(out)
        out = relu(out)
        out = conv2d(out_ch, 1, bias=False, name=f'{prefix}.conv3', dtype=dt)(out)
        out = batch_norm(train=train, name=f'{prefix}.bn3', dtype=dt)(out)
        if downsample:
            identity = conv2d(out_ch, 1, stride=stride, bias=False,
                              name=f'{prefix}.downsample.0', dtype=dt)(x)
            identity = batch_norm(train=train, name=f'{prefix}.downsample.1',
                                  dtype=dt)(identity)
        return relu(out + identity)

    @nn.compact
    def __call__(self, x, mode: str = 'forward', head: bool = True,
                 train: bool = False):
        dt = self.dtype
        if mode in ('forward', 'features'):
            x = conv2d(64, 7, stride=2, padding=3, bias=False, name='conv1',
                       dtype=dt)(x)
            x = batch_norm(train=train, name='bn1', dtype=dt)(x)
            x = relu(x)
            x = max_pool(x, 3, 2, 1)
            in_ch = 64
            for stage, (blocks, stride) in enumerate(
                    zip(self.layers, (1, 2, 2, 2)), start=1):
                planes = 64 * (2 ** (stage - 1))
                width = planes * self.base_width * self.cardinality // 64
                out_ch = planes * 4
                for i in range(blocks):
                    s = stride if i == 0 else 1
                    down = s != 1 or in_ch != out_ch
                    x = self._block(x, width, out_ch, s, down,
                                    f'layer{stage}.{i}', train)
                    in_ch = out_ch
            if mode == 'features':
                return x
        if mode in ('forward', 'logits'):
            x = avg_pool(x, 7, 1)
            x = x.reshape((x.shape[0], -1))
            if head:
                x = dense(self.num_classes, name='last_linear', dtype=dt)(x)
        return x


def ordered_leaves(layers=(3, 4, 23, 3)) -> list:
    """Our leaf-module prefixes in graph-creation order, mirroring the torch
    Lambda graph's registration order (conv before its bn; residual branch
    before downsample; stem first; classifier last)."""
    names = ['conv1', 'bn1']
    in_ch = 64
    for stage, blocks in enumerate(layers, start=1):
        out_ch = 64 * (2 ** (stage - 1)) * 4
        stride = 1 if stage == 1 else 2
        for i in range(blocks):
            p = f'layer{stage}.{i}'
            names += [f'{p}.conv1', f'{p}.bn1', f'{p}.conv2', f'{p}.bn2',
                      f'{p}.conv3', f'{p}.bn3']
            s = stride if i == 0 else 1
            if s != 1 or in_ch != out_ch:
                names += [f'{p}.downsample.0', f'{p}.downsample.1']
            in_ch = out_ch
    names.append('last_linear')
    return names


def _factory(name, cardinality, base_width):
    def fn(num_classes: int = 1000, pretrained: str = 'imagenet'):
        from ..core.factory import build_model
        module = ResNeXt(cardinality=cardinality, base_width=base_width,
                         num_classes=num_classes)
        return build_model(name, module, pretrained_settings, num_classes,
                           pretrained,
                           converter_opts={'ordered_leaves': ordered_leaves()})
    fn.__name__ = name
    fn.__doc__ = f'{name} (grouped-convolution ResNeXt, Torch7-port weights).'
    return register_model(fn, name=name)


resnext101_32x4d = _factory('resnext101_32x4d', 32, 4)
resnext101_64x4d = _factory('resnext101_64x4d', 64, 4)

register_settings(pretrained_settings)
