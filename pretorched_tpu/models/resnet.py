"""2D ResNet family (torchvision-compatible weights).

TPU-native re-implementation of the reference's torchvision ResNet wrappers
(reference: pretorched/models/torchvision_models.py:443-530 `modify_resnets`,
factories resnet18/34/50/101/152). Channels-last, Flax, one jit-compiled graph.

Checkpoint layout parity: leaf-module names replicate the torchvision
state-dict key prefixes (``conv1``, ``layer1.0.conv2``, ``layer2.0.downsample.0``
…) so `zoo.convert` maps weights mechanically. The final linear is named
``last_linear`` (reference renames torch's ``fc`` the same way); the converter
carries the ``fc -> last_linear`` rename.

Architecture notes (parity-relevant):
* bottleneck stride sits on the 3x3 conv (torchvision convention);
* stem: 7x7/2 pad 3 conv -> BN -> ReLU -> 3x3/2 pad 1 max pool;
* head: global average pool -> ``last_linear``.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn

from ..core.registry import image_settings, register_model, register_settings
from ..ops.pooling import global_avg_pool, max_pool
from .layers import batch_norm, conv2d, dense, relu

model_urls = {
    'resnet18': 'https://download.pytorch.org/models/resnet18-5c106cde.pth',
    'resnet34': 'https://download.pytorch.org/models/resnet34-333f7ec4.pth',
    'resnet50': 'https://download.pytorch.org/models/resnet50-19c8e357.pth',
    'resnet101': 'https://download.pytorch.org/models/resnet101-5d3b4d8f.pth',
    'resnet152': 'https://download.pytorch.org/models/resnet152-b121ed2d.pth',
}

pretrained_settings = {
    name: {'imagenet': image_settings(url)} for name, url in model_urls.items()
}
# extra hosted checkpoints (reference: torchvision_models.py:58-63, 96-143)
pretrained_settings['resnet50']['moments'] = image_settings(
    'http://moments.csail.mit.edu/moments_models/resnet50_moments-fd0c4436.pth',
    num_classes=339)
pretrained_settings['resnet18']['places365'] = image_settings(
    'http://pretorched-x.csail.mit.edu/models/resnet18_places365-dbad67aa.pth',
    num_classes=365)
pretrained_settings['resnet50']['places365'] = image_settings(
    'http://pretorched-x.csail.mit.edu/models/resnet50_places365-a570fcfc.pth',
    num_classes=365)


class ResNet(nn.Module):
    """Channels-last 2D ResNet with torchvision checkpoint naming."""

    block: str                      # 'basic' | 'bottleneck'
    layers: Sequence[int]
    num_classes: int = 1000
    width_per_stage: Sequence[int] = (64, 128, 256, 512)
    conv_bias: bool = False         # FBResNet ports use bias=True (fbresnet.py:22-23)
    stride_on: str = 'conv2'        # 'conv1' = caffe-style (cafferesnet.py:66-69)
    stem_pool: str = 'pad'          # 'ceil' = caffe 3x3/2 pad0 ceil_mode pool
    logits_pool: str = 'global'     # 'avg7' = fixed AvgPool2d(7) head
    inner_width_mult: float = 1.0   # WideResNet: widen bottleneck 3x3 widths only
    no_bn: bool = False             # BN-free net (functional-zoo WRN-50-2 hkl
                                    # export: BN folded into conv biases,
                                    # reference wideresnet.py:15-53)
    s2d_stem: bool = False          # fold the 7x7/2 stem via space-to-depth
    remat: bool = False             # checkpoint each residual block
    dtype: Any = None

    @property
    def expansion(self) -> int:
        return 1 if self.block == 'basic' else 4

    def _bn(self, x, name, train):
        if self.no_bn:
            return x
        return batch_norm(train=train, name=name, dtype=self.dtype)(x)

    def _basic(self, x, planes, stride, downsample, prefix, train):
        identity = x
        bias = self.conv_bias
        out = conv2d(planes, 3, stride=stride, padding=1, bias=bias,
                     name=f'{prefix}.conv1', dtype=self.dtype)(x)
        out = self._bn(out, f'{prefix}.bn1', train)
        out = relu(out)
        out = conv2d(planes, 3, padding=1, bias=bias,
                     name=f'{prefix}.conv2', dtype=self.dtype)(out)
        out = self._bn(out, f'{prefix}.bn2', train)
        if downsample:
            identity = conv2d(planes, 1, stride=stride, bias=bias,
                              name=f'{prefix}.downsample.0', dtype=self.dtype)(x)
            identity = self._bn(identity, f'{prefix}.downsample.1', train)
        return relu(out + identity)

    def _bottleneck(self, x, planes, stride, downsample, prefix, train):
        identity = x
        bias = self.conv_bias
        inner = int(planes * self.inner_width_mult)
        s1, s2 = (stride, 1) if self.stride_on == 'conv1' else (1, stride)
        out = conv2d(inner, 1, stride=s1, bias=bias, name=f'{prefix}.conv1',
                     dtype=self.dtype)(x)
        out = self._bn(out, f'{prefix}.bn1', train)
        out = relu(out)
        out = conv2d(inner, 3, stride=s2, padding=1, bias=bias,
                     name=f'{prefix}.conv2', dtype=self.dtype)(out)
        out = self._bn(out, f'{prefix}.bn2', train)
        out = relu(out)
        out = conv2d(planes * 4, 1, bias=bias, name=f'{prefix}.conv3',
                     dtype=self.dtype)(out)
        out = self._bn(out, f'{prefix}.bn3', train)
        if downsample:
            identity = conv2d(planes * 4, 1, stride=stride, bias=bias,
                              name=f'{prefix}.downsample.0', dtype=self.dtype)(x)
            identity = self._bn(identity, f'{prefix}.downsample.1', train)
        return relu(out + identity)

    def _block_fn(self):
        """Residual-block function, optionally per-block-rematerialized
        (backprop stores only block inputs; see resnet3d.VideoResNet)."""
        raw = (type(self)._basic if self.block == 'basic'
               else type(self)._bottleneck)
        if self.remat:
            raw = nn.remat(raw, static_argnums=(2, 3, 4, 5, 6))
        return raw.__get__(self)

    @nn.compact
    def __call__(self, x, mode: str = 'forward', head: bool = True,
                 train: bool = False):
        block_fn = self._block_fn()
        if mode in ('forward', 'features'):
            if self.s2d_stem and not self.conv_bias:
                from .layers import SpaceToDepthConv
                x = SpaceToDepthConv(64, 7, ndim=2, dtype=self.dtype,
                                     name='conv1')(x)
            else:
                x = conv2d(64, 7, stride=2, padding=3, bias=self.conv_bias,
                           name='conv1', dtype=self.dtype)(x)
            x = self._bn(x, 'bn1', train)
            x = relu(x)
            if self.stem_pool == 'ceil':
                x = max_pool(x, 3, stride=2, padding=0, ceil_mode=True)
            else:
                x = max_pool(x, 3, stride=2, padding=1)
            inplanes = 64
            for stage, (planes, blocks, stride) in enumerate(
                    zip(self.width_per_stage, self.layers, (1, 2, 2, 2)), start=1):
                for i in range(blocks):
                    s = stride if i == 0 else 1
                    down = s != 1 or inplanes != planes * self.expansion
                    x = block_fn(x, planes, s, down, f'layer{stage}.{i}', train)
                    inplanes = planes * self.expansion
            if mode == 'features':
                return x
        if mode in ('forward', 'logits'):
            if self.logits_pool == 'avg7':
                from ..ops.pooling import avg_pool
                x = avg_pool(x, 7, 7)
                x = x.reshape((x.shape[0], -1))
            else:
                x = global_avg_pool(x)
            if head:
                x = dense(self.num_classes, name='last_linear', dtype=self.dtype)(x)
        return x


CONFIGS = {
    'resnet18': ('basic', (2, 2, 2, 2)),
    'resnet34': ('basic', (3, 4, 6, 3)),
    'resnet50': ('bottleneck', (3, 4, 6, 3)),
    'resnet101': ('bottleneck', (3, 4, 23, 3)),
    'resnet152': ('bottleneck', (3, 8, 36, 3)),
}

# torch state-dict key prefix renames applied by the converter
TORCH_RENAMES = {'last_linear': 'fc'}


def _factory(name):
    def fn(num_classes: int = 1000, pretrained: str = 'imagenet'):
        from ..core.factory import build_model
        block, layers = CONFIGS[name]
        module = ResNet(block=block, layers=layers, num_classes=num_classes)
        return build_model(name, module, pretrained_settings, num_classes,
                           pretrained, torch_renames=TORCH_RENAMES)
    fn.__name__ = name
    fn.__doc__ = f'Constructs a {name} model (torchvision-weight compatible).'
    return register_model(fn, name=name)


resnet18 = _factory('resnet18')
resnet34 = _factory('resnet34')
resnet50 = _factory('resnet50')
resnet101 = _factory('resnet101')
resnet152 = _factory('resnet152')

register_settings(pretrained_settings)
