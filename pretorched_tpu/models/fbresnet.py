"""FBResNet — Facebook Torch7 ResNet ports.

Reference: pretorched/models/fbresnet.py. Deltas vs torchvision ResNet that
matter for weight parity: every conv carries a bias (fbresnet.py:22-23,63-69)
and the head pool is a fixed AvgPool2d(7) (fbresnet.py:131). Only
``fbresnet152`` has hosted weights; 18/34/50/101 are weightless constructors
(fbresnet.py:177-215).
"""

from __future__ import annotations

from ..core.registry import image_settings, register_model, register_settings
from .resnet import ResNet

pretrained_settings = {
    'fbresnet152': {
        'imagenet': image_settings(
            'http://pretorched-x.csail.mit.edu/models/fbresnet152-3ade0e00.pth'),
    }
}

_CONFIGS = {
    'fbresnet18': ('basic', (2, 2, 2, 2)),
    'fbresnet34': ('basic', (3, 4, 6, 3)),
    'fbresnet50': ('bottleneck', (3, 4, 6, 3)),
    'fbresnet101': ('bottleneck', (3, 4, 23, 3)),
    'fbresnet152': ('bottleneck', (3, 8, 36, 3)),
}


def _module(name, num_classes):
    block, layers = _CONFIGS[name]
    return ResNet(block=block, layers=layers, num_classes=num_classes,
                  conv_bias=True, logits_pool='avg7')


def _factory(name):
    def fn(num_classes: int = 1000, pretrained=None):
        from ..core.factory import build_model
        if pretrained is not None and name not in pretrained_settings:
            raise ValueError(f'{name} has no hosted pretrained weights')
        return build_model(name, _module(name, num_classes),
                           pretrained_settings, num_classes, pretrained)
    fn.__name__ = name
    fn.__doc__ = f'{name}: Torch7-port ResNet (convs with bias).'
    return register_model(fn, name=name)


fbresnet18 = _factory('fbresnet18')
fbresnet34 = _factory('fbresnet34')
fbresnet50 = _factory('fbresnet50')
fbresnet101 = _factory('fbresnet101')


@register_model
def fbresnet152(num_classes: int = 1000, pretrained: str = 'imagenet'):
    """FBResNet-152 (Torch7 port, hosted imagenet weights)."""
    from ..core.factory import build_model
    return build_model('fbresnet152', _module('fbresnet152', num_classes),
                       pretrained_settings, num_classes, pretrained)


register_settings(pretrained_settings)
