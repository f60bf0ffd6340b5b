"""CaffeResNet-101 — Caffe-port ResNet.

Reference: pretorched/models/cafferesnet.py. Caffe-parity deltas: bottleneck
stride on conv1 (cafferesnet.py:66-69), stem max pool 3x3/2 pad 0 with
ceil_mode (cafferesnet.py:109), fixed AvgPool2d(7) head, and BGR/[0,255]
input metadata (cafferesnet.py:8-22).
"""

from __future__ import annotations

from ..core.registry import image_settings, register_model, register_settings
from .resnet import ResNet

pretrained_settings = {
    'cafferesnet101': {
        'imagenet': image_settings(
            'http://data.lip6.fr/cadene/pretrainedmodels/cafferesnet101-9d633cc0.pth',
            input_space='BGR', input_range=(0, 255),
            mean=(102.9801, 115.9465, 122.7717), std=(1, 1, 1)),
    }
}


@register_model
def cafferesnet101(num_classes: int = 1000, pretrained: str = 'imagenet'):
    """CaffeResNet-101 (stride-on-conv1, ceil-mode stem pool, BGR input)."""
    from ..core.factory import build_model
    module = ResNet(block='bottleneck', layers=(3, 4, 23, 3),
                    num_classes=num_classes, stride_on='conv1',
                    stem_pool='ceil', logits_pool='avg7')
    return build_model('cafferesnet101', module, pretrained_settings,
                       num_classes, pretrained)


register_settings(pretrained_settings)
