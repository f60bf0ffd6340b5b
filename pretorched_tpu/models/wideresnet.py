"""WideResNet-50-2 (2D).

Reference: pretorched/models/wideresnet.py — which is dead code in the
reference (missing imports, undefined variables; SURVEY.md §2.6). We provide
the *capability* it gestures at — a working wide ResNet-50 (width x2)
constructor able to load converted checkpoints of that architecture — without
reproducing the broken hickle-based loader.
"""

from __future__ import annotations

from ..core.registry import image_settings, register_model, register_settings
from .resnet import ResNet

pretrained_settings = {
    'wideresnet50': {
        'imagenet': image_settings(
            'http://pretorched-x.csail.mit.edu/models/wide-resnet-50-2-export.hkl'),
    }
}


@register_model
def wideresnet50(num_classes: int = 1000, pretrained=None):
    """Wide ResNet-50-2: bottleneck widths doubled (256,512,1024,2048 internal)."""
    from ..core.factory import build_model
    module = ResNet(block='bottleneck', layers=(3, 4, 6, 3),
                    num_classes=num_classes, inner_width_mult=2.0,
                    conv_bias=True)
    return build_model('wideresnet50', module, pretrained_settings,
                       num_classes, pretrained)


register_settings(pretrained_settings, in_settings_registry=False)
