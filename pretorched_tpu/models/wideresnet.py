"""WideResNet-50-2 (2D), functional-zoo checkpoint compatible.

Reference: pretorched/models/wideresnet.py — dead code in the reference
(missing imports, undefined variables; SURVEY.md §2.6), but its *capability*
is loading the hosted hickle export of Sergey Zagoruyko's functional
WRN-50-2 (reference wideresnet.py:70-84, model_urls :11-13). That export is
**BN-free**: batch norms are folded into conv biases, and the forward is
conv -> relu chains with a post-add relu (reference wideresnet.py:15-53).

We reproduce that exact architecture via the shared ResNet skeleton
(``no_bn=True, conv_bias=True``, stride on the 3x3, AvgPool2d(7) head,
bottleneck widths doubled) with an exact prefix map from our torchvision
naming to the hkl keys (``group{g}.block{i}.conv{0,1,2}`` / ``conv_dim`` /
``conv0`` / ``fc``) — so the hosted ``.hkl`` weights convert mechanically
through ``zoo.io`` (which reads .hkl/.npz alongside .pth).
"""

from __future__ import annotations

from ..core.registry import image_settings, register_model, register_settings

LAYERS = (3, 4, 6, 3)

pretrained_settings = {
    'wideresnet50': {
        'imagenet': image_settings(
            'http://pretorched-x.csail.mit.edu/models/wide-resnet-50-2-export.hkl'),
    }
}


def hkl_renames() -> dict:
    """Exact flax-prefix -> hkl-key map for the functional WRN-50-2 export.

    hkl keys (reference wideresnet.py:20-47): stem ``conv0``; block ``g`` /
    index ``i`` convs ``group{g}.block{i}.conv{0,1,2}`` with the 1x1
    shortcut ``group{g}.block{i}.conv_dim``; classifier ``fc``."""
    r = {'conv1': 'conv0', 'last_linear': 'fc'}
    for g, n in enumerate(LAYERS):
        for i in range(n):
            for c in range(3):
                r[f'layer{g + 1}.{i}.conv{c + 1}'] = f'group{g}.block{i}.conv{c}'
            r[f'layer{g + 1}.{i}.downsample.0'] = f'group{g}.block{i}.conv_dim'
    return r


@register_model
def wideresnet50(num_classes: int = 1000, pretrained=None):
    """Wide ResNet-50-2: bottleneck widths doubled (128,256,512,1024 inner);
    BN-free conv/bias forward matching the hosted hickle export."""
    from ..core.factory import build_model
    from .resnet import ResNet
    module = ResNet(block='bottleneck', layers=LAYERS,
                    num_classes=num_classes, inner_width_mult=2.0,
                    conv_bias=True, no_bn=True, logits_pool='avg7')
    return build_model('wideresnet50', module, pretrained_settings,
                       num_classes, pretrained, torch_renames=hkl_renames())


register_settings(pretrained_settings, in_settings_registry=False)
