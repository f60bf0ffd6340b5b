"""Numerics parity for the torchvision-family models via converted weights.

Each test builds an independent torch twin (standard published architecture,
written from the recipe), converts its random state_dict through zoo.convert,
and requires matching outputs — systematic porting verification (SURVEY.md §4).
"""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import pretorched_tpu
from pretorched_tpu.zoo import convert


def _convert_into(model, torch_module, renames, key_rewrite=None):
    sd = {k: v.numpy() for k, v in torch_module.state_dict().items()}
    model.variables = convert.convert_state_dict(
        sd, model.variables, renames=renames, key_rewrite=key_rewrite)
    return model


def _randomize_bn(tm):
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d, tnn.BatchNorm3d)):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)


def test_alexnet_parity():
    class TorchAlexNet(tnn.Module):
        def __init__(self, nc=10):
            super().__init__()
            self.features = tnn.Sequential(
                tnn.Conv2d(3, 64, 11, 4, 2), tnn.ReLU(), tnn.MaxPool2d(3, 2),
                tnn.Conv2d(64, 192, 5, padding=2), tnn.ReLU(), tnn.MaxPool2d(3, 2),
                tnn.Conv2d(192, 384, 3, padding=1), tnn.ReLU(),
                tnn.Conv2d(384, 256, 3, padding=1), tnn.ReLU(),
                tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(), tnn.MaxPool2d(3, 2))
            self.classifier = tnn.Sequential(
                tnn.Dropout(), tnn.Linear(256 * 6 * 6, 4096), tnn.ReLU(),
                tnn.Dropout(), tnn.Linear(4096, 4096), tnn.ReLU(),
                tnn.Linear(4096, nc))

        def forward(self, x):
            x = self.features(x).flatten(1)
            return self.classifier(x)

    tm = TorchAlexNet().eval()
    from pretorched_tpu.models.alexnet import TORCH_RENAMES
    model = pretorched_tpu.alexnet(num_classes=10, pretrained=None)
    _convert_into(model, tm, TORCH_RENAMES)
    x = np.random.RandomState(0).randn(2, 3, 224, 224).astype(np.float32)
    ref = tm(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(model(x))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_squeezenet11_parity():
    class Fire(tnn.Module):
        def __init__(self, cin, s, e):
            super().__init__()
            self.squeeze = tnn.Conv2d(cin, s, 1)
            self.expand1x1 = tnn.Conv2d(s, e, 1)
            self.expand3x3 = tnn.Conv2d(s, e, 3, padding=1)

        def forward(self, x):
            x = F.relu(self.squeeze(x))
            return torch.cat([F.relu(self.expand1x1(x)),
                              F.relu(self.expand3x3(x))], 1)

    class TorchSqueezeNet11(tnn.Module):
        def __init__(self, nc=10):
            super().__init__()
            self.features = tnn.Sequential(
                tnn.Conv2d(3, 64, 3, 2), tnn.ReLU(),
                tnn.MaxPool2d(3, 2, ceil_mode=True),
                Fire(64, 16, 64), Fire(128, 16, 64),
                tnn.MaxPool2d(3, 2, ceil_mode=True),
                Fire(128, 32, 128), Fire(256, 32, 128),
                tnn.MaxPool2d(3, 2, ceil_mode=True),
                Fire(256, 64, 256), Fire(512, 64, 256),
                Fire(512, 64, 256), Fire(512, 64, 256))
            self.classifier = tnn.Sequential(
                tnn.Dropout(), tnn.Conv2d(512, nc, 1), tnn.ReLU(),
                tnn.AdaptiveAvgPool2d(1))

        def forward(self, x):
            return self.classifier(self.features(x)).flatten(1)

    tm = TorchSqueezeNet11().eval()
    from pretorched_tpu.models.squeezenet import TORCH_RENAMES
    model = pretorched_tpu.squeezenet1_1(num_classes=10, pretrained=None)
    _convert_into(model, tm, TORCH_RENAMES)
    x = np.random.RandomState(0).randn(2, 3, 128, 128).astype(np.float32)
    ref = tm(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(model(x))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_densenet121_parity_small():
    """Parity on a scaled-down DenseNet (same code path, fewer layers)."""

    class DenseLayer(tnn.Module):
        def __init__(self, cin, growth, bn_size=4):
            super().__init__()
            self.norm1 = tnn.BatchNorm2d(cin)
            self.conv1 = tnn.Conv2d(cin, bn_size * growth, 1, bias=False)
            self.norm2 = tnn.BatchNorm2d(bn_size * growth)
            self.conv2 = tnn.Conv2d(bn_size * growth, growth, 3, padding=1, bias=False)

        def forward(self, x):
            out = self.conv1(F.relu(self.norm1(x)))
            out = self.conv2(F.relu(self.norm2(out)))
            return torch.cat([x, out], 1)

    class Transition(tnn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.norm = tnn.BatchNorm2d(cin)
            self.conv = tnn.Conv2d(cin, cout, 1, bias=False)

        def forward(self, x):
            return F.avg_pool2d(self.conv(F.relu(self.norm(x))), 2, 2)

    growth, blocks, init = 8, (2, 3, 2, 2), 16

    class TorchDenseNet(tnn.Module):
        def __init__(self, nc=10):
            super().__init__()
            feats = tnn.Sequential()
            feats.add_module('conv0', tnn.Conv2d(3, init, 7, 2, 3, bias=False))
            feats.add_module('norm0', tnn.BatchNorm2d(init))
            feats.add_module('relu0', tnn.ReLU())
            feats.add_module('pool0', tnn.MaxPool2d(3, 2, 1))
            ch = init
            for bi, n in enumerate(blocks, start=1):
                block = tnn.Sequential()
                for li in range(n):
                    block.add_module(f'denselayer{li+1}', DenseLayer(ch, growth))
                    ch += growth
                feats.add_module(f'denseblock{bi}', block)
                if bi != len(blocks):
                    feats.add_module(f'transition{bi}', Transition(ch, ch // 2))
                    ch //= 2
            feats.add_module('norm5', tnn.BatchNorm2d(ch))
            self.features = feats
            self.classifier = tnn.Linear(ch, nc)

        def forward(self, x):
            x = F.relu(self.features(x))
            x = F.avg_pool2d(x, 7, 1).flatten(1)
            return self.classifier(x)

    tm = TorchDenseNet().eval()
    _randomize_bn(tm)

    from pretorched_tpu.core.factory import build_model
    from pretorched_tpu.models.densenet import TORCH_RENAMES, DenseNet
    module = DenseNet(growth_rate=growth, block_config=blocks,
                      num_init_features=init, num_classes=10)
    model = build_model('densenet_small', module,
                        {'densenet_small': {}}, 10, None)
    _convert_into(model, tm, TORCH_RENAMES)
    x = np.random.RandomState(0).randn(2, 3, 224, 224).astype(np.float32)
    ref = tm(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(model(x))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
