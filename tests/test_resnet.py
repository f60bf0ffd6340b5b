"""ResNet family: shapes, API contract, and converter numerics parity.

The parity test builds an independent torch ResNet-18 (standard torchvision
architecture, written here from the published recipe), pushes its random
state_dict through zoo.convert, and requires logits to agree — this is the
systematic version of the reference's porting-verification idea
(SURVEY.md §4, fbresnet/resnet152_load.py)."""

import numpy as np
import pytest

import pretorched_tpu


def test_registry_contract():
    assert 'resnet50' in pretorched_tpu.model_names
    assert 'imagenet' in pretorched_tpu.pretrained_settings['resnet50']
    s = pretorched_tpu.pretrained_settings['resnet50']['imagenet']
    assert s['input_size'] == [3, 224, 224]
    assert s['mean'] == [0.485, 0.456, 0.406]
    factory = pretorched_tpu.__dict__['resnet18']
    assert callable(factory)


def test_resnet18_forward_shapes():
    model = pretorched_tpu.resnet18(num_classes=1000, pretrained=None)
    x = np.random.RandomState(0).randn(2, 3, 224, 224).astype(np.float32)
    out = model(x)
    assert out.shape == (2, 1000)
    f = model.features(x)
    assert f.shape == (2, 512, 7, 7)
    y = model.logits(f)
    assert y.shape == (2, 1000)
    np.testing.assert_allclose(np.asarray(y), np.asarray(out), rtol=2e-5, atol=2e-5)


def test_identity_head_trick():
    model = pretorched_tpu.resnet18(num_classes=1000, pretrained=None)
    model.last_linear = pretorched_tpu.Identity()
    x = np.random.RandomState(0).randn(1, 3, 224, 224).astype(np.float32)
    feats = model(x)
    assert feats.shape == (1, 512)
    # restore a head
    model.reset_classifier(7)
    assert model(x).shape == (1, 7)


def test_num_classes_assert():
    with pytest.raises(AssertionError):
        pretorched_tpu.resnet18(num_classes=42, pretrained='imagenet')


# --------------------------------------------------------------------------
# torch parity: independent torch ResNet-18 (standard architecture recipe)


def _torch_resnet18(num_classes=10):
    import torch.nn as tnn

    class BasicBlock(tnn.Module):
        def __init__(self, cin, planes, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, planes, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.relu = tnn.ReLU()
            self.downsample = None
            if stride != 1 or cin != planes:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, planes, 1, stride, bias=False),
                    tnn.BatchNorm2d(planes))

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return self.relu(out + idt)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU()
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            cin = 64
            for li, (planes, stride) in enumerate([(64, 1), (128, 2), (256, 2), (512, 2)]):
                blocks = []
                for b in range(2):
                    blocks.append(BasicBlock(cin, planes, stride if b == 0 else 1))
                    cin = planes
                setattr(self, f'layer{li+1}', tnn.Sequential(*blocks))
            self.avgpool = tnn.AdaptiveAvgPool2d(1)
            self.fc = tnn.Linear(512, num_classes)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for li in range(4):
                x = getattr(self, f'layer{li+1}')(x)
            x = self.avgpool(x).flatten(1)
            return self.fc(x)

    return Net()


def test_resnet18_matches_torch_after_conversion():
    import torch

    from pretorched_tpu.models.resnet import TORCH_RENAMES
    from pretorched_tpu.zoo import convert

    tm = _torch_resnet18(num_classes=10).eval()
    # randomize BN stats so the test exercises running-stat conversion
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    model = pretorched_tpu.resnet18(num_classes=10, pretrained=None)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    model.variables = convert.convert_state_dict(sd, model.variables,
                                                 renames=TORCH_RENAMES)

    x = np.random.RandomState(1).randn(2, 3, 64, 64).astype(np.float32)
    ref = tm(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(model(x))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
