"""Parity tests for FBResNet/CaffeResNet/SENet deltas and the ordered
(positional) converter used by the ResNeXt Lambda-graph checkpoints."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import pretorched_tpu
from pretorched_tpu.zoo import convert


def _randomize_bn(tm):
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)


def test_se_resnet_block_parity():
    """One caffe-style SE bottleneck (stride on conv1 + SE gate) vs torch."""

    class TorchSEBlock(tnn.Module):
        def __init__(self, cin=16, planes=8, stride=2, reduction=4):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, planes, 1, stride=stride, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.se_fc1 = tnn.Conv2d(planes * 4, planes * 4 // reduction, 1)
            self.se_fc2 = tnn.Conv2d(planes * 4 // reduction, planes * 4, 1)
            self.down = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4))

        def forward(self, x):
            out = F.relu(self.bn1(self.conv1(x)))
            out = F.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            s = F.adaptive_avg_pool2d(out, 1)
            s = torch.sigmoid(self.se_fc2(F.relu(self.se_fc1(s))))
            return F.relu(out * s + self.down(x))

    import flax.linen as nn
    from pretorched_tpu.models.senet import SENet

    class OneBlock(SENet):
        @nn.compact
        def __call__(self, x, mode='forward', head=True, train=False):
            return self._block(x, 8, 2, True, 'layer2.0', train)

    tm = TorchSEBlock().eval()
    _randomize_bn(tm)
    module = OneBlock(block='se_resnet', layers=(1,), groups=1, reduction=4,
                      downsample_kernel_size=1, downsample_padding=0)
    import jax
    variables = module.init(jax.random.key(0), np.zeros((1, 9, 9, 16), np.float32))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    renames = {'layer2.0.se_module.fc1': 'se_fc1',
               'layer2.0.se_module.fc2': 'se_fc2',
               '^layer2\\.0\\.downsample\\.': 'down.',
               '^layer2\\.0\\.': ''}
    variables = convert.convert_state_dict(sd, dict(variables), renames=renames)
    x = np.random.RandomState(0).randn(2, 16, 9, 9).astype(np.float32)
    ref = tm(torch.from_numpy(x)).detach().numpy()
    got = module.apply(variables, np.transpose(x, (0, 2, 3, 1)))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_ordered_converter_resnext_style():
    """Positional conversion against a nameless torch Sequential graph."""

    class Block(tnn.Module):
        def __init__(self, cin, width, cout, stride, groups):
            super().__init__()
            self.branch = tnn.Sequential(
                tnn.Conv2d(cin, width, 1, bias=False), tnn.BatchNorm2d(width),
                tnn.ReLU(),
                tnn.Conv2d(width, width, 3, stride, 1, groups=groups, bias=False),
                tnn.BatchNorm2d(width), tnn.ReLU(),
                tnn.Conv2d(width, cout, 1, bias=False), tnn.BatchNorm2d(cout))
            self.down = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout)) if (stride != 1 or cin != cout) else None

        def forward(self, x):
            idt = x if self.down is None else self.down(x)
            return F.relu(self.branch(x) + idt)

    layers = (1, 1, 1, 1)
    card, bw = 4, 4

    class TorchMini(tnn.Module):
        def __init__(self):
            super().__init__()
            mods = [tnn.Conv2d(3, 64, 7, 2, 3, bias=False), tnn.BatchNorm2d(64)]
            in_ch = 64
            for stage in range(1, 5):
                planes = 64 * 2 ** (stage - 1)
                width = planes * bw * card // 64
                out_ch = planes * 4
                mods.append(Block(in_ch, width, out_ch, 1 if stage == 1 else 2, card))
                in_ch = out_ch
            self.seq = tnn.Sequential(*mods)
            self.fc = tnn.Linear(2048, 10)

        def forward(self, x):
            x = F.relu(self.seq[1](self.seq[0](x)))
            x = F.max_pool2d(x, 3, 2, 1)
            for m in list(self.seq)[2:]:
                x = m(x)
            x = F.avg_pool2d(x, 7, 1).flatten(1)
            return self.fc(x)

    from pretorched_tpu.models.resnext import ResNeXt, ordered_leaves
    tm = TorchMini().eval()
    _randomize_bn(tm)
    module = ResNeXt(layers=layers, cardinality=card, base_width=bw, num_classes=10)
    import jax
    x0 = np.zeros((1, 224, 224, 3), np.float32)
    variables = dict(module.init(jax.random.key(0), x0))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert.convert_state_dict_ordered(sd, variables,
                                                   ordered_leaves(layers))
    x = np.random.RandomState(0).randn(1, 3, 224, 224).astype(np.float32)
    ref = tm(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(module.apply(variables, np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_caffe_stem_pool_shape():
    """ceil-mode stem pool yields caffe's 56x56 grid from 224 input."""
    m = pretorched_tpu.cafferesnet101(num_classes=1000, pretrained=None)
    x = np.random.RandomState(0).randn(1, 3, 224, 224).astype(np.float32)
    assert m.features(x).shape == (1, 2048, 7, 7)
