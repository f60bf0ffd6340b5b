"""Video ResNet parity vs torch twins: 3D convs, shortcut-A zero-pad
downsample, R(2+1)D factored conv, and 2D->3D weight inflation."""

import math

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax

import pretorched_tpu
from pretorched_tpu.zoo import convert


def _rand_bn(tm):
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm3d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)


def _to_tlast(x):   # NCTHW -> NTHWC
    return np.transpose(x, (0, 2, 3, 4, 1))


def _to_tfirst(x):
    return np.transpose(np.asarray(x), (0, 4, 1, 2, 3))


def test_resnet3d_basic_block_shortcut_a_parity():
    class TorchBlockA(tnn.Module):
        """resnet3D.py BasicBlock with zero-pad shortcut (:65-107)."""

        def __init__(self, cin=8, planes=16, stride=2):
            super().__init__()
            self.conv1 = tnn.Conv3d(cin, planes, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm3d(planes)
            self.conv2 = tnn.Conv3d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm3d(planes)
            self.planes, self.stride = planes, stride

        def forward(self, x):
            out = F.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            ds = F.avg_pool3d(x, kernel_size=1, stride=self.stride)
            pad = torch.zeros(ds.size(0), self.planes - ds.size(1), ds.size(2),
                              ds.size(3), ds.size(4))
            residual = torch.cat([ds, pad], dim=1)
            return F.relu(out + residual)

    import flax.linen as nn
    from pretorched_tpu.models.resnet3d import VideoResNet

    class OneBlock(VideoResNet):
        @nn.compact
        def __call__(self, x, mode='forward', head=True, train=False):
            return self._basic(x, 16, 2, True, 'layer2.0', train)

    tm = TorchBlockA().eval()
    _rand_bn(tm)
    module = OneBlock(block='basic', layers=(1,), shortcut_type='A', expansion=1)
    variables = dict(module.init(jax.random.key(0),
                                 np.zeros((1, 4, 8, 8, 8), np.float32)))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert.convert_state_dict(sd, variables,
                                           renames={'^layer2\\.0\\.': ''})
    x = np.random.RandomState(0).randn(2, 8, 4, 8, 8).astype(np.float32)
    ref = tm(torch.from_numpy(x)).detach().numpy()
    got = _to_tfirst(module.apply(variables, _to_tlast(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_r2plus1d_conv_parity():
    """Factored spatio-temporal conv matches the reference formula
    (r2plus1d.py:29-88)."""

    class TorchST(tnn.Module):
        def __init__(self, cin=8, cout=16, k=3, stride=2, pad=1):
            super().__init__()
            mid = int(math.floor((k * k * k * cin * cout) /
                                 (k * k * cin + k * cout)))
            self.spatial_conv = tnn.Conv3d(cin, mid, (1, k, k), (1, stride, stride),
                                           (0, pad, pad), bias=False)
            self.bn = tnn.BatchNorm3d(mid)
            self.temporal_conv = tnn.Conv3d(mid, cout, (k, 1, 1), (stride, 1, 1),
                                            (pad, 0, 0), bias=False)

        def forward(self, x):
            return self.temporal_conv(F.relu(self.bn(self.spatial_conv(x))))

    import flax.linen as nn
    from pretorched_tpu.models.resnet3d import VideoResNet

    class OneConv(VideoResNet):
        @nn.compact
        def __call__(self, x, mode='forward', head=True, train=False):
            return self._conv(x, 16, 3, 'c', stride=2, padding=1, train=train)

    tm = TorchST().eval()
    _rand_bn(tm)
    module = OneConv(block='basic', layers=(1,), factored=True)
    variables = dict(module.init(jax.random.key(0),
                                 np.zeros((1, 6, 10, 10, 8), np.float32)))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert.convert_state_dict(sd, variables, renames={'^c\\.': ''})
    x = np.random.RandomState(0).randn(2, 8, 6, 10, 10).astype(np.float32)
    ref = tm(torch.from_numpy(x)).detach().numpy()
    got = _to_tfirst(module.apply(variables, _to_tlast(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_inflate_2d_to_3d():
    """2D conv weights broadcast over time (torchvision_models.py:170-191)."""
    import jax.numpy as jnp
    w2d = np.random.RandomState(0).randn(16, 8, 3, 3).astype(np.float32)
    variables = {'params': {'conv1': {'kernel': jnp.zeros((5, 3, 3, 8, 16))}}}
    out = convert.convert_state_dict({'conv1.weight': w2d}, variables)
    k = np.asarray(out['params']['conv1']['kernel'])
    assert k.shape == (5, 3, 3, 8, 16)
    for t in range(5):
        np.testing.assert_array_equal(k[t], np.transpose(w2d, (2, 3, 1, 0)))


def test_fine_tuning_parameter_names():
    from pretorched_tpu.models.resnet3d import get_fine_tuning_parameter_names
    assert get_fine_tuning_parameter_names(0) is None
    assert get_fine_tuning_parameter_names(4) == ['layer4', 'last_linear']
