"""Parity: DPN dual-path block, MobileNetV2 inverted residual, VGG-M LRN."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax

from pretorched_tpu.zoo import convert


def _rand_bn(tm):
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)


def test_lrn_matches_torch():
    from pretorched_tpu.ops.lrn import spatial_cross_map_lrn

    class TorchLRN(tnn.Module):
        """vggm.py:24-50 ACROSS_CHANNELS variant."""

        def __init__(self, size=5, alpha=0.0005, beta=0.75, k=2):
            super().__init__()
            self.avg = tnn.AvgPool3d((size, 1, 1), stride=1,
                                     padding=((size - 1) // 2, 0, 0))
            self.alpha, self.beta, self.k = alpha, beta, k

        def forward(self, x):
            div = self.avg(x.pow(2).unsqueeze(1)).squeeze(1)
            return x / (div * self.alpha + self.k).pow(self.beta)

    x = np.random.RandomState(0).randn(2, 16, 7, 7).astype(np.float32)
    ref = TorchLRN()(torch.from_numpy(x)).numpy()
    got = np.transpose(np.asarray(spatial_cross_map_lrn(
        np.transpose(x, (0, 2, 3, 1)), 5, 0.0005, 0.75, 2)), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_dpn_proj_block_parity():
    """'proj' dual-path block incl. channel split + dense concat (dpn.py:285-311)."""

    class TorchDPNBlock(tnn.Module):
        def __init__(self, in_chs=32, r=16, bw=24, inc=8, groups=4):
            super().__init__()
            self.bw = bw

            def bac(i, o, k, s=1, p=0, g=1):
                return tnn.Sequential(tnn.BatchNorm2d(i, eps=0.001), tnn.ReLU(),
                                      tnn.Conv2d(i, o, k, s, p, groups=g, bias=False))
            self.c1x1_w_s1 = bac(in_chs, bw + 2 * inc, 1)
            self.c1x1_a = bac(in_chs, r, 1)
            self.c3x3_b = bac(r, r, 3, 1, 1, 4)
            self.c1x1_c = bac(r, bw + inc, 1)

        def forward(self, x):
            x_s = self.c1x1_w_s1(x)
            s1, s2 = x_s[:, :self.bw], x_s[:, self.bw:]
            o = self.c1x1_c(self.c3x3_b(self.c1x1_a(x)))
            o1, o2 = o[:, :self.bw], o[:, self.bw:]
            return s1 + o1, torch.cat([s2, o2], 1)

    import flax.linen as nn
    from pretorched_tpu.models.dpn import DPN

    class OneBlock(DPN):
        @nn.compact
        def __call__(self, x, mode='forward', head=True, train=False):
            res, dense = self._dual_path_block(x, 16, 24, 8, 'features.conv2_1',
                                               'proj', train)
            import jax.numpy as jnp
            return jnp.concatenate([res, dense], axis=-1)

    tm = TorchDPNBlock().eval()
    _rand_bn(tm)
    module = OneBlock(groups=4)
    variables = dict(module.init(jax.random.key(0),
                                 np.zeros((1, 8, 8, 32), np.float32)))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    # torch twin names: c1x1_w_s1.{0,1,2} = bn, relu(no params), conv
    renames = {}
    for leaf in ('c1x1_w_s1', 'c1x1_a', 'c3x3_b', 'c1x1_c'):
        renames[f'features.conv2_1.{leaf}.bn'] = f'{leaf}.0'
        renames[f'features.conv2_1.{leaf}.conv'] = f'{leaf}.2'
    variables = convert.convert_state_dict(sd, variables, renames=renames)
    x = np.random.RandomState(0).randn(2, 32, 8, 8).astype(np.float32)
    r1, r2 = tm(torch.from_numpy(x))
    ref = torch.cat([r1, r2], 1).detach().numpy()
    got = np.transpose(np.asarray(module.apply(
        variables, np.transpose(x, (0, 2, 3, 1)))), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_mobilenet_inverted_residual_parity():
    class TorchIR(tnn.Module):
        def __init__(self, inp=16, oup=16, stride=1, expand=6):
            super().__init__()
            hid = inp * expand
            self.conv = tnn.Sequential(
                tnn.Conv2d(inp, hid, 1, bias=False), tnn.BatchNorm2d(hid),
                tnn.ReLU6(),
                tnn.Conv2d(hid, hid, 3, stride, 1, groups=hid, bias=False),
                tnn.BatchNorm2d(hid), tnn.ReLU6(),
                tnn.Conv2d(hid, oup, 1, bias=False), tnn.BatchNorm2d(oup))

        def forward(self, x):
            return x + self.conv(x)

    import flax.linen as nn
    from pretorched_tpu.models.mobilenet import MobileNetV2

    class OneIR(MobileNetV2):
        @nn.compact
        def __call__(self, x, mode='forward', head=True, train=False):
            return self._inverted_residual(x, 16, 1, 6, 'features.1', train)

    tm = TorchIR().eval()
    _rand_bn(tm)
    module = OneIR()
    variables = dict(module.init(jax.random.key(0),
                                 np.zeros((1, 8, 8, 16), np.float32)))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert.convert_state_dict(sd, variables,
                                           renames={'^features\\.1\\.': ''})
    x = np.random.RandomState(0).randn(2, 16, 8, 8).astype(np.float32)
    ref = tm(torch.from_numpy(x)).detach().numpy()
    got = np.transpose(np.asarray(module.apply(
        variables, np.transpose(x, (0, 2, 3, 1)))), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
