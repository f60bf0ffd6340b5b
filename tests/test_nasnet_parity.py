"""NASNet primitive parity vs torch: the TF-SAME pad/crop dances
(MaxPoolPad/AvgPoolPad, 'specific' BranchSeparables, FactorizedReduction) and
the SENet154 3-conv stem."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax

from pretorched_tpu.zoo import convert


def _nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def _nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_max_and_avg_pool_pad():
    from pretorched_tpu.models.nasnet import avg_pool_pad, max_pool_pad

    x = np.random.RandomState(0).randn(2, 8, 15, 15).astype(np.float32)
    tx = torch.from_numpy(x)
    # reference MaxPoolPad (nasnet_mobile.py:49-59)
    ref = F.max_pool2d(F.pad(tx, (1, 0, 1, 0)), 3, 2, 1)[:, :, 1:, 1:]
    got = _nchw(max_pool_pad(_nhwc(x)))
    np.testing.assert_allclose(got, ref.numpy(), rtol=1e-6, atol=1e-6)
    # reference AvgPoolPad (nasnet_mobile.py:62-72)
    ref = F.avg_pool2d(F.pad(tx, (1, 0, 1, 0)), 3, 2, 1,
                       count_include_pad=False)[:, :, 1:, 1:]
    got = _nchw(avg_pool_pad(_nhwc(x)))
    np.testing.assert_allclose(got, ref.numpy(), rtol=1e-5, atol=1e-5)


def test_specific_branch_separables_parity():
    """'specific' variant: pad (1,0,1,0) -> stride-2 depthwise -> crop [1:,1:]
    (nasnet_mobile.py:96-117)."""

    class TorchBS(tnn.Module):
        def __init__(self, cin=8, cout=8, k=5, stride=2, pad=2):
            super().__init__()
            self.sep1_dw = tnn.Conv2d(cin, cin, k, stride, pad, groups=cin,
                                      bias=False)
            self.sep1_pw = tnn.Conv2d(cin, cin, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cin, eps=0.001)
            self.sep2_dw = tnn.Conv2d(cin, cin, k, 1, pad, groups=cin,
                                      bias=False)
            self.sep2_pw = tnn.Conv2d(cin, cout, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout, eps=0.001)

        def forward(self, x):
            x = F.relu(x)
            x = F.pad(x, (1, 0, 1, 0))
            x = self.sep1_pw(self.sep1_dw(x))[:, :, 1:, 1:]
            x = F.relu(self.bn1(x))
            return self.bn2(self.sep2_pw(self.sep2_dw(x)))

    import flax.linen as nn

    from pretorched_tpu.models.nasnet import NASNetA

    class OneBranch(NASNetA):
        @nn.compact
        def __call__(self, x, mode='forward', head=True, train=False):
            return self._branch_sep(x, 8, 5, 2, 2, 'br', train, specific=True)

    tm = TorchBS().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    module = OneBranch()
    variables = dict(module.init(jax.random.key(0),
                                 np.zeros((1, 9, 9, 8), np.float32)))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    renames = {
        'br.separable_1.depthwise_conv2d': 'sep1_dw',
        'br.separable_1.pointwise_conv2d': 'sep1_pw',
        'br.bn_sep_1': 'bn1',
        'br.separable_2.depthwise_conv2d': 'sep2_dw',
        'br.separable_2.pointwise_conv2d': 'sep2_pw',
        'br.bn_sep_2': 'bn2',
    }
    variables = convert.convert_state_dict(sd, variables, renames=renames)
    x = np.random.RandomState(0).randn(2, 8, 9, 9).astype(np.float32)
    ref = tm(torch.from_numpy(x)).detach().numpy()
    got = _nchw(module.apply(variables, _nhwc(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_factorized_reduction_parity():
    """Dual avg-pool path shrink (nasnet.py:198-207 / pnasnet.py:118-146)."""

    class TorchFR(tnn.Module):
        def __init__(self, cin=6, cout=8):
            super().__init__()
            self.c1 = tnn.Conv2d(cin, cout // 2, 1, bias=False)
            self.c2 = tnn.Conv2d(cin, cout // 2, 1, bias=False)
            self.bn = tnn.BatchNorm2d(cout, eps=0.001)

        def forward(self, x):
            x = F.relu(x)
            p1 = self.c1(F.avg_pool2d(x, 1, 2, count_include_pad=False))
            p2 = F.pad(x, (0, 1, 0, 1))[:, :, 1:, 1:]
            p2 = self.c2(F.avg_pool2d(p2, 1, 2, count_include_pad=False))
            return self.bn(torch.cat([p1, p2], 1))

    import flax.linen as nn

    from pretorched_tpu.models.nasnet import NASNetA

    class OneFR(NASNetA):
        @nn.compact
        def __call__(self, x, mode='forward', head=True, train=False):
            # _prev_path applies its own relu
            return self._prev_path(x, 4, 'fr', train)

    tm = TorchFR().eval()
    module = OneFR()
    variables = dict(module.init(jax.random.key(0),
                                 np.zeros((1, 10, 10, 6), np.float32)))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    renames = {'fr.path_1.conv': 'c1', 'fr.path_2.conv': 'c2',
               'fr.final_path_bn': 'bn'}
    variables = convert.convert_state_dict(sd, variables, renames=renames)
    x = np.random.RandomState(0).randn(2, 6, 10, 10).astype(np.float32)
    ref = tm(torch.from_numpy(x)).detach().numpy()
    got = _nchw(module.apply(variables, _nhwc(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_senet154_stem_parity():
    """3x 3x3-conv stem + caffe ceil pool (senet.py:258-282)."""

    class TorchStem(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 3, 2, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.conv2 = tnn.Conv2d(64, 64, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(64)
            self.conv3 = tnn.Conv2d(64, 128, 3, 1, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(128)

        def forward(self, x):
            x = F.relu(self.bn1(self.conv1(x)))
            x = F.relu(self.bn2(self.conv2(x)))
            x = F.relu(self.bn3(self.conv3(x)))
            return F.max_pool2d(x, 3, 2, ceil_mode=True)

    import flax.linen as nn

    from pretorched_tpu.models.senet import SENet
    from pretorched_tpu.ops.pooling import max_pool
    from pretorched_tpu.models.layers import batch_norm, conv2d, relu as jrelu

    class Stem(SENet):
        @nn.compact
        def __call__(self, x, mode='forward', head=True, train=False):
            x = conv2d(64, 3, stride=2, padding=1, bias=False,
                       name='layer0.conv1')(x)
            x = jrelu(batch_norm(train=train, name='layer0.bn1')(x))
            x = conv2d(64, 3, padding=1, bias=False, name='layer0.conv2')(x)
            x = jrelu(batch_norm(train=train, name='layer0.bn2')(x))
            x = conv2d(self.inplanes, 3, padding=1, bias=False,
                       name='layer0.conv3')(x)
            x = jrelu(batch_norm(train=train, name='layer0.bn3')(x))
            return max_pool(x, 3, 2, 0, ceil_mode=True)

    tm = TorchStem().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    module = Stem(block='se', layers=(1,), groups=64)
    variables = dict(module.init(jax.random.key(0),
                                 np.zeros((1, 31, 31, 3), np.float32)))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert.convert_state_dict(
        sd, variables, renames={'^layer0\\.': ''})
    x = np.random.RandomState(0).randn(2, 3, 31, 31).astype(np.float32)
    ref = tm(torch.from_numpy(x)).detach().numpy()
    got = _nchw(module.apply(variables, _nhwc(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
