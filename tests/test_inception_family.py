"""Block-level parity for BNInception / InceptionV4 / Xception + background-class
slicing in the converter."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from pretorched_tpu.zoo import convert


def _rand_bn(tm):
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)


def test_bninception_block_parity():
    """One BN-Inception 4-branch block, ceil-mode avg pool branch, Caffe biases."""

    class TorchBlock(tnn.Module):
        def __init__(self, cin=32):
            super().__init__()
            def cbr(i, o, k, p=0):
                return tnn.Sequential(tnn.Conv2d(i, o, k, padding=p),
                                      tnn.BatchNorm2d(o, momentum=0.9), tnn.ReLU())
            self.b1 = cbr(cin, 8, 1)
            self.r3 = cbr(cin, 8, 1)
            self.c3 = cbr(8, 8, 3, 1)
            self.rd = cbr(cin, 8, 1)
            self.d1 = cbr(8, 12, 3, 1)
            self.d2 = cbr(12, 12, 3, 1)
            self.proj = cbr(cin, 4, 1)

        def forward(self, x):
            pool = F.avg_pool2d(x, 3, 1, 1, ceil_mode=True, count_include_pad=True)
            return torch.cat([self.b1(x), self.c3(self.r3(x)),
                              self.d2(self.d1(self.rd(x))), self.proj(pool)], 1)

    from pretorched_tpu.models.bninception import BNInception
    import flax.linen as nn

    class OneBlock(BNInception):
        @nn.compact
        def __call__(self, x, mode='forward', head=True, train=False):
            return self._inception(
                x, ('t', 8, 8, 8, 8, 12, 12, 4, 'avg', 1), train)

    tm = TorchBlock().eval()
    _rand_bn(tm)
    module = OneBlock()
    variables = dict(module.init(jax.random.key(0), np.zeros((1, 9, 9, 32), np.float32)))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    renames = {
        'inception_t_1x1': 'b1.0', 'inception_t_1x1_bn': 'b1.1',
        'inception_t_3x3_reduce': 'r3.0', 'inception_t_3x3_reduce_bn': 'r3.1',
        'inception_t_3x3': 'c3.0', 'inception_t_3x3_bn': 'c3.1',
        'inception_t_double_3x3_reduce': 'rd.0', 'inception_t_double_3x3_reduce_bn': 'rd.1',
        'inception_t_double_3x3_1': 'd1.0', 'inception_t_double_3x3_1_bn': 'd1.1',
        'inception_t_double_3x3_2': 'd2.0', 'inception_t_double_3x3_2_bn': 'd2.1',
        'inception_t_pool_proj': 'proj.0', 'inception_t_pool_proj_bn': 'proj.1',
    }
    variables = convert.convert_state_dict(sd, variables, renames=renames)
    x = np.random.RandomState(0).randn(2, 32, 9, 9).astype(np.float32)
    ref = tm(torch.from_numpy(x)).detach().numpy()
    got = np.transpose(np.asarray(module.apply(
        variables, np.transpose(x, (0, 2, 3, 1)))), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_xception_block_parity():
    """Xception middle-flow block: relu->sepconv->bn x3 with identity skip."""

    class TorchSep(tnn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cin, 3, 1, 1, groups=cin, bias=False)
            self.pointwise = tnn.Conv2d(cin, cout, 1, bias=False)

        def forward(self, x):
            return self.pointwise(self.conv1(x))

    class TorchBlock(tnn.Module):
        def __init__(self, ch=16):
            super().__init__()
            self.rep = tnn.Sequential(
                tnn.ReLU(), TorchSep(ch, ch), tnn.BatchNorm2d(ch),
                tnn.ReLU(), TorchSep(ch, ch), tnn.BatchNorm2d(ch),
                tnn.ReLU(), TorchSep(ch, ch), tnn.BatchNorm2d(ch))

        def forward(self, x):
            return self.rep(x) + x

    from pretorched_tpu.models.xception import Xception
    import flax.linen as nn

    class OneBlock(Xception):
        @nn.compact
        def __call__(self, x, mode='forward', head=True, train=False):
            return self._block(x, 16, 3, 'blockT', train)

    tm = TorchBlock().eval()
    _rand_bn(tm)
    module = OneBlock()
    variables = dict(module.init(jax.random.key(0), np.zeros((1, 8, 8, 16), np.float32)))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert.convert_state_dict(sd, variables,
                                           renames={'^blockT\\.': ''})
    x = np.random.RandomState(0).randn(2, 16, 8, 8).astype(np.float32)
    ref = tm(torch.from_numpy(x)).detach().numpy()
    got = np.transpose(np.asarray(module.apply(
        variables, np.transpose(x, (0, 2, 3, 1)))), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_background_class_slice():
    variables = {'params': {'last_linear': {
        'kernel': jnp.zeros((8, 5)), 'bias': jnp.zeros((5,))}}}
    sd = {'last_linear.weight': np.arange(6 * 8, dtype=np.float32).reshape(6, 8),
          'last_linear.bias': np.arange(6, dtype=np.float32)}
    out = convert.convert_state_dict(sd, variables,
                                     background_class_keys=('last_linear',))
    np.testing.assert_array_equal(np.asarray(out['params']['last_linear']['bias']),
                                  np.arange(1, 6, dtype=np.float32))
    np.testing.assert_array_equal(
        np.asarray(out['params']['last_linear']['kernel']),
        np.arange(6 * 8, dtype=np.float32).reshape(6, 8)[1:].T)
