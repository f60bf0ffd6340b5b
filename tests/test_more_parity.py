"""Additional parity: SlowFast bottleneck, TRN Relation MLP, DPN
test-time-pool divergence, inceptionv3 aux path, finetune masks."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

import pretorched_tpu as p
from pretorched_tpu.zoo import convert


def _rand_bn(tm):
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm3d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)


def test_slowfast_bottleneck_parity():
    """head_conv=3 bottleneck: temporal (3,1,1) conv1 + spatial-strided conv2."""

    class TorchSFBlock(tnn.Module):
        def __init__(self, cin=16, planes=8, stride=2):
            super().__init__()
            self.conv1 = tnn.Conv3d(cin, planes, (3, 1, 1), padding=(1, 0, 0),
                                    bias=False)
            self.bn1 = tnn.BatchNorm3d(planes)
            self.conv2 = tnn.Conv3d(planes, planes, (1, 3, 3),
                                    stride=(1, stride, stride),
                                    padding=(0, 1, 1), bias=False)
            self.bn2 = tnn.BatchNorm3d(planes)
            self.conv3 = tnn.Conv3d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm3d(planes * 4)
            self.down = tnn.Sequential(
                tnn.Conv3d(cin, planes * 4, 1, stride=(1, stride, stride),
                           bias=False), tnn.BatchNorm3d(planes * 4))

        def forward(self, x):
            out = F.relu(self.bn1(self.conv1(x)))
            out = F.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return F.relu(out + self.down(x))

    import flax.linen as nn

    from pretorched_tpu.models.slowfast import SlowFast

    class OneBlock(SlowFast):
        @nn.compact
        def __call__(self, x, mode='forward', head=True, train=False):
            return self._block(x, 8, 2, True, 'slow.res4.0', 3, train)

    tm = TorchSFBlock().eval()
    _rand_bn(tm)
    module = OneBlock(block='bottleneck')
    variables = dict(module.init(jax.random.key(0),
                                 np.zeros((1, 4, 8, 8, 16), np.float32)))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert.convert_state_dict(
        sd, variables, renames={'^slow\\.res4\\.0\\.downsample\\.': 'down.',
                                '^slow\\.res4\\.0\\.': ''})
    x = np.random.RandomState(0).randn(2, 16, 4, 8, 8).astype(np.float32)
    ref = tm(torch.from_numpy(x)).detach().numpy()
    got = np.transpose(np.asarray(module.apply(
        variables, np.transpose(x, (0, 2, 3, 4, 1)))), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_trn_relation_parity():
    class TorchRelation(tnn.Module):
        def __init__(self, n=4, din=16, dout=8, bottleneck=12):
            super().__init__()
            self.relate = tnn.Sequential(
                tnn.ReLU(), tnn.Linear(n * din, bottleneck), tnn.ReLU(),
                tnn.Linear(bottleneck, dout))
            self.n, self.din, self.dout = n, din, dout

        def forward(self, x):
            out = x.contiguous().view(-1, self.n * self.din)
            return self.relate(out).view(x.size(0), -1, self.dout)

    from pretorched_tpu.models.trn import Relation

    tm = TorchRelation().eval()
    module = Relation(num_inputs=4, in_features=16, out_features=8,
                      bottleneck_dim=12)
    variables = dict(module.init(jax.random.key(0),
                                 np.zeros((2, 4, 16), np.float32)))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert.convert_state_dict(sd, variables)
    x = np.random.RandomState(0).randn(2, 4, 16).astype(np.float32)
    ref = tm(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(module.apply(variables, x))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_dpn_test_time_pool_divergence():
    """dpn.py:375-384: eval uses 7x7 pool + conv + avgmax; train global avg."""
    m = p.dpn68(num_classes=10, pretrained=None)
    x = np.random.RandomState(0).randn(1, 3, 224, 224).astype(np.float32)
    eval_out = np.asarray(m(x))
    train_out = np.asarray(m.module.apply(
        m.variables, np.transpose(x, (0, 2, 3, 1)), train=True,
        mutable=['batch_stats'], rngs={'dropout': jax.random.key(0)})[0])
    assert eval_out.shape == train_out.shape == (1, 10)
    assert np.abs(eval_out - train_out).max() > 1e-6  # different pooling paths


def test_inceptionv3_aux_training_path():
    m = p.inceptionv3(num_classes=12, pretrained=None)
    x = np.transpose(
        np.random.RandomState(0).randn(1, 3, 299, 299).astype(np.float32),
        (0, 2, 3, 1))
    out = m.module.apply(m.variables, x, train=True, mutable=['batch_stats'],
                         rngs={'dropout': jax.random.key(0)})[0]
    assert isinstance(out, tuple) and len(out) == 2
    assert out[0].shape == (1, 12) and out[1].shape == (1, 12)


def test_finetune_mask():
    from pretorched_tpu.models.resnet3d import get_fine_tuning_parameter_names
    from pretorched_tpu.parallel.train import finetune_mask

    m = p.resnet3d10(num_classes=5, pretrained=None)
    names = get_fine_tuning_parameter_names(4)
    mask = finetune_mask(m.variables['params'], names)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    trainable = {('.'.join(str(getattr(q, 'key', q)) for q in path)): v
                 for path, v in flat}
    assert any(k.startswith('layer4') and v for k, v in trainable.items())
    assert any(k.startswith('last_linear') and v for k, v in trainable.items())
    assert all(not v for k, v in trainable.items() if k.startswith('layer1'))
    full = finetune_mask(m.variables['params'], None)
    assert all(jax.tree_util.tree_leaves(full))
