"""ResNeXt ordered conversion against the ACTUAL Lambda-graph registration
order (VERDICT r1 #6b): a loop-generated torch twin of the reference's
auto-generated nested Sequential/ConcatTable graph
(resnext_features/resnext101_32x4d_features.py:30+) — same nesting, same
module registration order, same auto-index keys — is converted positionally
via ordered_leaves() and must reproduce logits."""

import os

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax

from pretorched_tpu.models.resnext import ResNeXt, ordered_leaves
from pretorched_tpu.zoo import convert

import torch_twins as twins


class _LambdaMap(tnn.Sequential):
    """ConcatTable: apply every child to the same input."""

    def forward(self, x):
        return [m(x) for m in self._modules.values()]


class _LambdaReduce(tnn.Module):
    """CAddTable."""

    def forward(self, xs):
        out = xs[0]
        for x in xs[1:]:
            out = out + x
        return out


class _Identity(tnn.Module):
    def forward(self, x):
        return x


def _lambda_block(cin, width, cout, stride, cardinality):
    main = tnn.Sequential(
        tnn.Sequential(
            tnn.Conv2d(cin, width, 1, bias=False),
            tnn.BatchNorm2d(width),
            tnn.ReLU(),
            tnn.Conv2d(width, width, 3, stride, 1, groups=cardinality,
                       bias=False),
            tnn.BatchNorm2d(width),
            tnn.ReLU(),
        ),
        tnn.Conv2d(width, cout, 1, bias=False),
        tnn.BatchNorm2d(cout),
    )
    if stride != 1 or cin != cout:
        shortcut = tnn.Sequential(
            tnn.Conv2d(cin, cout, 1, stride, bias=False),
            tnn.BatchNorm2d(cout))
    else:
        shortcut = _Identity()
    return tnn.Sequential(_LambdaMap(main, shortcut), _LambdaReduce(),
                          tnn.ReLU())


def _lambda_graph_resnext(layers, cardinality=32, base_width=4,
                          num_classes=10):
    """The reference wrapper: .features = the generated graph,
    .last_linear = Linear (resnext.py:37-55)."""
    stages = []
    cin = 64
    for stage, blocks in enumerate(layers, start=1):
        planes = 64 * 2 ** (stage - 1)
        width = planes * base_width * cardinality // 64
        cout = planes * 4
        stride = 1 if stage == 1 else 2
        seq = []
        for i in range(blocks):
            seq.append(_lambda_block(cin, width, cout,
                                     stride if i == 0 else 1, cardinality))
            cin = cout
        stages.append(tnn.Sequential(*seq))
    features = tnn.Sequential(
        tnn.Conv2d(3, 64, 7, 2, 3, bias=False),
        tnn.BatchNorm2d(64),
        tnn.ReLU(),
        tnn.MaxPool2d(3, 2, 1),
        *stages)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = features
            self.avg_pool = tnn.AvgPool2d(7, 1)
            self.last_linear = tnn.Linear(2048 if layers == (3, 4, 23, 3)
                                          else cin, num_classes)

        def forward(self, x):
            x = self.avg_pool(self.features(x)).flatten(1)
            return self.last_linear(x)

    return Net()


@pytest.mark.parametrize('layers,size', [
    pytest.param((3, 4, 23, 3), 224, marks=pytest.mark.skipif(
        not os.environ.get('PRETORCHED_TEST_SLOW'),
        reason='slow: full-depth resnext101')),
    ((1, 1, 1, 1), 224),
])
def test_lambda_graph_ordered_conversion(layers, size):
    tm = _lambda_graph_resnext(layers).eval()
    twins.randomize_bn(tm)
    module = ResNeXt(layers=layers, cardinality=32, base_width=4,
                     num_classes=10)
    variables = dict(module.init(jax.random.key(0),
                                 np.zeros((1, size, size, 3), np.float32)))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    # sanity: the checkpoint keys really are meaningless auto-indices
    assert any(k.startswith('features.4.0.0.0.0.') for k in sd), list(sd)[:8]
    variables = convert.convert_state_dict_ordered(
        sd, variables, ordered_leaves(layers))
    x = np.random.RandomState(0).randn(2, 3, size, size).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(module.apply(variables, np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
