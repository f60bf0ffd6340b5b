"""End-to-end pretrained-loading flow: .pth in cache -> convert -> msgpack
cache -> identical logits on reload (zoo/io.py integration)."""

import numpy as np
import torch
import torch.nn as tnn

import pretorched_tpu


def test_pth_convert_and_cache(tmp_path, monkeypatch):
    monkeypatch.setenv('PRETORCHED_HOME', str(tmp_path))

    # a torch state_dict with exactly resnet18's keys/shapes (random values):
    # build it from our own param template via the converter's key mapping.
    from pretorched_tpu.models.resnet import TORCH_RENAMES
    from pretorched_tpu.zoo import convert, io

    template = pretorched_tpu.resnet18(num_classes=1000, pretrained=None)
    flat = convert.flatten_variables(template.variables)
    gen = np.random.RandomState(0)
    sd = {}
    for path, leaf in flat.items():
        tkey = convert.torch_key_for(path, TORCH_RENAMES)
        if tkey is None:
            continue
        shape = np.shape(leaf)
        # invert the layout transpose to produce torch-shaped tensors
        if path[-1] == 'kernel' and len(shape) == 4:
            tshape = (shape[3], shape[2], shape[0], shape[1])
        elif path[-1] == 'kernel' and len(shape) == 2:
            tshape = (shape[1], shape[0])
        else:
            tshape = shape
        if path[-1] == 'var':
            sd[tkey] = torch.from_numpy(
                gen.rand(*tshape).astype(np.float32) + 0.5)
        else:
            sd[tkey] = torch.from_numpy(
                gen.randn(*tshape).astype(np.float32) * 0.05)

    weights_dir = tmp_path / 'weights'
    weights_dir.mkdir(parents=True)
    url = pretorched_tpu.pretrained_settings['resnet18']['imagenet']['url']
    torch.save(sd, weights_dir / url.rsplit('/', 1)[-1])

    # first load: converts the .pth and writes the msgpack cache
    m1 = pretorched_tpu.resnet18(num_classes=1000, pretrained='imagenet')
    assert io.converted_path('resnet18', 'imagenet').exists()
    # second load: hits the converted cache
    m2 = pretorched_tpu.resnet18(num_classes=1000, pretrained='imagenet')

    x = np.random.RandomState(1).randn(1, 3, 64, 64).astype(np.float32)
    y1, y2 = np.asarray(m1(x)), np.asarray(m2(x))
    np.testing.assert_allclose(y1, y2, rtol=1e-6, atol=1e-6)
    # loaded weights actually differ from random init
    init = pretorched_tpu.resnet18(num_classes=1000, pretrained=None)
    assert np.abs(np.asarray(init(x)) - y1).max() > 1e-3
    # metadata stamped (reference: load_pretrained)
    assert m1.input_size == [3, 224, 224]
    assert m1.mean == [0.485, 0.456, 0.406]


def test_pretrained_with_null_url_falls_back_to_random_init():
    """Settings registered with url=None (e.g. resnet3d10 kinetics): the
    factory must warn and return an initialized model, not crash on the
    cache directory path."""
    import warnings

    import pretorched_tpu as p

    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        model = p.resnet3d10(num_classes=400, pretrained='kinetics-400')
    x = np.random.RandomState(0).randn(1, 3, 4, 32, 32).astype(np.float32)
    assert model(x).shape == (1, 400)


def test_ordered_converter_rejects_unmatched_leaf():
    """A typo'd ordered_leaves entry must raise, not silently leave the leaf
    randomly initialized while consuming a torch param group."""
    import flax.linen as nn
    import pytest as _pytest

    from pretorched_tpu.zoo import convert

    import jax

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(3, name='head')(x)

    m = M()
    variables = dict(m.init(jax.random.key(0), np.zeros((1, 4), np.float32)))
    sd = {'head.weight': np.zeros((3, 4), np.float32),
          'head.bias': np.zeros((3,), np.float32)}
    with _pytest.raises(ValueError, match='matches no model variable'):
        convert.convert_state_dict_ordered(sd, variables, ['haed'])


def test_torch_export_roundtrip():
    """flax -> torch export is the exact inverse of the import path: a twin's
    state_dict converted in and exported back is bit-identical, and torch's
    strict load_state_dict accepts the export (interop both ways)."""
    from pretorched_tpu.models.resnet import TORCH_RENAMES
    from pretorched_tpu.zoo import convert

    from torch_twins import ResNet2DTwin

    twin = ResNet2DTwin('basic', (2, 2, 2, 2), num_classes=10)
    sd = {k: v.numpy() for k, v in twin.state_dict().items()}

    model = pretorched_tpu.resnet18(num_classes=10, pretrained=None)
    variables = convert.convert_state_dict(sd, model.variables,
                                           renames=TORCH_RENAMES)
    out = convert.to_torch_state_dict(variables, renames=TORCH_RENAMES)

    assert set(out) == set(sd), (set(out) ^ set(sd))
    for k in sd:
        np.testing.assert_array_equal(out[k], sd[k], err_msg=k)
    twin.load_state_dict({k: torch.from_numpy(np.asarray(v))
                          for k, v in out.items()}, strict=True)


def test_save_torch_checkpoint_loads_back(tmp_path):
    """save_torch_checkpoint writes a .pth the import path round-trips."""
    from pretorched_tpu.models.resnet import TORCH_RENAMES
    from pretorched_tpu.zoo import convert

    model = pretorched_tpu.resnet18(num_classes=7, pretrained=None)
    path = tmp_path / 'exported.pth'
    convert.save_torch_checkpoint(model.variables, str(path),
                                  renames=TORCH_RENAMES)
    sd = {k: v.numpy() for k, v in torch.load(str(path)).items()}
    variables = convert.convert_state_dict(sd, model.variables,
                                           renames=TORCH_RENAMES)
    a = convert.flatten_variables(model.variables)
    b = convert.flatten_variables(variables)
    for path_k in a:
        np.testing.assert_allclose(np.asarray(a[path_k], np.float32),
                                   np.asarray(b[path_k], np.float32),
                                   err_msg=str(path_k))


def test_wrapper_export_method():
    """model.export_torch_state_dict() uses the factory-stashed rename map
    (fc <-> last_linear for torchvision-family models)."""
    model = pretorched_tpu.resnet18(num_classes=5, pretrained=None)
    sd = model.export_torch_state_dict()
    assert 'fc.weight' in sd and sd['fc.weight'].shape == (5, 512)
    assert 'bn1.num_batches_tracked' in sd
    assert 'conv1.weight' in sd and sd['conv1.weight'].shape == (64, 3, 7, 7)


def test_export_num_batches_tracked_respects_regex_renames():
    """The BN num_batches_tracked prefix must follow torch_key_for's full
    rename logic (exact AND ^-regex), not just exact-match lookup."""
    from pretorched_tpu.zoo import convert
    variables = {
        'params': {'features.0': {'kernel': np.zeros((1, 1, 3, 4),
                                                     np.float32)},
                   'features.1': {'scale': np.ones(4, np.float32),
                                  'bias': np.zeros(4, np.float32)}},
        'batch_stats': {'features.1': {'mean': np.zeros(4, np.float32),
                                       'var': np.ones(4, np.float32)}},
    }
    renames = {'^features\\.': 'trunk.'}
    sd = convert.to_torch_state_dict(variables, renames=renames)
    assert 'trunk.1.running_mean' in sd
    assert 'trunk.1.num_batches_tracked' in sd
    assert not any(k.startswith('features.') for k in sd)
