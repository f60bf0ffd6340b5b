"""Serving export (zoo/export.py): StableHLO round-trip — export a model,
reload in terms of only the serialized artifact + params sidecar, identical
logits; symbolic-batch export serves multiple batch sizes from one artifact."""

import numpy as np

import pretorched_tpu
from pretorched_tpu.zoo.export import (export_model, load_exported,
                                       stablehlo_text)


def test_export_roundtrip_fixed_batch(tmp_path):
    model = pretorched_tpu.resnet18(num_classes=10, pretrained=None).eval()
    path = str(tmp_path / 'resnet18.jaxexp')
    export_model(model, path, (224, 224, 3), batch='2')

    call, variables = load_exported(path)
    x = np.random.RandomState(0).randn(2, 224, 224, 3).astype(np.float32)
    got = np.asarray(call(variables, x))
    ref = np.asarray(model.module.apply(model.variables, x))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_export_symbolic_batch(tmp_path):
    model = pretorched_tpu.alexnet(num_classes=7, pretrained=None).eval()
    path = str(tmp_path / 'alexnet.jaxexp')
    export_model(model, path, (224, 224, 3), batch='b')
    call, variables = load_exported(path)
    for b in (1, 3):
        x = np.random.RandomState(b).randn(b, 224, 224, 3).astype(np.float32)
        got = np.asarray(call(variables, x))
        assert got.shape == (b, 7)
        ref = np.asarray(model.module.apply(model.variables, x))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_stablehlo_text_contains_module():
    model = pretorched_tpu.squeezenet1_1(num_classes=5, pretrained=None)
    txt = stablehlo_text(model, (224, 224, 3))
    assert 'stablehlo' in txt and 'module' in txt
