"""Golden-accuracy workflow proven end-to-end with a synthetic checkpoint
(VERDICT r2 #2): fabricated .pth -> convert-once cache -> imagenet-folder
eval -> measured-vs-BASELINE.md table. The day real weights land, parity is
one command: ``python tools/convert_weights.py --eval <valdir>``."""

import importlib.util
import os

import numpy as np
import pytest
import torch
from PIL import Image

import pretorched_tpu

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        'convert_weights', os.path.join(REPO, 'tools', 'convert_weights.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fabricate_resnet18_pth(weights_dir):
    """A torch state_dict with exactly resnet18's keys/shapes (random
    values), built from our own param template via the converter mapping —
    the same recipe as test_weight_loading."""
    from pretorched_tpu.models.resnet import TORCH_RENAMES
    from pretorched_tpu.zoo import convert

    template = pretorched_tpu.resnet18(num_classes=1000, pretrained=None)
    flat = convert.flatten_variables(template.variables)
    gen = np.random.RandomState(0)
    sd = {}
    for path, leaf in flat.items():
        tkey = convert.torch_key_for(path, TORCH_RENAMES)
        if tkey is None:
            continue
        shape = np.shape(leaf)
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
    url = pretorched_tpu.pretrained_settings['resnet18']['imagenet']['url']
    weights_dir.mkdir(parents=True, exist_ok=True)
    torch.save(sd, weights_dir / url.rsplit('/', 1)[-1])


def _fabricate_val_folder(valdir, n_classes=2, per_class=2):
    rng = np.random.RandomState(1)
    for c in range(n_classes):
        cdir = valdir / f'n{c:08d}'
        cdir.mkdir(parents=True)
        for i in range(per_class):
            arr = rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
            Image.fromarray(arr).save(cdir / f'img_{i}.jpg')


def test_parse_baseline_table():
    from pretorched_tpu.zoo import golden

    table = golden.parse_baseline()
    assert table['resnet18'] == (70.142, 89.274)
    assert table['dpn68b'] == (77.034, 93.590)          # DualPathNet68b_5k
    assert table['cafferesnet101'] == (76.200, 92.766)  # Our porting > Caffe
    assert table['se_resnext50_32x4d'] == (79.076, 94.434)
    assert table['nasnetalarge'] == (82.566, 96.086)    # Our porting wins
    assert table['fbresnet152'] == (77.386, 93.594)
    # >= 40 distinct models parsed out of the published table
    assert len(table) >= 40


def test_golden_workflow_end_to_end(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv('PRETORCHED_HOME', str(tmp_path / 'zoo'))
    _fabricate_resnet18_pth(tmp_path / 'zoo' / 'weights')
    _fabricate_val_folder(tmp_path / 'val')

    tool = _load_tool()
    rc = tool.main(['--eval', str(tmp_path / 'val'), '--limit', '4',
                    '-b', '2', '--golden-dir', str(tmp_path / 'golden'),
                    '--image', os.path.join(REPO, 'data', 'cat.jpg'),
                    'resnet18'])
    out = capsys.readouterr().out

    # conversion happened and was cached
    from pretorched_tpu.zoo import io
    assert io.converted_path('resnet18', 'imagenet').exists()
    assert (tmp_path / 'golden' / 'resnet18-imagenet.npy').exists()
    assert 'resnet18/imagenet: converted' in out

    # the accuracy table row flowed: measured, published ref, delta, verdict
    row = next(line for line in out.splitlines()
               if line.startswith('* resnet18/imagenet:'))
    assert 'Acc@1' in row and 'ref 70.142' in row and '(n=4)' in row
    assert 'accuracy vs BASELINE.md' in out
    # random weights cannot be within 0.1% of the published number -> FAIL,
    # and the tool's exit code propagates that
    assert row.endswith('FAIL') and rc == 1


def test_golden_workflow_pass_verdict(tmp_path, monkeypatch):
    """accuracy_row PASS/FAIL thresholds."""
    from pretorched_tpu.zoo import golden

    base = {'resnet18': (70.142, 89.274)}
    ok = golden.accuracy_row('resnet18', 'imagenet', 70.10, 89.30, 50000,
                             base)
    assert ok.endswith('PASS')
    bad = golden.accuracy_row('resnet18', 'imagenet', 69.0, 89.27, 50000,
                              base)
    assert bad.endswith('FAIL')
    unknown = golden.accuracy_row('mysterynet', 'imagenet', 50.0, 70.0, 10,
                                  {})
    assert 'no published baseline' in unknown


def test_golden_workflow_video_model(tmp_path, monkeypatch, capsys):
    """Video checkpoints (input_size shares the image [C,H,W] schema) take
    the fixed-seed-clip golden path, not the cat.jpg image path."""
    monkeypatch.setenv('PRETORCHED_HOME', str(tmp_path / 'zoo'))
    from pretorched_tpu.zoo import io

    # shrink the eval shape so the 1-core CPU forward stays cheap
    settings = pretorched_tpu.pretrained_settings['resnet3d18']['kinetics-400']
    monkeypatch.setitem(settings, 'input_size', [3, 64, 64])

    m = pretorched_tpu.resnet3d18(num_classes=400, pretrained=None)
    io.save_converted(m.variables,
                      io.converted_path('resnet3d18', 'kinetics-400'))

    tool = _load_tool()
    rc = tool.main(['--golden-dir', str(tmp_path / 'golden'),
                    '--image', os.path.join(REPO, 'data', 'cat.jpg'),
                    'resnet3d18'])
    out = capsys.readouterr().out
    assert 'fixed-seed clip golden logits saved' in out, out
    assert (tmp_path / 'golden' / 'resnet3d18-kinetics-400.npy').exists()
    assert rc == 0
