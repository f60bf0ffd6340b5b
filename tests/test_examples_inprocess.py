"""In-process end-to-end example runs on CPU (VERDICT r1 #8): the cheap
always-on complement to the slow-gated subprocess CLI tests."""

import os
import runpy
import sys

import numpy as np
from PIL import Image

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_example(script, argv, capsys):
    old = sys.argv
    sys.argv = [script] + argv
    try:
        runpy.run_path(os.path.join(ROOT, script), run_name='__main__')
    finally:
        sys.argv = old
    return capsys.readouterr().out


def test_imagenet_logits_inprocess(capsys):
    out = _run_example(
        'examples/imagenet_logits.py',
        [os.path.join(ROOT, 'data/cat.jpg'), '-a', 'resnet18',
         '--pretrained', 'none'], capsys)
    assert "is a '" in out, out


def test_video_eval_inprocess(tmp_path, capsys):
    """Tiny frame-folder dataset through the full multi-clip consensus eval,
    including the ragged-final-batch padding path on the 8-device mesh."""
    rng = np.random.RandomState(0)
    for cls in ('applauding', 'boxing'):
        for vid in ('v0', 'v1', 'v2'):          # 6 videos; batch 4 -> ragged
            d = tmp_path / cls / vid
            d.mkdir(parents=True)
            for f in range(5):
                arr = rng.randint(0, 255, (40, 40, 3), np.uint8)
                Image.fromarray(arr).save(d / f'frame_{f:05d}.jpg')
    out = _run_example(
        'examples/video_eval.py',
        [str(tmp_path), '-a', 'resnet3d10', '--pretrained', 'none',
         '--num-classes', '2', '--frames', '4', '--clips', '2',
         '--size', '32', '--batch-size', '4', '-j', '1'], capsys)
    assert ' * Acc@1 ' in out, out
    assert 'Loss' in out, out


def test_video_eval_native_frames_inprocess(tmp_path, capsys):
    """--frames native: ragged video lengths (3, 9, 12 frames) are bucketed
    onto the --frame-multiple ladder (3->4, 9/12->12 with multiple 4, i.e.
    at most one compile per rung), per-bucket batches flush independently,
    and the consensus metrics still aggregate across all videos."""
    rng = np.random.RandomState(0)
    lengths = {'v0': 3, 'v1': 9, 'v2': 12}
    for cls in ('applauding', 'boxing'):
        for vid, n in lengths.items():
            d = tmp_path / cls / vid
            d.mkdir(parents=True)
            for f in range(n):
                arr = rng.randint(0, 255, (40, 40, 3), np.uint8)
                Image.fromarray(arr).save(d / f'frame_{f:05d}.jpg')
    out = _run_example(
        'examples/video_eval.py',
        [str(tmp_path), '-a', 'resnet3d10', '--pretrained', 'none',
         '--num-classes', '2', '--frames', 'native', '--max-frames', '12',
         '--frame-multiple', '4', '--clips', '2', '--size', '32',
         '--batch-size', '2', '-j', '1'], capsys)
    assert ' * Acc@1 ' in out, out


def test_imagenet_eval_train_loop_inprocess(tmp_path, capsys, monkeypatch):
    """One tiny training epoch through examples/imagenet_eval.py: train step,
    validate, checkpoint + model_best copy (reference imagenet_eval.py:154-159,
    256-259). Slow-gated: two jit compiles at 224px on the 1-core sandbox."""
    import pytest
    if not os.environ.get('PRETORCHED_TEST_SLOW'):
        pytest.skip('slow: set PRETORCHED_TEST_SLOW=1')
    rng = np.random.RandomState(0)
    for split, n in (('train', 4), ('val', 2)):
        for cls in ('cat', 'dog'):
            d = tmp_path / 'data' / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                arr = rng.randint(0, 255, (64, 64, 3), np.uint8)
                Image.fromarray(arr).save(d / f'{i}.jpg')
    monkeypatch.chdir(tmp_path)
    # train batch must be a multiple of the 8-device mesh's data axis
    # (eval batches are padded+masked; train uses drop_last instead)
    out = _run_example(
        'examples/imagenet_eval.py',
        [str(tmp_path / 'data'), '-a', 'resnet18', '-b', '8', '--epochs', '1',
         '--pretrained', 'none', '-j', '1', '--lr', '0.01'], capsys)
    assert 'Epoch: [0]' in out, out
    assert ' * Acc@1 ' in out, out
    assert (tmp_path / 'checkpoint.msgpack').exists()
    assert (tmp_path / 'checkpoint.msgpack.meta').exists()
    # model_best copies only when prec1 beats 0.0 (reference semantics,
    # imagenet_eval.py:154-159) — random init on 4 val images may score 0
    final = out.rsplit(' * Acc@1 ', 1)[1].split()[0]
    if float(final) > 0:
        assert (tmp_path / 'model_best.msgpack').exists()


def test_imagenet_eval_bf16_fast_pipeline_inprocess(tmp_path, capsys):
    """--bf16 --fast-pipeline: bf16 model compute + bf16 fused device
    preprocessing (the TPU serving mode) end-to-end through the CLI."""
    rng = np.random.RandomState(0)
    for cls in ('a', 'b'):
        d = tmp_path / 'val' / cls
        d.mkdir(parents=True)
        for i in range(3):
            arr = rng.randint(0, 255, (64, 64, 3), np.uint8)
            Image.fromarray(arr).save(d / f'{i}.jpg')
    out = _run_example(
        'examples/imagenet_eval.py',
        [str(tmp_path), '-a', 'resnet18', '-b', '4', '-e',
         '--pretrained', 'none', '-j', '1', '--bf16', '--fast-pipeline'],
        capsys)
    assert ' * Acc@1 ' in out, out


def test_imagenet_eval_ten_crop_inprocess(tmp_path, capsys):
    """--ten-crop: device 10-crop + softmax consensus through the sharded
    multi-clip step (the reference's 10-crop-style run, README.md:198-199)."""
    rng = np.random.RandomState(0)
    for cls in ('a', 'b'):
        d = tmp_path / 'val' / cls
        d.mkdir(parents=True)
        for i in range(3):
            arr = rng.randint(0, 255, (48, 48, 3), np.uint8)
            Image.fromarray(arr).save(d / f'{i}.jpg')
    out = _run_example(
        'examples/imagenet_eval.py',
        [str(tmp_path), '-a', 'resnet18', '-b', '4', '-e',
         '--pretrained', 'none', '-j', '1', '--ten-crop'], capsys)
    assert ' * Acc@1 ' in out, out
