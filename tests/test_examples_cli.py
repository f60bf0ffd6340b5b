"""Example CLI smoke tests (subprocess, CPU, no weights)."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get('PRETORCHED_TEST_SLOW'),
    reason='slow: subprocess CLI runs (~5 min); set PRETORCHED_TEST_SLOW=1')

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=280):
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    return subprocess.run([sys.executable] + args, cwd=ROOT, env=env,
                          capture_output=True, text=True, timeout=timeout)


def test_imagenet_logits_cli():
    r = _run(['examples/imagenet_logits.py', 'data/cat.jpg', '-a', 'resnet18',
              '--pretrained', 'none', '--cpu'])
    assert r.returncode == 0, r.stderr[-800:]
    assert "is a '" in r.stdout, r.stdout


def test_serve_cli():
    r = _run(['examples/serve.py', '-a', 'resnet18', '--cpu',
              '--requests', '16', '--clients', '4', '--size', '64',
              '--max-batch', '8', '--resolver-threads', '4'])
    assert r.returncode == 0, r.stderr[-800:]
    assert 'req/s' in r.stdout and 'buckets compiled' in r.stdout, r.stdout


def test_visu_arch_cli(tmp_path):
    r = _run(['examples/visu_arch.py', '-a', 'resnet18', '--image',
              'data/cat.jpg', '--outdir', str(tmp_path), '--cpu'])
    assert r.returncode == 0, r.stderr[-800:]
    assert (tmp_path / 'filters.png').exists()
    assert (tmp_path / 'activations.png').exists()
