"""Packaging parity (reference ships setup.py + setup.cfg + requirements.txt +
LICENSE — /root/reference/setup.py:1-43, setup.cfg, requirements.txt).

The smoke test builds and installs the package into a throwaway prefix
(``pip install --prefix``, no build isolation, no deps, zero network) and runs
a resnet18 forward from that install in a clean subprocess.
"""

import os
import subprocess
import sys
import sysconfig

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_packaging_files_exist():
    for name in ('setup.py', 'setup.cfg', 'requirements.txt', 'LICENSE'):
        path = os.path.join(REPO, name)
        assert os.path.isfile(path), name
        assert os.path.getsize(path) > 0, name


def test_requirements_cover_runtime_deps():
    reqs = open(os.path.join(REPO, 'requirements.txt')).read().lower()
    for dep in ('jax', 'flax', 'optax', 'orbax-checkpoint', 'numpy',
                'pillow'):
        assert dep in reqs, dep


@pytest.mark.skipif(not os.environ.get('PRETORCHED_TEST_SLOW'),
                    reason='slow: pip build+install (~25s); '
                           'set PRETORCHED_TEST_SLOW=1')
def test_pip_install_smoke(tmp_path):
    """Install into a temp --prefix and import + forward from it."""
    prefix = tmp_path / 'prefix'
    r = subprocess.run(
        [sys.executable, '-m', 'pip', 'install', '--no-deps',
         '--no-build-isolation', '--no-index', '--prefix', str(prefix), REPO],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr

    # site-packages dir under the prefix (platform-correct)
    rel = sysconfig.get_path('purelib', vars={'base': str(prefix),
                                              'platbase': str(prefix)})
    assert os.path.isdir(rel), rel
    env = dict(os.environ, PYTHONPATH=rel, JAX_PLATFORMS='cpu')
    code = (
        "import numpy as np, pretorched\n"
        "m = pretorched.resnet18(num_classes=10, pretrained=None)\n"
        "y = m(np.zeros((1, 3, 64, 64), np.float32))\n"
        "assert y.shape == (1, 10), y.shape\n"
        "print('PACKAGING-OK')\n")
    r2 = subprocess.run([sys.executable, '-c', code], capture_output=True,
                        text=True, timeout=600, env=env, cwd=str(tmp_path))
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert 'PACKAGING-OK' in r2.stdout
