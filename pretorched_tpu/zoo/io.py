"""Weight cache + load path.

Replaces the reference's ``model_zoo.load_url`` flow (README.md:145,
torchvision_models.py:161): checkpoints live in a local cache directory
(``$PRETORCHED_HOME``, falling back to ``$TORCH_MODEL_ZOO`` then
``~/.cache/pretorched_tpu``). A raw ``.pth`` found there is converted once via
``zoo.convert`` and cached as a Flax msgpack; subsequent loads are instant.

Offline behavior: if neither a converted checkpoint nor the ``.pth`` is
available locally, we warn and return the randomly-initialized params
(set ``PRETORCHED_STRICT_WEIGHTS=1`` to raise instead) — the zoo has zero
network egress in this environment.
"""

from __future__ import annotations

import os
import warnings
from pathlib import Path
from typing import Optional

import numpy as np

from . import convert as _convert


def cache_dir() -> Path:
    for env in ('PRETORCHED_HOME', 'TORCH_MODEL_ZOO'):
        v = os.environ.get(env)
        if v:
            return Path(v)
    return Path.home() / '.cache' / 'pretorched_tpu'


def converted_path(name: str, dataset: str) -> Path:
    return cache_dir() / 'converted' / f'{name}-{dataset}.msgpack'


def find_torch_checkpoint(url: str) -> Optional[Path]:
    fname = (url or '').rstrip('/').rsplit('/', 1)[-1]
    if not fname:
        return None     # settings with url=None (no hosted checkpoint)
    for base in (cache_dir() / 'weights', cache_dir(), Path.home() / '.torch' / 'models'):
        p = base / fname
        if p.exists():
            return p
    return None


def load_torch_state_dict(path: Path) -> dict:
    """Checkpoint file -> {key: numpy array}.

    Formats: torch ``.pth`` (optionally wrapped in {'state_dict': ...},
    DataParallel ``module.`` prefixes stripped), hickle/HDF5 ``.hkl`` (the
    reference's hosted WRN-50-2 export, wideresnet.py:70-84), and ``.npz``.
    """
    suffix = Path(path).suffix.lower()
    if suffix in ('.hkl', '.h5', '.hdf5'):
        return _load_h5_state_dict(path)
    if suffix == '.npz':
        with np.load(str(path)) as z:
            return {k: np.asarray(z[k]) for k in z.files}
    import torch
    obj = torch.load(str(path), map_location='cpu', weights_only=False)
    if isinstance(obj, dict) and 'state_dict' in obj:
        obj = obj['state_dict']
    out = {}
    for k, v in obj.items():
        k = k[len('module.'):] if k.startswith('module.') else k
        out[k] = v.numpy() if hasattr(v, 'numpy') else np.asarray(v)
    return out


def _load_h5_state_dict(path: Path) -> dict:
    """Flatten every dataset in an HDF5/hickle file into {key: array}.

    hickle versions differ in layout (datasets at the root named by dict key,
    or nested under a ``data`` group), so we walk the whole tree and strip
    the wrapper group names hickle uses."""
    import h5py
    out = {}

    def visit(name, obj):
        if isinstance(obj, h5py.Dataset):
            key = name
            for wrapper in ('data/', 'data.'):
                if key.startswith(wrapper):
                    key = key[len(wrapper):]
            out[key.replace('/', '.')] = np.asarray(obj)

    with h5py.File(str(path), 'r') as f:
        f.visititems(visit)
    return out


def save_converted(variables: dict, path: Path) -> None:
    from flax import serialization
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(serialization.to_bytes(variables))


def load_converted(variables_template: dict, path: Path) -> dict:
    from flax import serialization
    return serialization.from_bytes(variables_template, path.read_bytes())


def load_pretrained_variables(name: str, dataset: str, settings: dict,
                              variables: dict, *, torch_renames=None,
                              converter_opts=None) -> dict:
    cpath = converted_path(name, dataset)
    if cpath.exists():
        return load_converted(variables, cpath)
    tpath = find_torch_checkpoint(settings.get('url', '') or '')
    if tpath is not None:
        sd = load_torch_state_dict(tpath)
        opts = dict(converter_opts or {})
        ordered = opts.pop('ordered_leaves', None)
        if ordered is not None:
            converted = _convert.convert_state_dict_ordered(sd, variables, ordered)
        else:
            converted = _convert.convert_state_dict(
                sd, variables, renames=torch_renames, **opts)
        save_converted(converted, cpath)
        return converted
    msg = (f'pretrained weights for {name}/{dataset} not found locally '
           f'(looked for a converted checkpoint at {cpath} and the .pth from '
           f"{settings.get('url')!r} under {cache_dir()}/weights). "
           'Proceeding with random initialization.')
    if os.environ.get('PRETORCHED_STRICT_WEIGHTS'):
        raise FileNotFoundError(msg)
    warnings.warn(msg)
    return variables
