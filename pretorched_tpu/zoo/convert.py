"""PyTorch checkpoint -> Flax variables converter.

The TPU-native replacement for the reference's ``model_zoo.load_url`` +
``load_state_dict`` path (torchvision_models.py:158-191) and its offline
porting tools (models/fbresnet/resnet152_load.py). A torch ``state_dict`` is
mapped onto our param pytree by a *mechanical* rule, because every model module
names its leaf layers with the exact torch key prefixes:

    flax ('params', 'layer1.0.conv1', 'kernel')  <-  'layer1.0.conv1.weight'
    flax ('params', 'bn1', 'scale')              <-  'bn1.weight'
    flax ('batch_stats', 'bn1', 'mean')          <-  'bn1.running_mean'

plus layout transposes (conv OIHW->HWIO, conv3d OITHW->THWIO, linear
(out,in)->(in,out)) and the reference's special cases as options:

* ``background_class``: 1001->1000 class slicing for TF-ported models
  (nasnet.py:618-625, pnasnet.py:384-391, inceptionresnetv2.py:343-350);
* ``inflate_time``: 2D->3D I3D-style weight inflation by broadcast over the
  time axis (torchvision_models.py:170-191 ``inflate_pretrained``);
* ``renames``: flax-prefix -> torch-prefix maps (e.g. ``last_linear -> fc``)
  and regex rewrites (densenet dotted keys, torchvision_models.py:288-297);
* ``strict=False``: tolerate missing keys (nonlocalnet.py:564).

The mapping is invertible: ``to_torch_state_dict`` / ``save_torch_checkpoint``
export our (possibly fine-tuned) variables back to a torch ``state_dict``
the reference can load — interop in both directions.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp
from jax import tree_util

_LEAF_TO_TORCH = {
    ('params', 'kernel'): 'weight',
    ('params', 'bias'): 'bias',
    ('params', 'scale'): 'weight',
    ('params', 'embedding'): 'weight',
    ('batch_stats', 'mean'): 'running_mean',
    ('batch_stats', 'var'): 'running_var',
}

IGNORED_TORCH_SUFFIXES = ('num_batches_tracked',)


def flatten_variables(variables) -> Dict[Tuple[str, ...], np.ndarray]:
    flat = {}
    for collection, tree in variables.items():
        leaves = tree_util.tree_flatten_with_path(tree)[0]
        for path, leaf in leaves:
            keys = tuple(getattr(p, 'key', getattr(p, 'idx', None)) for p in path)
            flat[(collection,) + keys] = leaf
    return flat


def unflatten_variables(flat: Dict[Tuple[str, ...], np.ndarray]) -> dict:
    out: dict = {}
    for path, leaf in flat.items():
        node = out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf
    return out


def torch_key_for(path: Tuple[str, ...], renames: Optional[dict] = None) -> Optional[str]:
    """Map a flax variable path to its torch state-dict key."""
    collection, leaf = path[0], path[-1]
    suffix = _LEAF_TO_TORCH.get((collection, leaf))
    if suffix is None:
        return None
    prefix = '.'.join(path[1:-1])
    if renames:
        if prefix in renames:
            prefix = renames[prefix]
        else:
            for pat, repl in renames.items():
                if pat.startswith('^'):
                    new = re.sub(pat, repl, prefix)
                    if new != prefix:
                        prefix = new
                        break
    return f'{prefix}.{suffix}' if prefix else suffix


def _to_flax_layout(value: np.ndarray, path: Tuple[str, ...],
                    target_shape: Tuple[int, ...]) -> np.ndarray:
    leaf = path[-1]
    if leaf == 'kernel':
        if value.ndim == 4 and len(target_shape) == 5:
            # I3D inflation: broadcast conv2d weights over time
            # (reference: torchvision_models.py:170-191)
            t = target_shape[0]
            value = np.broadcast_to(value[:, :, None], value.shape[:2] + (t,) + value.shape[2:])
        if value.ndim == 2:
            return np.transpose(value, (1, 0))
        if value.ndim == 3:
            return np.transpose(value, (2, 1, 0))
        if value.ndim == 4:
            return np.transpose(value, (2, 3, 1, 0))
        if value.ndim == 5:
            return np.transpose(value, (2, 3, 4, 1, 0))
    return value


def convert_state_dict(state_dict: Dict[str, np.ndarray], variables: dict, *,
                       renames: Optional[dict] = None,
                       key_rewrite: Optional[Callable[[str], str]] = None,
                       background_class_keys: Tuple[str, ...] = (),
                       strict: bool = True) -> dict:
    """Convert a torch state_dict (numpy values) into our variables pytree.

    ``renames`` maps flax prefixes to torch prefixes (exact, or ``^regex``).
    ``key_rewrite`` pre-rewrites torch keys (densenet's dotted-key migration).
    ``background_class_keys``: flax prefixes whose torch tensors carry an extra
    leading background class to slice off.
    """
    sd = {}
    for k, v in state_dict.items():
        if k.endswith(IGNORED_TORCH_SUFFIXES):
            continue
        if key_rewrite:
            k = key_rewrite(k)
        sd[k] = np.asarray(v)

    flat = flatten_variables(variables)
    out = {}
    missing, used = [], set()
    for path, leaf in flat.items():
        tkey = torch_key_for(path, renames)
        if tkey is None or tkey not in sd:
            if tkey is not None:
                missing.append(tkey)
            out[path] = leaf
            continue
        value = sd[tkey]
        used.add(tkey)
        prefix = '.'.join(path[1:-1])
        if prefix in background_class_keys:
            value = value[1:]
        value = _to_flax_layout(value, path, tuple(np.shape(leaf)))
        if tuple(value.shape) != tuple(np.shape(leaf)):
            msg = (f'shape mismatch for {tkey} -> {path}: torch {value.shape} '
                   f'vs flax {np.shape(leaf)}')
            if strict:
                raise ValueError(msg)
            import warnings
            warnings.warn(msg + ' (skipped, strict=False)')
            out[path] = leaf
            continue
        out[path] = jnp.asarray(np.ascontiguousarray(value), dtype=jnp.asarray(leaf).dtype)

    unexpected = sorted(set(sd) - used)
    if strict and (missing or unexpected):
        raise ValueError(
            f'checkpoint mismatch: missing={missing[:10]}{"..." if len(missing) > 10 else ""} '
            f'unexpected={unexpected[:10]}{"..." if len(unexpected) > 10 else ""}')
    return unflatten_variables(out)


def group_state_dict_in_order(state_dict) -> list:
    """Group a torch state_dict into per-leaf-module param dicts, preserving
    insertion (registration) order.

    Used for checkpoints whose key names are meaningless auto-generated graph
    indices (the reference's ResNeXt Lambda-graph ports,
    resnext_features/resnext101_*_features.py): the *order* of param-bearing
    modules is the stable contract, so we match our leaves to torch leaves
    positionally (conv<->conv, bn<->bn verified by param signature).
    """
    groups, order = {}, []
    for k, v in state_dict.items():
        if k.endswith(IGNORED_TORCH_SUFFIXES):
            continue
        prefix, leaf = k.rsplit('.', 1)
        if prefix not in groups:
            groups[prefix] = {}
            order.append(prefix)
        groups[prefix][leaf] = np.asarray(v)
    return [(p, groups[p]) for p in order]


def convert_state_dict_ordered(state_dict, variables: dict,
                               ordered_leaves: list) -> dict:
    """Positional conversion: our leaf prefixes (graph creation order) are
    zipped against the torch checkpoint's param-bearing modules in
    registration order. ``ordered_leaves`` is a list of flax leaf-name prefixes
    (strings) in the order the model creates them."""
    torch_groups = group_state_dict_in_order(state_dict)
    if len(torch_groups) != len(ordered_leaves):
        raise ValueError(
            f'leaf count mismatch: checkpoint has {len(torch_groups)} '
            f'param-bearing modules, model has {len(ordered_leaves)}')
    flat = flatten_variables(variables)
    out = dict(flat)
    leaf_map = {'kernel': 'weight', 'bias': 'bias', 'scale': 'weight',
                'mean': 'running_mean', 'var': 'running_var'}
    for ours, (tprefix, tgroup) in zip(ordered_leaves, torch_groups):
        matched = False
        for path in flat:
            if '.'.join(path[1:-1]) != ours:
                continue
            tkey = leaf_map[path[-1]]
            if tkey not in tgroup:
                raise ValueError(f'{tprefix} missing {tkey} for {path}')
            value = _to_flax_layout(tgroup[tkey], path, tuple(np.shape(flat[path])))
            if tuple(value.shape) != tuple(np.shape(flat[path])):
                raise ValueError(
                    f'shape mismatch {tprefix}->{ours}: {value.shape} vs '
                    f'{np.shape(flat[path])}')
            out[path] = jnp.asarray(np.ascontiguousarray(value),
                                    dtype=jnp.asarray(flat[path]).dtype)
            matched = True
        if not matched:
            # a typo'd ordered_leaves entry would otherwise leave that leaf
            # randomly initialized and silently consume a torch group
            raise ValueError(
                f'ordered leaf {ours!r} matches no model variable '
                f'(torch group {tprefix!r} would be dropped)')
    return unflatten_variables(out)


def _to_torch_layout(value: np.ndarray, path: Tuple[str, ...]) -> np.ndarray:
    """Inverse of ``_to_flax_layout`` (layout only — inflation/class slicing
    are lossy and stay in their converted form)."""
    if path[-1] == 'kernel':
        if value.ndim == 2:                       # (in, out) -> (out, in)
            return np.transpose(value, (1, 0))
        if value.ndim == 3:                       # (W, in, out) -> (out, in, W)
            return np.transpose(value, (2, 1, 0))
        if value.ndim == 4:                       # HWIO -> OIHW
            return np.transpose(value, (3, 2, 0, 1))
        if value.ndim == 5:                       # THWIO -> OITHW
            return np.transpose(value, (4, 3, 0, 1, 2))
    return value


def to_torch_state_dict(variables: dict,
                        renames: Optional[dict] = None) -> Dict[str, np.ndarray]:
    """Export our variables pytree as a torch-style ``state_dict``
    (numpy float values, torch layouts, torch key names).

    The exact inverse of ``convert_state_dict``'s mechanical rule — leaf
    modules are named with torch prefixes, so a model trained or fine-tuned
    here round-trips into a checkpoint the reference (or any torch codebase
    sharing its naming) can ``load_state_dict`` directly. BN leaves get the
    ``num_batches_tracked`` scalar torch's strict loading expects. bf16
    leaves are widened to float32 (numpy-portable). Not invertible by
    design: ``background_class`` slicing (the 1001st row is gone) and I3D
    inflation (3D kernels export as conv3d weights)."""
    flat = flatten_variables(variables)
    sd: Dict[str, np.ndarray] = {}
    bn_prefixes = set()
    for path, leaf in flat.items():
        tkey = torch_key_for(path, renames)
        if tkey is None:
            continue
        value = np.asarray(leaf)
        if value.dtype not in (np.float32, np.float64, np.int32, np.int64):
            value = value.astype(np.float32)
        sd[tkey] = np.ascontiguousarray(_to_torch_layout(value, path))
        if path[0] == 'batch_stats':
            # the torch BN prefix is whatever torch_key_for produced
            # (exact or regex rename), minus the leaf suffix
            bn_prefixes.add(tkey.rsplit('.', 1)[0] if '.' in tkey else '')
    for tprefix in bn_prefixes:
        key = f'{tprefix}.num_batches_tracked' if tprefix \
            else 'num_batches_tracked'
        sd[key] = np.asarray(0, np.int64)
    return sd


def save_torch_checkpoint(variables: dict, path: str,
                          renames: Optional[dict] = None) -> None:
    """``to_torch_state_dict`` + ``torch.save`` (tensors, plain state_dict
    at top level — the reference's hosted-checkpoint format)."""
    import torch
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in to_torch_state_dict(variables, renames).items()}
    torch.save(sd, path)


def densenet_key_rewrite(key: str) -> str:
    """Dotted-key migration for old densenet checkpoints
    (reference: torchvision_models.py:288-297)."""
    pattern = re.compile(
        r'^(.*denselayer\d+\.(?:norm|relu|conv))\.((?:[12])\.(?:weight|bias|running_mean|running_var))$')
    m = pattern.match(key)
    if m:
        return m.group(1) + m.group(2)
    return key
