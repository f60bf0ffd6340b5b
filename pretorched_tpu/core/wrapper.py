"""PretrainedModel — the public model object of the zoo.

Reproduces the reference's model contract (README.md:413-547,
torchvision_models.py:443-481): ``model(x)``, ``model.features(x)``,
``model.logits(f)``, ``model.last_linear``, and the stamped metadata
attributes ``input_space/input_size/input_range/mean/std`` — over a purely
functional Flax module + param pytree, with jit-compiled apply paths.

TPU-native design:
* modules run channels-last internally; the wrapper converts from the
  reference's channels-first contract at the edge (a single fused transpose
  inside the jitted function);
* compute dtype is switchable (``model.bfloat16()``) while params stay f32;
* every (mode, head, train, format) combination gets one cached jit.

The ``last_linear = Identity()`` feature-extraction trick
(voc2007_extract.py:147) is supported: assigning ``Identity()`` (or ``None``)
drops the final linear from the ``logits`` path.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import Identity


def _replace_dtype(module, dtype):
    """Replace the compute ``dtype`` field on a Flax module AND on any
    module instances stored in its fields (e.g. TRN.base_module — a nested
    backbone constructed before the wrapper's dtype switch; without the
    recursion bfloat16() left such backbones computing in f32: measured
    2x on the TRN bench row)."""
    import flax.linen as nn
    if not dataclasses.is_dataclass(module):
        return module
    updates = {}
    for f in dataclasses.fields(module):
        if f.name == 'dtype':
            updates['dtype'] = dtype
            continue
        v = getattr(module, f.name, None)
        if isinstance(v, nn.Module):
            nv = _replace_dtype(v, dtype)
            if nv is not v:
                updates[f.name] = nv
    return dataclasses.replace(module, **updates) if updates else module


def to_channels_last(x):
    if x.ndim == 3:
        return jnp.transpose(x, (0, 2, 1))
    if x.ndim == 4:
        return jnp.transpose(x, (0, 2, 3, 1))
    if x.ndim == 5:
        return jnp.transpose(x, (0, 2, 3, 4, 1))
    return x


def to_channels_first(x):
    if x.ndim == 3:
        return jnp.transpose(x, (0, 2, 1))
    if x.ndim == 4:
        return jnp.transpose(x, (0, 3, 1, 2))
    if x.ndim == 5:
        return jnp.transpose(x, (0, 4, 1, 2, 3))
    return x


class LinearHead:
    """Read/write view of the model's final linear layer params.

    ``.weight`` is exposed in torch layout ``(out, in)`` for API parity;
    ``.kernel`` is the native flax layout ``(in, out)``.
    """

    def __init__(self, model: 'PretrainedModel', path: str):
        self._model = model
        self._path = path

    def _leaf(self):
        node = self._model.variables['params']
        for k in self._path.split('/'):
            node = node[k]
        return node

    @property
    def kernel(self):
        return self._leaf().get('kernel')

    @property
    def bias(self):
        return self._leaf().get('bias')

    @property
    def weight(self):
        k = self.kernel
        return None if k is None else jnp.transpose(k)

    @property
    def in_features(self):
        return self.kernel.shape[0]

    @property
    def out_features(self):
        return self.kernel.shape[1]

    def __repr__(self):
        k = self.kernel
        return f'LinearHead(path={self._path!r}, in={k.shape[0]}, out={k.shape[1]})'


class PretrainedModel:
    """Stateful convenience wrapper over (flax module, variables)."""

    def __init__(self, name: str, module, variables, settings: Optional[dict] = None,
                 head_path: Optional[str] = 'last_linear',
                 data_format: str = 'channels_first',
                 metadata: Optional[dict] = None):
        self.name = name
        self.module = module
        self.variables = jax.tree_util.tree_map(lambda x: x, dict(variables))
        self.settings = settings
        self.head_path = head_path
        self._head_enabled = head_path is not None
        self.data_format = data_format
        self._jit_cache: Dict[Any, Callable] = {}
        self.training = False
        self._step = 0
        self.torch_renames = None     # set by the factory (export key names)
        # ``settings`` is the loaded-pretrained settings (None for
        # pretrained=None, matching the reference, which stamps metadata only
        # on pretrained loads — torchvision_models.py:162-166). ``metadata``
        # is the registry's default-dataset settings: stamping it regardless
        # means TransformImage(model) always works, an intentional usability
        # improvement over the reference quirk.
        meta = settings if settings is not None else metadata
        if meta is not None:
            self.input_space = meta['input_space']
            self.input_size = meta['input_size']
            self.input_range = meta['input_range']
            self.mean = meta['mean']
            self.std = meta['std']
            if 'scale' in meta:
                self.scale = meta['scale']

    # ------------------------------------------------------------------ heads
    @property
    def last_linear(self):
        if self.head_path is None:
            return None
        if not self._head_enabled:
            return Identity()
        return LinearHead(self, self.head_path)

    @last_linear.setter
    def last_linear(self, value):
        if value is None or isinstance(value, Identity):
            self._head_enabled = False
        elif isinstance(value, LinearHead):
            self._head_enabled = True
            # graft foreign head params into our tree
            self._set_head_params(value.kernel, value.bias)
        else:
            raise TypeError(
                'last_linear can be set to Identity()/None (feature extraction) '
                'or a LinearHead; to change num_classes use reset_classifier().')
        self._jit_cache.clear()

    def _set_head_params(self, kernel, bias):
        node = self.variables['params']
        parts = self.head_path.split('/')
        for k in parts[:-1]:
            node = node[k]
        leaf = dict(node[parts[-1]])
        leaf['kernel'] = jnp.asarray(kernel)
        if bias is not None:
            leaf['bias'] = jnp.asarray(bias)
        node[parts[-1]] = leaf

    def reset_classifier(self, num_classes: int, rng: Optional[jax.Array] = None):
        """Re-initialize the final linear for a new class count (fine-tuning)."""
        if self.head_path is None:
            raise ValueError(f'{self.name} has no linear head')
        head = LinearHead(self, self.head_path)
        in_features = head.in_features
        rng = rng if rng is not None else jax.random.key(0)
        k1, _ = jax.random.split(rng)
        bound = 1.0 / np.sqrt(in_features)
        kernel = jax.random.uniform(k1, (in_features, num_classes), jnp.float32,
                                    -bound, bound)
        bias = jnp.zeros((num_classes,), jnp.float32)
        self._set_head_params(kernel, bias)
        if hasattr(self.module, 'num_classes'):
            self.module = dataclasses.replace(self.module, num_classes=num_classes)
        self._head_enabled = True
        self._jit_cache.clear()

    # ------------------------------------------------------------------ modes
    def train(self):
        self.training = True
        return self

    def eval(self):
        self.training = False
        return self

    def export_torch_state_dict(self):
        """Variables -> torch-style state_dict (numpy values, torch layouts,
        this model's own checkpoint key names) — the inverse of pretrained
        loading, so fine-tuned weights travel back to torch users. See
        ``zoo.convert.to_torch_state_dict`` / ``save_torch_checkpoint``."""
        from ..zoo.convert import to_torch_state_dict
        return to_torch_state_dict(self.variables, renames=self.torch_renames)

    def bfloat16(self):
        """Switch compute dtype to bfloat16 (params stay f32)."""
        self.module = _replace_dtype(self.module, jnp.bfloat16)
        self._jit_cache.clear()
        return self

    def float(self):
        self.module = _replace_dtype(self.module, None)
        self._jit_cache.clear()
        return self

    # ------------------------------------------------------------------ apply
    def _apply_fn(self, mode: str) -> Callable:
        training = self.training
        key = (mode, self._head_enabled, self.data_format, training,
               id(self.module))
        fn = self._jit_cache.get(key)
        if fn is None:
            module = self.module
            head = self._head_enabled
            cf = self.data_format == 'channels_first'

            @jax.jit
            def run(variables, x, rng):
                if cf:
                    x = to_channels_last(x)
                if training:
                    y, updates = module.apply(
                        variables, x, mode=mode, head=head, train=True,
                        mutable=['batch_stats'], rngs={'dropout': rng})
                else:
                    y, updates = module.apply(variables, x, mode=mode,
                                              head=head), None
                if cf and mode == 'features':
                    y = to_channels_first(y)
                return y, updates

            fn = run
            self._jit_cache[key] = fn
        return fn

    def _run(self, mode, x):
        rng = jax.random.fold_in(jax.random.key(0), self._step)
        y, updates = self._apply_fn(mode)(self.variables, jnp.asarray(x), rng)
        if updates:
            # torch-like train(): running BN stats update in place
            self.variables = dict(self.variables, **updates)
        if self.training:
            self._step += 1
        return y

    def features(self, x):
        """Backbone features (channels-first out, matching the reference)."""
        return self._run('features', x)

    def logits(self, features):
        return self._run('logits', features)

    def forward(self, x):
        return self._run('forward', x)

    __call__ = forward

    # ------------------------------------------------------------ functional
    @property
    def params(self):
        return self.variables['params']

    @property
    def batch_stats(self):
        return self.variables.get('batch_stats')

    def apply(self, variables, x, **kwargs):
        """Raw functional apply (channels-last), for training loops/pjit."""
        return self.module.apply(variables, x, **kwargs)

    def num_params(self) -> int:
        return sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(self.variables['params']))

    def __repr__(self):
        return (f'{type(self).__name__}({self.name}, params={self.num_params():,}, '
                f'head={"on" if self._head_enabled else "identity"})')
