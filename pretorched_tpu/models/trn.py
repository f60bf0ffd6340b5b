"""Temporal Relation Networks.

Reference: pretorched/models/trn.py. A 2D backbone runs per-frame; relation
heads reason over ordered frame-feature subsets:

* ``Relation`` (:20-56): MLP over the concatenation of n ordered frames;
* ``MultiScaleRelation`` (:59-113): sums relations over random subsets of
  k-frame combinations for every scale k in [n..2] — the reference draws the
  subsets with np.random.choice inside forward; here the sampling is an
  explicit JAX PRNG stream (rng collection 'relation_sample'), deterministic
  (first-k combinations) when no rng is provided;
* ``HierarchicalRelation`` (:116-159) and ``MultiScaleHierarchicalRelation``
  (:162-189): recursive neighborhood relations;
* ``TRN`` (:192-343): per-frame backbone (head dropped), partial-BN freeze
  handled in the training policy below, LR groups via
  ``get_optim_policy_groups``.

The reference's trn factory is unloadable as shipped (imports the upstream
``pretrainedmodels`` package and carries an empty moments URL — trn.py:8,13,
SURVEY §2.6); we provide the working capability.
"""

from __future__ import annotations

import itertools
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core.registry import image_settings, register_model, register_settings
from .layers import dense, dropout, relu

pretrained_settings = {
    'trn': {
        'moments': image_settings('', num_classes=339),  # URL empty in reference (trn.py:13)
    }
}


class Relation(nn.Module):
    """MLP over n concatenated ordered inputs (reference: trn.py:20-56).

    input (..., num_inputs, in_features) -> (batch, -1, out_features)."""

    num_inputs: int
    in_features: int
    out_features: int
    bottleneck_dim: int = 512
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        batch = x.shape[0]
        h = x.reshape(-1, self.num_inputs * self.in_features)
        h = relu(h)
        h = dense(self.bottleneck_dim, name='relate.1', dtype=self.dtype)(h)
        h = relu(h)
        h = dense(self.out_features, name='relate.3', dtype=self.dtype)(h)
        return h.reshape(batch, -1, self.out_features)


class MultiScaleRelation(nn.Module):
    """Sum of subsampled k-frame relations for k = n..2 (trn.py:59-113)."""

    num_inputs: int
    in_features: int
    out_features: int
    bottleneck_dim: int = 512
    num_relations: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        import numpy as np
        scales = list(range(self.num_inputs, 1, -1))
        batch = x.shape[0]
        total = None
        for si, scale in enumerate(scales):
            combos = np.array(list(itertools.combinations(
                range(self.num_inputs), scale)), np.int32)   # (m, scale)
            k = min(self.num_relations, len(combos))
            if self.has_rng('relation_sample'):
                # jit-safe analog of the reference's np.random.choice
                # (trn.py:100-110): traced gather over the combination table.
                rng = self.make_rng('relation_sample')
                idx = jax.random.choice(rng, combos.shape[0], (k,),
                                        replace=False)
            else:
                idx = jnp.arange(k)
            sel = jnp.take(jnp.asarray(combos), idx, axis=0)  # (k, scale)
            gathered = jnp.take(x, sel.reshape(-1), axis=-2)
            gathered = gathered.reshape(
                x.shape[:-2] + (k, scale, x.shape[-1]))
            rel = Relation(scale, self.in_features, self.out_features,
                           self.bottleneck_dim, dtype=self.dtype,
                           name=f'relations.{si}')
            out = rel(gathered)                               # (b, ..k.., out)
            out = jnp.sum(out, axis=1, keepdims=True)         # sum over combos
            total = out if total is None else total + out
        return total.reshape(batch, -1, self.out_features)


class HierarchicalRelation(nn.Module):
    """Recursive neighborhood relations (trn.py:116-159).

    The reference's forward crashes as shipped: ``torch.stack(outs)`` over
    per-level tensors of differing window counts (a leftover singleton dim
    defeats the intended ``.sum(-2)`` window reduction) — verified by
    executing its semantics verbatim. This implements the evident intent:
    reduce each level's linear over its windows, mean over levels."""

    num_inputs: int
    in_features: int
    out_features: int
    relation_size: int = 4
    relation_dist: int = 1
    bottleneck_dim: int = 1024
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        import numpy as np
        depth = int(np.ceil((self.num_inputs - self.relation_size)
                            / (self.relation_size - 1)))
        num_final = self.num_inputs + depth * (1 - self.relation_size)
        x = x.reshape(-1, self.num_inputs, self.in_features)
        outs = []
        for d in range(depth):
            n = x.shape[1]
            idxs = list(zip(*[range(i, n) for i in range(self.relation_size)]))
            rel = Relation(self.relation_size, self.in_features,
                           self.in_features, dtype=self.dtype,
                           name=f'relations.{d}')
            x = jnp.stack([rel(x[:, list(i), :])[:, 0] for i in idxs], axis=1)
            lin = dense(self.out_features, name=f'linears.{d}',
                        dtype=self.dtype)(x)
            outs.append(jnp.sum(lin, axis=-2))
        final = Relation(num_final, self.in_features, self.out_features,
                         dtype=self.dtype, name='final_relation')(x)[:, 0]
        outs.append(final)
        return jnp.mean(jnp.stack(outs), axis=0)


class MultiScaleHierarchicalRelation(nn.Module):
    """(trn.py:162-189)."""

    num_inputs: int
    in_features: int
    out_features: int
    relation_dist: int = 1
    bottleneck_dim: int = 512
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        scales = list(range(self.num_inputs, 1, -1))
        x = x.reshape(-1, self.num_inputs, self.in_features)
        houts = []
        for si, scale in enumerate(scales):
            h = HierarchicalRelation(
                self.num_inputs, self.in_features, self.out_features,
                relation_size=scale, relation_dist=self.relation_dist,
                bottleneck_dim=self.bottleneck_dim, dtype=self.dtype,
                name=f'h_relations.{si}')(x)
            houts.append(h.reshape(-1, self.out_features))
        h = jnp.stack(houts, axis=1)
        out = Relation(len(scales), self.out_features, self.out_features,
                       self.bottleneck_dim, dtype=self.dtype,
                       name='final_relation')(h)
        return out[:, 0]


_CONSENSUS = {
    'TRN': Relation,
    'HTRN': HierarchicalRelation,
    'MSTRN': MultiScaleRelation,
    'MSHTRN': MultiScaleHierarchicalRelation,
}


class TRN(nn.Module):
    """Per-frame 2D backbone + temporal relation head (trn.py:192-343)."""

    base_module: nn.Module
    frame_feature_dim: int
    num_classes: int
    num_segments: int = 8
    consensus: str = 'MSTRN'
    video_feature_dim: int = 1024
    frame_bottleneck_dim: int = 1024
    dropout_rate: float = 0.5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mode: str = 'forward', head: bool = True,
                 train: bool = False):
        # x: (N, T, H, W, C) channels-last frames
        if mode in ('forward', 'features'):
            b = x.shape[0]
            frames = x.reshape((-1,) + x.shape[2:])
            feats = self.base_module(frames, mode='forward', head=False,
                                     train=train)
            # base.last_linear was replaced by Dropout in the reference
            feats = dropout(self.dropout_rate, train=train)(feats)
            feats = feats.reshape(b, -1, self.num_segments, feats.shape[-1])
            cls = _CONSENSUS[self.consensus]
            kw = dict(num_inputs=self.num_segments,
                      in_features=self.frame_feature_dim,
                      out_features=self.video_feature_dim,
                      bottleneck_dim=self.frame_bottleneck_dim,
                      dtype=self.dtype, name='temporal_relation')
            rel = cls(**kw)
            x = rel(feats)          # relation over the last two dims
            x = x.reshape(b, -1)    # the reference's .squeeze()
            if mode == 'features':
                return x
        if mode in ('forward', 'logits'):
            if head:
                x = dense(self.num_classes, name='last_linear', dtype=self.dtype)(x)
        return x


def get_optim_policy_groups():
    """LR/decay multiplier groups mirroring trn.py:287-330."""
    return [
        {'match': 'first_conv_weight', 'lr_mult': 1, 'decay_mult': 1},
        {'match': 'first_conv_bias', 'lr_mult': 2, 'decay_mult': 0},
        {'match': 'normal_weight', 'lr_mult': 1, 'decay_mult': 1},
        {'match': 'normal_bias', 'lr_mult': 2, 'decay_mult': 0},
        {'match': 'bn', 'lr_mult': 1, 'decay_mult': 0},
    ]


@register_model
def trn(num_classes: int = 339, num_segments: int = 8, consensus: str = 'MSTRN',
        arch: str = 'resnet50', pretrained=None,
        frame_bottleneck_dim: int = 1024, video_feature_dim: int = 1024):
    """TRN over a 2D backbone from this zoo's registry."""
    import numpy as np

    from ..core.factory import init_variables
    from ..core.registry import MODEL_REGISTRY
    from ..core.wrapper import PretrainedModel

    num_pc = 1000 if pretrained == 'imagenet' else 339
    base_pretrained = pretrained if pretrained in ('imagenet', 'moments') else None
    base = MODEL_REGISTRY[arch](num_classes=num_pc, pretrained=base_pretrained)
    # frame feature dim = backbone head input width
    frame_dim = base.last_linear.in_features if base.head_path else None
    module = TRN(base_module=base.module, frame_feature_dim=frame_dim,
                 num_classes=num_classes, num_segments=num_segments,
                 consensus=consensus, video_feature_dim=video_feature_dim,
                 frame_bottleneck_dim=frame_bottleneck_dim)
    variables = init_variables(module, (1, num_segments, 64, 64, 3))
    # graft the (possibly pretrained) backbone params into our tree
    for coll in variables:
        if coll in base.variables and 'base_module' in variables[coll]:
            variables[coll]['base_module'] = base.variables[coll]
    settings = dict(pretrained_settings['trn'].get(pretrained, {})) or None
    model = PretrainedModel('trn', module, variables, settings)
    model.input_ndim = 5
    if settings is None and getattr(base, 'input_size', None) is not None:
        # TRN inherits preprocessing metadata from its backbone
        # (trn.py:213-216); the backbone carries stamped registry metadata
        # even when built with pretrained=None (core/factory.py), so
        # TransformImage(trn_model) always works too.
        for attr in ('input_space', 'input_size', 'input_range', 'mean', 'std'):
            setattr(model, attr, getattr(base, attr))
    return model


register_settings(pretrained_settings, in_settings_registry=False)
