"""Video (3D) ResNet family — the backbone of the zoo's video stack.

Reference: pretorched/models/resnet3D.py (+ resnext3D.py, wideresnet3D.py,
pre_act_resnet3D.py, r2plus1d.py which parameterize the same skeleton). One
channels-last (N, T, H, W, C) Flax module covers all five variants:

* stem: 7x7x7 conv, stride (1,2,2), pad 3 (resnet3D.py:153) -> BN -> ReLU ->
  3x3x3/2 pad 1 max pool;
* shortcut type 'A' (resnet3d18/34 Kinetics checkpoints): strided identity +
  zero channel padding (resnet3D.py:65-74) — implemented as a strided slice +
  pad, no parameters;
* ResNeXt3D: grouped 3x3x3 (cardinality 32), expansion 2, stage widths
  128..1024 (resnext3D.py:76-121);
* WideResNet3D: widths x k, expansion 2 (wideresnet3D.py:71-106);
* PreAct: BN->ReLU->conv ordering, no post-add ReLU (pre_act_resnet3D.py);
* R(2+1)D: stem, bottleneck and downsample convs are factored
  spatial(1xkxk)+temporal(kx1x1) pairs with the paper's intermediate-channel
  formula (r2plus1d.py:29-88); BASIC blocks keep plain 3x3x3 convs, exactly
  like the reference (r2plus1d.py:93-95 binds conv3x3x3, not the factored
  conv).

Head: global average pool over (T, H, W) + ``last_linear`` (renamed from
torch's ``fc`` as modify_resnets does). 16-frame 112/224px clips; time is just
another spatial dim for XLA, so the convs tile on the MXU without special
casing.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ..core.registry import image_settings, register_model, register_settings
from ..ops.pooling import global_avg_pool, max_pool
from .layers import batch_norm, conv3d, dense, kaiming_normal_out, relu


def _tup3(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v, v)


_KINETICS = 'kinetics-400'

model_urls = {
    _KINETICS: {
        'resnet3d18': 'http://pretorched-x.csail.mit.edu/models/resnet3d18_kinetics-e9f44270.pth',
        'resnet3d34': 'http://pretorched-x.csail.mit.edu/models/resnet3d34_kinetics-7fed38dd.pth',
        'resnet3d50': 'http://pretorched-x.csail.mit.edu/models/resnet3d50_kinetics-aad059c9.pth',
        'resnet3d101': 'http://pretorched-x.csail.mit.edu/models/resnet3d101_kinetics-8d4c9d63.pth',
        'resnet3d152': 'http://pretorched-x.csail.mit.edu/models/resnet3d152_kinetics-575c47e2.pth',
        'resnext3d101': 'http://pretorched-x.csail.mit.edu/models/resnext3d101_kinetics-8e57b772.pth',
        'wideresnet3d50': 'http://pretorched-x.csail.mit.edu/models/wideresnet3d50_kinetics-52e415d3.pth',
    },
    'moments': {
        'resnet3d50': 'http://pretorched-x.csail.mit.edu/models/resnet3d50_16seg_moments-6eb53860.pth',
    },
}

DATASET_CLASSES = {_KINETICS: 400, 'moments': 339}


def video_settings(names, urls=model_urls):
    """Per-model {dataset: settings} in the reference's schema
    (resnet3D.py:33-55)."""
    out = {}
    for name in names:
        out[name] = {}
        for dataset, n in DATASET_CLASSES.items():
            out[name][dataset] = image_settings(
                urls.get(dataset, {}).get(name), num_classes=n)
    return out


pretrained_settings = video_settings([
    'resnet3d10', 'resnet3d18', 'resnet3d34', 'resnet3d50', 'resnet3d101',
    'resnet3d152', 'resnet3d200'])


class VideoResNet(nn.Module):
    """Channels-last 3D ResNet skeleton shared by all video variants."""

    block: str                    # 'basic' | 'bottleneck'
    layers: Sequence[int]
    num_classes: int = 400
    shortcut_type: str = 'B'
    expansion: int = 4
    width_per_stage: Sequence[int] = (64, 128, 256, 512)
    cardinality: int = 0          # >0: grouped 3x3x3 with resnext mid-width rule
    preact: bool = False
    factored: bool = False        # R(2+1)D spatio-temporal conv factorization
    s2d_stem: bool = False        # fold the stride-(1,2,2) stem via space-to-depth
    remat: Any = False            # True = checkpoint every residual block;
    #                               a tuple of stage idxs (0=layer1..3=layer4)
    #                               remats only those stages (selective)
    dtype: Any = None

    # ------------------------------------------------------------------ convs
    def _conv(self, x, out_ch, kernel, name, stride=1, padding=0, groups=1,
              train=False, plain=False, s2d=False):
        if not self.factored or plain:
            assert not s2d      # non-factored s2d stems fold in __call__
            return conv3d(out_ch, kernel, stride=stride, padding=padding,
                          groups=groups, bias=False, name=name,
                          kernel_init=kaiming_normal_out, dtype=self.dtype)(x)
        # R(2+1)D: 2D spatial conv -> BN -> ReLU -> 1D temporal conv
        # (r2plus1d.py:29-88), intermediate channels per paper §3.5.
        kt, kh, kw = _tup3(kernel)
        st, sh, sw = _tup3(stride)
        pt, ph, pw = _tup3(padding)
        in_ch = x.shape[-1]
        mid = int(math.floor((kt * kh * kw * in_ch * out_ch) /
                             (kh * kw * in_ch + kt * out_ch)))
        if s2d:
            # fold the SPATIAL half via space-to-depth (exact; the stored
            # kernel keeps the plain (1,kh,kw) shape/name, so checkpoints
            # are interchangeable). Only worth it on the 3-channel stem —
            # SpaceToDepthConv hardcodes stride (1,2,2) / pad k//2 / no
            # bias, so assert the call site asked for exactly that.
            from .layers import SpaceToDepthConv
            assert (sh, sw) == (2, 2) and (ph, pw) == (kh // 2, kw // 2) \
                and kh == kw, (kernel, stride, padding)
            x = SpaceToDepthConv(mid, (1, kh, kw), ndim=3, dtype=self.dtype,
                                 name=f'{name}.spatial_conv')(x)
        else:
            x = conv3d(mid, (1, kh, kw), stride=(1, sh, sw),
                       padding=(0, ph, pw), bias=False,
                       name=f'{name}.spatial_conv',
                       kernel_init=kaiming_normal_out, dtype=self.dtype)(x)
        x = batch_norm(train=train, name=f'{name}.bn', dtype=self.dtype)(x)
        x = relu(x)
        return conv3d(out_ch, (kt, 1, 1), stride=(st, 1, 1), padding=(pt, 0, 0),
                      bias=False, name=f'{name}.temporal_conv',
                      kernel_init=kaiming_normal_out, dtype=self.dtype)(x)

    def _downsample(self, x, out_ch, stride, prefix, train):
        if self.shortcut_type == 'A':
            # zero-pad shortcut (resnet3D.py:65-74): avg_pool3d(kernel=1,
            # stride) == strided subsample; then zero-pad new channels.
            s = _tup3(stride)
            out = x[:, ::s[0], ::s[1], ::s[2], :]
            pad = out_ch - out.shape[-1]
            if pad > 0:
                out = jnp.pad(out, [(0, 0)] * 4 + [(0, pad)])
            return out
        out = self._conv(x, out_ch, 1, f'{prefix}.downsample.0', stride=stride,
                         train=train)
        return batch_norm(train=train, name=f'{prefix}.downsample.1',
                          dtype=self.dtype)(out)

    # ----------------------------------------------------------------- blocks
    def _bn(self, x, name, train):
        return batch_norm(train=train, name=name, dtype=self.dtype)(x)

    def _basic(self, x, planes, stride, down, prefix, train):
        identity = x
        if self.preact:
            out = relu(self._bn(x, f'{prefix}.bn1', train))
            out = self._conv(out, planes, 3, f'{prefix}.conv1', stride=stride,
                             padding=1, train=train, plain=True)
            out = relu(self._bn(out, f'{prefix}.bn2', train))
            out = self._conv(out, planes, 3, f'{prefix}.conv2', padding=1,
                             train=train, plain=True)
            if down:
                identity = self._downsample(x, planes, stride, prefix, train)
            return out + identity
        out = self._conv(x, planes, 3, f'{prefix}.conv1', stride=stride,
                         padding=1, train=train, plain=True)
        out = relu(self._bn(out, f'{prefix}.bn1', train))
        out = self._conv(out, planes, 3, f'{prefix}.conv2', padding=1,
                         train=train, plain=True)
        out = self._bn(out, f'{prefix}.bn2', train)
        if down:
            identity = self._downsample(x, planes, stride, prefix, train)
        return relu(out + identity)

    def _bottleneck(self, x, planes, stride, down, prefix, train):
        identity = x
        out_ch = planes * self.expansion
        if self.cardinality:
            mid = self.cardinality * (planes // 32)
            groups = self.cardinality
        else:
            mid = planes
            groups = 1
        if self.preact:
            out = relu(self._bn(x, f'{prefix}.bn1', train))
            out = self._conv(out, mid, 1, f'{prefix}.conv1', train=train)
            out = relu(self._bn(out, f'{prefix}.bn2', train))
            out = self._conv(out, mid, 3, f'{prefix}.conv2', stride=stride,
                             padding=1, groups=groups, train=train)
            out = relu(self._bn(out, f'{prefix}.bn3', train))
            out = self._conv(out, out_ch, 1, f'{prefix}.conv3', train=train)
            if down:
                identity = self._downsample(x, out_ch, stride, prefix, train)
            return out + identity
        out = self._conv(x, mid, 1, f'{prefix}.conv1', train=train)
        out = relu(self._bn(out, f'{prefix}.bn1', train))
        out = self._conv(out, mid, 3, f'{prefix}.conv2', stride=stride,
                         padding=1, groups=groups, train=train)
        out = relu(self._bn(out, f'{prefix}.bn2', train))
        out = self._conv(out, out_ch, 1, f'{prefix}.conv3', train=train)
        out = self._bn(out, f'{prefix}.bn3', train)
        if down:
            identity = self._downsample(x, out_ch, stride, prefix, train)
        return relu(out + identity)

    def _remat_stages(self):
        """Stages (0-based: layer1..layer4) whose blocks rematerialize.
        ``remat=True`` -> all four; a tuple like ``(0,)`` -> selective
        remat of only those stages' blocks (e.g. stem+layer1, the stage the
        r4 grad roofline charged with the worst bwd roofline% — recompute
        only where the activation working set is largest)."""
        if self.remat is True:
            return (0, 1, 2, 3)
        if not self.remat:
            return ()
        return tuple(self.remat)

    def _block_fn(self, rematted: bool = False):
        """The residual-block function, optionally rematerialized per block:
        backprop then stores only block INPUTS and recomputes each block's
        interior (~4/3x FLOPs for ~a block's depth less activation HBM) —
        this is what lets long clips / big batches train. Checkpointing the
        WHOLE forward instead saves nothing: the rematted backward still
        materializes every intermediate at once."""
        raw = (type(self)._basic if self.block == 'basic'
               else type(self)._bottleneck)
        if rematted:
            raw = nn.remat(raw, static_argnums=(2, 3, 4, 5, 6))
        return raw.__get__(self)

    # ---------------------------------------------------------------- forward
    @nn.compact
    def __call__(self, x, mode: str = 'forward', head: bool = True,
                 train: bool = False, stage_slice=None):
        """``stage_slice=(lo, hi)`` runs only pipeline segments lo..hi-1 of
        [stem+layer1, layer2, layer3, layer4+pool+head] — the static split
        used by ``parallel.pipeline.pipeline_apply_stages`` to place the
        net's four resolution stages on a 'stage' mesh axis. ``None`` (the
        default) is the full forward; composing the four slices is
        numerically identical to it (same modules, same order)."""
        lo, hi = (0, 4) if stage_slice is None else stage_slice
        remat_stages = self._remat_stages()
        block_fns = {False: self._block_fn(False)}
        if remat_stages:
            block_fns[True] = self._block_fn(True)
        if mode in ('forward', 'features'):
            if lo == 0:
                if self.s2d_stem and not self.factored:
                    from .layers import SpaceToDepthConv
                    x = SpaceToDepthConv(64, 7, ndim=3, dtype=self.dtype,
                                         name='conv1')(x)
                else:
                    # factored (R(2+1)D) stems fold their spatial half when
                    # s2d_stem is set — the 3-channel input is the MXU-lane
                    # waster; the (kt,1,1) temporal conv is unaffected
                    x = self._conv(x, 64, 7, 'conv1', stride=(1, 2, 2),
                                   padding=3, train=train, s2d=self.s2d_stem)
                x = relu(self._bn(x, 'bn1', train))
                x = max_pool(x, 3, 2, 1)
            inplanes = 64
            for stage, (planes, blocks, stride) in enumerate(
                    zip(self.width_per_stage, self.layers, (1, 2, 2, 2)), start=1):
                for i in range(blocks):
                    s = stride if i == 0 else 1
                    down = s != 1 or inplanes != planes * self.expansion
                    if lo <= stage - 1 < hi:
                        fn = block_fns[stage - 1 in remat_stages]
                        x = fn(x, planes, s, down, f'layer{stage}.{i}',
                               train)
                    inplanes = planes * self.expansion
            if mode == 'features' or hi < 4:
                return x
        if mode in ('forward', 'logits'):
            x = global_avg_pool(x)
            if head:
                x = dense(self.num_classes, name='last_linear', dtype=self.dtype)(x)
        return x


TORCH_RENAMES = {'last_linear': 'fc'}

# pipeline split points of ``stage_slice`` (see __call__): top-level flat
# param names belonging to each of the four 'stage'-axis segments
PIPELINE_STAGE_PREFIXES = (('conv1', 'bn1', 'layer1'), ('layer2',),
                           ('layer3',), ('layer4', 'last_linear'))


def split_stage_variables(variables):
    """Partition a VideoResNet variable tree into the four pipeline stages'
    subtrees (by the flat torch-style top-level names), for
    ``parallel.pipeline.pipeline_apply_stages``."""
    out = []
    for prefixes in PIPELINE_STAGE_PREFIXES:
        sub = {}
        for coll, tree in variables.items():
            keep = {k: v for k, v in tree.items()
                    if k.split('.')[0] in prefixes}
            if keep:
                sub[coll] = keep
        out.append(sub)
    return out


def pipeline_stage_fns(module):
    """The four ``(stage_variables, x) -> y`` callables matching
    ``split_stage_variables`` — each applies one resolution stage via
    ``stage_slice``; composed in order they equal the full forward."""
    def make(lo, hi):
        def fn(variables, h):
            return module.apply(variables, h, stage_slice=(lo, hi))
        return fn
    return [make(i, i + 1) for i in range(4)]

CONFIGS = {
    'resnet3d10': ('basic', (1, 1, 1, 1)),
    'resnet3d18': ('basic', (2, 2, 2, 2)),
    'resnet3d34': ('basic', (3, 4, 6, 3)),
    'resnet3d50': ('bottleneck', (3, 4, 6, 3)),
    'resnet3d101': ('bottleneck', (3, 4, 23, 3)),
    'resnet3d152': ('bottleneck', (3, 8, 36, 3)),
    'resnet3d200': ('bottleneck', (3, 24, 36, 3)),
}


def get_fine_tuning_parameter_names(ft_begin_index: int):
    """Names of param-tree prefixes to fine-tune (reference:
    resnet3D.py:221-239): layers >= ft_begin_index plus the classifier.
    Returns None for ft_begin_index == 0 (train everything)."""
    if ft_begin_index == 0:
        return None
    names = [f'layer{i}' for i in range(ft_begin_index, 5)]
    names.append('last_linear')
    return names


def _build(name, num_classes, pretrained, shortcut_type, converter_opts=None,
           frames=16):
    from ..core.factory import build_model
    block, layers = CONFIGS[name]
    module = VideoResNet(block=block, layers=layers, num_classes=num_classes,
                         shortcut_type=shortcut_type,
                         expansion=1 if block == 'basic' else 4)
    return build_model(name, module, pretrained_settings, num_classes,
                       pretrained, torch_renames=TORCH_RENAMES, video=True,
                       converter_opts=converter_opts,
                       input_shape=(1, frames, 112, 112, 3))


def _factory(name, default_nc=400, default_pt=_KINETICS, shortcut='B'):
    def fn(num_classes: int = default_nc, pretrained: str = default_pt,
           shortcut_type: str = shortcut):
        return _build(name, num_classes, pretrained, shortcut_type)
    fn.__name__ = name
    fn.__doc__ = f'Constructs a {name} video model.'
    return register_model(fn, name=name)


resnet3d10 = _factory('resnet3d10', default_pt=None)
resnet3d18 = _factory('resnet3d18', shortcut='A')
resnet3d34 = _factory('resnet3d34', shortcut='A')
resnet3d50 = _factory('resnet3d50')
resnet3d101 = _factory('resnet3d101')
resnet3d152 = _factory('resnet3d152')
resnet3d200 = _factory('resnet3d200', default_pt=None)


@register_model
def resneti3d50(num_classes: int = 339, pretrained: str = 'moments'):
    """ResNet3D-50 bootstrapped by inflating 2D resnet50 weights over time
    (reference: resnet3D.py:311-318 + torchvision_models.py:170-191)."""
    from ..core.factory import build_model
    from .resnet import pretrained_settings as resnet2d_settings
    module = VideoResNet(block='bottleneck', layers=(3, 4, 6, 3),
                         num_classes=num_classes)
    settings_map = {'resneti3d50': resnet2d_settings['resnet50']}
    return build_model('resneti3d50', module, settings_map, num_classes,
                       pretrained, torch_renames=TORCH_RENAMES, video=True,
                       input_shape=(1, 16, 112, 112, 3))


register_settings(pretrained_settings)
