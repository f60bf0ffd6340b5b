"""SlowFast networks.

Reference: pretorched/models/slowfast.py. Two pathways over the same clip:
Fast (stride 2, 8-channel stem, temporal 3x1x1 'head' convs everywhere) feeds
the Slow pathway (stride 16, 64-channel stem, spatial-only convs until res4)
through four time-strided lateral convs concatenated into the slow stream
(:273-296, :138-155); heads concatenate [slow, fast] -> dropout ->
bias-free last_linear (:371-396). Modes: 'sf' (both), 's' (SlowOnly), 'f'
(FastOnly) (:578-612). No hosted weights in the reference.

Parity notes: block 'head_conv' selects temporal (3,1,1) vs pointwise conv1
(:13-26, :62-68); res3 stride is 2 only for bottlenecks (:126-128); basic
blocks put the spatial stride on conv2 (with bias), bottlenecks on conv2
bias-free. The temporal subsampling ``input[:, :, ::stride]`` is a static
strided slice under jit.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ..core.registry import register_model
from ..ops.pooling import global_avg_pool, max_pool
from .layers import batch_norm, conv3d, dense, dropout, relu


class SlowFast(nn.Module):
    block: str = 'bottleneck'            # 'basic' | 'bottleneck'
    layers: Sequence[int] = (3, 4, 6, 3)
    num_classes: int = 400
    mode: str = 'sf'                     # 'sf' | 's' | 'f'
    dropout_rate: float = 0.5
    slow_stride: int = 16
    fast_stride: int = 2
    s2d_stem: bool = False        # fold both pathways' stride-(1,2,2) stems
    fused_blocks: int = 0         # eval-only Pallas fused bottleneck tails
    #                               for stride-1 blocks with planes <= this
    #                               (the C<=32 HBM-bound fast pathway; 0=off)
    dtype: Any = None

    @property
    def expansion(self):
        return 4 if self.block == 'bottleneck' else 1

    def _cbr(self, x, ch, kernel, name, stride=1, padding=0, bias=False,
             train=False, act=True, s2d=False):
        if s2d:
            # exact space-to-depth folding of the stride-(1,2,2) stem
            # (ops/space_to_depth.py): same stored kernel, same math,
            # 4x better MXU lane use on the 3-channel input.
            # SpaceToDepthConv hardcodes this geometry — assert the call
            # site actually asked for it rather than silently ignoring
            # stride/padding/bias.
            kt, kh, kw = kernel
            assert stride == (1, 2, 2) and not bias and \
                padding == (kt // 2, kh // 2, kw // 2), (
                    kernel, stride, padding, bias)
            from .layers import SpaceToDepthConv
            x = SpaceToDepthConv(ch, kernel, ndim=3, dtype=self.dtype,
                                 name=name)(x)
        else:
            x = conv3d(ch, kernel, stride=stride, padding=padding, bias=bias,
                       name=name, dtype=self.dtype)(x)
        x = batch_norm(train=train, name=name.replace('conv', 'bn'),
                       dtype=self.dtype)(x)
        return relu(x) if act else x

    def _fused_tail(self, y1, x, down, prefix):
        """Eval-only Pallas fused bottleneck tail (ops/pallas/fused_block):
        conv2(1,3,3)+bn2+relu -> conv3+bn3 -> +residual -> relu in ONE
        kernel, y2/y3 never touching HBM. BN folded to affine from the
        running stats read directly off this scope's variable tree (the
        flat torch-style naming makes the subtrees addressable)."""
        import jax

        from ..ops.pallas.fused_block import fold_bn, fused_bottleneck_tail

        def g(n, col='params'):
            return self.get_variable(col, f'{prefix}.{n}')

        def folded(n):
            p, s = g(n), g(n, 'batch_stats')
            return jnp.stack(fold_bn(p['scale'], p['bias'],
                                     s['mean'], s['var']))

        w2 = g('conv2')['kernel'][0]                  # (3,3,Cm,Cm)
        w3 = g('conv3')['kernel'][0, 0, 0]            # (Cm,Cout)
        wp = ap = None
        if down:
            wp = g('downsample.0')['kernel'][0, 0, 0]
            ap = folded('downsample.1')
        return fused_bottleneck_tail(
            y1, x, w2, folded('bn2'), w3, folded('bn3'), wp, ap,
            interpret=jax.default_backend() != 'tpu')

    def _can_fuse(self, planes, stride, train, prefix):
        return (self.fused_blocks and planes <= self.fused_blocks
                and stride == 1 and not train and self.block != 'basic'
                and not self.is_initializing()
                and self.get_variable('params', f'{prefix}.conv2')
                is not None)

    def _block(self, x, planes, stride, down, prefix, head_conv, train):
        identity = x
        dt = self.dtype
        if self.block == 'basic':
            if head_conv == 1:
                out = conv3d(planes, (1, 3, 3), stride=(1, stride, stride),
                             padding=(0, 1, 1), bias=False,
                             name=f'{prefix}.conv1', dtype=dt)(x)
            else:
                out = conv3d(planes, (3, 1, 1), padding=(1, 0, 0), bias=False,
                             name=f'{prefix}.conv1', dtype=dt)(x)
            out = relu(batch_norm(train=train, name=f'{prefix}.bn1', dtype=dt)(out))
            # reference quirk: basic conv2 carries the stride and a bias
            s2 = (1, stride, stride) if head_conv == 3 else (1, 1, 1)
            out = conv3d(planes, (1, 3, 3), stride=s2, padding=(0, 1, 1),
                         name=f'{prefix}.conv2', dtype=dt)(out)
            out = batch_norm(train=train, name=f'{prefix}.bn2', dtype=dt)(out)
        else:
            if head_conv == 1:
                out = conv3d(planes, 1, bias=False, name=f'{prefix}.conv1',
                             dtype=dt)(x)
            else:
                out = conv3d(planes, (3, 1, 1), padding=(1, 0, 0), bias=False,
                             name=f'{prefix}.conv1', dtype=dt)(x)
            out = relu(batch_norm(train=train, name=f'{prefix}.bn1', dtype=dt)(out))
            if self._can_fuse(planes, stride, train, prefix):
                return self._fused_tail(out, x, down, prefix)
            out = conv3d(planes, (1, 3, 3), stride=(1, stride, stride),
                         padding=(0, 1, 1), bias=False, name=f'{prefix}.conv2',
                         dtype=dt)(out)
            out = relu(batch_norm(train=train, name=f'{prefix}.bn2', dtype=dt)(out))
            out = conv3d(planes * 4, 1, bias=False, name=f'{prefix}.conv3',
                         dtype=dt)(out)
            out = batch_norm(train=train, name=f'{prefix}.bn3', dtype=dt)(out)
        if down:
            identity = conv3d(planes * self.expansion, 1,
                              stride=(1, stride, stride), bias=False,
                              name=f'{prefix}.downsample.0', dtype=dt)(x)
            identity = batch_norm(train=train, name=f'{prefix}.downsample.1',
                                  dtype=dt)(identity)
        return relu(out + identity)

    def _stage(self, x, prefix, planes, blocks, stride, head_conv, inplanes,
               train):
        for i in range(blocks):
            s = stride if i == 0 else 1
            down = s != 1 or inplanes != planes * self.expansion
            x = self._block(x, planes, s, down, f'{prefix}.{i}', head_conv, train)
            inplanes = planes * self.expansion
        return x, inplanes

    def _lateral(self, x, ch, name):
        return conv3d(ch * 2, (5, 1, 1), stride=(8, 1, 1), padding=(2, 0, 0),
                      bias=False, name=name, dtype=self.dtype)(x)

    def _fast(self, x, train, laterals: bool):
        p = 'fast'
        if self.s2d_stem and x.shape[-3] % 4 == 0 and x.shape[-2] % 4 == 0:
            # fold-4 stem: the 8-channel fast stem is MXU-lane-starved at
            # fold-2 (8/128 output lanes); fold-4 packs the 2x2 output
            # parities into channels (exact math, weights re-indexed).
            # Measured v5e b128 T32 224px: stem+pool 39.3 -> 31.8 ms
            # (tools/stem_probe.py; applying the pool in the folded layout
            # measured SLOWER — 34.5 ms — so the conv depth-to-spaces back
            # and BN/ReLU/pool run on the natural layout).
            from .layers import SpaceToDepthConv
            x = SpaceToDepthConv(8, (5, 7, 7), ndim=3, fold=4,
                                 dtype=self.dtype, name=f'{p}.conv1')(x)
            x = batch_norm(train=train, name=f'{p}.bn1', dtype=self.dtype)(x)
            x = relu(x)
        else:
            x = self._cbr(x, 8, (5, 7, 7), f'{p}.conv1', stride=(1, 2, 2),
                          padding=(2, 3, 3), train=train, s2d=self.s2d_stem)
        x = max_pool(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        lat = []
        if laterals:
            lat.append(self._lateral(x, 8, f'{p}.lateral_p1'))
        res3_stride = 2 if self.block == 'bottleneck' else 1
        inp = 8
        x, inp = self._stage(x, f'{p}.res2', 8, self.layers[0], 1, 3, inp, train)
        if laterals:
            lat.append(self._lateral(x, inp, f'{p}.lateral_res2'))
        x, inp = self._stage(x, f'{p}.res3', 16, self.layers[1], res3_stride, 3,
                             inp, train)
        if laterals:
            lat.append(self._lateral(x, inp, f'{p}.lateral_res3'))
        x, inp = self._stage(x, f'{p}.res4', 32, self.layers[2], 2, 3, inp, train)
        if laterals:
            lat.append(self._lateral(x, inp, f'{p}.lateral_res4'))
        x, inp = self._stage(x, f'{p}.res5', 64, self.layers[3], 2, 3, inp, train)
        return global_avg_pool(x), lat

    def _slow(self, x, lateral, train):
        p = 'slow'
        x = self._cbr(x, 64, (1, 7, 7), f'{p}.conv1', stride=(1, 2, 2),
                      padding=(0, 3, 3), train=train, s2d=self.s2d_stem)
        x = max_pool(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        res3_stride = 2 if self.block == 'bottleneck' else 1
        fuse = lateral is not None
        if fuse:
            x = jnp.concatenate([x, lateral[0]], axis=-1)
        inp = x.shape[-1]
        x, inp = self._stage(x, f'{p}.res2', 64, self.layers[0], 1, 1, inp, train)
        if fuse:
            x = jnp.concatenate([x, lateral[1]], axis=-1)
            inp = x.shape[-1]
        x, inp = self._stage(x, f'{p}.res3', 128, self.layers[1], res3_stride, 1,
                             inp, train)
        if fuse:
            x = jnp.concatenate([x, lateral[2]], axis=-1)
            inp = x.shape[-1]
        x, inp = self._stage(x, f'{p}.res4', 256, self.layers[2], 2, 3, inp, train)
        if fuse:
            x = jnp.concatenate([x, lateral[3]], axis=-1)
            inp = x.shape[-1]
        x, inp = self._stage(x, f'{p}.res5', 512, self.layers[3], 2, 3, inp, train)
        return global_avg_pool(x)

    @nn.compact
    def __call__(self, x, mode: str = 'forward', head: bool = True,
                 train: bool = False):
        # x: (N, T, H, W, C) channels-last
        m = self.mode.lower()
        if mode in ('forward', 'features'):
            if m == 'f':
                feats, _ = self._fast(x[:, ::self.fast_stride], train,
                                      laterals=False)
            elif m == 's':
                feats = self._slow(x[:, ::self.slow_stride], None, train)
            else:
                fast, lateral = self._fast(x[:, ::self.fast_stride], train,
                                           laterals=True)
                slow = self._slow(x[:, ::self.slow_stride], lateral, train)
                feats = jnp.concatenate([slow, fast], axis=-1)
            if mode == 'features':
                return feats
            x = feats
        if mode in ('forward', 'logits'):
            x = dropout(self.dropout_rate, train=train)(x)
            if head:
                x = dense(self.num_classes, bias=(m != 'sf'),
                          name='last_linear', dtype=self.dtype)(x)
        return x


def SlowFastV0(block: str = 'bottleneck', layers=(3, 4, 6, 3),
               num_classes: int = 10, dropout: float = 0.5, **kwargs):
    """The reference's monolithic variant (slowfast.py:399-575) — the same
    two-pathway network with flat attribute naming and a fixed res3 stride;
    for the bottleneck configs it is built with, the compute graph matches
    ``SlowFast(mode='sf')``, which we return. No hosted weights exist for
    either variant."""
    return SlowFast(block=block, layers=layers, num_classes=num_classes,
                    mode='sf', dropout_rate=dropout, **kwargs)


_LAYERS = {
    'resnet18': ('basic', (2, 2, 2, 2)),
    'resnet50': ('bottleneck', (3, 4, 6, 3)),
    'resnet101': ('bottleneck', (3, 4, 23, 3)),
    'resnet152': ('bottleneck', (3, 8, 36, 3)),
    'resnet200': ('bottleneck', (3, 24, 36, 3)),
}


def _factory(short):
    def fn(mode: str = 'SF', num_classes: int = 400, pretrained=None,
           dropout: float = 0.5, **kwargs):
        from ..core.factory import build_model
        block, layers = _LAYERS[short]
        module = SlowFast(block=block, layers=layers, num_classes=num_classes,
                          mode=mode.lower(), dropout_rate=dropout, **kwargs)
        name = f'slowfast_{short}'
        return build_model(name, module, {name: {}}, num_classes, pretrained,
                           video=True, input_shape=(1, 32, 64, 64, 3))
    fn.__name__ = short
    fn.__doc__ = (f'SlowFast {short}: mode "sf" (two-pathway), '
                  f'"s" (SlowOnly), "f" (FastOnly).')
    return fn


resnet18 = _factory('resnet18')
resnet50 = _factory('resnet50')
resnet101 = _factory('resnet101')
resnet152 = _factory('resnet152')
resnet200 = _factory('resnet200')

register_model(resnet18, name='slowfast_resnet18')
register_model(resnet50, name='slowfast_resnet50')
register_model(resnet101, name='slowfast_resnet101')
register_model(resnet152, name='slowfast_resnet152')
register_model(resnet200, name='slowfast_resnet200')
