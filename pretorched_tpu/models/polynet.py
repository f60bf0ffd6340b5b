"""PolyNet.

Reference: pretorched/models/polynet.py. Inception-ResNet blocks composed
into 2-way (two parallel blocks summed into the residual) and poly-3 modules
(three *sequential* applications sharing conv weights but each with its own
BatchNorm — PolyConv2d, polynet.py:41-65); per-module residual scales decay
linearly 1 -> 0.7 across the net. Eval resize 378 -> center 331 crop
(README.md:276). Head: 9x9 avg pool -> dropout(0.2) -> last_linear(2048).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..core.registry import image_settings, register_model, register_settings
from ..ops.pooling import avg_pool, max_pool
from .layers import batch_norm, conv2d, dense, dropout, relu

pretrained_settings = {
    'polynet': {
        'imagenet': image_settings(
            'http://data.lip6.fr/cadene/pretrainedmodels/polynet-f71d82a5.pth',
            input_size=(3, 331, 331)),
    }
}

_A_SCALES = (1, 0.992308, 0.984615, 0.976923, 0.969231, 0.961538, 0.953846,
             0.946154, 0.938462, 0.930769)
_B_SCALES = (0.923077, 0.915385, 0.907692, 0.9, 0.892308, 0.884615, 0.876923,
             0.869231, 0.861538, 0.853846, 0.846154, 0.838462, 0.830769,
             0.823077, 0.815385, 0.807692, 0.8, 0.792308, 0.784615, 0.776923)
_C_SCALES = (0.769231, 0.761538, 0.753846, 0.746154, 0.738462, 0.730769,
             0.723077, 0.715385, 0.707692, 0.7)


class PolyNet(nn.Module):
    num_classes: int = 1000
    dtype: Any = None

    def _bc(self, x, out_ch, kernel, name, stride=1, padding=0, train=False,
            output_relu=True):
        x = conv2d(out_ch, kernel, stride=stride, padding=padding, bias=False,
                   name=f'{name}.conv', dtype=self.dtype)(x)
        x = batch_norm(train=train, name=f'{name}.bn', dtype=self.dtype)(x)
        return relu(x) if output_relu else x

    def _seq(self, x, p, specs, train, output_relu=True):
        last = len(specs) - 1
        for j, (f, k, s, pad) in enumerate(specs):
            x = self._bc(x, f, k, f'{p}.{j}', stride=s, padding=pad, train=train,
                         output_relu=(output_relu or j != last))
        return x

    # --------------------------------------------------------------- stem
    def _stem(self, x, train):
        x = self._seq(x, 'stem.conv1',
                      [(32, 3, 2, 0), (32, 3, 1, 0), (64, 3, 1, 1)], train)
        x = jnp.concatenate([
            max_pool(x, 3, 2),
            self._bc(x, 96, 3, 'stem.conv1_branch', stride=2, train=train)], -1)
        short = self._seq(x, 'stem.conv2_short', [(64, 1, 1, 0), (96, 3, 1, 0)],
                          train)
        long = self._seq(x, 'stem.conv2_long',
                         [(64, 1, 1, 0), (64, (7, 1), 1, (3, 0)),
                          (64, (1, 7), 1, (0, 3)), (96, 3, 1, 0)], train)
        x = jnp.concatenate([short, long], -1)
        return jnp.concatenate([
            max_pool(x, 3, 2),
            self._bc(x, 192, 3, 'stem.conv2_branch', stride=2, train=train)], -1)

    # ------------------------------------------------------------- 2-way blocks
    def _block_a(self, x, p, train):
        x0 = self._seq(x, f'{p}.path0',
                       [(32, 1, 1, 0), (48, 3, 1, 1), (64, 3, 1, 1)], train)
        x1 = self._seq(x, f'{p}.path1', [(32, 1, 1, 0), (32, 3, 1, 1)], train)
        x2 = self._bc(x, 32, 1, f'{p}.path2', train=train)
        out = jnp.concatenate([x0, x1, x2], -1)
        return self._bc(out, 384, 1, f'{p}.conv2d', train=train,
                        output_relu=False)

    def _block_b(self, x, p, train):
        x0 = self._seq(x, f'{p}.path0',
                       [(128, 1, 1, 0), (160, (1, 7), 1, (0, 3)),
                        (192, (7, 1), 1, (3, 0))], train)
        x1 = self._bc(x, 192, 1, f'{p}.path1', train=train)
        out = jnp.concatenate([x0, x1], -1)
        return self._bc(out, 1152, 1, f'{p}.conv2d', train=train,
                        output_relu=False)

    def _block_c(self, x, p, train):
        x0 = self._seq(x, f'{p}.path0',
                       [(192, 1, 1, 0), (224, (1, 3), 1, (0, 1)),
                        (256, (3, 1), 1, (1, 0))], train)
        x1 = self._bc(x, 192, 1, f'{p}.path1', train=train)
        out = jnp.concatenate([x0, x1], -1)
        return self._bc(out, 2048, 1, f'{p}.conv2d', train=train,
                        output_relu=False)

    def _multiway(self, x, block_fn, scale, p, train, num_blocks=2):
        out = x
        for b in range(num_blocks):
            out = out + block_fn(x, f'{p}.blocks.{b}', train) * scale
        return relu(out)

    # ------------------------------------------------------------ poly-3 blocks
    def _poly(self, x, scale, p, train, path0_specs, path1_ch, out_ch,
              num_blocks=3):
        """Poly-N module: conv weights shared across the N sequential paths,
        BatchNorms per path (PolyConv2d, polynet.py:41-65)."""
        # shared convs created once, reused across block indices
        convs = [conv2d(f, k, padding=pad, bias=False, name=f'{p}.{nm}.conv',
                        dtype=self.dtype)
                 for nm, f, k, pad in path0_specs]
        conv1 = conv2d(path1_ch, 1, bias=False, name=f'{p}.path1.conv',
                       dtype=self.dtype)
        out = x
        for b in range(num_blocks):
            h = x
            for (nm, f, k, pad), cv in zip(path0_specs, convs):
                h = cv(h)
                h = batch_norm(train=train, name=f'{p}.{nm}.bn_blocks.{b}',
                               dtype=self.dtype)(h)
                h = relu(h)
            h1 = conv1(x)
            h1 = batch_norm(train=train, name=f'{p}.path1.bn_blocks.{b}',
                            dtype=self.dtype)(h1)
            h1 = relu(h1)
            blk = self._bc(jnp.concatenate([h, h1], -1), out_ch, 1,
                           f'{p}.conv2d_blocks.{b}', train=train,
                           output_relu=False)
            out = out + blk * scale
            x = relu(blk)
        return relu(out)

    def _poly_b(self, x, scale, p, train, num_blocks=3):
        specs = [('path0_1x1', 128, 1, 0), ('path0_1x7', 160, (1, 7), (0, 3)),
                 ('path0_7x1', 192, (7, 1), (3, 0))]
        return self._poly(x, scale, p, train, specs, 192, 1152, num_blocks)

    def _poly_c(self, x, scale, p, train, num_blocks=3):
        specs = [('path0_1x1', 192, 1, 0), ('path0_1x3', 224, (1, 3), (0, 1)),
                 ('path0_3x1', 256, (3, 1), (1, 0))]
        return self._poly(x, scale, p, train, specs, 192, 2048, num_blocks)

    # ------------------------------------------------------------- reductions
    def _reduction_a(self, x, train):
        p = 'reduction_a'
        x0 = self._seq(x, f'{p}.path0',
                       [(256, 1, 1, 0), (256, 3, 1, 1), (384, 3, 2, 0)], train)
        x1 = self._bc(x, 384, 3, f'{p}.path1', stride=2, train=train)
        return jnp.concatenate([x0, x1, max_pool(x, 3, 2)], -1)

    def _reduction_b(self, x, train):
        p = 'reduction_b'
        x0 = self._seq(x, f'{p}.path0',
                       [(256, 1, 1, 0), (256, 3, 1, 1), (256, 3, 2, 0)], train)
        x1 = self._seq(x, f'{p}.path1', [(256, 1, 1, 0), (256, 3, 2, 0)], train)
        x2 = self._seq(x, f'{p}.path2', [(256, 1, 1, 0), (384, 3, 2, 0)], train)
        return jnp.concatenate([x0, x1, x2, max_pool(x, 3, 2)], -1)

    # ---------------------------------------------------------------- forward
    @nn.compact
    def __call__(self, x, mode: str = 'forward', head: bool = True,
                 train: bool = False):
        if mode in ('forward', 'features'):
            x = self._stem(x, train)
            for i, s in enumerate(_A_SCALES):
                x = self._multiway(x, self._block_a, s, f'stage_a.{i}', train)
            x = self._reduction_a(x, train)
            for i, s in enumerate(_B_SCALES):
                if i % 2 == 0:
                    x = self._poly_b(x, s, f'stage_b.{i}', train)
                else:
                    x = self._multiway(x, self._block_b, s, f'stage_b.{i}', train)
            x = self._reduction_b(x, train)
            for i, s in enumerate(_C_SCALES):
                if i % 2 == 0:
                    x = self._poly_c(x, s, f'stage_c.{i}', train)
                else:
                    x = self._multiway(x, self._block_c, s, f'stage_c.{i}', train)
            if mode == 'features':
                return x
        if mode in ('forward', 'logits'):
            x = avg_pool(x, 9, 1)
            x = dropout(0.2, train=train)(x)
            x = x.reshape((x.shape[0], -1))
            if head:
                x = dense(self.num_classes, name='last_linear', dtype=self.dtype)(x)
        return x


@register_model
def polynet(num_classes: int = 1000, pretrained: str = 'imagenet'):
    """PolyNet (arXiv:1611.05725); eval resize 378 -> 331 center crop."""
    from ..core.factory import build_model
    module = PolyNet(num_classes=num_classes)
    return build_model('polynet', module, pretrained_settings, num_classes,
                       pretrained, fallback_size=331)


register_settings(pretrained_settings)
