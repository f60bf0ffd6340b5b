"""SoundNet (audio CNN) + BranchedSoundNet (object/places dual head).

Reference: pretorched/models/soundnet.py. 8 strided conv1d stages over a raw
waveform (B, L, 1) channels-last; ``forward`` averages the classifier over
fixed-size feature windows so arbitrary-length audio works
(soundnet.py:73-77).

The reference constructs its BatchNorm layers *inside* forward — fresh,
untrained, per call (soundnet.py:27-33,63-69; SURVEY §2.6 flags this as a
bug). We provide real, learnable BatchNorm layers (named bn1..bn7) —
checkpoints without them load via strict=False.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..core.registry import register_model
from ..ops.pooling import max_pool
from .layers import batch_norm, conv1d, dense, relu

# (out_ch, kernel, stride, padding, pool_kernel or None)
_STAGES = ((16, 64, 2, 32, 8), (32, 32, 2, 16, 8), (64, 16, 2, 8, None),
           (128, 8, 2, 4, None), (256, 4, 2, 2, 4), (512, 4, 2, 2, None),
           (1024, 4, 2, 2, None))


class SoundNet(nn.Module):
    num_classes: int = 1000
    feature_dim: int = 262000
    dtype: Any = None

    def _features(self, x, train):
        dt = self.dtype
        for i, (ch, k, s, p, pool) in enumerate(_STAGES, start=1):
            x = conv1d(ch, k, stride=s, padding=p, name=f'conv{i}', dtype=dt)(x)
            x = batch_norm(train=train, name=f'bn{i}', dtype=dt)(x)
            x = relu(x)
            if pool:
                x = max_pool(x, pool, 1, 0)
        return x

    @nn.compact
    def __call__(self, x, mode: str = 'forward', head: bool = True,
                 train: bool = False):
        # x: (B, L, 1) channels-last waveform
        dt = self.dtype
        if mode in ('forward', 'features'):
            x = self._features(x, train)
            x = relu(conv1d(1000, 8, stride=2, name='conv8', dtype=dt)(x))
            x = jnp.transpose(x, (0, 2, 1)).reshape(x.shape[0], -1)  # torch CHW flatten
            if mode == 'features':
                return x
        if mode in ('forward', 'logits'):
            if not head:
                return x
            fd = self.feature_dim
            total = x.shape[-1]
            assert total >= fd, f'need >= {fd} features, got {total}'
            lin = dense(self.num_classes, name='last_linear', dtype=dt)
            # torch semantics (soundnet.py:73-77): all fd-chunks except the
            # last, plus one right-aligned window.
            n_chunks = -(-total // fd)
            starts = [i * fd for i in range(n_chunks - 1)] + [total - fd]
            outs = [lin(x[:, st:st + fd]) for st in starts]
            x = jnp.mean(jnp.stack(outs), axis=0)
        return x


class BranchedSoundNet(nn.Module):
    """Dual-head (ImageNet-objects + Places) SoundNet (soundnet.py:7-39)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        for i, (ch, k, s, p, pool) in enumerate(_STAGES, start=1):
            x = conv1d(ch, k, stride=s, padding=p, name=f'conv{i}', dtype=dt)(x)
            x = batch_norm(train=train, name=f'bn{i}', dtype=dt)(x)
            x = relu(x)
            if pool:
                x = max_pool(x, pool, 1, 0)
        obj = relu(conv1d(1000, 8, stride=2, name='conv8_1', dtype=dt)(x))
        plc = relu(conv1d(401, 8, stride=2, name='conv8_2', dtype=dt)(x))
        obj = jnp.transpose(obj, (0, 2, 1)).reshape(obj.shape[0], -1)
        plc = jnp.transpose(plc, (0, 2, 1)).reshape(plc.shape[0], -1)
        obj = dense(1000, name='last_linear1', dtype=dt)(obj)
        plc = dense(365, name='last_linear2', dtype=dt)(plc)
        return obj, plc


@register_model
def soundnet8(num_classes: int = 1000, pretrained=None,
              sample_length: int = 67724):
    """SoundNet-8. The reference loads a local 'soundnet8.pth' with
    strict=False (soundnet.py:85-90); place the file in the weight cache to
    do the same here."""
    from ..core.factory import build_model
    module = SoundNet(num_classes=num_classes)
    settings_map = {'soundnet8': {'imagenet': {
        'url': 'soundnet8.pth', 'input_space': 'waveform',
        'input_size': [1, sample_length], 'input_range': [-1, 1],
        'mean': [0.0], 'std': [1.0], 'num_classes': num_classes}}}
    return build_model('soundnet8', module, settings_map, num_classes,
                       pretrained, converter_opts={'strict': False},
                       input_shape=(1, sample_length, 1))
