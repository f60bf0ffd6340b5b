"""BigGAN-style class-conditional generator (sampling path).

BASELINE.json config 5 ("BigGAN class-conditional 256px generator sampling,
GAN zoo stretch path") — not present in the reference snapshot (SURVEY §7
item 9), built here from the published architecture (arXiv:1809.11096):

* hierarchical latent: z is split into per-block chunks, each concatenated
  with a shared class embedding to drive conditional BatchNorm gains/biases;
* G blocks: condBN -> relu -> 2x nearest upsample -> 3x3 conv -> condBN ->
  relu -> 3x3 conv; the skip is 1x1-conv'd whenever the block upsamples or
  changes width (the published ``learnable_sc`` rule);
* one SAGAN self-attention block mid-resolution (64x64), phi/g max-pooled
  2x2 as in SAGAN (attention reads N/4 keys);
* latent layout: 20 dims per chunk -> dim_z 120 at 128px, 140 at 256px;
* head: BN -> relu -> 3x3 conv -> tanh;
* truncated-normal sampling via the ``truncation`` argument.

TPU notes: generation is one jit; attention uses the same blockwise Pallas
kernel as the non-local nets; all convs channels-last bf16-ready.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

import functools

from ..models.layers import conv2d, dense
from ..ops.pallas.nonlocal_attention import auto_nonlocal_attention
from ..ops.pooling import max_pool


def _upsample2x(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class CondBatchNorm(nn.Module):
    """BN with class+latent-conditioned scale/shift."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, cond, train: bool = False):
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-4, use_bias=False, use_scale=False,
                         dtype=self.dtype, name='bn')(x)
        gain = dense(self.features, name='gain', dtype=self.dtype)(cond)
        bias = dense(self.features, name='bias', dtype=self.dtype)(cond)
        return h * (1.0 + gain[:, None, None, :]) + bias[:, None, None, :]


class GBlock(nn.Module):
    out_ch: int
    upsample: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, cond, train: bool = False):
        h = CondBatchNorm(x.shape[-1], dtype=self.dtype, name='bn1')(x, cond, train)
        h = jax.nn.relu(h)
        if self.upsample:
            h = _upsample2x(h)
            x = _upsample2x(x)
        h = conv2d(self.out_ch, 3, padding=1, name='conv1', dtype=self.dtype)(h)
        h = CondBatchNorm(self.out_ch, dtype=self.dtype, name='bn2')(h, cond, train)
        h = jax.nn.relu(h)
        h = conv2d(self.out_ch, 3, padding=1, name='conv2', dtype=self.dtype)(h)
        # published learnable_sc rule: a 1x1 skip conv whenever the block
        # upsamples OR changes width (ajbrock BigGAN GBlock)
        if self.upsample or x.shape[-1] != self.out_ch:
            x = conv2d(self.out_ch, 1, name='conv_sc', dtype=self.dtype)(x)
        return h + x


class SelfAttention(nn.Module):
    """SAGAN attention over H*W positions (blockwise kernel on TPU)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        theta = conv2d(c // 8, 1, bias=False, name='theta', dtype=self.dtype)(x)
        # SAGAN pools phi/g 2x2: attention reads N/4 keys (the kernel
        # supports rectangular q vs k/v)
        phi = max_pool(conv2d(c // 8, 1, bias=False, name='phi',
                              dtype=self.dtype)(x), 2, 2)
        g = max_pool(conv2d(c // 2, 1, bias=False, name='g',
                            dtype=self.dtype)(x), 2, 2)
        n = h * w
        y = auto_nonlocal_attention(theta.reshape(b, n, -1),
                                    phi.reshape(b, phi.shape[1] * phi.shape[2], -1),
                                    g.reshape(b, g.shape[1] * g.shape[2], -1))
        y = y.reshape(b, h, w, c // 2)
        o = conv2d(c, 1, bias=False, name='o', dtype=self.dtype)(y)
        gamma = self.param('gamma', nn.initializers.zeros, ())
        return x + gamma * o


class BigGAN(nn.Module):
    """Generator. resolution in {128, 256}; ch = width multiplier base."""

    resolution: int = 256
    ch: int = 96
    dim_z: int = 0          # 0 = published layout: 20 dims per z chunk
    shared_dim: int = 128
    num_classes: int = 1000
    attn_res: int = 64
    dtype: Any = None

    @property
    def arch(self) -> Sequence[int]:
        if self.resolution == 256:
            return (16, 16, 8, 8, 4, 2)   # 4 -> 8 ... -> 256
        if self.resolution == 128:
            return (16, 16, 8, 4, 2)
        raise ValueError(self.resolution)

    @property
    def latent_dim(self) -> int:
        # one chunk for the first linear + one per block, 20 dims each
        # (published: 120 at 128px, 140 at 256px)
        return self.dim_z or 20 * (len(self.arch) + 1)

    @nn.compact
    def __call__(self, z, labels, train: bool = False):
        blocks = list(self.arch)
        n_chunks = len(blocks) + 1
        chunk = self.latent_dim // n_chunks
        if chunk == 0 or chunk * n_chunks != self.latent_dim:
            # a non-divisible dim_z would silently discard the trailing z
            # dims (and dim_z < n_chunks would feed every block empty
            # chunks — bias-only conditioning); fail loudly instead
            raise ValueError(
                f'dim_z={self.latent_dim} must be a positive multiple of '
                f'{n_chunks} (one chunk for the first linear + one per '
                f'block; published layout is 20 per chunk)')
        zs = [z[:, i * chunk:(i + 1) * chunk] for i in range(n_chunks)]
        shared = nn.Embed(self.num_classes, self.shared_dim,
                          name='shared_embedding')(labels)

        h = dense(4 * 4 * 16 * self.ch, name='linear', dtype=self.dtype)(zs[0])
        h = h.reshape(-1, 4, 4, 16 * self.ch)
        res = 4
        for i, mult in enumerate(blocks):
            cond = jnp.concatenate([shared, zs[i + 1]], axis=-1)
            h = GBlock(mult * self.ch, dtype=self.dtype,
                       name=f'blocks.{i}')(h, cond, train)
            res *= 2
            if res == self.attn_res:
                h = SelfAttention(dtype=self.dtype, name='attention')(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-4, dtype=self.dtype, name='output_bn')(h)
        h = jax.nn.relu(h)
        h = conv2d(3, 3, padding=1, name='output_conv', dtype=self.dtype)(h)
        return jnp.tanh(h)


def _build(resolution, ch, num_classes, seed=0):
    module = BigGAN(resolution=resolution, ch=ch, num_classes=num_classes)
    z = jnp.zeros((1, module.latent_dim))
    y = jnp.zeros((1,), jnp.int32)
    # jit the init so XLA DCEs the forward (CLAUDE.md: don't eager-init)
    variables = jax.jit(module.init)(jax.random.key(seed), z, y)
    return module, variables


def biggan128(num_classes: int = 1000, ch: int = 96):
    """BigGAN-128 generator (module, variables)."""
    return _build(128, ch, num_classes)


def biggan256(num_classes: int = 1000, ch: int = 96):
    """BigGAN-256 generator (module, variables)."""
    return _build(256, ch, num_classes)


def sample(module, variables, rng, labels, truncation: float = 1.0):
    """Class-conditional sampling with the truncation trick.

    Returns images in [-1, 1], channels-last (B, res, res, 3)."""
    n = labels.shape[0]
    z = jax.random.truncated_normal(rng, -2.0, 2.0,
                                    (n, module.latent_dim)) * truncation
    return _generate(module, variables, z, jnp.asarray(labels))


@functools.partial(jax.jit, static_argnums=0)
def _generate(module, variables, z, labels):
    # module is a hashable static arg, so repeated sample() calls hit one
    # compile cache instead of re-jitting per call
    return module.apply(variables, z, labels)
