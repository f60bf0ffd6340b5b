"""BigGAN generator sampling path (BASELINE config 5 stretch)."""

import numpy as np

import jax
import jax.numpy as jnp

from pretorched_tpu.gan.biggan import BigGAN, sample


def test_biggan_tiny_sample():
    # tiny config: ch=8, 10 classes, 128px arch at reduced ch
    module = BigGAN(resolution=128, ch=8, num_classes=10, attn_res=16)
    z = jnp.zeros((2, module.latent_dim))
    y = jnp.asarray([1, 3])
    variables = module.init(jax.random.key(0), z, y)
    imgs = sample(module, variables, jax.random.key(1), y, truncation=0.5)
    assert imgs.shape == (2, 128, 128, 3)
    arr = np.asarray(imgs)
    assert np.isfinite(arr).all()
    assert arr.min() >= -1.0 and arr.max() <= 1.0
    # different classes give different images
    assert np.abs(arr[0] - arr[1]).mean() > 1e-4


def test_biggan_256_arch():
    module = BigGAN(resolution=256, ch=4, num_classes=5, attn_res=8)
    z = jnp.zeros((1, module.latent_dim))
    y = jnp.zeros((1,), jnp.int32)
    variables = module.init(jax.random.key(0), z, y)
    out = module.apply(variables, z, y)
    assert out.shape == (1, 256, 256, 3)


def test_biggan_published_latent_layout():
    """20 dims per chunk: 120 at 128px (6 chunks), 140 at 256px (7)."""
    assert BigGAN(resolution=128).latent_dim == 120
    assert BigGAN(resolution=256).latent_dim == 140
    # blocks that upsample without changing width still carry a skip conv
    module = BigGAN(resolution=256, ch=4, num_classes=5, attn_res=8)
    z = jnp.zeros((1, module.latent_dim))
    y = jnp.zeros((1,), jnp.int32)
    variables = module.init(jax.random.key(0), z, y)
    assert 'conv_sc' in variables['params']['blocks.0']   # 16ch -> 16ch, up
