"""Non-local block parity vs torch (all 4 modes) + Pallas kernel checks."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax

from pretorched_tpu.models.nonlocalnet import NonLocalBlock
from pretorched_tpu.zoo import convert


class TorchNL3D(tnn.Module):
    """Reference-behavior non-local block (nonlocalnet.py:51-243)."""

    def __init__(self, c, mode, sub_sample=False):
        super().__init__()
        self.mode, self.c, self.inter = mode, c, c // 2
        self.sub = sub_sample
        self.g = tnn.Conv3d(c, self.inter, 1)
        self.W0 = tnn.Conv3d(self.inter, c, 1)
        self.Wbn = tnn.BatchNorm3d(c)
        if mode != 'gaussian':
            self.theta = tnn.Conv3d(c, self.inter, 1)
            self.phi = tnn.Conv3d(c, self.inter, 1)
        if mode == 'concatenation':
            self.concat_project = tnn.Conv2d(self.inter * 2, 1, 1, bias=False)

    def forward(self, x):
        b = x.size(0)
        g_x = self.g(x)
        if self.sub:
            g_x = F.max_pool3d(g_x, 2)
        g_x = g_x.view(b, self.inter, -1).permute(0, 2, 1)
        if self.mode == 'dot_product' and self.sub:
            theta = self.theta(x).view(b, self.inter, -1).permute(0, 2, 1)
            phi = F.max_pool3d(self.phi(x), 2).reshape(b, self.inter, -1)
            f = torch.matmul(theta, phi)
            fdc = f / f.size(-1)   # divides by KEY count (nonlocalnet.py:208)
            y = torch.matmul(fdc, g_x).permute(0, 2, 1).contiguous()
            y = y.view(b, self.inter, *x.shape[2:])
            return self.Wbn(self.W0(y)) + x
        if self.mode == 'gaussian':
            theta = x.view(b, self.c, -1).permute(0, 2, 1)
            phi_in = F.max_pool3d(x, 2) if self.sub else x
            phi = phi_in.reshape(b, self.c, -1)
            f = torch.matmul(theta, phi)
            fdc = F.softmax(f, dim=-1)
        elif self.mode == 'embedded_gaussian':
            theta = self.theta(x).view(b, self.inter, -1).permute(0, 2, 1)
            phi = self.phi(x)
            if self.sub:
                phi = F.max_pool3d(phi, 2)
            phi = phi.reshape(b, self.inter, -1)
            f = torch.matmul(theta, phi)
            fdc = F.softmax(f, dim=-1)
        elif self.mode == 'dot_product':
            theta = self.theta(x).view(b, self.inter, -1).permute(0, 2, 1)
            phi = self.phi(x).view(b, self.inter, -1)
            f = torch.matmul(theta, phi)
            fdc = f / f.size(-1)
        else:  # concatenation
            theta = self.theta(x).view(b, self.inter, -1, 1)
            phi = self.phi(x).view(b, self.inter, 1, -1)
            h, w = theta.size(2), phi.size(3)
            f = self.concat_project(torch.cat(
                [theta.repeat(1, 1, 1, w), phi.repeat(1, 1, h, 1)], dim=1))
            f = F.relu(f).view(b, h, w)
            fdc = f / f.size(-1)
        y = torch.matmul(fdc, g_x).permute(0, 2, 1).contiguous()
        y = y.view(b, self.inter, *x.shape[2:])
        return self.Wbn(self.W0(y)) + x


@pytest.mark.parametrize('mode', ['embedded_gaussian', 'gaussian',
                                  'dot_product', 'concatenation'])
def test_nonlocal_block_parity(mode):
    c = 16
    tm = TorchNL3D(c, mode).eval()
    with torch.no_grad():
        tm.Wbn.running_mean.uniform_(-0.2, 0.2)
        tm.Wbn.running_var.uniform_(0.5, 1.5)
        tm.Wbn.weight.uniform_(0.5, 1.5)

    module = NonLocalBlock(in_channels=c, dimension=3, mode=mode)
    variables = dict(module.init(jax.random.key(0),
                                 np.zeros((1, 4, 6, 6, c), np.float32)))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    renames = {'W.0': 'W0', 'W.1': 'Wbn', 'concat_project.0': 'concat_project'}
    variables = convert.convert_state_dict(sd, variables, renames=renames)
    x = np.random.RandomState(0).randn(2, c, 4, 6, 6).astype(np.float32)
    ref = tm(torch.from_numpy(x)).detach().numpy()
    got = module.apply(variables, np.transpose(x, (0, 2, 3, 4, 1)))
    got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize('mode', ['embedded_gaussian', 'dot_product'])
def test_nonlocal_sub_sample_parity(mode):
    c = 16
    tm = TorchNL3D(c, mode, sub_sample=True).eval()
    module = NonLocalBlock(in_channels=c, dimension=3, sub_sample=True,
                           mode=mode)
    variables = dict(module.init(jax.random.key(0),
                                 np.zeros((1, 4, 6, 6, c), np.float32)))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    renames = {'W.0': 'W0', 'W.1': 'Wbn', 'g.0': 'g', 'phi.0': 'phi'}
    variables = convert.convert_state_dict(sd, variables, renames=renames)
    x = np.random.RandomState(0).randn(2, c, 4, 6, 6).astype(np.float32)
    ref = tm(torch.from_numpy(x)).detach().numpy()
    got = module.apply(variables, np.transpose(x, (0, 2, 3, 4, 1)))
    got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_pallas_attention_matches_reference():
    from pretorched_tpu.ops.pallas.nonlocal_attention import (
        nonlocal_attention, nonlocal_attention_reference)
    rng = np.random.RandomState(0)
    q = rng.randn(2, 300, 32).astype(np.float32)
    k = rng.randn(2, 300, 32).astype(np.float32)
    v = rng.randn(2, 300, 32).astype(np.float32)
    ref = np.asarray(nonlocal_attention_reference(q, k, v))
    got = np.asarray(nonlocal_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_nonlocal_zero_init_is_identity():
    """Fresh blocks are identity (W BN scale zero-init, nonlocalnet.py:94-101)."""
    module = NonLocalBlock(in_channels=8, dimension=2)
    x = np.random.RandomState(0).randn(1, 5, 5, 8).astype(np.float32)
    variables = module.init(jax.random.key(0), x)
    out = module.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-6)


def test_pallas_attention_blockwise_backward():
    """Flash-style dq/dk/dv kernels match the reference VJP (VERDICT r1 #5),
    including the key/query padding path (N not a block multiple)."""
    from pretorched_tpu.ops.pallas.nonlocal_attention import (
        _nonlocal_attention_ad, nonlocal_attention_reference)
    rng = np.random.RandomState(1)
    for n in (256, 300):    # exact blocks + ragged padding
        q = rng.randn(2, n, 32).astype(np.float32)
        k = rng.randn(2, n, 32).astype(np.float32)
        v = rng.randn(2, n, 32).astype(np.float32)
        ct = rng.randn(2, n, 32).astype(np.float32)

        def loss_pallas(q, k, v):
            return (jax.numpy.asarray(ct) *
                    _nonlocal_attention_ad(q, k, v, 0.5, True)).sum()

        def loss_ref(q, k, v):
            return (jax.numpy.asarray(ct) *
                    nonlocal_attention_reference(q, k, v, scale=0.5)).sum()

        got = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for g, r, name in zip(got, ref, 'qkv'):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=f'd{name} n={n}')


def test_pallas_attention_rectangular():
    """q longer than k/v — the sub_sample layout (phi/g max-pooled to N/8,
    nonlocalnet.py:126-131): each side pads to its own block multiple and
    the key mask uses the key count. Forward + dq/dk/dv vs the reference."""
    from pretorched_tpu.ops.pallas.nonlocal_attention import (
        _nonlocal_attention_ad, nonlocal_attention,
        nonlocal_attention_reference)
    rng = np.random.RandomState(2)
    q = rng.randn(2, 300, 32).astype(np.float32)
    k = rng.randn(2, 72, 32).astype(np.float32)
    v = rng.randn(2, 72, 32).astype(np.float32)
    ct = rng.randn(2, 300, 32).astype(np.float32)

    ref = np.asarray(nonlocal_attention_reference(q, k, v, scale=0.5))
    got = np.asarray(nonlocal_attention(q, k, v, scale=0.5, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def loss_pallas(q, k, v):
        return (jax.numpy.asarray(ct) *
                _nonlocal_attention_ad(q, k, v, 0.5, True)).sum()

    def loss_ref(q, k, v):
        return (jax.numpy.asarray(ct) *
                nonlocal_attention_reference(q, k, v, scale=0.5)).sum()

    got_g = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    ref_g = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, r, name in zip(got_g, ref_g, 'qkv'):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f'd{name} rectangular')


def test_pallas_attention_lse():
    from pretorched_tpu.ops.pallas.nonlocal_attention import (
        _nonlocal_attention_fwd_lse)
    rng = np.random.RandomState(0)
    q = rng.randn(1, 200, 16).astype(np.float32)
    k = rng.randn(1, 200, 16).astype(np.float32)
    v = rng.randn(1, 200, 16).astype(np.float32)
    out, lse = _nonlocal_attention_fwd_lse(q, k, v, interpret=True)
    s = np.einsum('bnc,bmc->bnm', q, k)
    ref_lse = np.log(np.exp(s - s.max(-1, keepdims=True)).sum(-1)) + s.max(-1)
    np.testing.assert_allclose(np.asarray(lse), ref_lse, rtol=1e-4, atol=1e-4)


def test_pallas_attention_compiled_on_tpu():
    """Compiled (non-interpret) kernel path — runs only when a real TPU is
    attached (e.g. `JAX_PLATFORMS=axon pytest -p no:cacheprovider
    tests/test_nonlocal.py -k compiled`); CI's CPU conftest skips it."""
    if jax.default_backend() != 'tpu':
        pytest.skip('needs a TPU backend (CI runs on the CPU mesh)')
    from pretorched_tpu.ops.pallas.nonlocal_attention import (
        _nonlocal_attention_ad, nonlocal_attention_reference)
    rng = np.random.RandomState(0)
    q, k, v = (jax.numpy.asarray(rng.randn(1, 4096, 64), 'float32')
               for _ in range(3))
    got = _nonlocal_attention_ad(q, k, v, 1.0, False)
    ref = nonlocal_attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)   # bf16 matmul units
    g = jax.jit(jax.grad(lambda a, b, c:
                         _nonlocal_attention_ad(a, b, c, 1.0, False).sum(),
                         argnums=(0, 1, 2)))(q, k, v)
    assert all(np.isfinite(np.asarray(x)).all() for x in g)

    # rectangular (sub_sample) shapes compile and match too: Nk = N/8
    ks, vs = k[:, :512], v[:, :512]
    got = _nonlocal_attention_ad(q, ks, vs, 1.0, False)
    ref = nonlocal_attention_reference(q, ks, vs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)
    g = jax.jit(jax.grad(lambda a, b, c:
                         _nonlocal_attention_ad(a, b, c, 1.0, False).sum(),
                         argnums=(0, 1, 2)))(q, ks, vs)
    assert g[1].shape == ks.shape and g[2].shape == vs.shape
    assert all(np.isfinite(np.asarray(x)).all() for x in g)


def test_pallas_attention_rectangular_channels():
    """v with a different CHANNEL count than q/k — the SAGAN layout
    (gan/biggan.py SelfAttention: theta/phi at C/8, g at C/2). Found r3:
    the wrapper sized v's BlockSpec and the output from q's channels, so
    the kernel silently read the first C_q channels of v and returned the
    wrong width (BigGAN-256 sampling crashed on the reshape). Forward +
    dq/dk/dv vs the reference."""
    from pretorched_tpu.ops.pallas.nonlocal_attention import (
        _nonlocal_attention_ad, nonlocal_attention,
        nonlocal_attention_reference)
    rng = np.random.RandomState(3)
    q = rng.randn(2, 300, 16).astype(np.float32)
    k = rng.randn(2, 72, 16).astype(np.float32)
    v = rng.randn(2, 72, 64).astype(np.float32)
    ct = rng.randn(2, 300, 64).astype(np.float32)

    ref = np.asarray(nonlocal_attention_reference(q, k, v))
    got = np.asarray(nonlocal_attention(q, k, v, interpret=True))
    assert got.shape == (2, 300, 64)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def loss_pallas(q, k, v):
        return (jax.numpy.asarray(ct) *
                _nonlocal_attention_ad(q, k, v, 1.0, True)).sum()

    def loss_ref(q, k, v):
        return (jax.numpy.asarray(ct) *
                nonlocal_attention_reference(q, k, v)).sum()

    got_g = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    ref_g = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, r, name in zip(got_g, ref_g, 'qkv'):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f'd{name} rect-channels')


def test_pallas_attention_scale_regime_on_tpu():
    """The kernel's raison-d'etre regime (VERDICT r3 #4): N = 65536 — e.g. a
    nonlocal block at layer1 scale (reference nonlocalnet.py:143-166
    materializes the N x N affinity there). At this N the full-softmax XLA
    path needs a 65536^2 f32 affinity = 17 GB and must RESOURCE_EXHAUSTED on
    a 16 GB v5e; the blockwise kernel streams it in O(N) memory. Asserts the
    OOM, the kernel's finite output, row-subset correctness against a
    rectangular full-softmax reference (q rows see ALL of k/v), and prints
    the measured throughput for ROUND_NOTES."""
    if jax.default_backend() != 'tpu':
        pytest.skip('needs a TPU backend (CI runs on the CPU mesh)')
    import time

    from pretorched_tpu.ops.pallas.nonlocal_attention import (
        nonlocal_attention, nonlocal_attention_reference)

    n, c = 65536, 64
    rng = np.random.RandomState(0)
    one = jax.numpy.asarray(rng.randn(1, 1, c), jax.numpy.bfloat16)
    # iota-modulated broadcast: O(N*C) host cost, non-degenerate rows
    ramp = (jax.numpy.arange(n, dtype=jax.numpy.bfloat16) / n)[None, :, None]
    q, k, v = (one * (i + 1) + ramp for i in range(3))

    # 1. the blockwise kernel runs in O(N) memory (the OOM assertion runs
    #    LAST: a failed 17 GB allocation poisons later allocations in this
    #    process — the failed buffers stay referenced via the exception)
    fwd = jax.jit(lambda q, k, v: nonlocal_attention(q, k, v))
    out = jax.device_get(fwd(q, k, v))
    assert out.shape == (1, n, c)
    assert np.isfinite(out.astype(np.float32)).all()

    # 2. row-subset correctness: kernel rows 0..255 == full-softmax over a
    #    rectangular (256, N) affinity (fits easily; same k/v context)
    ref = jax.device_get(nonlocal_attention_reference(q[:, :256], k, v))
    np.testing.assert_allclose(out[:, :256].astype(np.float32),
                               ref.astype(np.float32), rtol=5e-2, atol=5e-2)

    # 3. throughput datapoint (fwd is ~1.1 PFLOP at this N/C). Timed inside
    #    one jit via lax.scan (python-chained dispatch measures the link
    #    RTT, not the kernel — 612 vs 31 ms/iter on the tunnel).
    iters = 10
    jnp = jax.numpy

    @jax.jit
    def many(q, k, v):
        def body(carry, _):
            out = nonlocal_attention(carry, k, v)
            s = jnp.sum(out.astype(jnp.float32))
            return carry + (s * 0).astype(carry.dtype), s
        _, outs = jax.lax.scan(body, q, None, length=iters)
        return jnp.sum(outs)

    jax.device_get(many(q, k, v))            # compile + first
    t0 = time.perf_counter()
    jax.device_get(many(q, k, v))
    dt = (time.perf_counter() - t0) / iters
    flops = 4.0 * n * n * c                  # qk^T + pv
    print(f'\n# pallas blockwise N={n} C={c} bf16: {dt * 1000:.0f} ms/iter, '
          f'{flops / dt / 1e12:.1f} TFLOP/s '
          f'({flops / dt / 197e12 * 100:.0f}% of v5e bf16 peak); '
          f'full-softmax XLA: RESOURCE_EXHAUSTED (17 GB affinity)')

    # 4. the full-softmax XLA path cannot run at this N (must come last —
    #    see step 1's note)
    with pytest.raises(Exception, match='RESOURCE_EXHAUSTED|[Oo]ut of memory'):
        jax.block_until_ready(nonlocal_attention_reference(q, k, v))
