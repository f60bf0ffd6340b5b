"""Pooling semantics parity vs torch.nn.functional (the numerics oracle).

Covers the reference's tricky configurations: ceil_mode pools
(senet.py:279-282, bninception), count_include_pad avg pools (dpn/polynet/
nasnet), adaptive pools (dpn.py:407-428)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pretorched_tpu.ops import pooling


def _nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def _nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


CASES_2D = [
    # (H, W, kernel, stride, padding, ceil_mode)
    (224, 224, 3, 2, 1, False),
    (112, 112, 3, 2, 0, True),     # bninception-style ceil pool
    (14, 14, 3, 2, 1, True),
    (15, 15, 2, 2, 0, True),
    (13, 9, 3, 3, 1, False),
    (7, 7, 7, 7, 0, False),
    (10, 10, 3, 2, 1, True),
    (9, 9, 5, 3, 2, True),
]


@pytest.mark.parametrize('h,w,k,s,p,ceil', CASES_2D)
def test_max_pool2d_matches_torch(rng, h, w, k, s, p, ceil):
    x = rng.randn(2, 5, h, w).astype(np.float32)
    ref = F.max_pool2d(torch.from_numpy(x), k, s, p, ceil_mode=ceil).numpy()
    got = _nchw(pooling.max_pool(_nhwc(x), k, s, p, ceil_mode=ceil))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize('h,w,k,s,p,ceil', CASES_2D)
@pytest.mark.parametrize('cip', [True, False])
def test_avg_pool2d_matches_torch(rng, h, w, k, s, p, ceil, cip):
    x = rng.randn(2, 5, h, w).astype(np.float32)
    ref = F.avg_pool2d(torch.from_numpy(x), k, s, p, ceil_mode=ceil,
                       count_include_pad=cip).numpy()
    got = _nchw(pooling.avg_pool(_nhwc(x), k, s, p, ceil_mode=ceil,
                                 count_include_pad=cip))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_max_pool3d_matches_torch(rng):
    x = rng.randn(1, 4, 9, 15, 15).astype(np.float32)
    ref = F.max_pool3d(torch.from_numpy(x), (3, 3, 3), (2, 2, 2), (1, 1, 1)).numpy()
    got = np.transpose(np.asarray(
        pooling.max_pool(np.transpose(x, (0, 2, 3, 4, 1)), 3, 2, 1)), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_avg_pool3d_asym_matches_torch(rng):
    x = rng.randn(1, 4, 8, 14, 14).astype(np.float32)
    ref = F.avg_pool3d(torch.from_numpy(x), (2, 3, 3), (2, 2, 2), (0, 1, 1)).numpy()
    got = np.transpose(np.asarray(
        pooling.avg_pool(np.transpose(x, (0, 2, 3, 4, 1)), (2, 3, 3), (2, 2, 2),
                         (0, 1, 1))), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('insize,outsize', [(7, 1), (14, 7), (13, 4), (10, 3)])
def test_adaptive_avg_pool2d_matches_torch(rng, insize, outsize):
    x = rng.randn(2, 3, insize, insize).astype(np.float32)
    ref = F.adaptive_avg_pool2d(torch.from_numpy(x), outsize).numpy()
    got = _nchw(pooling.adaptive_avg_pool(_nhwc(x), outsize))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('insize,outsize', [(7, 1), (13, 4), (10, 3)])
def test_adaptive_max_pool2d_matches_torch(rng, insize, outsize):
    x = rng.randn(2, 3, insize, insize).astype(np.float32)
    ref = F.adaptive_max_pool2d(torch.from_numpy(x), outsize).numpy()
    got = _nchw(pooling.adaptive_max_pool(_nhwc(x), outsize))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_adaptive_avgmax_modes(rng):
    x = _nhwc(rng.randn(2, 3, 8, 8).astype(np.float32))
    avg = pooling.adaptive_avgmax_pool2d(x, 'avg')
    mx = pooling.adaptive_avgmax_pool2d(x, 'max')
    both = pooling.adaptive_avgmax_pool2d(x, 'avgmax')
    cat = pooling.adaptive_avgmax_pool2d(x, 'avgmaxc')
    np.testing.assert_allclose(np.asarray(both), 0.5 * (np.asarray(avg) + np.asarray(mx)), rtol=1e-6)
    assert cat.shape[-1] == 2 * x.shape[-1]
