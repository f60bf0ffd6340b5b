"""Dynamic-shape bucketing: bounded compilations for variable input sizes
(SURVEY §7 hard part; VERDICT r1 #7; FBResNet variable H x W,
reference README.md:480-487)."""

import numpy as np

import jax

import pretorched_tpu
from pretorched_tpu.utils.bucketing import (BucketedModel, bucket_dim,
                                            bucket_frames, bucket_spatial,
                                            resample_frames_to_bucket,
                                            resize_to_bucket)


def test_bucket_dim_math():
    assert bucket_dim(224, 32) == 224          # on the ladder: untouched
    assert bucket_dim(225, 32) == 256
    assert bucket_dim(230, 32) == 256
    assert bucket_dim(1, 32) == 32
    assert bucket_dim(200, ladder=[224, 256, 331]) == 224
    assert bucket_dim(300, ladder=[224, 256, 331]) == 331
    # above every rung: rounds UP via the multiple rule (never a silent
    # downsize, which would change eval numerics) and warns
    import pytest as _pytest
    with _pytest.warns(UserWarning, match='exceeds every ladder rung'):
        assert bucket_dim(999, ladder=[224, 256, 331]) == 1024
    assert bucket_spatial(230, 300, 32) == (256, 320)
    assert bucket_frames(13, 8) == 16


def test_resize_and_resample():
    x = np.random.RandomState(0).randn(2, 230, 300, 3).astype(np.float32)
    y = resize_to_bucket(x, 32)
    assert y.shape == (2, 256, 320, 3)
    x = np.random.RandomState(0).randn(1, 13, 8, 8, 3).astype(np.float32)
    y = resample_frames_to_bucket(x, 8)
    assert y.shape == (1, 16, 8, 8, 3)
    # exact shapes pass through untouched (no-op, same object)
    x224 = np.zeros((1, 224, 224, 3), np.float32)
    assert resize_to_bucket(x224, 32) is x224


def test_three_nearby_shapes_two_compiles():
    """3 nearby input sizes must hit <= 2 compiled programs."""
    model = pretorched_tpu.fbresnet18(num_classes=10, pretrained=None)
    model.eval()
    bucketed = BucketedModel(model, spatial_multiple=32)
    for size in (224, 230, 236):
        x = np.zeros((1, 3, size, size), np.float32)
        out = bucketed(x)
        assert out.shape == (1, 10)
    # the wrapper holds exactly one jitted apply for this (mode, head, ...)
    # combination; jax.jit retraces per distinct input shape
    (fn,) = model._jit_cache.values()
    assert fn._cache_size() <= 2, fn._cache_size()   # {224, 256} buckets


def test_bucketed_video_model():
    model = pretorched_tpu.resnet3d10(num_classes=5, pretrained=None)
    model.eval()
    bucketed = BucketedModel(model, spatial_multiple=32, frame_multiple=8)
    for t, s in ((13, 30), (16, 32), (15, 31)):
        x = np.zeros((1, 3, t, s, s), np.float32)
        assert bucketed(x).shape == (1, 5)
    # metadata passthrough
    assert bucketed.num_params() == model.num_params()
