"""Native JPEG decoder vs PIL (both drive libjpeg -> exact match expected)."""

import io
import time

import numpy as np
import pytest
from PIL import Image

from pretorched_tpu.datasets import native


def _jpeg_bytes(rng, h, w, quality=90):
    img = Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, 'JPEG', quality=quality)
    return buf.getvalue()


def test_native_builds():
    assert native.native_available(), 'g++/libjpeg expected in this image'


def test_decode_matches_pil():
    rng = np.random.RandomState(0)
    bufs = [_jpeg_bytes(rng, 240, 320), _jpeg_bytes(rng, 480, 640),
            _jpeg_bytes(rng, 37, 53)]
    got = native.decode_jpeg_batch(bufs, threads=3)
    for b, g in zip(bufs, got):
        ref = np.asarray(Image.open(io.BytesIO(b)).convert('RGB'))
        assert g.shape == ref.shape
        np.testing.assert_array_equal(g, ref)


def test_decode_scaled():
    rng = np.random.RandomState(1)
    bufs = [_jpeg_bytes(rng, 512, 512)]
    half = native.decode_jpeg_batch(bufs, scale_denom=2)[0]
    assert half.shape == (256, 256, 3)


def test_decode_cat_jpg():
    arrs = native.decode_jpeg_files(['data/cat.jpg'])
    ref = np.asarray(Image.open('data/cat.jpg').convert('RGB'))
    np.testing.assert_array_equal(arrs[0], ref)


def test_corrupt_jpeg_falls_back():
    rng = np.random.RandomState(2)
    bufs = [_jpeg_bytes(rng, 64, 64), b'not a jpeg at all']
    with pytest.raises(Exception):
        native.decode_jpeg_batch(bufs)  # PIL fallback raises on garbage too


def test_throughput_smoke():
    """Correctness smoke at batch scale. (No timing assertion: this sandbox
    has a single CPU core, so threaded-vs-serial comparisons are noise; the
    pool shows gains on real multi-core hosts.)"""
    rng = np.random.RandomState(3)
    bufs = [_jpeg_bytes(rng, 480, 640) for _ in range(32)]
    out = native.decode_jpeg_batch(bufs, threads=8)
    assert len(out) == 32
    assert all(o.shape == (480, 640, 3) for o in out)
