"""Fused device preprocessing vs the PIL oracle (tolerance-tested)."""

import numpy as np
from PIL import Image

from pretorched_tpu.transforms import TransformImage
from pretorched_tpu.transforms.fused import (fused_preprocess, preprocess_clip,
                                             ten_crop)

SETTINGS = {
    'input_space': 'RGB', 'input_size': [3, 224, 224], 'input_range': [0, 1],
    'mean': [0.485, 0.456, 0.406], 'std': [0.229, 0.224, 0.225],
}


def test_fused_matches_pil_oracle():
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 255, (300, 400, 3), np.uint8)
    oracle = TransformImage(SETTINGS)(Image.fromarray(raw))       # (3,224,224)
    fused = np.asarray(fused_preprocess(raw, SETTINGS,
                                        channels_last=False))[0]
    assert fused.shape == oracle.shape
    # antialiased bilinear resize: close but not bit-equal to PIL
    diff = np.abs(fused - oracle)
    assert np.percentile(diff, 99) < 0.12, np.percentile(diff, 99)
    assert diff.mean() < 0.02, diff.mean()


def test_fused_bf16_matches_f32():
    """dtype='bfloat16' (half the HBM traffic, MXU resize) stays within
    bf16 rounding of the f32 chain — uint8->bf16 is exact, so the only
    noise is /255 + bilinear accumulation + the final affine."""
    rng = np.random.RandomState(3)
    raw = rng.randint(0, 255, (2, 300, 400, 3), np.uint8)
    f32 = np.asarray(fused_preprocess(raw, SETTINGS))
    bf16 = np.asarray(fused_preprocess(raw, SETTINGS,
                                       dtype='bfloat16')).astype(np.float32)
    assert bf16.dtype == np.float32 and bf16.shape == f32.shape
    # normalized units: values span ~[-2.1, 2.6]; bf16 eps ~ 2^-8
    diff = np.abs(bf16 - f32)
    assert diff.max() < 0.08, diff.max()
    assert diff.mean() < 0.01, diff.mean()


def test_fused_bgr_255():
    s = dict(SETTINGS, input_space='BGR', input_range=[0, 255],
             mean=[104, 117, 128], std=[1, 1, 1])
    raw = np.random.RandomState(0).randint(0, 255, (256, 256, 3), np.uint8)
    out = np.asarray(fused_preprocess(raw, s))[0]
    assert out.shape == (224, 224, 3)
    # un-normalize: values should be in [0, 255] and channel order flipped
    un = out + np.array(s['mean'])
    assert un.min() >= -1e-3 and un.max() <= 255 + 1e-3


def test_ten_crop():
    x = np.random.RandomState(0).randn(2, 256, 256, 3).astype(np.float32)
    crops = np.asarray(ten_crop(x, 224))
    assert crops.shape == (2, 10, 224, 224, 3)
    # crop 0 = top-left corner; crop 5 = its horizontal flip
    np.testing.assert_allclose(crops[:, 0], x[:, :224, :224, :])
    np.testing.assert_allclose(crops[:, 5], x[:, :224, :224, :][:, :, ::-1, :])


def test_preprocess_clip():
    frames = np.random.RandomState(0).randint(0, 255, (8, 256, 320, 3), np.uint8)
    out = np.asarray(preprocess_clip(frames, SETTINGS, channels_last=False))
    assert out.shape == (1, 3, 8, 224, 224)


def test_fast_eval_batches(tmp_path):
    import os

    from PIL import Image as PILImage

    from pretorched_tpu.datasets.folder import fast_eval_batches

    rng = np.random.RandomState(0)
    for cls in ('a', 'b'):
        d = tmp_path / 'val' / cls
        os.makedirs(d)
        for i in range(3):
            PILImage.fromarray(rng.randint(0, 255, (200 + 10 * i, 260, 3),
                                           np.uint8)).save(d / f'{i}.jpg')
    total = 0
    for batch, labels in fast_eval_batches(str(tmp_path / 'val'), SETTINGS, 4):
        assert batch.shape[1:] == (224, 224, 3)
        assert len(labels) == batch.shape[0]
        total += batch.shape[0]
    assert total == 6


def test_fast_eval_batches_dct_scaled_decode(tmp_path):
    """Large sources decode at reduced DCT scale (header-driven batch denom)
    and still come out at the model's crop size."""
    import os

    from PIL import Image as PILImage

    from pretorched_tpu.datasets.folder import fast_eval_batches

    rng = np.random.RandomState(1)
    d = tmp_path / 'val' / 'a'
    os.makedirs(d)
    for i in range(2):
        PILImage.fromarray(
            rng.randint(0, 255, (1100, 1200, 3), np.uint8)).save(d / f'{i}.jpg')
    total = 0
    for batch, labels in fast_eval_batches(str(tmp_path / 'val'), SETTINGS, 2):
        assert batch.shape[1:] == (224, 224, 3)
        total += batch.shape[0]
    assert total == 2


def test_batch_iterator_early_break_frees_producer():
    """Abandoning the generator early must unblock the producer thread
    (bounded queue) instead of pinning it and its thread pool forever."""
    import threading
    import time

    from pretorched_tpu.datasets.folder import batch_iterator

    class DS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return np.zeros((8, 8, 3), np.float32), 0

    before = threading.active_count()
    it = batch_iterator(DS(), batch_size=4, num_workers=2, prefetch=2)
    next(it)
    it.close()                      # GeneratorExit -> abandoned.set()
    for _ in range(100):            # producer + pool wind down
        if threading.active_count() <= before:
            break
        time.sleep(0.1)
    assert threading.active_count() <= before


def test_fast_eval_batches_prefetch_and_error_propagation(tmp_path):
    """The threaded producer (host decode overlapping device compute):
    early consumer exit doesn't hang, and a decode error surfaces to the
    consumer instead of being swallowed in the producer thread."""
    import os

    from PIL import Image as PILImage

    from pretorched_tpu.datasets.folder import fast_eval_batches

    rng = np.random.RandomState(2)
    d = tmp_path / 'val' / 'a'
    os.makedirs(d)
    for i in range(6):
        PILImage.fromarray(rng.randint(0, 255, (64, 64, 3),
                                       np.uint8)).save(d / f'{i}.jpg')
    # early exit: take one batch and drop the generator
    gen = fast_eval_batches(str(tmp_path / 'val'), SETTINGS, 2, prefetch=1)
    next(gen)
    gen.close()         # must not hang (producer abandons)

    # error propagation: corrupt file that PIL cannot open either
    (d / 'bad.jpg').write_bytes(b'not a jpeg at all')
    import pytest

    with pytest.raises(Exception):
        for _ in fast_eval_batches(str(tmp_path / 'val'), SETTINGS, 3):
            pass


def test_batch_iterator_error_propagates_no_hang():
    """A raising __getitem__ must surface to the consumer (pre-r3 the
    producer died without enqueuing the stop sentinel -> q.get() hung)."""
    import pytest

    from pretorched_tpu.datasets.folder import batch_iterator

    class Bad:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise OSError('corrupt image')
            return np.zeros((4, 4, 3), np.float32), 0

    with pytest.raises(OSError, match='corrupt image'):
        for _ in batch_iterator(Bad(), 4, num_workers=2):
            pass


def test_fused_train_augmentation():
    """fused_train_preprocess: per-sample random crop + hflip on device,
    PRNG-keyed (reference TransformImage(random_crop=True, random_hflip=True)
    semantics, transforms/utils.py:61-71, without host PIL or global RNG)."""
    import jax

    from pretorched_tpu.transforms.fused import fused_train_preprocess

    rng = np.random.RandomState(1)
    raw = rng.randint(0, 255, (8, 280, 350, 3), np.uint8)
    key = jax.random.PRNGKey(0)

    out = np.asarray(fused_train_preprocess(raw, SETTINGS, key))
    assert out.shape == (8, 224, 224, 3)
    # deterministic under the same key, different under another
    out2 = np.asarray(fused_train_preprocess(raw, SETTINGS, key))
    np.testing.assert_array_equal(out, out2)
    out3 = np.asarray(fused_train_preprocess(raw, SETTINGS,
                                             jax.random.PRNGKey(7)))
    assert np.abs(out - out3).max() > 1e-3

    # normalization chain unchanged: batch statistics match the eval chain's
    # (crops of the same images through the same affine)
    full = np.asarray(fused_preprocess(raw, SETTINGS))
    assert np.abs(out.mean() - full.mean()) < 0.2


def test_fused_train_identity_when_no_freedom():
    """When the resized plane exactly equals the crop size there is no crop
    freedom: the train chain must equal the eval chain up to hflip."""
    import jax

    from pretorched_tpu.transforms.fused import fused_train_preprocess

    s = dict(SETTINGS, scale=1.0)
    rng = np.random.RandomState(2)
    raw = rng.randint(0, 255, (6, 224, 224, 3), np.uint8)   # square -> 224x224
    ev = np.asarray(fused_preprocess(raw, s))
    tr = np.asarray(fused_train_preprocess(raw, s, jax.random.PRNGKey(3)))
    match = np.abs(tr - ev).max(axis=(1, 2, 3)) < 1e-5
    match_flip = np.abs(tr - ev[:, :, ::-1, :]).max(axis=(1, 2, 3)) < 1e-5
    assert np.all(match | match_flip)
    assert match.any() and match_flip.any()   # p=0.5 each over 6 samples...


def test_batch_iterator_multihost_sharding():
    """shard_id/num_shards: disjoint deterministic shards of the same
    global shuffle, equal batch counts per shard (collective lockstep),
    and every retained sample appears in exactly one shard."""
    from pretorched_tpu.datasets.folder import batch_iterator

    class DS:
        def __len__(self):
            return 103          # not a multiple of num_shards

        def __getitem__(self, i):
            return np.full((2, 2, 3), i, np.float32), i

    def collect(shard_id, num_shards):
        labels = []
        nbatches = 0
        for _, lab in batch_iterator(DS(), batch_size=8, shuffle=True,
                                     seed=7, num_workers=2,
                                     shard_id=shard_id,
                                     num_shards=num_shards):
            labels.extend(lab.tolist())
            nbatches += 1
        return labels, nbatches

    shards = [collect(s, 4) for s in range(4)]
    sizes = [len(lab) for lab, _ in shards]
    counts = [nb for _, nb in shards]
    assert sizes == [25, 25, 25, 25]          # 103 -> truncated to 100
    assert counts == [4] * 4                  # equal batch counts
    union = sorted(sum((lab for lab, _ in shards), []))
    assert len(set(union)) == 100             # disjoint
    # deterministic: same seed reproduces the same shard
    again, _ = collect(2, 4)
    assert again == shards[2][0]
    # single-shard default is unchanged
    all_lab, _ = collect(0, 1)
    assert sorted(all_lab) == list(range(103))
