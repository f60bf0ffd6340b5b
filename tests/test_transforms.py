"""Transform pipeline semantics (reference: transforms/utils.py:34-114)."""

import numpy as np
from PIL import Image

from pretorched_tpu.transforms import (LoadImage, TransformImage,
                                       LoadTransformImage)

SETTINGS = {
    'input_space': 'RGB', 'input_size': [3, 224, 224], 'input_range': [0, 1],
    'mean': [0.485, 0.456, 0.406], 'std': [0.229, 0.224, 0.225],
}


def _img(w=300, h=200):
    rng = np.random.RandomState(0)
    return Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8))


def test_output_shape_and_norm():
    tf = TransformImage(SETTINGS)
    out = tf(_img())
    assert out.shape == (3, 224, 224)
    assert out.dtype == np.float32
    # resize shorter side to floor(224/0.875)=256, center crop 224
    # un-normalize must land in [0, 1]
    un = out * np.array(SETTINGS['std']).reshape(-1, 1, 1) + \
        np.array(SETTINGS['mean']).reshape(-1, 1, 1)
    assert un.min() >= -1e-5 and un.max() <= 1 + 1e-5


def test_bgr_and_range255():
    s = dict(SETTINGS, input_space='BGR', input_range=[0, 255],
             mean=[104, 117, 128], std=[1, 1, 1])
    rgb = TransformImage(SETTINGS)(_img())
    bgr = TransformImage(s)(_img())
    # undo normalization on both, compare channel order
    rgb01 = rgb * np.array(SETTINGS['std']).reshape(-1, 1, 1) + \
        np.array(SETTINGS['mean']).reshape(-1, 1, 1)
    bgr255 = bgr + np.array(s['mean']).reshape(-1, 1, 1)
    np.testing.assert_allclose(bgr255[::-1] / 255.0, rgb01, atol=1e-5)


def test_scale_from_settings():
    s = dict(SETTINGS, input_size=[3, 299, 299], scale=0.8975)
    tf = TransformImage(s)
    assert abs(tf.scale - 0.8975) < 1e-9
    assert tf(_img(600, 400)).shape == (3, 299, 299)


def test_load_transform_image(tmp_path):
    p = tmp_path / 'img.png'
    _img().save(p)
    img = LoadImage()(str(p))
    assert img.mode == 'RGB'
    out = LoadTransformImage(SETTINGS)(str(p))
    assert out.shape == (3, 224, 224)


def test_random_crop_flip_deterministic_seed():
    tf1 = TransformImage(SETTINGS, random_crop=True, random_hflip=True, seed=0)
    tf2 = TransformImage(SETTINGS, random_crop=True, random_hflip=True, seed=0)
    a, b = tf1(_img()), tf2(_img())
    np.testing.assert_array_equal(a, b)
