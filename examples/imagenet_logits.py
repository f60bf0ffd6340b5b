#!/usr/bin/env python
"""Single-image ImageNet prediction CLI.

TPU-native equivalent of the reference's examples/imagenet_logits.py: load a
model from the factory registry, derive the preprocessing from its metadata,
print the argmax class (the canonical "cat.jpg -> 'tiger cat'" smoke test,
reference README.md:188-191).

Usage:
    python examples/imagenet_logits.py data/cat.jpg -a resnet18
    python examples/imagenet_logits.py data/cat.jpg -a resnet50 --pretrained none
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description='ImageNet single-image logits')
    parser.add_argument('path_img', help='path to an image')
    parser.add_argument('--arch', '-a', default='resnet18',
                        help='model architecture name')
    parser.add_argument('--pretrained', default='imagenet',
                        help="pretrained dataset tag, or 'none'")
    parser.add_argument('--cpu', action='store_true', help='force CPU backend')
    args = parser.parse_args()

    if args.cpu:
        os.environ['JAX_PLATFORMS'] = 'cpu'
        import jax
        jax.config.update('jax_platforms', 'cpu')

    import pretorched_tpu as pretorched
    from pretorched_tpu.datasets.utils import load_imagenet_classes
    from pretorched_tpu.transforms import LoadImage, TransformImage

    pretrained = None if args.pretrained in ('none', 'None', '') else args.pretrained
    print(f"=> creating model '{args.arch}' (pretrained={pretrained})")
    model = pretorched.__dict__[args.arch](num_classes=1000, pretrained=pretrained)
    model.eval()

    settings = (model.settings if model.settings is not None
                else pretorched.pretrained_settings[args.arch]['imagenet'])
    tf_img = TransformImage(settings)
    img = LoadImage()(args.path_img)
    x = tf_img(img)[None]          # (1, C, H, W)

    logits = np.asarray(model(x))[0]
    idx = int(logits.argmax())

    data_dir = os.path.join(os.path.dirname(__file__), '..', 'data')
    classes = load_imagenet_classes(
        os.path.join(data_dir, 'imagenet_synsets.txt'),
        os.path.join(data_dir, 'imagenet_classes.txt'))
    print(f"'{args.arch}': '{args.path_img}' is a '{classes[idx]}' "
          f'(class {idx}, logit {logits[idx]:.3f})')


if __name__ == '__main__':
    main()
