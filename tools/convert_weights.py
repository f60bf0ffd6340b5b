#!/usr/bin/env python
"""Offline checkpoint conversion + golden-logit capture.

The systematized version of the reference's porting workflow
(models/fbresnet/resnet152_load.py: dump -> rebuild -> compare). For every
.pth present in the weight cache this tool:

1. builds the matching model with ``pretrained=<tag>`` (triggering the
   mechanical torch->flax conversion + msgpack caching in zoo/io),
2. runs data/cat.jpg through the model's own metadata-derived transform,
3. stores the logits to ``golden/<name>-<tag>.npy`` for regression testing.

Usage:
    python tools/convert_weights.py                  # everything available
    python tools/convert_weights.py resnet50 alexnet # specific models
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('models', nargs='*', help='model names (default: all)')
    ap.add_argument('--golden-dir', default='golden')
    ap.add_argument('--image', default='data/cat.jpg')
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()
    if args.cpu:
        os.environ['JAX_PLATFORMS'] = 'cpu'
        import jax
        jax.config.update('jax_platforms', 'cpu')
    os.environ['PRETORCHED_STRICT_WEIGHTS'] = '1'

    import pretorched_tpu as pretorched
    from pretorched_tpu.transforms import LoadImage, TransformImage
    from pretorched_tpu.zoo import io as zoo_io

    names = args.models or pretorched.model_names
    os.makedirs(args.golden_dir, exist_ok=True)
    img = LoadImage()(args.image)
    converted, skipped = [], []
    for name in names:
        for tag, settings in pretorched.pretrained_settings.get(name, {}).items():
            url = settings.get('url')
            if not url or zoo_io.find_torch_checkpoint(url) is None:
                if not zoo_io.converted_path(name, tag).exists():
                    skipped.append(f'{name}/{tag}')
                    continue
            try:
                model = pretorched.__dict__[name](
                    num_classes=settings['num_classes'], pretrained=tag)
            except Exception as e:  # noqa: BLE001
                print(f'!! {name}/{tag}: {type(e).__name__}: {e}')
                continue
            model.eval()
            if len(settings['input_size']) == 3:   # image models only
                x = TransformImage(settings)(img)[None]
                logits = np.asarray(model(x))[0]
                np.save(os.path.join(args.golden_dir, f'{name}-{tag}.npy'),
                        logits)
                top = int(logits.argmax())
                print(f'{name}/{tag}: converted; cat.jpg argmax={top} '
                      f'logit={logits[top]:.3f}')
            else:
                print(f'{name}/{tag}: converted (video; no golden image)')
            converted.append(f'{name}/{tag}')
    print(f'\nconverted {len(converted)}; '
          f'skipped (no local weights): {len(skipped)}')


if __name__ == '__main__':
    main()
