#!/usr/bin/env python
"""Architecture introspection demo.

TPU-native equivalent of the reference's examples/visu_arch.py: print
per-layer output shapes for a forward pass and dump first-layer filters +
activations as images. Instead of torch forward hooks (visu_arch.py:75-92)
we walk the traced jaxpr — exact shapes with zero execution — and run one
real forward for the activation dumps.

Usage:
    python examples/visu_arch.py -a resnet18 --image data/cat.jpg
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--arch', '-a', default='resnet18')
    p.add_argument('--image', default='data/cat.jpg')
    p.add_argument('--outdir', default='/tmp/visu')
    p.add_argument('--cpu', action='store_true')
    args = p.parse_args()
    if args.cpu:
        os.environ['JAX_PLATFORMS'] = 'cpu'
        import jax
        jax.config.update('jax_platforms', 'cpu')

    import jax

    import pretorched_tpu as pretorched
    from pretorched_tpu.transforms import LoadImage, TransformImage

    model = pretorched.__dict__[args.arch](num_classes=1000, pretrained=None)
    settings = pretorched.pretrained_settings[args.arch]['imagenet']

    # per-op shape listing via jaxpr (the hook-printing analog)
    x_spec = jax.ShapeDtypeStruct(
        (1, settings['input_size'][1], settings['input_size'][2], 3),
        np.float32)
    jaxpr = jax.make_jaxpr(
        lambda v, x: model.module.apply(v, x))(model.variables, x_spec)
    print(f'== {args.arch}: traced ops and output shapes ==')
    # convs/matmuls always; pooling windows too (the reference's hooks print
    # every module's output size, visu_arch.py:75-92)
    for eqn in jaxpr.jaxpr.eqns:
        if eqn.primitive.name in ('conv_general_dilated', 'dot_general',
                                  'reduce_window_max', 'reduce_window_sum'):
            shapes = [tuple(v.aval.shape) for v in eqn.outvars]
            print(f'{eqn.primitive.name:24s} -> {shapes}')

    # one real forward: dump input, first-conv filters, first activations
    img = LoadImage()(args.image)
    x = TransformImage(settings)(img)[None]
    feats = np.asarray(model.features(x))
    print(f'features: {feats.shape}; logits: {np.asarray(model(x)).shape}')

    os.makedirs(args.outdir, exist_ok=True)
    from PIL import Image

    def save_grid(arr, path, pad=1):
        n, h, w = arr.shape[:3]
        cols = int(np.ceil(np.sqrt(n)))
        rows = int(np.ceil(n / cols))
        grid = np.zeros((rows * (h + pad), cols * (w + pad)), np.float32)
        for i in range(n):
            r, c = divmod(i, cols)
            a = arr[i]
            a = (a - a.min()) / max(a.max() - a.min(), 1e-6)
            grid[r*(h+pad):r*(h+pad)+h, c*(w+pad):c*(w+pad)+w] = a
        Image.fromarray((grid * 255).astype(np.uint8)).save(path)

    # first conv kernel (any model with a stem conv named conv1-like)
    params = model.variables['params']
    first = next((k for k in params if 'kernel' in params[k]
                  and np.ndim(params[k]['kernel']) == 4), None)
    if first:
        k = np.asarray(params[first]['kernel'])          # (h, w, in, out)
        save_grid(np.transpose(k.mean(2), (2, 0, 1)),
                  os.path.join(args.outdir, 'filters.png'))
        print(f"saved first-layer filters ({first}) to {args.outdir}/filters.png")
    save_grid(feats[0][:64], os.path.join(args.outdir, 'activations.png'))
    print(f'saved feature activations to {args.outdir}/activations.png')


if __name__ == '__main__':
    main()
