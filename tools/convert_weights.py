#!/usr/bin/env python
"""Offline checkpoint conversion + golden-logit capture + accuracy check.

The systematized version of the reference's porting workflow
(models/fbresnet/resnet152_load.py: dump -> rebuild -> compare). For every
.pth present in the weight cache this tool:

1. builds the matching model with ``pretrained=<tag>`` (triggering the
   mechanical torch->flax conversion + msgpack caching in zoo/io),
2. runs data/cat.jpg through the model's own metadata-derived transform,
3. stores the logits to ``golden/<name>-<tag>.npy`` for regression testing,
4. with ``--eval VALDIR``: evaluates ImageNet center-crop accuracy on the
   folder and prints measured vs published (BASELINE.md, reference
   README.md:203-282) Acc@1/Acc@5 with PASS/FAIL at |delta| <= --tol.

Usage:
    python tools/convert_weights.py                  # convert everything
    python tools/convert_weights.py resnet50 alexnet # specific models
    python tools/convert_weights.py --eval /data/imagenet/val \
        --limit 5000 resnet50                        # accuracy vs baseline

The whole pipeline (fabricated .pth -> convert -> evaluate -> table) is
CI-proven with a synthetic checkpoint in tests/test_golden_workflow.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np  # noqa: E402

# reference-documented per-model eval protocol deviations (BASELINE.md
# "Measurement caveats": polynet resizes square 378 -> 331 center crop,
# README.md:276; xception's 0.8975 scale comes from its own settings)
EVAL_OVERRIDES = {
    'polynet': {'preserve_aspect_ratio': False},
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('models', nargs='*', help='model names (default: all)')
    ap.add_argument('--golden-dir', default='golden')
    ap.add_argument('--image', default='data/cat.jpg')
    ap.add_argument('--cpu', action='store_true')
    ap.add_argument('--eval', dest='valdir', default=None, metavar='VALDIR',
                    help='ImageNet val folder: evaluate each converted model '
                         'and compare to BASELINE.md')
    ap.add_argument('--limit', type=int, default=None,
                    help='eval at most N images (subset runs)')
    ap.add_argument('-b', '--batch-size', type=int, default=64)
    ap.add_argument('--tol', type=float, default=0.1,
                    help='PASS threshold on |measured - published| (%%)')
    ap.add_argument('--baseline', default=None,
                    help='path to BASELINE.md (default: repo root)')
    args = ap.parse_args(argv)
    if args.cpu:
        os.environ['JAX_PLATFORMS'] = 'cpu'
        import jax
        jax.config.update('jax_platforms', 'cpu')
    # strict weights for the duration of the tool only — restored on exit so
    # an in-process caller (tests) doesn't leak the env var
    prior_strict = os.environ.get('PRETORCHED_STRICT_WEIGHTS')
    os.environ['PRETORCHED_STRICT_WEIGHTS'] = '1'
    try:
        return _run(args)
    finally:
        if prior_strict is None:
            os.environ.pop('PRETORCHED_STRICT_WEIGHTS', None)
        else:
            os.environ['PRETORCHED_STRICT_WEIGHTS'] = prior_strict


def _run(args):
    import pretorched_tpu as pretorched
    from pretorched_tpu.transforms import LoadImage, TransformImage
    from pretorched_tpu.zoo import golden as zoo_golden
    from pretorched_tpu.zoo import io as zoo_io

    names = args.models or pretorched.model_names
    os.makedirs(args.golden_dir, exist_ok=True)
    img = LoadImage()(args.image)
    baseline = zoo_golden.parse_baseline(args.baseline) if args.valdir else {}
    converted, skipped, table, failures = [], [], [], 0
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
            # The factory stamps the channels-last init rank (settings can't
            # distinguish image from video — both use [C, H, W]).
            shape = settings['input_size']
            ndim = getattr(model, 'input_ndim', 4)
            is_video = ndim != 4
            if ndim == 5:
                # video checkpoints have no published accuracy table
                # (BASELINE.md) — parity is logit-match on a fixed-seed clip
                t = shape[1] if len(shape) == 4 else 16
                clip = np.random.RandomState(0).rand(
                    1, shape[0], t, shape[-2], shape[-1]).astype(np.float32)
                logits = np.asarray(model(clip))[0]
            elif ndim == 3:        # audio: fixed-seed waveform golden
                wav = (np.random.RandomState(0)
                       .rand(1, shape[0], shape[-1]).astype(np.float32) * 2
                       - 1)
                logits = np.asarray(model(wav))[0]
            else:
                x = TransformImage(settings)(img)[None]
                logits = np.asarray(model(x))[0]
            np.save(os.path.join(args.golden_dir, f'{name}-{tag}.npy'),
                    logits)
            top = int(logits.argmax())
            if is_video:
                print(f'{name}/{tag}: converted (video; fixed-seed clip '
                      f'golden logits saved, argmax={top})')
            else:
                print(f'{name}/{tag}: converted; cat.jpg argmax={top} '
                      f'logit={logits[top]:.3f}')
                if args.valdir:
                    top1, top5, n = zoo_golden.evaluate_imagenet(
                        model, args.valdir, batch_size=args.batch_size,
                        limit=args.limit, **EVAL_OVERRIDES.get(name, {}))
                    row = zoo_golden.accuracy_row(
                        name, tag, top1, top5, n, baseline, tol=args.tol)
                    failures += row.endswith('FAIL')
                    table.append(row)
                    print('* ' + row, flush=True)
            converted.append(f'{name}/{tag}')
    print(f'\nconverted {len(converted)}; '
          f'skipped (no local weights): {len(skipped)}')
    if table:
        print('\n== accuracy vs BASELINE.md '
              f'(tol {args.tol}, limit {args.limit}) ==')
        for row in table:
            print(row)
        print(f'{len(table) - failures}/{len(table)} within tolerance')
    return 1 if failures else 0


if __name__ == '__main__':
    sys.exit(main())
