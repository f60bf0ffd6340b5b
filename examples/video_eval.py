#!/usr/bin/env python
"""Multi-clip video evaluation CLI (Kinetics/Moments-style).

The north-star capability beyond the reference (BASELINE configs 3-4): N-clip
consensus evaluation of a video model, sharded over the TPU mesh. Expects the
common frame-folder layout:

    root/<class_name>/<video_id>/{frame_00001.jpg, ...}

Each video is sampled as ``--clips`` clips of ``--frames`` frames (uniform
temporal stride), decoded with the native JPEG decoder, preprocessed on
device, and scored with log-softmax consensus over clips.

Usage:
    python examples/video_eval.py /data/kinetics/val -a resnet3d50 \
        --pretrained kinetics-400 --frames 16 --clips 10
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser(description='Multi-clip video eval (TPU)')
    p.add_argument('data', help='root with class/video/frame.jpg layout')
    p.add_argument('--arch', '-a', default='resnet3d50')
    p.add_argument('--pretrained', default='kinetics-400')
    p.add_argument('--num-classes', default=400, type=int)
    p.add_argument('--frames', default='16',
                   help="frames per clip (int), or 'native': use each "
                        "video's own length (capped by --max-frames), "
                        'bucketed to --frame-multiple so ragged videos '
                        'compile at most once per rung')
    p.add_argument('--max-frames', default=64, type=int,
                   help='native-mode cap on frames per clip')
    p.add_argument('--frame-multiple', default=8, type=int,
                   help='native-mode temporal bucket size')
    p.add_argument('--clips', default=10, type=int)
    p.add_argument('--batch-size', '-b', default=4, type=int,
                   help='videos per step (x clips = clip batch)')
    p.add_argument('--size', default=224, type=int)
    p.add_argument('--workers', '-j', default=8, type=int)
    p.add_argument('--print-freq', default=10, type=int)
    p.add_argument('--cpu', action='store_true')
    p.add_argument('--compile-cache', nargs='?', const='1', default=None,
                   metavar='DIR',
                   help='persistent XLA compilation cache (optional DIR; '
                        'defaults to ~/.cache/pretorched/xla)')
    return p.parse_args()


def list_videos(root):
    classes = sorted(d.name for d in os.scandir(root) if d.is_dir())
    class_to_idx = {c: i for i, c in enumerate(classes)}
    videos = []
    for c in classes:
        cdir = os.path.join(root, c)
        for v in sorted(os.scandir(cdir), key=lambda d: d.name):
            if v.is_dir():
                frames = sorted(
                    os.path.join(v.path, f) for f in os.listdir(v.path)
                    if f.lower().endswith(('.jpg', '.jpeg', '.png')))
                if frames:
                    videos.append((frames, class_to_idx[c]))
    return videos, classes


def sample_clips(frames, num_clips, clip_len):
    """Uniformly-spaced clip starts, frames within a clip are consecutive
    (looped when the video is short)."""
    n = len(frames)
    starts = np.linspace(0, max(n - clip_len, 0), num_clips).astype(int)
    return [[frames[min(s + t, n - 1)] for t in range(clip_len)]
            for s in starts]


def main():
    args = parse_args()
    import jax
    if args.cpu:
        # env-var overrides don't stick here (site hook); use the config API
        jax.config.update('jax_platforms', 'cpu')
    if args.compile_cache is not None:
        from pretorched_tpu.utils.compile_cache import enable_from_flag
        print(f"=> XLA compile cache: {enable_from_flag(args.compile_cache)}")
    import jax.numpy as jnp

    import pretorched_tpu as pretorched
    from pretorched_tpu.datasets.native import decode_jpeg_files
    from pretorched_tpu.parallel import make_mesh
    from pretorched_tpu.parallel.evaluate import multi_clip_eval_step, pad_batch
    from pretorched_tpu.transforms.fused import fused_preprocess
    from pretorched_tpu.utils import AverageMeter, DeviceRunningSums

    pretrained = None if args.pretrained in ('none', '') else args.pretrained
    print(f"=> creating '{args.arch}' (pretrained={pretrained})")
    model = pretorched.__dict__[args.arch](
        num_classes=args.num_classes, pretrained=pretrained)
    model.eval().bfloat16()
    settings = (model.settings or
                {'input_space': 'RGB', 'input_size': [3, args.size, args.size],
                 'input_range': [0, 1], 'mean': [0.485, 0.456, 0.406],
                 'std': [0.229, 0.224, 0.225]})

    native_t = args.frames == 'native'
    fixed_frames = None if native_t else int(args.frames)

    # this CLI is single-PROCESS by design: native-T bucketing means each
    # process's step sequence depends on its own videos' lengths, so a
    # multi-host global mesh could never stay in collective lockstep. On a
    # pod slice, run one process per host on its own directory split; each
    # uses its local chips (a global mesh here would raise or hang on the
    # host-local feeds).
    mesh = (make_mesh(devices=jax.local_devices())
            if jax.process_count() > 1 else make_mesh())
    step = multi_clip_eval_step(model.module, mesh=mesh)
    videos, classes = list_videos(args.data)
    print(f'=> {len(videos)} videos, {len(classes)} classes, '
          f"{args.clips}x{args.frames}f clips, mesh {dict(mesh.shape)}")

    import time
    batch_time = AverageMeter()
    # native-T mode: one accumulator per temporal bucket, so every flush is
    # a fixed-shape step (at most one compile per rung)
    buckets = {}        # t_bucket -> (clips list, labels list)
    t_last = time.time()
    batch_idx = 0

    # per-batch metric sums stay ON DEVICE between prints
    # (utils.misc.DeviceRunningSums): a per-flush device_get would block
    # the next batch's dispatch behind this batch's completion. The eval
    # step returns masked SUMS + count, so accumulation is exact for
    # padded/ragged batches.
    meters = DeviceRunningSums()

    def flush(batch_clips, batch_labels):
        nonlocal t_last, batch_idx
        if not batch_clips:
            return
        # pad ragged final batches to the sharding multiple (label -1 rows
        # are masked out of the metric sums by the eval step)
        clips, labels = pad_batch(jnp.stack(batch_clips),
                                  np.asarray(batch_labels),
                                  mesh.shape.get('data', 1))
        meters.update(step(model.variables, jnp.asarray(clips),
                           jnp.asarray(labels)))
        batch_time.update(time.time() - t_last)
        t_last = time.time()
        if batch_idx % args.print_freq == 0:
            o, s = meters.snapshot()
            n, nt = max(o['count'], 1), max(s['count'], 1)
            # same meter-line format as the reference validate()
            # (imagenet_eval.py:241-251)
            print(f'Test: [{batch_idx}/{-(-len(videos) // args.batch_size)}]\t'
                  f'Time {batch_time.val:.3f} ({batch_time.avg:.3f})\t'
                  f"Loss {o['loss'] / n:.4f} ({s['loss'] / nt:.4f})\t"
                  f"Acc@1 {100 * o['top1'] / n:.3f} "
                  f"({100 * s['top1'] / nt:.3f})\t"
                  f"Acc@5 {100 * o['top5'] / n:.3f} "
                  f"({100 * s['top5'] / nt:.3f})")
        batch_idx += 1

    for frames, label in videos:
        if native_t:
            # the video's own length, capped, bucketed up to the next rung
            # (uniform temporal re-sampling — reference capability
            # README.md:480-487, bounded-compile version)
            clip_len = min(len(frames), args.max_frames)
        else:
            clip_len = fixed_frames
        clip_paths = sample_clips(frames, args.clips, clip_len)
        flat = [p for clip in clip_paths for p in clip]
        arrays = decode_jpeg_files(flat, threads=args.workers)
        # one fused preprocess per clip (device-side resize/crop/normalize)
        clips = []
        for c in range(args.clips):
            frames_u8 = np.stack(
                arrays[c * clip_len:(c + 1) * clip_len])
            # bf16 chain: the model computes in bf16 anyway, so resizing in
            # bf16 just moves the cast before the resize (half the HBM bytes)
            clips.append(fused_preprocess(frames_u8, settings,
                                          dtype='bfloat16'))
        video = jnp.stack(clips)
        if native_t:
            from pretorched_tpu.utils.bucketing import (
                resample_frames_to_bucket)
            video = resample_frames_to_bucket(video, args.frame_multiple)
        tb = video.shape[1]
        clips_list, labels_list = buckets.setdefault(tb, ([], []))
        clips_list.append(video)
        labels_list.append(label)
        if len(clips_list) == args.batch_size:
            flush(clips_list, labels_list)
            buckets.pop(tb)
    for tb in sorted(buckets):
        flush(*buckets[tb])
    if not meters:                             # no videos found
        print(' * Acc@1 0.000 Acc@5 0.000')
        return
    s = meters.totals()
    nt = max(s['count'], 1)
    print(f" * Acc@1 {100.0 * s['top1'] / nt:.3f} "
          f"Acc@5 {100.0 * s['top5'] / nt:.3f}")


if __name__ == '__main__':
    main()
