#!/usr/bin/env python
"""ImageNet train/evaluate CLI.

TPU-native equivalent of the reference's examples/imagenet_eval.py: same
argparse surface (arch, batch-size, evaluate, resume, lr schedule) and the
same `* Acc@1 ... Acc@5 ...` progress format (imagenet_eval.py:200-251), but
the device layer is a jit-compiled step sharded over a ('data','model') mesh
instead of nn.DataParallel (imagenet_eval.py:136).

Usage:
    python examples/imagenet_eval.py /path/to/imagenet -a resnet18 -b 256 -e
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser(description='ImageNet training/eval (TPU)')
    p.add_argument('data', help='path to dataset (train/ and val/ subdirs)')
    p.add_argument('--arch', '-a', default='resnet18')
    p.add_argument('--workers', '-j', default=8, type=int)
    p.add_argument('--epochs', default=90, type=int)
    p.add_argument('--start-epoch', default=0, type=int)
    p.add_argument('-b', '--batch-size', default=256, type=int)
    p.add_argument('--lr', '--learning-rate', default=0.1, type=float)
    p.add_argument('--momentum', default=0.9, type=float)
    p.add_argument('--weight-decay', '--wd', default=1e-4, type=float)
    p.add_argument('--print-freq', '-p', default=10, type=int)
    p.add_argument('--resume', default='', type=str)
    p.add_argument('-e', '--evaluate', action='store_true')
    p.add_argument('--pretrained', default='imagenet',
                   help="pretrained dataset tag or 'none'")
    p.add_argument('--scale', default=None, type=float,
                   help='resize scale; default: model metadata, else 0.875')
    p.add_argument('--fast-pipeline', action='store_true',
                   help='native C++ JPEG decode + fused device preprocessing')
    p.add_argument('--bf16', action='store_true',
                   help='bf16 compute (params stay f32) + bf16 fused '
                        'pipeline: the TPU serving mode (MXU-rate matmuls, '
                        'half the preprocessing HBM traffic)')
    p.add_argument('--ten-crop', action='store_true',
                   help='10-crop eval: 4 corners + center, each hflipped, '
                        'softmax-averaged (README.md:198-199 style)')
    p.add_argument('--no-preserve-aspect-ratio', action='store_true',
                   help='square resize before crop (polynet eval, README.md:276)')
    p.add_argument('--cpu', action='store_true')
    p.add_argument('--remat', action='store_true',
                   help='rematerialize per residual block during backprop '
                        '(~4/3x FLOPs for much less activation HBM; lets '
                        'long clips / large batches train)')
    p.add_argument('--accum-steps', default=1, type=int,
                   help='gradient accumulation: split each batch into N '
                        'sequential microbatches inside the jitted step '
                        '(activation HBM bounded by the microbatch)')
    p.add_argument('--zero', nargs='?', const='1', default=None,
                   choices=['1', 'fsdp'],
                   help='ZeRO-shard the optimizer state over the data axis '
                        '(--zero fsdp also shards the params); per-device '
                        'optimizer HBM drops to 1/n_devices')
    p.add_argument('--compile-cache', nargs='?', const='1', default=None,
                   metavar='DIR',
                   help='persistent XLA compilation cache (optional DIR; '
                        'defaults to ~/.cache/pretorched/xla). Repeat runs '
                        'skip the tens-of-seconds model compile.')
    return p.parse_args()


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
    from pretorched_tpu.core.wrapper import to_channels_last
    from pretorched_tpu.datasets.folder import ImageFolder, batch_iterator
    from pretorched_tpu.parallel import (global_batch, make_mesh,
                                         make_train_step)
    from pretorched_tpu.parallel.evaluate import (make_eval_step,
                                                   multi_clip_eval_step,
                                                   pad_batch)
    from pretorched_tpu.transforms import TransformImage
    from pretorched_tpu.utils import AverageMeter, DeviceRunningSums
    from pretorched_tpu.zoo import io as zoo_io

    pretrained = None if args.pretrained in ('none', 'None', '') else args.pretrained
    print(f"=> creating model '{args.arch}' (pretrained={pretrained})")
    model = pretorched.__dict__[args.arch](
        num_classes=1000, pretrained=pretrained)
    model.eval()
    if args.bf16:
        model.bfloat16()

    settings = (model.settings if model.settings is not None else
                pretorched.pretrained_settings[args.arch]['imagenet'])
    # explicit --scale wins; otherwise the model's own metadata (xception
    # et al. carry a 'scale'), else the 0.875 default
    scale = (args.scale if args.scale is not None
             else settings.get('scale', 0.875))
    mesh = make_mesh()
    nproc = jax.process_count()
    print(f"=> mesh: {dict(mesh.shape)} over {nproc} process(es)")

    def feed(images, labels):
        """Host batch -> device, channels-last, sharded over the mesh.

        Single-process keeps the cheap path (contiguous NCHW transfer +
        on-device transpose). Multi-host must assemble the GLOBAL batch from
        each process's local one (parallel.global_batch) — a host-local
        array fed into a jit sharded over a multi-host mesh either raises
        or silently trains on 1/nproc of the data."""
        import numpy as np
        if nproc == 1:
            return to_channels_last(jnp.asarray(images)), jnp.asarray(labels)
        x = np.ascontiguousarray(np.moveaxis(np.asarray(images), 1, -1))
        return global_batch(mesh, x), global_batch(mesh, np.asarray(labels))

    best_prec1 = 0.0
    if args.resume and os.path.isfile(args.resume):
        print(f"=> loading checkpoint '{args.resume}'")
        from flax import serialization
        with open(args.resume, 'rb') as f:
            model.variables = serialization.from_bytes(model.variables, f.read())
        # reference resumes epoch + best_prec1 too (imagenet_eval.py:78-88)
        meta_path = args.resume + '.meta'
        if os.path.isfile(meta_path):
            import ast
            with open(meta_path) as f:
                meta = ast.literal_eval(f.read())
            if not args.start_epoch:
                args.start_epoch = int(meta.get('epoch', -1)) + 1
            best_prec1 = float(meta.get('best_prec1', 0.0))
            print(f"=> resumed epoch {args.start_epoch} "
                  f"(best_prec1 {best_prec1:.3f})")

    if args.fast_pipeline and args.ten_crop:
        raise SystemExit('--ten-crop needs uncropped resized frames; the '
                         'fast pipeline emits center-cropped batches — use '
                         'one or the other')
    if args.fast_pipeline and args.no_preserve_aspect_ratio:
        print('warning: --no-preserve-aspect-ratio is ignored by '
              '--fast-pipeline (fused path resizes short-side)')

    # 10-crop: square resize only (crop happens on device, 10 ways)
    val_tf = TransformImage(
        settings, scale=scale, crop=not args.ten_crop,
        preserve_aspect_ratio=(not args.no_preserve_aspect_ratio
                               and not args.ten_crop))
    valdir = os.path.join(args.data, 'val')
    val_set = ImageFolder(valdir, transform=val_tf)
    print(f'=> {len(val_set)} val images')

    if args.ten_crop:
        from pretorched_tpu.transforms.fused import ten_crop
        crop_size = max(settings['input_size'])
        crop_step = multi_clip_eval_step(model.module, mesh=mesh)

        def eval_step(variables, x, labels):
            return crop_step(variables, ten_crop(x, crop_size), labels)
    else:
        eval_step = make_eval_step(model, mesh=mesh)

    def val_batches():
        if args.fast_pipeline:
            from pretorched_tpu.datasets.folder import fast_eval_batches
            yield from fast_eval_batches(
                valdir, settings, args.batch_size, num_threads=args.workers,
                dtype='bfloat16' if args.bf16 else 'float32')
        else:
            for images, labels in batch_iterator(
                    val_set, args.batch_size, num_workers=args.workers):
                images, labels = feed(images, labels)
                if args.bf16:
                    images = images.astype(jnp.bfloat16)
                yield images, labels

    def validate():
        batch_time = AverageMeter()
        end = time.time()
        # per-batch metric sums stay ON DEVICE between prints
        # (utils.misc.DeviceRunningSums): a per-batch device_get would
        # block batch i+1's dispatch behind batch i's completion.
        # eval_step returns masked SUMS + count, so accumulation is exact
        # for ragged/padded batches too.
        meters = DeviceRunningSums()
        for i, (x, labels) in enumerate(val_batches()):
            # ragged batches (size-bucketed fast pipeline, final flush) are
            # padded to the sharding multiple; label -1 rows are masked out
            x, labels = pad_batch(jnp.asarray(x), np.asarray(labels),
                                  mesh.shape.get('data', 1))
            meters.update(eval_step(model.variables, jnp.asarray(x),
                                    jnp.asarray(labels)))
            batch_time.update(time.time() - end)
            end = time.time()
            if i % args.print_freq == 0:
                o, s = meters.snapshot()
                n, nt = max(o['count'], 1), max(s['count'], 1)
                print(f'Test: [{i}]\t'
                      f'Time {batch_time.val:.3f} ({batch_time.avg:.3f})\t'
                      f"Loss {o['loss'] / n:.4f} ({s['loss'] / nt:.4f})\t"
                      f"Acc@1 {100 * o['top1'] / n:.3f} "
                      f"({100 * s['top1'] / nt:.3f})\t"
                      f"Acc@5 {100 * o['top5'] / n:.3f} "
                      f"({100 * s['top5'] / nt:.3f})")
        if not meters:                         # empty val dir
            print(' * Acc@1 0.000 Acc@5 0.000')
            return 0.0
        s = meters.totals()
        nt = max(s['count'], 1)
        top1_avg = 100.0 * s['top1'] / nt
        print(f" * Acc@1 {top1_avg:.3f} Acc@5 {100.0 * s['top5'] / nt:.3f}")
        return top1_avg

    if args.evaluate:
        validate()
        return

    # ------------------------------------------------------------- training
    import optax

    from pretorched_tpu.parallel.train import sgd_step_decay

    traindir = os.path.join(args.data, 'train')
    train_tf = TransformImage(settings, scale=scale, random_crop=True,
                              random_hflip=True)
    train_set = ImageFolder(traindir, transform=train_tf)
    # per-PROCESS steps per epoch: the sharded loader yields len/nproc
    # samples per process, so the LR step-decay schedule (counted in this
    # process's step_idx) stays aligned with data epochs on any host count
    steps_per_epoch = max(len(train_set) // (args.batch_size * nproc), 1)
    tx = sgd_step_decay(args.lr, args.momentum, args.weight_decay,
                        decay_epochs=30, steps_per_epoch=steps_per_epoch)
    train_step = make_train_step(model.module, tx, mesh=mesh,
                                 remat=args.remat,
                                 accum_steps=args.accum_steps,
                                 zero_axis='data' if args.zero else None,
                                 zero_params=args.zero == 'fsdp')
    params = model.variables['params']
    batch_stats = model.variables.get('batch_stats')
    if args.zero:
        # ZeRO: optimizer state (and with fsdp, params) sharded over 'data'
        # — per-device optimizer HBM 1/n (parallel/zero.py)
        from pretorched_tpu.parallel import zero_init
        params, opt_state = zero_init(tx, params, mesh,
                                      shard_params=args.zero == 'fsdp')
    else:
        opt_state = tx.init(params)
    # train_step donates its params/batch_stats/opt_state inputs (see
    # make_train_step); drop model's reference to those same arrays now so
    # nothing aliases deleted buffers during the first epoch — validate()
    # only runs after the end-of-epoch reassignment below.
    model.variables = {}

    from pretorched_tpu.utils import PreemptionGuard

    def snapshot_variables():
        v = {'params': params}
        if batch_stats is not None:
            v['batch_stats'] = batch_stats
        return v

    step_idx = args.start_epoch * steps_per_epoch
    # TPU preemption safety: SIGTERM (spot/preemptible eviction notice)
    # latches a flag; the step loop checkpoints mid-epoch and exits cleanly
    # instead of losing the epoch (utils/preemption.py, SURVEY §5.3)
    with PreemptionGuard() as guard:
        for epoch in range(args.start_epoch, args.epochs):
            batch_time = AverageMeter()
            end = time.time()
            # per-step metrics accumulate ON DEVICE between prints
            # (utils.misc.DeviceRunningSums): a per-step float() would block
            # step i+1's dispatch behind step i's completion. drop_last=True
            # makes batches equal-size, so the mean of per-step means is the
            # exact epoch mean.
            meters = DeviceRunningSums()
            # multi-host: each process trains on its own deterministic shard
            # of the same global shuffle (equal batch counts keep psums in
            # lockstep)
            for i, (images, labels) in enumerate(batch_iterator(
                    train_set, args.batch_size, shuffle=True, drop_last=True,
                    num_workers=args.workers, seed=epoch,
                    shard_id=jax.process_index(),
                    num_shards=jax.process_count())):
                x, lab = feed(images, labels)
                params, batch_stats, opt_state, metrics = train_step(
                    params, batch_stats, opt_state, x, lab, step_idx)
                step_idx += 1
                meters.update(metrics)
                batch_time.update(time.time() - end)
                end = time.time()
                if i % args.print_freq == 0:
                    m, s = meters.snapshot()
                    print(f'Epoch: [{epoch}][{i}]\t'
                          f'Time {batch_time.val:.3f} ({batch_time.avg:.3f})\t'
                          f"Loss {m['loss']:.4f} ({s['loss'] / (i + 1):.4f})\t"
                          f"Acc@1 {100 * m['top1']:.3f} "
                          f"({100 * s['top1'] / (i + 1):.3f})")
                if guard.requested:
                    # save with epoch-1 so --resume restarts THIS epoch (its
                    # remaining batches were never seen; the deterministic
                    # per-epoch shuffle replays it identically)
                    model.variables = snapshot_variables()
                    save_checkpoint(model.variables, args.arch, epoch - 1,
                                    best_prec1, is_best=False)
                    print(f'=> preemption signal: checkpointed at epoch '
                          f'{epoch} step {i}; --resume restarts epoch {epoch}')
                    return
            model.variables = snapshot_variables()
            prec1 = validate()
            is_best = prec1 > best_prec1
            best_prec1 = max(prec1, best_prec1)
            save_checkpoint(model.variables, args.arch, epoch, best_prec1,
                            is_best)


def save_checkpoint(variables, arch, epoch, best_prec1,
                    is_best, filename='checkpoint.msgpack'):
    """Reference: imagenet_eval.py:256-259 (+ best-copy).

    Multi-host: params are replicated, so only process 0 writes — every
    process writing the same path on a shared filesystem is a race."""
    import shutil

    import jax
    if jax.process_index() != 0:
        return
    from flax import serialization
    with open(filename, 'wb') as f:
        f.write(serialization.to_bytes(variables))
    meta = {'epoch': epoch, 'arch': arch, 'best_prec1': best_prec1}
    with open(filename + '.meta', 'w') as f:
        f.write(repr(meta))
    if is_best:
        shutil.copyfile(filename, 'model_best.msgpack')


if __name__ == '__main__':
    main()
