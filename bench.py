#!/usr/bin/env python
"""Benchmarks on one TPU chip.

Prints a full JSON result line to stdout (flushed) **after every completed
row** — each line is a superset of the previous one, so a driver that parses
the *last* parseable stdout line always gets the headline metric plus every
row finished so far, even if the process is killed mid-suite (round 2 lost
all perf evidence to exactly that: a 489s cold tunnel + per-row compiles hit
the driver timeout before the single end-of-run print).

Top-level keys: the headline metric ({"metric", "value", "unit",
"vs_baseline"}) plus "rows" (rows finished so far), "mfu"/"roofline" for the
headline, and "notes" (rows skipped by the time budget or failed, if any).
A row that raises is recorded in "notes" and the suite continues.

Rows, ordered so the most important land inside the time budget first:
  1. resnet3d50 16f 224px bf16 b128 s2d inference    (headline, + MFU)
  2. SGD training step (fwd+bwd+update, donated buffers, bf16 compute, + MFU)
  3. resnet50 2D 224px bf16 b128 inference
  4. SlowFast-R50 dual-pathway inference, 64-frame clips (+ MFU)
  5. R(2+1)D-50 16f 112px inference (BASELINE config 4 family, + MFU)
  6. nonlocalresnet3d50 32f 224px — Pallas blockwise attention engaged
  7. 10-clip consensus eval step (multi_clip_eval_step math)
  8. fused uint8 decode->preprocess->forward device pipeline
  9. nonlocal attention kernel fwd+bwd, N=8192 (blockwise backward)
 10. TRN multi-scale relation head (MSTRN, resnet50 backbone, 8 segments)
 11. online serving loadtest (dynamic batching, req/s + p50/p99 latency)
 12. BigGAN-256 class-conditional sampling (BASELINE config 5)

``BENCH_TIME_BUDGET`` (seconds, default 1500) bounds the whole run: once the
budget is spent, remaining rows are skipped with a note. The headline row
always runs (it is first and its result is printed the moment it exists).

The reference publishes no throughput numbers (BASELINE.md); ``vs_baseline``
is measured against VS_BASELINE_CLIPS_PER_SEC — a documented estimate of the
PyTorch reference on a datacenter GPU (V100-class, fp32, cuDNN benchmark
mode): ~100 clips/s for this model/clip size. North-star >= 10x.

Measurement notes (this sandbox): the axon TPU tunnel has a ~15min cold
device->host path and an unreliable block_until_ready, so every timed loop
runs *inside* one jit via lax.scan (sequential by carry dependency) and
completion is forced with jax.device_get of a scalar checksum. The train row
instead chains donated jitted steps from Python — a scan would discard
buffer donation (inner-jit donation is ignored under tracing) and OOM at
b128 — with completion forced the same way through the steps' data
dependencies.

Model variables are always jit ARGUMENTS, never closures: closed-over
weights are inlined as dense constants into the serialized StableHLO the
tunnel uploads per compile — measured r3, that made every row's compile
minutes-long (multiclip 408s) and drew HTTP 413 on the ~200MB MSTRN head;
as arguments, the uploaded program carries only shapes.
"""

import dataclasses
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

VS_BASELINE_CLIPS_PER_SEC = 100.0
V5E_BF16_PEAK_FLOPS = 197e12

BATCH = int(os.environ.get('BENCH_BATCH', '128'))
FRAMES = int(os.environ.get('BENCH_FRAMES', '16'))
SIZE = int(os.environ.get('BENCH_SIZE', '224'))
ITERS = int(os.environ.get('BENCH_ITERS', '20'))
ONLY = os.environ.get('BENCH_ONLY', '')       # comma list of row names
TIME_BUDGET = float(os.environ.get('BENCH_TIME_BUDGET', '1500'))

_T_START = time.monotonic()


def _elapsed():
    return time.monotonic() - _T_START


def _is_oom(e: Exception) -> bool:
    """True only for allocation failures; anything else must propagate.

    Matching on the message (RESOURCE_EXHAUSTED / out of memory) rather than
    bare Exception means a shape or dtype bug fails the row loudly instead of
    silently degrading into a half-batch result (ADVICE r2)."""
    msg = str(e)
    return ('RESOURCE_EXHAUSTED' in msg or 'Resource exhausted' in msg
            or 'out of memory' in msg.lower())


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import pretorched_tpu as pretorched

    # warm the device->host path first (one-time ~15min on the axon tunnel)
    t0 = time.perf_counter()
    jax.device_get(jax.jit(lambda x: x + 1)(jnp.zeros((8, 128))))
    print(f'# cold-path warmup: {time.perf_counter() - t0:.1f}s',
          file=sys.stderr)

    rows = []
    notes = []
    state = {'headline': None}
    # BENCH_FLOPS_CHECK=1 audit results: {tag: counted(b)/b1-scaled}.
    # Measured r5 on chip: resnet3d50 0.8979, slowfast 0.8980, r2plus1d
    # 0.8411 — the b1-scaled convention (cheap: no real-batch compile per
    # row) is an UPPER bound on the compiled graph's own count, i.e. the
    # stamped MFUs are upper bounds by ~11-19% relative (ROUND_NOTES r5).
    flops_check = {}

    def emit():
        """Print the full result JSON line, then a bounded COMPACT summary
        line. The driver parses the *last* parseable stdout line within a
        ~2000-char tail window; at 12 rows the full cumulative line outgrew
        it (BENCH_r04 recorded ``parsed: null`` despite rc=0), so the last
        line printed is always the compact one — headline metric + a
        {row_name: [value, unit]} map + latency fields for the serving row —
        asserted under 1500 chars so it survives any tail window."""
        headline = state['headline']
        if headline is None:
            headline = dict(rows[0]) if rows else {
                'metric': 'no rows completed', 'value': 0, 'unit': ''}
        out = {k: headline[k] for k in ('metric', 'value', 'unit')
               if k in headline}
        if 'vs_baseline' in headline:
            out['vs_baseline'] = headline['vs_baseline']
        out['rows'] = rows
        hrow = rows[0] if rows and 'mfu' in rows[0] else {}
        if hrow and state['headline'] is not None:
            out['mfu'] = hrow['mfu']
            out['roofline'] = (
                f"{hrow['gflops_per_clip']} GF/clip x {headline['value']}"
                f" clips/s = "
                f"{hrow['gflops_per_clip'] * headline['value'] / 1000:.1f}"
                f" TFLOP/s vs ~197 TFLOP/s v5e bf16 peak")
        if notes:
            out['notes'] = notes
        print(json.dumps(out), flush=True)
        # compact summary: no nested rows, no metric prose — bounded size
        summary = {}
        for r in rows:
            name = r.get('name', 'row')
            summary[name] = [r['value'], r['unit']]
            for k in ('p50_ms', 'p99_ms', 'link_floor_req_s',
                      'link_up_MBps', 'mfu'):
                if k in r:
                    summary[f'{name}.{k}'] = r[k]
        compact = {k: out[k] for k in ('metric', 'value', 'unit',
                                       'vs_baseline') if k in out}
        compact['summary'] = summary
        compact['notes_n'] = len(notes)
        line = json.dumps(compact)
        # bounded-size guarantee, degrading gracefully instead of crashing
        # the run (the whole point of this line is surviving any tail
        # window; an assert here would lose every remaining row): drop the
        # dotted detail fields first, then oldest rows' values — the
        # headline metric/value stay top-level either way.
        if len(line) >= 1500:
            compact['summary'] = {k: v for k, v in summary.items()
                                  if '.' not in k}
            compact['truncated'] = True
            line = json.dumps(compact)
        while len(line) >= 1500 and compact['summary']:
            compact['summary'].pop(next(iter(compact['summary'])))
            line = json.dumps(compact)
        print(line, flush=True)

    def timed_scan(apply_fn, variables, x, iters, tag):
        """sec/iter of apply_fn(variables, x) with OOM batch-halving;
        returns (sec_per_iter, batch_used).

        ``variables`` is a jit ARGUMENT, never a closure: closed-over
        weights get inlined as dense constants into the serialized
        StableHLO that the axon tunnel uploads to its remote compiler —
        measured r3: the MSTRN head's ~200MB of constants drew HTTP 413,
        and converting it to an argument cut that row's compile+first
        from tunnel-breaking (~25min) to 16s."""
        batch = x.shape[0]
        while True:
            xb = x[:batch]

            @jax.jit
            def many(v, xb):
                def body(carry, _):
                    out = apply_fn(v, carry)
                    carry = carry + (out * 0).astype(carry.dtype)
                    return carry, jnp.float32(jnp.sum(out.astype(jnp.float32)))
                _, outs = jax.lax.scan(body, xb, None, length=iters)
                return jnp.sum(outs)

            try:
                t0 = time.perf_counter()
                jax.device_get(many(variables, xb))
                print(f'# {tag} b{batch} compile+first: '
                      f'{time.perf_counter() - t0:.1f}s', file=sys.stderr)
                break
            except Exception as e:
                if not _is_oom(e) or batch <= 2:
                    raise
                print(f'# {tag} b{batch} OOM; retrying b{batch // 2}',
                      file=sys.stderr)
                batch //= 2
        t0 = time.perf_counter()
        jax.device_get(many(variables, xb))
        return (time.perf_counter() - t0) / iters, batch

    def cost_flops(jitted, *args):
        """Total FLOPs of one call per XLA cost analysis (0.0 on failure)."""
        try:
            ca = jitted.lower(*args).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            return float(ca.get('flops', 0.0))
        except Exception as e:
            print(f'# cost_analysis failed: {type(e).__name__}: {e}',
                  file=sys.stderr)
            return 0.0

    def b1_scaled_flops(fwd1, variables, clip, b, tag):
        """FLOPs of one forward at the REAL batch, as b x the b1 count.

        Convs are batch-linear so this avoids a full-batch remote compile
        per row; rows carrying it stamp flops_convention='b1-scaled'.
        ``BENCH_FLOPS_CHECK=1`` audits the convention: compile (never
        execute) the real batch once and report counted/scaled — any
        b1-specific padding or fusion in the counted graph shows up as a
        ratio away from 1.0 (ADVICE r4). Measured check results live in
        ROUND_NOTES."""
        f1 = cost_flops(fwd1, variables, clip[:1])
        if os.environ.get('BENCH_FLOPS_CHECK'):
            fb = cost_flops(fwd1, variables, clip[:b])
            ratio = fb / (f1 * b) if f1 else float('nan')
            print(f'# {tag} flops check: b{b} counted / b1-scaled = '
                  f'{ratio:.4f}', file=sys.stderr)
            flops_check[tag] = round(ratio, 4)
        return f1 * b

    rng = np.random.RandomState(0)

    def rand_batch(shape, dtype=jnp.bfloat16):
        """One random item broadcast over the batch dim, built ON DEVICE.

        The naive ``rng.rand(*shape)`` builds a float64 host array first —
        the slowfast input (b128 x 64f x 224px) is 39.5 GB and takes the
        1-core sandbox host MINUTES to fill, eating the bench time budget
        (r3: rows 7-11 got skipped). Conv/BN eval timing is data-
        independent, so identical batch items measure identically."""
        if jnp.issubdtype(dtype, jnp.integer):
            one = jnp.asarray(rng.randint(0, 255, (1,) + tuple(shape[1:])),
                              dtype)
        else:
            one = jnp.asarray(rng.rand(1, *shape[1:]), dtype)
        return jnp.broadcast_to(one, tuple(shape))

    # ------------------------------------------------ 1. resnet3d50 headline
    def row_resnet3d50():
        model = pretorched.resnet3d50(num_classes=400, pretrained=None)
        model.bfloat16()
        # exact space-to-depth stem folding: +5% on v5e, bit-identical outputs
        module = dataclasses.replace(model.module, s2d_stem=True)
        variables = model.variables
        clip = rand_batch((BATCH, FRAMES, SIZE, SIZE, 3))

        def fwd(v, c):
            return module.apply(v, c)[0, 0]

        dt, b = timed_scan(fwd, variables, clip, ITERS, 'resnet3d50')
        clips_s = b / dt
        # roofline: XLA cost analysis of one PLAIN forward (s2d folding adds
        # zero-tap FLOPs to the stem — counting the folded graph would
        # inflate gflops/mfu), at b1 scaled by b (convs are batch-linear)
        fwd1 = jax.jit(lambda v, c: model.module.apply(v, c))
        flops_fwd = b1_scaled_flops(fwd1, variables, clip, b, 'resnet3d50')
        gf_per_clip = flops_fwd / b / 1e9
        mfu = flops_fwd / b * clips_s / V5E_BF16_PEAK_FLOPS
        state['headline'] = {
            'metric': f'resnet3d50 {FRAMES}f{SIZE}px bf16 clips/sec/chip',
            'value': round(clips_s, 2),
            'unit': 'clips/s',
            'vs_baseline': round(clips_s / VS_BASELINE_CLIPS_PER_SEC, 3),
        }
        rows.append(dict(state['headline'], batch=b,
                         gflops_per_clip=round(gf_per_clip, 1),
                         mfu=round(mfu, 3),
                         flops_convention='b1-scaled'))

    # --------------------------------- 2. resnet3d50 training step (SGD)
    def row_train():
        import optax

        from pretorched_tpu.parallel import make_train_step
        model = pretorched.resnet3d50(num_classes=400, pretrained=None)
        # s2d is a fwd win; its bwd was probed separately (BENCH_TRAIN_S2D=0)
        s2d = bool(int(os.environ.get('BENCH_TRAIN_S2D', '1')))
        module = dataclasses.replace(model.module, dtype=jnp.bfloat16,
                                     s2d_stem=s2d)
        variables = model.variables
        tx = optax.sgd(0.1, momentum=0.9)
        accum = int(os.environ.get('BENCH_TRAIN_ACCUM', '1'))
        # '0'/'1' = off/all-blocks; 's0' / 's0,1' = selective remat of only
        # those stages' blocks (0=stem+layer1 .. 3=layer4). Default 's0':
        # rematting ONLY stem+layer1 (the stage with the worst measured bwd
        # roofline%) shrinks the dominant backward working set enough to
        # BEAT its own recompute — measured r5 same-session: plain 228.86
        # -> s0 237.16 clips/s (+3.6%, repeat 237.05); full remat ('1')
        # measured -7.5% in r4.
        remat_env = os.environ.get('BENCH_TRAIN_REMAT', 's0')
        if remat_env.startswith('s'):
            remat = tuple(int(i) for i in remat_env[1:].split(','))
        else:
            remat = bool(int(remat_env))
        step = make_train_step(module, tx, accum_steps=accum, remat=remat)
        iters = max(ITERS // 2, 5)
        # v5e sweep (ROUND_NOTES r2): b64 177, b128 226.8 clips/s, b192 OOM;
        # the halve-batch fallback below covers OOM if other rows hold HBM.
        batch = int(os.environ.get('BENCH_TRAIN_BATCH', min(BATCH, 128)))

        # Unlike the scan rows this row deliberately times a Python loop of
        # jitted steps: wrapping the step in a scan discards buffer donation
        # (inner-jit donation is ignored under tracing), and the lost
        # aliasing pushes b128 out of HBM — measured on v5e: scan form b128
        # OOM / b64 177.6 clips/s vs donated loop b128 226.8. Completion is
        # still forced through the tunnel: each step consumes the previous
        # step's outputs, so device_get of the last loss chains the sequence.
        p = bs = os_ = clip = labels = m = None
        while True:
            try:
                # fresh device copies each attempt: the step donates buffers
                p = jax.tree_util.tree_map(jnp.copy, variables['params'])
                bs = jax.tree_util.tree_map(jnp.copy,
                                            variables['batch_stats'])
                os_ = tx.init(p)
                clip = rand_batch((batch, FRAMES, SIZE, SIZE, 3),
                                  jnp.float32)
                labels = jnp.asarray(np.arange(batch) % 400)
                t0 = time.perf_counter()
                p, bs, os_, m = step(p, bs, os_, clip, labels, 0)
                jax.device_get(m['loss'])
                print(f'# train b{batch} accum{accum} compile+first: '
                      f'{time.perf_counter() - t0:.1f}s', file=sys.stderr)
                t0 = time.perf_counter()
                for i in range(1, iters + 1):
                    p, bs, os_, m = step(p, bs, os_, clip, labels, i)
                loss = float(jax.device_get(m['loss']))   # chains all steps
                dt = (time.perf_counter() - t0) / iters
                break
            except Exception as e:
                if not _is_oom(e) or batch <= 2:
                    raise
                print(f'# train b{batch} OOM; retrying b{batch // 2}',
                      file=sys.stderr)
                batch //= 2
                # drop any half-built device state before the retry copies
                p = bs = os_ = clip = labels = m = None
                gc.collect()
        assert np.isfinite(loss), loss
        if s2d:
            # FLOP honesty (matches the video inference rows): the folded
            # stem adds zero-tap FLOPs, so cost-analyze a PLAIN-stem step.
            # Must be at the REAL batch: XLA's counted flops are not
            # batch-linear for the bwd (b8-scaled read 184.9 GF/clip vs the
            # actual b128 plain compile's 235.8). Lower+compile only — no
            # execution, no HBM allocation.
            plain_step = make_train_step(
                dataclasses.replace(module, s2d_stem=False), tx,
                accum_steps=accum, remat=remat)
            flops_step = cost_flops(plain_step, p, bs, os_, clip, labels, 0)
        else:
            # the jit cache shares the executable: lowers without recompile
            flops_step = cost_flops(step, p, bs, os_, clip, labels, 0)
        # XLA cost analysis counts a while/scan body ONCE, so the accumulated
        # step's microbatch fwd+bwd is undercounted by ~accum_steps x (the
        # un-scanned optimizer update is negligible next to it); scale back.
        flops_step *= accum
        clips_s = batch / dt
        rows.append({
            'metric': (f'resnet3d50 {FRAMES}f{SIZE}px bf16-compute SGD train '
                       f'step clips/sec/chip (donated buffers'
                       + (f', accum x{accum}' if accum > 1 else '')
                       + (f', remat={remat_env}' if remat else '') + ')'),
            'value': round(clips_s, 2), 'unit': 'clips/s', 'batch': batch,
            'gflops_per_clip': round(flops_step / batch / 1e9, 1),
            'mfu': round(flops_step / batch * clips_s / V5E_BF16_PEAK_FLOPS,
                         3)})

    # ------------------------------------------------ 3. resnet50 2D
    def row_resnet50():
        m2 = pretorched.resnet50(num_classes=1000, pretrained=None)
        m2.bfloat16()
        img = rand_batch((BATCH, SIZE, SIZE, 3))

        def fwd2(v, x):
            return m2.apply(v, x)[0, 0]

        dt, b = timed_scan(fwd2, m2.variables, img, ITERS, 'resnet50-2d')
        rows.append({'metric': f'resnet50 2D {SIZE}px bf16 img/sec/chip',
                     'value': round(b / dt, 1), 'unit': 'img/s', 'batch': b})

    # --------------------------------- 4. SlowFast dual-pathway inference
    def row_slowfast():
        sf = pretorched.slowfast_resnet50(num_classes=400, pretrained=None)
        sf.bfloat16()
        # exact s2d folding of BOTH pathway stems (fast (5,7,7), slow
        # (1,7,7)) — same trick as the headline row, bit-identical outputs
        module = dataclasses.replace(sf.module, s2d_stem=True)
        # SlowFast consumes the full 64-frame clip and strides internally
        # (slow /16, fast /2 — reference slowfast.py:390-395)
        sf_frames = max(FRAMES, 64)
        # v5e sweep: b16 227, b32 338, b64 518, b128 717.8 clips/s, b256 OOM
        sf_batch = int(os.environ.get('BENCH_SF_BATCH', min(BATCH, 128)))
        clip = rand_batch((sf_batch, sf_frames, SIZE, SIZE, 3))

        def fwds(v, c):
            return module.apply(v, c)[0, 0]

        dt, b = timed_scan(fwds, sf.variables, clip, max(ITERS // 2, 5),
                           'slowfast50')
        clips_s = b / dt
        # true-algorithm FLOPs: the fold-4 fast stem counts ~2.25x zero-tap
        # FLOPs in the folded graph's cost analysis — use the plain module
        fwd1 = jax.jit(lambda v, c: sf.module.apply(v, c))
        flops_fwd = b1_scaled_flops(fwd1, sf.variables, clip, b, 'slowfast')
        rows.append({
            'metric': (f'slowfast_resnet50 {sf_frames}f{SIZE}px bf16 '
                       f'clips/sec/chip (s2d stems)'),
            'value': round(clips_s, 2), 'unit': 'clips/s', 'batch': b,
            'gflops_per_clip': round(flops_fwd / b / 1e9, 1),
            'mfu': round(flops_fwd / b * clips_s / V5E_BF16_PEAK_FLOPS, 3),
            'flops_convention': 'b1-scaled'})

    # ------------------------------------ 5. R(2+1)D-50 16f 112px inference
    def row_r2plus1d():
        r21 = pretorched.r2plus1d50(num_classes=400, pretrained=None)
        r21.bfloat16()
        # exact s2d folding of the factored stem's SPATIAL conv (the
        # 3-channel MXU-lane waster; test_r2plus1d_s2d_stem_exact)
        module = dataclasses.replace(r21.module, s2d_stem=True)
        # R(2+1)D's published protocol is 112px clips (reference
        # r2plus1d.py:155-173 smoke uses 112); BASELINE config 4 family.
        r21_size = int(os.environ.get('BENCH_R21_SIZE', '112'))
        r21_batch = int(os.environ.get('BENCH_R21_BATCH', str(BATCH)))
        clip = rand_batch((r21_batch, FRAMES, r21_size, r21_size, 3))

        def fwdr(v, c):
            return module.apply(v, c)[0, 0]

        dt, b = timed_scan(fwdr, r21.variables, clip, max(ITERS // 2, 5),
                           'r2plus1d50')
        clips_s = b / dt
        # plain module at b1 for true-algorithm FLOPs (no s2d zero taps)
        fwd1 = jax.jit(lambda v, c: r21.module.apply(v, c))
        flops_fwd = b1_scaled_flops(fwd1, r21.variables, clip, b, 'r2plus1d')
        rows.append({
            'metric': (f'r2plus1d50 {FRAMES}f{r21_size}px bf16 '
                       f'clips/sec/chip (s2d stem)'),
            'value': round(clips_s, 2), 'unit': 'clips/s', 'batch': b,
            'gflops_per_clip': round(flops_fwd / b / 1e9, 1),
            'mfu': round(flops_fwd / b * clips_s / V5E_BF16_PEAK_FLOPS, 3),
            'flops_convention': 'b1-scaled'})

    # ---------------------------- 6. nonlocal resnet3d50 (Pallas engaged)
    def row_nonlocal():
        nl = pretorched.nonlocalresnet3d50(num_classes=400, pretrained=None)
        nl.bfloat16()
        # 32-frame clips: layer2 runs at T=8, 28px -> N = 8*28*28 = 6272
        # >= PALLAS_MIN_N, so the blockwise kernel is actually engaged
        # (16-frame clips give N=3136 and fall back to the XLA einsum)
        nl_frames = max(FRAMES, 32)
        # r3 batch sweep: b8 89.6, b16 143.2, b32 200.0, b64 267.2,
        # b128 357.7 clips/s, b256 OOM -> default b128
        nl_batch = int(os.environ.get('BENCH_NL_BATCH', str(min(BATCH, 128))))
        clip = rand_batch((nl_batch, nl_frames, SIZE, SIZE, 3))

        def fwdn(v, c):
            return nl.apply(v, c)[0, 0]

        dt, b = timed_scan(fwdn, nl.variables, clip, max(ITERS // 2, 5),
                           'nonlocal3d50')
        clips_s = b / dt
        # roofline note: XLA cost analysis does NOT see inside the Pallas
        # custom call, so this undercounts the attention matmuls — the MFU
        # is a lower bound
        fwd1 = jax.jit(lambda v, c: nl.module.apply(v, c))
        flops_fwd = cost_flops(fwd1, nl.variables, clip[:b])
        rows.append({
            'metric': (f'nonlocalresnet3d50 {nl_frames}f{SIZE}px bf16 '
                       f'clips/sec/chip (Pallas blockwise, layer2 N=6272)'),
            'value': round(clips_s, 2), 'unit': 'clips/s', 'batch': b,
            'gflops_per_clip': round(flops_fwd / b / 1e9, 1),
            'mfu_lower_bound': round(
                flops_fwd / b * clips_s / V5E_BF16_PEAK_FLOPS, 3)})

    # ---------------------------------------- 7. 10-clip consensus eval
    def row_multiclip():
        model = pretorched.resnet3d50(num_classes=400, pretrained=None)
        model.bfloat16()
        # same bit-identical s2d stem folding as the headline row (+~8%)
        module = dataclasses.replace(model.module, s2d_stem=True)
        variables = model.variables
        nclips = 10
        vids = rand_batch((12, nclips, FRAMES, SIZE, SIZE, 3))

        def consensus(v, c):
            b, n = c.shape[:2]
            flat = c.reshape((b * n,) + c.shape[2:])
            logits = module.apply(v, flat).astype(jnp.float32)
            probs = jnp.mean(jax.nn.softmax(logits.reshape(b, n, -1), -1), 1)
            return jnp.max(probs)       # scalar dependency

        dt, b = timed_scan(consensus, variables, vids, max(ITERS // 2, 5),
                           'multiclip')
        videos_s = b / dt
        fwd1 = jax.jit(consensus)
        flops_vid = cost_flops(fwd1, variables, vids[:b])
        rows.append({
            'metric': (f'resnet3d50 10-clip consensus eval {FRAMES}f{SIZE}px '
                       f'bf16 videos/sec/chip'),
            'value': round(videos_s, 2), 'unit': 'videos/s', 'batch': b,
            'clips_per_sec': round(b * nclips / dt, 1),
            'gflops_per_video': round(flops_vid / b / 1e9, 1),
            'mfu': round(flops_vid / b * videos_s / V5E_BF16_PEAK_FLOPS, 3)})

    # --------------------------- 8. fused preprocess -> forward pipeline
    def row_pipeline():
        from pretorched_tpu.transforms.fused import _fused, _settings_tuple
        model = pretorched.resnet3d50(num_classes=400, pretrained=None)
        model.bfloat16()
        # same s2d stem as the headline row so the delta vs row 1 isolates
        # the preprocessing cost rather than a different stem/batch
        module = dataclasses.replace(model.module, s2d_stem=True)
        variables = model.variables
        spec = _settings_tuple(model.settings or {
            'input_size': [3, SIZE, SIZE], 'input_space': 'RGB',
            'input_range': [0, 1], 'mean': [0.485, 0.456, 0.406],
            'std': [0.229, 0.224, 0.225]})

        def pipe(v, u8):
            b, t = u8.shape[:2]
            frames = u8.reshape((b * t,) + u8.shape[2:])
            # bf16 end-to-end: the resize matmuls ride the MXU bf16 path and
            # the chain moves half the HBM bytes (the model is bf16 anyway)
            x = _fused(frames, spec, dtype='bfloat16')   # resize/crop/norm
            x = x.reshape((b, t) + x.shape[1:])
            return module.apply(v, x)[0, 0]

        pbatch = min(BATCH, 128)
        iters = max(ITERS // 2, 5)
        while True:
            raw = rand_batch((pbatch, FRAMES, 256, 256, 3), jnp.uint8)

            # uint8 input: thread a zero-valued uint8 carry into the input so
            # the loop body can't be hoisted as loop-invariant
            @jax.jit
            def many(v, u8):
                def body(carry, _):
                    out = pipe(v, u8 + carry)
                    return (out * 0).astype(jnp.uint8), out
                _, outs = jax.lax.scan(body, jnp.uint8(0), None,
                                       length=iters)
                return jnp.sum(outs.astype(jnp.float32))

            try:
                t0 = time.perf_counter()
                jax.device_get(many(variables, raw))
                print(f'# pipeline b{pbatch} compile+first: '
                      f'{time.perf_counter() - t0:.1f}s', file=sys.stderr)
                break
            except Exception as e:
                if not _is_oom(e) or pbatch <= 2:
                    raise
                print(f'# pipeline b{pbatch} OOM; retrying b{pbatch // 2}',
                      file=sys.stderr)
                pbatch //= 2
                raw = many = None
                gc.collect()
        t0 = time.perf_counter()
        jax.device_get(many(variables, raw))
        dt = (time.perf_counter() - t0) / iters
        rows.append({
            'metric': (f'fused uint8 256px->preprocess->{SIZE}px forward '
                       f'{FRAMES}f device pipeline clips/sec/chip (s2d stem)'),
            'value': round(pbatch / dt, 2), 'unit': 'clips/s',
            'batch': pbatch})

    # ------------------------------- 9. nonlocal attention kernel fwd+bwd
    def row_attn():
        from pretorched_tpu.ops.pallas.nonlocal_attention import (
            _nonlocal_attention_ad)
        n, c = 8192, 64
        q = jnp.asarray(rng.randn(1, n, c), jnp.float32)
        k = jnp.asarray(rng.randn(1, n, c), jnp.float32)
        v = jnp.asarray(rng.randn(1, n, c), jnp.float32)

        def attn_loss(q, k, v):
            return _nonlocal_attention_ad(q, k, v, 1.0, False).sum()

        gfn = jax.jit(jax.grad(attn_loss, argnums=(0, 1, 2)))

        @jax.jit
        def many(q, k, v):
            def body(carry, _):
                dq, dk, dv = gfn(carry, k, v)
                return carry + dq * 0, dq[0, 0, 0]
            _, outs = jax.lax.scan(body, q, None, length=10)
            return jnp.sum(outs)

        t0 = time.perf_counter()
        jax.device_get(many(q, k, v))
        print(f'# attn compile+first: {time.perf_counter() - t0:.1f}s',
              file=sys.stderr)
        t0 = time.perf_counter()
        jax.device_get(many(q, k, v))
        dt = (time.perf_counter() - t0) / 10
        rows.append({
            'metric': (f'nonlocal attention fwd+bwd blockwise kernel '
                       f'N={n} C={c} f32 ms/iter'),
            'value': round(dt * 1000, 2), 'unit': 'ms'})

    # ----------------------- 10. TRN multi-scale head (BASELINE config 4)
    def row_trn():
        trn = pretorched.trn(num_classes=400, num_segments=8,
                             consensus='MSTRN', arch='resnet50',
                             pretrained=None)
        trn.bfloat16()
        # post dtype-propagation fix (bfloat16() now reaches the nested
        # base_module — it silently computed f32 before, 845 videos/s),
        # the sweep is b16 1303.6 / b32 1383.2 / b64 1416.8 / b128 1429.1:
        # flat past b64, so b64 is the default (backbone batch 512 frames)
        tb = int(os.environ.get('BENCH_TRN_BATCH', str(min(BATCH, 64))))
        iters = max(ITERS // 2, 5)

        # No scan wrapper here: the MSTRN graph compiles ~3x slower than the
        # plain-resnet50 rows (7 relation MLPs + gathers on top of the
        # backbone), and wrapping it in the timing while-loop pushed the
        # axon tunnel's remote_compile past its ~25min proxy timeout (broken
        # pipe, r3 — at b64 AND b16). Compile just the forward and chain
        # jitted calls through a carry so completion is still forced.
        # Variables are a jit ARGUMENT, not a closure: the MSTRN head's
        # relation MLPs hold ~75M params, and closure constants get inlined
        # into the serialized StableHLO — ~200MB of bf16 weights that blew
        # the tunnel proxy's request-body limit (HTTP 413, r3).
        tvars = trn.variables

        @jax.jit
        def fwdt(v, c):
            out = trn.apply(v, c)[0, 0]
            return c + (out * 0).astype(c.dtype), out

        while True:  # same OOM batch-halving the timed_scan rows get
            clip = rand_batch((tb, 8, SIZE, SIZE, 3))
            try:
                t0 = time.perf_counter()
                clip, out = fwdt(tvars, clip)
                jax.device_get(out)
                print(f'# trn-mstrn b{tb} compile+first: '
                      f'{time.perf_counter() - t0:.1f}s', file=sys.stderr)
                break
            except Exception as e:
                if not _is_oom(e) or tb <= 2:
                    raise
                print(f'# trn-mstrn b{tb} OOM; retrying b{tb // 2}',
                      file=sys.stderr)
                tb //= 2
        t0 = time.perf_counter()
        for _ in range(iters):
            clip, out = fwdt(tvars, clip)
        jax.device_get(out)                     # chains all iters
        dt = (time.perf_counter() - t0) / iters
        rows.append({
            'metric': (f'trn MSTRN resnet50-backbone 8seg {SIZE}px bf16 '
                       f'videos/sec/chip'),
            'value': round(tb / dt, 2), 'unit': 'videos/s', 'batch': tb})

    # ------------------- 11. online serving loadtest (InferenceServer)
    def row_serving():
        """Three payload wire formats, same loadtest: preprocessed f32
        tensors (the classic path), raw uint8 at the 256px decode size
        (device-side fused preprocess; ~3x smaller), and encoded JPEG bytes
        (native host decode in the client threads; ~10-30x smaller). The r4
        row proved any ingress-limited deployment is request-bytes-bound —
        req/s == link_MBps / req_MB — so each mode reports its OWN link
        floor; compare modes within a session, rows across sessions only
        when link_up_MBps is comparable (bench_compare checks this)."""
        import io
        import threading
        from PIL import Image
        from pretorched_tpu.serving import _fit_uint8, serve_model
        model = pretorched.resnet50(num_classes=1000, pretrained=None).eval()
        model.bfloat16()
        max_batch = int(os.environ.get('BENCH_SERVE_MAXBATCH', '32'))
        n_req = int(os.environ.get('BENCH_SERVE_REQUESTS', '256'))
        n_cli = int(os.environ.get('BENCH_SERVE_CLIENTS', '8'))
        n_res = int(os.environ.get('BENCH_SERVE_RESOLVERS', '1'))
        modes = [m.strip() for m in
                 os.environ.get('BENCH_SERVE_MODES', 'f32,u8,jpeg').split(',')]
        unknown = [m for m in modes if m not in ('f32', 'u8', 'jpeg')]
        if unknown:
            # an unrecognized token must not silently run zero modes — the
            # missing rows would only surface as DROPPED in a later
            # cross-round diff
            notes.append(f'serving: unknown BENCH_SERVE_MODES {unknown} '
                         f"(valid: f32,u8,jpeg)")
            print(f'# {notes[-1]}', file=sys.stderr)
        shape = (SIZE, SIZE, 3)
        # context for the latency numbers: one tiny device->host round trip
        # (a request can never resolve faster than this on the axon tunnel)
        t0 = time.perf_counter()
        jax.device_get(jnp.zeros((1,)) + 1)
        rtt_ms = (time.perf_counter() - t0) * 1000
        # host->device upload bandwidth, measured once for all modes.
        # The tunnel runs ~13 MB/s some sessions and ~67 MB/s others (r4) —
        # the per-mode floor lets cross-round diffs tell link drift from
        # server regressions. (Real PCIe hosts: both are noise.)
        up = np.random.rand(1024 * 1024).astype(np.float32)      # 4MB
        jax.device_get(jax.device_put(up)[:1])                   # warm path
        t0 = time.perf_counter()
        jax.device_get(jax.device_put(up)[:1])
        link_mbps = 4.0 / (time.perf_counter() - t0)

        # request payloads: one natural image in each wire format
        here = os.path.dirname(os.path.abspath(__file__))
        from pretorched_tpu.datasets.native import decode_jpeg_batch
        cat = decode_jpeg_batch([open(os.path.join(here, 'data', 'cat.jpg'),
                                      'rb').read()])[0]
        u8_256 = _fit_uint8(cat, (256, 256, 3))
        buf = io.BytesIO()
        Image.fromarray(u8_256).save(buf, format='JPEG', quality=87)
        jpeg_bytes = buf.getvalue()
        f32_img = (u8_256[16:16 + SIZE, 16:16 + SIZE] / 255.0
                   ).astype(np.float32)
        t0 = time.perf_counter()
        decode_jpeg_batch([jpeg_bytes] * 8)
        decode_ms = (time.perf_counter() - t0) / 8 * 1000  # host decode cost

        def loadtest(srv, request, warm_shape, warm_dtype, tag):
            """req/s + latency percentiles; client errors re-raised (a
            swallowed thread exception used to silently shorten the latency
            array and corrupt the percentiles, ADVICE r4)."""
            b = 1
            warm = np.zeros((max_batch,) + warm_shape, warm_dtype)
            while b <= max_batch:   # warm every bucket outside the clock
                t0 = time.perf_counter()
                srv(warm[:b])
                print(f'# serving[{tag}] bucket {b} warm: '
                      f'{time.perf_counter() - t0:.1f}s', file=sys.stderr)
                b *= 2
            lat, errs = [], []
            lock = threading.Lock()

            def client(n):
                try:
                    for _ in range(n):
                        t0 = time.perf_counter()
                        srv.submit(request).result()
                        dt = time.perf_counter() - t0
                        with lock:
                            lat.append(dt)
                except BaseException as e:   # noqa: BLE001 — re-raised below
                    with lock:
                        errs.append(e)

            per = [n_req // n_cli + (1 if i < n_req % n_cli else 0)
                   for i in range(n_cli)]
            t0 = time.perf_counter()
            threads = [threading.Thread(target=client, args=(n,))
                       for n in per]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.perf_counter() - t0
            if errs:
                raise errs[0]
            assert len(lat) == n_req, (len(lat), n_req)
            p50, p99 = np.percentile(np.asarray(lat) * 1000, [50, 99])
            return n_req / wall, p50, p99

        def report(tag, name, req_bytes, reqs, p50, p99, srv, extra=(),
                   key_tag=''):
            rows.append(dict({
                # row_key strips parenthesized config notes, so what sits
                # outside the parens is the row's cross-round identity: the
                # f32 row keeps the pre-r5 metric key (it IS the same
                # measurement, so old artifacts without a 'name' field
                # still match it), while u8/jpeg carry a key_tag so they
                # never mis-match a pre-r5 f32 row
                'metric': (f'serving loadtest{key_tag} resnet50 {SIZE}px '
                           f'bf16 ({tag} payload, {n_cli} clients, '
                           f'max_batch {max_batch}, {n_res} resolvers, '
                           f'dynamic pow2 bucketing) req/sec'),
                'name': name,
                'value': round(reqs, 2), 'unit': 'req/s',
                'p50_ms': round(float(p50), 1),
                'p99_ms': round(float(p99), 1),
                'req_KB': round(req_bytes / 1e3, 1),
                'tunnel_rtt_ms': round(rtt_ms, 1),
                'link_up_MBps': round(link_mbps, 1),
                'link_floor_req_s': round(link_mbps / (req_bytes / 1e6), 1),
                'buckets': sorted(srv.bucket_compiles)}, **dict(extra)))

        if 'f32' in modes:
            with serve_model(model, max_batch=max_batch, max_wait_ms=2.0,
                             resolver_threads=n_res) as srv:
                reqs, p50, p99 = loadtest(srv, f32_img, shape, np.float32,
                                          'f32')
            report('f32 tensor', 'serving', SIZE * SIZE * 3 * 4,
                   reqs, p50, p99, srv)
            emit()
        if 'u8' in modes:
            with serve_model(model, max_batch=max_batch, max_wait_ms=2.0,
                             resolver_threads=n_res,
                             payload='uint8',
                             preprocess_dtype='bfloat16') as srv:
                reqs, p50, p99 = loadtest(srv, u8_256, (256, 256, 3),
                                          np.uint8, 'u8')
            report('uint8 256px', 'serving_u8', 256 * 256 * 3,
                   reqs, p50, p99, srv, key_tag=' uint8')
            emit()
        if 'jpeg' in modes:
            with serve_model(model, max_batch=max_batch, max_wait_ms=2.0,
                             resolver_threads=n_res, payload='jpeg',
                             preprocess_dtype='bfloat16') as srv:
                reqs, p50, p99 = loadtest(srv, jpeg_bytes, (256, 256, 3),
                                          np.uint8, 'jpeg')
            report('jpeg-encoded', 'serving_jpeg', len(jpeg_bytes),
                   reqs, p50, p99, srv, key_tag=' jpeg',
                   extra={'host_decode_ms': round(decode_ms, 2)})

    # -------------- 12. BigGAN-256 conditional sampling (BASELINE config 5)
    def row_biggan():
        from pretorched_tpu.gan.biggan import BigGAN
        module = BigGAN(resolution=256, ch=96, num_classes=1000,
                        dtype=jnp.bfloat16)
        gb = int(os.environ.get('BENCH_GAN_BATCH', '32'))
        z0 = jnp.zeros((1, module.latent_dim))
        y0 = jnp.zeros((1,), jnp.int32)
        variables = jax.jit(module.init)(jax.random.key(0), z0, y0)
        labels = jnp.asarray(rng.randint(0, 1000, (gb,)), jnp.int32)

        def gen(v, z):
            img = module.apply(v, z, labels[:z.shape[0]])
            return jnp.sum(img.astype(jnp.float32))   # full dependence

        iters = max(ITERS // 2, 5)
        z = jnp.asarray(rng.randn(gb, module.latent_dim), jnp.bfloat16)
        dt, gb = timed_scan(gen, variables, z, iters, 'biggan256')
        flops = cost_flops(jax.jit(gen), variables, z[:gb])
        rows.append({
            'metric': 'biggan256 ch96 class-conditional sampling bf16 '
                      'images/sec/chip',
            'value': round(gb / dt, 2), 'unit': 'images/s', 'batch': gb,
            'gflops_per_image': round(flops / gb / 1e9, 1),
            'mfu': round(flops / gb * (gb / dt) / V5E_BF16_PEAK_FLOPS, 3)})

    suite = [
        ('resnet3d50', row_resnet3d50),
        ('train', row_train),
        ('resnet50', row_resnet50),
        ('slowfast', row_slowfast),
        ('r2plus1d', row_r2plus1d),
        ('nonlocal', row_nonlocal),
        ('multiclip', row_multiclip),
        ('pipeline', row_pipeline),
        ('attn', row_attn),
        ('trn', row_trn),
        ('serving', row_serving),
        ('biggan', row_biggan),
    ]
    for i, (name, fn) in enumerate(suite):
        if ONLY and name not in ONLY.split(','):
            continue
        # the headline row always runs; later rows respect the budget
        if i > 0 and _elapsed() > TIME_BUDGET:
            notes.append(f'{name}: skipped, time budget '
                         f'({TIME_BUDGET:.0f}s) spent at {_elapsed():.0f}s')
            print(f'# {notes[-1]}', file=sys.stderr)
            emit()
            continue
        n_before = len(rows)
        try:
            fn()
        except Exception as e:
            notes.append(f'{name}: FAILED {type(e).__name__}: '
                         + str(e).splitlines()[0][:200])
            print(f'# {notes[-1]}', file=sys.stderr)
        for r in rows[n_before:]:       # stable short id for the compact
            r.setdefault('name', name)  # summary + cross-round matching
            if name in flops_check:     # audited counted/b1-scaled ratio
                r['flops_b_over_b1'] = flops_check[name]
        emit()
        gc.collect()

    emit()


if __name__ == '__main__':
    main()
