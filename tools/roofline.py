#!/usr/bin/env python
"""Per-stage roofline decomposition on the real chip (VERDICT r3 #1/#2).

Decomposes the bench headline (resnet3d50 16f 224px bf16 s2d fwd), the SGD
train step, and the SlowFast dual-pathway row into stage/pathway-level
time + FLOPs + MFU tables, printed as markdown for docs/performance.md.

Method: the net's four pipeline segments (``stage_slice`` in
models/resnet3d.py — stem+layer1 / layer2 / layer3 / layer4+head) are timed
as *cumulative prefixes* of the real graph — prefix(0,k) for k=1..4 — so the
per-stage delta (t_k - t_{k-1}) charges each stage with exactly what it adds
to the full compiled program, fusion boundaries included (isolated-stage
timings do NOT compose on XLA, ROUND_NOTES r3). Each prefix also runs
*isolated* on its own stage input, giving the stage's best-case in a
program all its own — the gap between the two columns is the fusion/layout
cost of composition.

Timing follows bench.py's tunnel rules: the loop lives inside one jit via
lax.scan with a carry that feeds the input and depends on the output, and
completion is forced with jax.device_get of a scalar. Variables are jit
arguments, never closures.

Usage: python tools/roofline.py [--sections fwd,train,slowfast]
                                [--batch 128] [--iters 10]
"""

import argparse
import dataclasses
import gc
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

V5E_BF16_PEAK_FLOPS = 197e12
V5E_HBM_GBPS = 819e9

STAGE_NAMES = ('stem+layer1', 'layer2', 'layer3', 'layer4+head')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--sections', default='fwd,train,slowfast')
    p.add_argument('--batch', type=int, default=128)
    p.add_argument('--train-batch', type=int, default=128)
    p.add_argument('--sf-batch', type=int, default=128)
    p.add_argument('--frames', type=int, default=16)
    p.add_argument('--size', type=int, default=224)
    p.add_argument('--iters', type=int, default=10)
    args = p.parse_args()
    sections = args.sections.split(',')

    import jax
    import jax.numpy as jnp
    import numpy as np

    import pretorched_tpu as pretorched
    from pretorched_tpu.models.resnet3d import PIPELINE_STAGE_PREFIXES

    t0 = time.perf_counter()
    jax.device_get(jax.jit(lambda x: x + 1)(jnp.zeros((8, 128))))
    print(f'# cold-path warmup: {time.perf_counter() - t0:.1f}s', flush=True)

    rng = np.random.RandomState(0)

    def rand_batch(shape, dtype=jnp.bfloat16):
        one = jnp.asarray(rng.rand(1, *shape[1:]), dtype)
        return jnp.broadcast_to(one, tuple(shape))

    def timed_scan(apply_fn, variables, x, iters, tag):
        """sec/iter; carry feeds the input and depends on the output (the
        output is reduced to a scalar so mismatched shapes still chain)."""
        @jax.jit
        def many(v, xb):
            def body(carry, _):
                out = apply_fn(v, carry)
                s = jnp.sum(out.astype(jnp.float32))
                carry = carry + (s * 0).astype(carry.dtype)
                return carry, s
            _, outs = jax.lax.scan(body, xb, None, length=iters)
            return jnp.sum(outs)

        t0 = time.perf_counter()
        jax.device_get(many(variables, x))
        print(f'# {tag} compile+first: {time.perf_counter() - t0:.1f}s',
              flush=True)
        t0 = time.perf_counter()
        jax.device_get(many(variables, x))
        return (time.perf_counter() - t0) / iters

    def cost_flops(fn, *a):
        """(flops, hbm_bytes) of one call per XLA cost analysis."""
        try:
            ca = jax.jit(fn).lower(*a).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            return (float(ca.get('flops', 0.0)),
                    float(ca.get('bytes accessed', 0.0)))
        except Exception as e:
            print(f'# cost_analysis failed: {e}', flush=True)
            return 0.0, 0.0

    def stage_params(variables, lo, hi):
        """Variable subtree for prefix stages lo..hi-1 — merged from the
        library's own stage partition so the stage->param mapping lives in
        exactly one place (models/resnet3d.py split_stage_variables)."""
        from pretorched_tpu.models.resnet3d import split_stage_variables
        merged: dict = {}
        for sub in split_stage_variables(variables)[lo:hi]:
            for coll, tree in sub.items():
                merged.setdefault(coll, {}).update(tree)
        return merged

    def table(title, names, times, costs, batch):
        """costs: list of (flops, bytes) cumulative pairs. The roofline
        column reports achieved time vs max(compute-bound, HBM-bound) time
        for each stage's delta — ~100% means the stage is AT its roofline
        and low MFU there is an arithmetic-intensity fact, not a lost
        optimization."""
        print(f'\n### {title} (b{batch}, deltas from cumulative prefixes)\n')
        print('| stage | ms/iter | GFLOP | GB | MFU | HBM GB/s | bound | '
              'roofline% |')
        print('|---|---|---|---|---|---|---|---|')
        tot_t, (tot_f, tot_b) = times[-1], costs[-1]
        prev_t = prev_f = prev_b = 0.0
        for name, t, (f, bts) in zip(names, times, costs):
            dt, df, db = t - prev_t, f - prev_f, bts - prev_b
            prev_t, prev_f, prev_b = t, f, bts
            if dt <= 0:
                continue
            t_flop = df / V5E_BF16_PEAK_FLOPS
            t_hbm = db / V5E_HBM_GBPS
            bound = 'MXU' if t_flop > t_hbm else 'HBM'
            roof = max(t_flop, t_hbm) / dt * 100
            print(f'| {name} | {dt * 1e3:.1f} | {df / 1e9:.0f} | '
                  f'{db / 1e9:.1f} | '
                  f'{df / dt / V5E_BF16_PEAK_FLOPS * 100:.1f}% | '
                  f'{db / dt / 1e9:.0f} | {bound} | {roof:.0f}% |')
        t_flop, t_hbm = tot_f / V5E_BF16_PEAK_FLOPS, tot_b / V5E_HBM_GBPS
        print(f'| **total** | **{tot_t * 1e3:.1f}** | **{tot_f / 1e9:.0f}** '
              f'| **{tot_b / 1e9:.1f}** | '
              f'**{tot_f / tot_t / V5E_BF16_PEAK_FLOPS * 100:.1f}%** | '
              f'**{tot_b / tot_t / 1e9:.0f}** | '
              f'**{"MXU" if t_flop > t_hbm else "HBM"}** | '
              f'**{max(t_flop, t_hbm) / tot_t * 100:.0f}%** |')
        sys.stdout.flush()

    # ---------------------------------------------------------- forward
    if 'fwd' in sections:
        model = pretorched.resnet3d50(num_classes=400, pretrained=None)
        model.bfloat16()
        module = dataclasses.replace(model.module, s2d_stem=True)
        variables = model.variables
        clip = rand_batch((args.batch, args.frames, args.size, args.size, 3))

        times, flops = [], []
        for k in range(1, 5):
            def fwd(v, c, k=k):
                return module.apply(v, c, stage_slice=(0, k))
            sub = stage_params(variables, 0, k)
            times.append(timed_scan(fwd, sub, clip, args.iters,
                                    f'fwd prefix(0,{k})'))
            flops.append(cost_flops(fwd, sub, clip))
        table('resnet3d50 forward per-stage roofline', STAGE_NAMES, times,
              flops, args.batch)

        # isolated per stage: each stage in a program of its own, on its
        # real input activation (best case; does not compose — r3 rule)
        print('\n### isolated stages (same batch; upper bound per stage)\n')
        print('| stage | ms/iter | GFLOP | MFU | vs in-graph |')
        print('|---|---|---|---|---|')
        h = clip
        prev_t = 0.0
        for k in range(4):
            def one(v, c, k=k):
                return module.apply(v, c, stage_slice=(k, k + 1))
            sub = stage_params(variables, k, k + 1)
            t = timed_scan(one, sub, h, args.iters, f'fwd stage {k} isolated')
            f, _ = cost_flops(one, sub, h)
            dt_graph = times[k] - prev_t
            prev_t = times[k]
            print(f'| {STAGE_NAMES[k]} | {t * 1e3:.1f} | {f / 1e9:.0f} | '
                  f'{f / t / V5E_BF16_PEAK_FLOPS * 100:.1f}% | '
                  f'{dt_graph / t:.2f}x |')
            sys.stdout.flush()
            if k < 3:
                h = jax.jit(one)(sub, h)   # next stage's input
        del model, variables, clip, h
        gc.collect()

    # ------------------------------------------------------------ train
    if 'train' in sections:
        model = pretorched.resnet3d50(num_classes=400, pretrained=None)
        module = dataclasses.replace(model.module, dtype=jnp.bfloat16,
                                     s2d_stem=True)
        variables = model.variables
        batch = args.train_batch
        clip = rand_batch((batch, args.frames, args.size, args.size, 3),
                          jnp.float32)

        # all four prefixes must run at ONE batch for the deltas to mean
        # anything — on OOM, restart the whole section at half batch
        while True:
            times, flops = [], []
            try:
                for k in range(1, 5):
                    def gstep(params_bs, c, k=k):
                        params, bs = params_bs
                        def loss_fn(params):
                            out, _ = module.apply(
                                {'params': params, 'batch_stats': bs}, c,
                                stage_slice=(0, k), train=True,
                                mutable=['batch_stats'])
                            return jnp.mean(out.astype(jnp.float32) ** 2)
                        g = jax.grad(loss_fn)(params)
                        # one scalar carrying dependence on every grad leaf
                        return sum(jnp.sum(l.astype(jnp.float32))
                                   for l in jax.tree_util.tree_leaves(g))
                    sub = stage_params(variables, 0, k)
                    pb = (sub['params'], sub['batch_stats'])
                    times.append(timed_scan(gstep, pb, clip, args.iters,
                                            f'train prefix(0,{k}) b{batch}'))
                    flops.append(cost_flops(gstep, pb, clip))
                break
            except Exception as e:
                from bench import _is_oom   # all three OOM message forms
                if not _is_oom(e) or batch <= 8:
                    raise
                batch //= 2
                clip = rand_batch(
                    (batch, args.frames, args.size, args.size, 3),
                    jnp.float32)
                print(f'# train section OOM -> restarting at b{batch}',
                      flush=True)
                gc.collect()
        table('resnet3d50 fwd+bwd (grad) per-stage roofline', STAGE_NAMES,
              times, flops, batch)
        del model, variables, clip
        gc.collect()

    # --------------------------------------------------------- slowfast
    if 'slowfast' in sections:
        sf_frames = 64
        print(f'\n### SlowFast-R50 {sf_frames}f{args.size}px pathway profile '
              f'(b{args.sf_batch}, s2d stems)\n')
        print('| variant | ms/iter | GFLOP | TFLOP/s | MFU |')
        print('|---|---|---|---|---|')
        results = {}
        for mode in ('sf', 's', 'f'):
            m = pretorched.slowfast_resnet50(mode=mode, num_classes=400,
                                             pretrained=None)
            m.bfloat16()
            module = dataclasses.replace(m.module, s2d_stem=True)
            clip = rand_batch((args.sf_batch, sf_frames, args.size,
                               args.size, 3))

            def fwd(v, c, module=module):
                return module.apply(v, c)
            t = timed_scan(fwd, m.variables, clip, args.iters,
                           f'slowfast mode={mode}')
            f, bts = cost_flops(fwd, m.variables, clip)
            results[mode] = (t, f)
            roof = max(f / V5E_BF16_PEAK_FLOPS, bts / V5E_HBM_GBPS) / t * 100
            print(f'| {mode} | {t * 1e3:.1f} | {f / 1e9 / args.sf_batch:.0f}'
                  f'/clip | {f / t / 1e12:.1f} | '
                  f'{f / t / V5E_BF16_PEAK_FLOPS * 100:.1f}% '
                  f'(roofline {roof:.0f}%, {bts / t / 1e9:.0f} GB/s) |')
            sys.stdout.flush()
            del m, clip
            gc.collect()
        (t_sf, f_sf), (t_s, f_s), (t_f, f_f) = (results['sf'], results['s'],
                                                results['f'])
        print(f'\nlaterals + concat-widened slow overhead: '
              f'{(t_sf - t_s - t_f) * 1e3:.1f} ms/iter '
              f'({(t_sf - t_s - t_f) / t_sf * 100:.0f}% of sf), '
              f'{(f_sf - f_s - f_f) / 1e9:.0f} GFLOP')

    def timed_chain(apply_fn, variables, x, iters, tag):
        """Python-chained timing for graphs whose scan form breaks the
        tunnel's remote compile (MSTRN, bench.py r3 note): one jitted call
        returning (carried input, scalar), iterated from Python; the final
        device_get chains every step through data dependencies."""
        @jax.jit
        def one(v, c):
            out = apply_fn(v, c)
            s = jnp.sum(out.astype(jnp.float32))
            return c + (s * 0).astype(c.dtype), s

        t0 = time.perf_counter()
        c, s = one(variables, x)
        jax.device_get(s)
        print(f'# {tag} compile+first: {time.perf_counter() - t0:.1f}s',
              flush=True)
        t0 = time.perf_counter()
        for _ in range(iters):
            c, s = one(variables, c)
        jax.device_get(s)
        return (time.perf_counter() - t0) / iters

    # ---------------------------------------------------- SE excitation
    # Fusion evidence for the squeeze-excite gates (VERDICT r4 #6): A/B the
    # FULL se_resnext50_32x4d graph against the identical graph with every
    # SE gate bypassed (se_identity). If the measured delta is close to the
    # SE ops' own roofline time (they are tiny: global pool + two 1x1 convs
    # + sigmoid-scale per block), the gates are fusion-resident — XLA keeps
    # them inside the surrounding conv fusions rather than spilling extra
    # HBM round trips.
    if 'senet' in sections:
        m = pretorched.se_resnext50_32x4d(num_classes=1000, pretrained=None)
        m.bfloat16()
        img = rand_batch((args.batch, args.size, args.size, 3))

        def fwd_se(v, x):
            return m.module.apply(v, x)

        mod_off = dataclasses.replace(m.module, se_identity=True)

        def fwd_off(v, x):
            return mod_off.apply(v, x)

        t_on = timed_scan(fwd_se, m.variables, img, args.iters,
                          f'se_resnext50 SE-on b{args.batch}')
        f_on, b_on = cost_flops(fwd_se, m.variables, img)
        t_off = timed_scan(fwd_off, m.variables, img, args.iters,
                           f'se_resnext50 SE-off b{args.batch}')
        f_off, b_off = cost_flops(fwd_off, m.variables, img)
        dt, df, db = t_on - t_off, f_on - f_off, b_on - b_off
        t_roof = max(df / V5E_BF16_PEAK_FLOPS, db / V5E_HBM_GBPS)
        print(f'\n### se_resnext50_32x4d SE-gate fusion evidence '
              f'(b{args.batch} {args.size}px bf16)\n')
        print('| graph | ms/iter | GFLOP | GB | MFU |')
        print('|---|---|---|---|---|')
        for name, t, f, bts in (('SE on (full model)', t_on, f_on, b_on),
                                ('SE bypassed', t_off, f_off, b_off)):
            print(f'| {name} | {t * 1e3:.1f} | {f / 1e9:.0f} | '
                  f'{bts / 1e9:.1f} | '
                  f'{f / t / V5E_BF16_PEAK_FLOPS * 100:.1f}% |')
        print(f'| **SE delta** | **{dt * 1e3:.2f}** | **{df / 1e9:.1f}** | '
              f'**{db / 1e9:.2f}** | roofline time '
              f'**{t_roof * 1e3:.2f} ms** ({dt / max(t_roof, 1e-12):.1f}x) |')
        print(f'\nSE gates cost {dt / t_on * 100:.1f}% of the forward for '
              f'{df / f_on * 100:.2f}% of its FLOPs; delta vs own-roofline '
              f'{dt / max(t_roof, 1e-12):.1f}x.', flush=True)
        del m, img
        gc.collect()

    # ------------------------------------------------ TRN relation MLPs
    # Fusion evidence for the MSTRN relation heads: full TRN forward minus
    # the per-frame backbone on the same frame count isolates what the 7
    # relation MLPs + subset gathers + classifier add to the graph; compare
    # that delta to the head ops' own roofline time.
    if 'trn' in sections:
        tb = 64
        trn_m = pretorched.trn(num_classes=400, num_segments=8,
                               consensus='MSTRN', arch='resnet50',
                               pretrained=None)
        trn_m.bfloat16()
        clip = rand_batch((tb, 8, args.size, args.size, 3))
        frames = clip.reshape((tb * 8,) + clip.shape[2:])
        base = trn_m.module.base_module
        base_vars = {c: t['base_module'] for c, t in trn_m.variables.items()
                     if 'base_module' in t}

        def fwd_full(v, c):
            return trn_m.module.apply(v, c)

        def fwd_bb(v, fr):
            return base.apply(v, fr, mode='forward', head=False)

        t_full = timed_chain(fwd_full, trn_m.variables, clip, args.iters,
                             f'trn MSTRN full b{tb}')
        f_full, b_full = cost_flops(fwd_full, trn_m.variables, clip)
        t_bb = timed_chain(fwd_bb, base_vars, frames, args.iters,
                           f'trn backbone-only b{tb}x8 frames')
        f_bb, b_bb = cost_flops(fwd_bb, base_vars, frames)
        dt, df, db = t_full - t_bb, f_full - f_bb, b_full - b_bb
        t_roof = max(df / V5E_BF16_PEAK_FLOPS, db / V5E_HBM_GBPS)
        print(f'\n### TRN MSTRN relation-head fusion evidence '
              f'(resnet50 backbone, b{tb} x 8 seg {args.size}px bf16)\n')
        print('| graph | ms/iter | GFLOP | GB | MFU |')
        print('|---|---|---|---|---|')
        for name, t, f, bts in (('full TRN (backbone+head)', t_full, f_full,
                                 b_full),
                                ('backbone only (512 frames)', t_bb, f_bb,
                                 b_bb)):
            print(f'| {name} | {t * 1e3:.1f} | {f / 1e9:.0f} | '
                  f'{bts / 1e9:.1f} | '
                  f'{f / t / V5E_BF16_PEAK_FLOPS * 100:.1f}% |')
        print(f'| **head delta** | **{dt * 1e3:.2f}** | **{df / 1e9:.1f}** '
              f'| **{db / 1e9:.2f}** | roofline time '
              f'**{t_roof * 1e3:.2f} ms** ({dt / max(t_roof, 1e-12):.1f}x) |')
        print(f'\nrelation head costs {dt / t_full * 100:.1f}% of the '
              f'forward for {df / f_full * 100:.2f}% of its FLOPs; delta vs '
              f'own-roofline {dt / max(t_roof, 1e-12):.1f}x.', flush=True)

    print('\n# done', flush=True)


if __name__ == '__main__':
    main()
