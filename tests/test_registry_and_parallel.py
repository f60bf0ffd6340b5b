"""Registry completeness (SURVEY §2 inventory) + mesh-parallel eval/train."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pretorched_tpu as p

# the reference's settings.py aggregation (SURVEY §2.1); ours is a superset
REFERENCE_MODEL_NAMES = [
    'fbresnet152', 'bninception', 'resnext101_32x4d', 'resnext101_64x4d',
    'inceptionv4', 'inceptionresnetv2',
    'alexnet', 'densenet121', 'densenet169', 'densenet201', 'densenet161',
    'resnet18', 'resnet34', 'resnet50', 'resnet101', 'resnet152',
    'inceptionv3', 'squeezenet1_0', 'squeezenet1_1',
    'vgg11', 'vgg11_bn', 'vgg13', 'vgg13_bn', 'vgg16', 'vgg16_bn',
    'vgg19_bn', 'vgg19',
    'nasnetamobile', 'nasnetalarge',
    'dpn68', 'dpn68b', 'dpn92', 'dpn98', 'dpn131', 'dpn107',
    'xception',
    'senet154', 'se_resnet50', 'se_resnet101', 'se_resnet152',
    'se_resnext50_32x4d', 'se_resnext101_32x4d',
    'cafferesnet101', 'pnasnet5large', 'polynet',
    'resnet3d10', 'resnet3d18', 'resnet3d34', 'resnet3d50', 'resnet3d101',
    'resnet3d152', 'resnet3d200',
    'resnext3d10', 'resnext3d18', 'resnext3d34', 'resnext3d50',
    'resnext3d101', 'resnext3d152', 'resnext3d200',
]

# factories the reference exports without registering (pretorched/__init__.py)
EXTRA_FACTORIES = [
    'fbresnet18', 'fbresnet34', 'fbresnet50', 'fbresnet101',
    'resneti3d50', 'nonlocalresnet3d18', 'nonlocalresnet3d34',
    'nonlocalresnet3d50', 'nonlocalresnet3d101', 'mobilenetv2', 'soundnet8',
    'wideresnet3d50', 'vggm', 'trn', 'r2plus1d18', 'r2plus1d50',
    'preact_resnet3d18', 'preact_resnet3d50', 'densenet3d121', 'mvresnet18',
    'slowfast_resnet50', 'wideresnet50',
]


def test_model_names_superset_of_reference():
    missing = set(REFERENCE_MODEL_NAMES) - set(p.model_names)
    assert not missing, f'missing from registry: {sorted(missing)}'


def test_all_factories_present():
    for name in REFERENCE_MODEL_NAMES + EXTRA_FACTORIES:
        assert name in p.MODEL_REGISTRY, name
        assert callable(p.__dict__[name]), name


def test_settings_schema():
    for name in REFERENCE_MODEL_NAMES:
        for dataset, s in p.pretrained_settings[name].items():
            for key in ('url', 'input_space', 'input_size', 'input_range',
                        'mean', 'std', 'num_classes'):
                assert key in s, (name, dataset, key)


def test_mesh_sharded_eval_step():
    from pretorched_tpu.parallel import make_mesh
    from pretorched_tpu.parallel.evaluate import make_eval_step

    assert len(jax.devices()) == 8, 'conftest should provide 8 cpu devices'
    mesh = make_mesh()          # 8-way data parallel
    model = p.resnet18(num_classes=10, pretrained=None)
    step = make_eval_step(model, mesh=mesh)
    x = jnp.asarray(np.random.RandomState(0).randn(16, 64, 64, 3), jnp.float32)
    labels = jnp.asarray(np.arange(16) % 10)
    out = jax.device_get(step(model.variables, x, labels))
    assert int(out['count']) == 16
    assert 0 <= int(out['top1']) <= 16


def test_mesh_sharded_eval_uneven_batch():
    """Ragged batches pad to the data-axis multiple; -1 labels are masked
    out of every metric (incl. loss/count) — ADVICE r1 medium #2."""
    from pretorched_tpu.parallel import make_mesh
    from pretorched_tpu.parallel.evaluate import make_eval_step, pad_batch

    mesh = make_mesh()
    model = p.resnet18(num_classes=10, pretrained=None)
    step = make_eval_step(model, mesh=mesh)
    rng = np.random.RandomState(0)
    x = rng.randn(13, 32, 32, 3).astype(np.float32)   # 13 % 8 != 0
    labels = np.arange(13) % 10
    xp, lp = pad_batch(x, labels, mesh.shape['data'])
    assert len(lp) == 16 and (lp[13:] == -1).all()
    out = jax.device_get(step(model.variables, jnp.asarray(xp),
                              jnp.asarray(lp)))
    assert int(out['count']) == 13
    # identical metrics to the unsharded, unpadded run
    ref = jax.device_get(make_eval_step(model)(model.variables,
                                               jnp.asarray(x),
                                               jnp.asarray(labels)))
    assert int(out['top1']) == int(ref['top1'])
    assert int(out['top5']) == int(ref['top5'])
    np.testing.assert_allclose(float(out['loss']), float(ref['loss']),
                               rtol=1e-5)


def test_multi_clip_eval_consensus_and_loss():
    """Consensus = mean softmax over clips; loss is NLL of that mean
    (VERDICT r1 #10 + ADVICE r1 low #3)."""
    from pretorched_tpu.parallel.evaluate import multi_clip_eval_step

    model = p.resnet3d10(num_classes=6, pretrained=None)
    step = multi_clip_eval_step(model.module)
    rng = np.random.RandomState(1)
    clips = rng.randn(2, 3, 4, 16, 16, 3).astype(np.float32)
    labels = np.array([2, 5])
    out = jax.device_get(step(model.variables, jnp.asarray(clips),
                              jnp.asarray(labels)))
    # oracle: run the backbone per clip, average softmax, NLL
    flat = clips.reshape((-1,) + clips.shape[2:])
    logits = np.asarray(model.module.apply(model.variables, flat),
                        np.float32).reshape(2, 3, -1)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    mean_p = probs.mean(1)
    ref_loss = -np.log(mean_p[np.arange(2), labels]).sum()
    np.testing.assert_allclose(float(out['loss']), ref_loss, rtol=1e-4)
    assert int(out['count']) == 2


def test_mesh_train_step_dp_tp():
    import optax

    from pretorched_tpu.parallel import make_mesh, make_train_step
    from pretorched_tpu.parallel.mesh import batch_sharding, model_shardings

    mesh = make_mesh((4, 2))    # dp=4, tp=2
    model = p.resnet18(num_classes=8, pretrained=None)
    variables = jax.device_put(model.variables,
                               model_shardings(mesh, model.variables))
    params, batch_stats = variables['params'], variables.get('batch_stats')
    tx = optax.sgd(0.1, momentum=0.9)
    opt_state = tx.init(params)
    step = make_train_step(model.module, tx, mesh=mesh)
    x = jax.device_put(
        jnp.asarray(np.random.RandomState(0).randn(8, 32, 32, 3), jnp.float32),
        batch_sharding(mesh))
    labels = jax.device_put(jnp.asarray(np.arange(8) % 8), batch_sharding(mesh))
    with mesh:
        params, batch_stats, opt_state, metrics = step(
            params, batch_stats, opt_state, x, labels, 0)
    assert np.isfinite(float(metrics['loss']))
    # head kernel is column-sharded over 'model'
    sh = params['last_linear']['kernel'].sharding
    assert 'model' in str(sh.spec)


def _train_losses(module, variables, x, labels, remat):
    import optax

    from pretorched_tpu.parallel import make_train_step

    tx = optax.sgd(0.1, momentum=0.9)
    step = make_train_step(module, tx, remat=remat)
    pr = jax.tree_util.tree_map(jnp.copy, variables['params'])
    bs = jax.tree_util.tree_map(jnp.copy, variables.get('batch_stats'))
    opt_state = tx.init(pr)
    out = []
    for i in range(2):
        pr, bs, opt_state, m = step(pr, bs, opt_state, x, labels, i)
        out.append(float(m['loss']))
    return out


def test_train_step_remat_matches_plain():
    """Whole-forward jax.checkpoint fallback (modules without a remat field)
    is a compute trade, not a numerics change."""
    import flax.linen as nn

    class Tiny(nn.Module):     # deliberately has no `remat` field
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3))(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = jax.nn.relu(x).mean(axis=(1, 2))
            return nn.Dense(6)(x)

    module = Tiny()
    x = jnp.asarray(np.random.RandomState(1).randn(4, 16, 16, 3), jnp.float32)
    variables = dict(module.init(jax.random.key(0), x))
    labels = jnp.asarray(np.arange(4) % 6)
    a = _train_losses(module, variables, x, labels, False)
    b = _train_losses(module, variables, x, labels, True)
    np.testing.assert_allclose(b, a, rtol=1e-6)


@pytest.mark.parametrize('family', ['video', 'image'])
def test_train_step_block_remat_matches_plain(family):
    """Per-block nn.remat (the long-clip/large-batch training path): same
    param tree, identical losses, BN running stats still update."""
    if family == 'video':
        from pretorched_tpu.models.resnet3d import VideoResNet
        module = VideoResNet(block='bottleneck', layers=(1, 1, 1, 1),
                             num_classes=6)
        x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 32, 32, 3),
                        jnp.float32)
    else:
        from pretorched_tpu.models.resnet import ResNet
        module = ResNet(block='basic', layers=(1, 1, 1, 1), num_classes=6)
        x = jnp.asarray(np.random.RandomState(1).randn(2, 32, 32, 3),
                        jnp.float32)
    variables = dict(module.init(jax.random.key(0), x))
    labels = jnp.asarray(np.arange(2) % 6)
    a = _train_losses(module, variables, x, labels, False)
    b = _train_losses(module, variables, x, labels, True)
    np.testing.assert_allclose(b, a, rtol=1e-6)
    # remat=True builds the identical parameter tree
    import dataclasses
    mr = dataclasses.replace(module, remat=True)
    vr = dict(mr.init(jax.random.key(0), x))
    assert (jax.tree_util.tree_structure(vr)
            == jax.tree_util.tree_structure(variables))


def test_train_step_selective_remat_matches_plain():
    """Selective remat (remat=(0,): stem+layer1 blocks only — the stage the
    r4 grad roofline charged with the worst bwd roofline%) is numerically
    identical to the plain step and builds the same param tree."""
    import dataclasses

    from pretorched_tpu.models.resnet3d import VideoResNet
    module = VideoResNet(block='bottleneck', layers=(1, 1, 1, 1),
                         num_classes=6)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 32, 32, 3),
                    jnp.float32)
    variables = dict(module.init(jax.random.key(0), x))
    labels = jnp.asarray(np.arange(2) % 6)
    a = _train_losses(module, variables, x, labels, False)
    b = _train_losses(module, variables, x, labels, (0,))
    np.testing.assert_allclose(b, a, rtol=1e-6)
    ms = dataclasses.replace(module, remat=(0, 2))
    vs = dict(ms.init(jax.random.key(0), x))
    assert (jax.tree_util.tree_structure(vs)
            == jax.tree_util.tree_structure(variables))


def test_senet_se_identity_ablation():
    """se_identity bypasses every SE gate (profiling A/B) while accepting
    the full model's variables — outputs differ from the gated forward but
    share shapes; gated forward equals the plain model."""
    import dataclasses

    m = p.se_resnext50_32x4d(num_classes=7, pretrained=None).eval()
    # 224px: the SENet head pools a fixed 7x7 window (senet.py:129-130)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 224, 224, 3),
                    jnp.float32)
    y_on = m.module.apply(m.variables, x)
    mod_off = dataclasses.replace(m.module, se_identity=True)
    y_off = mod_off.apply(m.variables, x)     # extra SE params tolerated
    assert y_on.shape == y_off.shape == (1, 7)
    assert not np.allclose(np.asarray(y_on), np.asarray(y_off))


@pytest.mark.skipif(not os.environ.get('PRETORCHED_TEST_SLOW'),
                    reason='slow: big-model param-count checks')
def test_published_param_counts():
    assert p.nasnetamobile(num_classes=1000, pretrained=None).num_params() == 5289978
    assert p.nasnetalarge(num_classes=1000, pretrained=None).num_params() == 88753150
    assert p.pnasnet5large(num_classes=1000, pretrained=None).num_params() == 86057668
    assert p.polynet(num_classes=1000, pretrained=None).num_params() == 95366600


def test_train_step_without_batch_stats():
    """make_train_step(has_batch_stats=False): flax apply with mutable=[]
    still returns an (out, vars) tuple — BN-free models must train."""
    import flax.linen as nn
    import optax

    from pretorched_tpu.parallel import make_train_step

    class NoBN(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3))(x)
            x = jax.nn.relu(x).mean(axis=(1, 2))
            return nn.Dense(5)(x)

    module = NoBN()
    x = jnp.asarray(np.random.RandomState(0).randn(4, 16, 16, 3), jnp.float32)
    params = module.init(jax.random.key(0), x)['params']
    tx = optax.sgd(0.1)
    step = make_train_step(module, tx, has_batch_stats=False)
    opt_state = tx.init(params)
    params, bs, opt_state, m = step(params, None, opt_state, x,
                                    jnp.asarray(np.arange(4) % 5), 0)
    assert bs is None and np.isfinite(float(m['loss']))


def test_model_shardings_indivisible_head_stays_replicated():
    """A 101-class head on a tp=2 axis can't column-shard; it must fall back
    to replicated instead of failing at placement."""
    from pretorched_tpu.parallel import make_mesh
    from pretorched_tpu.parallel.mesh import model_shardings

    mesh = make_mesh((4, 2))
    model = p.resnet18(num_classes=101, pretrained=None)
    shardings = model_shardings(mesh, model.variables)
    placed = jax.device_put(model.variables, shardings)   # must not raise
    spec = placed['params']['last_linear']['kernel'].sharding.spec
    assert 'model' not in str(spec)
    # divisible heads still shard
    model2 = p.resnet18(num_classes=100, pretrained=None)
    placed2 = jax.device_put(model2.variables,
                             model_shardings(mesh, model2.variables))
    assert 'model' in str(placed2['params']['last_linear']['kernel'].sharding.spec)


def test_train_step_gradient_accumulation_matches_full_batch():
    """accum_steps=2 on a BN-free module: the accumulated average gradient
    equals the full-batch gradient, so parameter updates (and therefore the
    next step's loss) match the plain step exactly."""
    import flax.linen as nn
    import optax

    from pretorched_tpu.parallel import make_train_step

    class TinyNoBN(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3))(x)
            x = jax.nn.relu(x).mean(axis=(1, 2))
            return nn.Dense(6)(x)

    module = TinyNoBN()
    x = jnp.asarray(np.random.RandomState(2).randn(8, 16, 16, 3), jnp.float32)
    labels = jnp.asarray(np.arange(8) % 6)
    variables = dict(module.init(jax.random.key(0), x))

    def run(accum):
        tx = optax.sgd(0.1, momentum=0.9)
        step = make_train_step(module, tx, has_batch_stats=False,
                               accum_steps=accum)
        pr = jax.tree_util.tree_map(jnp.copy, variables['params'])
        opt_state = tx.init(pr)
        losses = []
        for i in range(3):
            pr, _, opt_state, m = step(pr, None, opt_state, x, labels, i)
            losses.append(float(m['loss']))
        return losses, pr

    la, pa = run(1)
    lb, pb = run(2)
    np.testing.assert_allclose(lb, la, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-6),
        pa, pb)


def test_train_step_gradient_accumulation_with_bn():
    """accum_steps with BatchNorm: runs, loss finite, and the BN running
    stats advance (microbatch-sequential semantics)."""
    import optax

    from pretorched_tpu.models.resnet3d import VideoResNet
    from pretorched_tpu.parallel import make_train_step

    module = VideoResNet(block='basic', layers=(1, 1, 1, 1), expansion=1,
                         num_classes=5)
    x = jnp.asarray(np.random.RandomState(3).randn(4, 4, 32, 32, 3),
                    jnp.float32)
    labels = jnp.asarray(np.arange(4) % 5)
    variables = dict(module.init(jax.random.key(0), x))
    tx = optax.sgd(0.1)
    step = make_train_step(module, tx, accum_steps=2)
    pr = jax.tree_util.tree_map(jnp.copy, variables['params'])
    bs0 = jax.tree_util.tree_map(jnp.copy, variables['batch_stats'])
    bs = jax.tree_util.tree_map(jnp.copy, variables['batch_stats'])
    opt_state = tx.init(pr)
    pr, bs, opt_state, m = step(pr, bs, opt_state, x, labels, 0)
    assert np.isfinite(float(m['loss']))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        bs0, bs)
    assert max(jax.tree_util.tree_leaves(moved)) > 0
