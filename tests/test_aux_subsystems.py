"""Aux subsystems (SURVEY §5): checkpoint round-trip, profiling, debugging."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pretorched_tpu as p


def test_checkpoint_roundtrip(tmp_path):
    from pretorched_tpu.zoo.checkpoint import load_checkpoint, save_checkpoint

    state = {
        'params': {'w': jnp.arange(6.0).reshape(2, 3), 'b': jnp.ones(3)},
        'meta': {'epoch': 3, 'arch': 'resnet18', 'best_prec1': 71.5},
    }
    path = str(tmp_path / 'ckpt')
    save_checkpoint(path, state, is_best=True)
    restored = load_checkpoint(path, template=state)
    np.testing.assert_array_equal(np.asarray(restored['params']['w']),
                                  np.asarray(state['params']['w']))
    assert restored['meta']['epoch'] == 3


def test_zoo_io_converted_cache_roundtrip(tmp_path):
    from pretorched_tpu.zoo import io as zoo_io

    variables = {'params': {'conv': {'kernel': jnp.ones((3, 3, 2, 4))}},
                 'batch_stats': {'bn': {'mean': jnp.zeros(4)}}}
    path = tmp_path / 'm.msgpack'
    zoo_io.save_converted(variables, path)
    out = zoo_io.load_converted(variables, path)
    np.testing.assert_array_equal(np.asarray(out['params']['conv']['kernel']),
                                  np.ones((3, 3, 2, 4)))


def test_op_shapes_and_flops():
    from pretorched_tpu.utils.profiling import flops_estimate, op_shapes

    def f(a, b):
        return (a @ b).sum()

    a = jnp.ones((64, 128))
    b = jnp.ones((128, 32))
    shapes = op_shapes(f, a, b)
    assert ('dot_general', (64, 32)) in shapes
    flops = flops_estimate(f, a, b)
    assert flops >= 2 * 64 * 128 * 32 * 0.4   # cost model may discount

def test_step_timer_format():
    from pretorched_tpu.utils.profiling import StepTimer

    t = StepTimer()
    t.data_loaded()
    t.step_done()
    s = str(t)
    assert 'Time' in s and 'Data' in s


def test_checked_catches_nan():
    from pretorched_tpu.utils.debugging import checked

    def f(x):
        return jnp.log(x)

    g = checked(f)
    g(jnp.asarray([1.0, 2.0]))   # fine
    with pytest.raises(Exception):
        g(jnp.asarray([-1.0]))   # log(-1) = nan


def test_grad_stats_and_assert_finite():
    from pretorched_tpu.utils.debugging import assert_finite, grad_stats

    grads = {'layer1': {'w': jnp.ones((2, 2)) * 3}, 'fc': {'b': jnp.ones(2)}}
    stats = grad_stats(grads)
    assert any('layer1' in k for k in stats)
    assert_finite(grads)
    with pytest.raises(FloatingPointError):
        assert_finite({'x': jnp.asarray([np.nan])})


def test_profile_model_cli():
    """tools/profile_model.py: cost analysis + op ranking + timed steps."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        'profile_model',
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), 'tools', 'profile_model.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rc = mod.main(['-a', 'resnet18', '-b', '1', '--size', '64',
                   '--num-classes', '7', '--cpu'])
    assert rc == 0


def test_compile_cache_enable_and_populate(tmp_path, monkeypatch):
    """compile_cache: flag/env parsing + a jit actually writes cache files."""
    from pretorched_tpu.utils import compile_cache as cc

    prev = jax.config.jax_compilation_cache_dir
    prev_min_time = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        # env parsing: unset/falsy -> None; truthy -> default dir; path -> path
        monkeypatch.delenv('PRETORCHED_COMPILE_CACHE', raising=False)
        assert cc.enable_from_env() is None
        monkeypatch.setenv('PRETORCHED_COMPILE_CACHE', '0')
        assert cc.enable_from_env() is None
        monkeypatch.setenv('PRETORCHED_COMPILE_CACHE', '1')
        assert cc.enable_from_env() == cc.default_cache_dir()
        assert cc.enable_from_flag(None) is None
        assert cc.enable_from_flag('off') is None

        cache_dir = cc.enable_from_flag(str(tmp_path / 'xla'))
        assert cache_dir == str(tmp_path / 'xla')
        assert jax.config.jax_compilation_cache_dir == cache_dir

        # a fresh compile must land in the cache directory
        @jax.jit
        def f(x):
            return (x * 2.0 + 1.0).sum()

        f(jnp.arange(512.0).reshape(8, 64)).block_until_ready()
        import os
        entries = os.listdir(cache_dir) if os.path.isdir(cache_dir) else []
        assert entries, 'persistent compilation cache wrote no entries'
    finally:
        jax.config.update('jax_compilation_cache_dir', prev)
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          prev_min_time)


def test_preemption_guard():
    """SIGTERM latches the flag; a second signal chains to the previous
    handler; handlers are restored on exit (utils/preemption.py — TPU
    spot-eviction safety, SURVEY §5.3)."""
    import signal

    from pretorched_tpu.utils import PreemptionGuard

    chained = []

    def prev_handler(signum, frame):
        chained.append(signum)

    old = signal.signal(signal.SIGTERM, prev_handler)
    try:
        with PreemptionGuard() as guard:
            assert not guard.requested
            signal.raise_signal(signal.SIGTERM)
            assert guard.requested
            assert chained == []          # first signal only sets the flag
            signal.raise_signal(signal.SIGTERM)
            assert chained == [signal.SIGTERM]   # second one chains through
        assert signal.getsignal(signal.SIGTERM) is prev_handler
    finally:
        signal.signal(signal.SIGTERM, old)


def test_preemption_guard_loop_checkpoint(tmp_path):
    """The documented wiring: a training-style loop polls the guard, saves
    once mid-run, and stops — matching examples/imagenet_eval.py."""
    import signal

    from pretorched_tpu.utils import PreemptionGuard
    from pretorched_tpu.zoo.checkpoint import load_checkpoint, save_checkpoint

    state = {'w': np.zeros((2, 2), np.float32)}
    saved_at = []
    with PreemptionGuard(signals=(signal.SIGUSR1,)) as guard:
        for step in range(100):
            state = {'w': state['w'] + 1.0}
            if step == 3:
                signal.raise_signal(signal.SIGUSR1)
            if guard.requested:
                save_checkpoint(str(tmp_path / 'ckpt'), state)
                saved_at.append(step)
                break
    assert saved_at == [3]
    restored = load_checkpoint(str(tmp_path / 'ckpt'), template=state)
    np.testing.assert_array_equal(np.asarray(restored['w']),
                                  np.full((2, 2), 4.0, np.float32))
