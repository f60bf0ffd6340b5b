"""parallel/dist.py: multi-host init wrapper (VERDICT r1 #9) — exercised
with a monkeypatched jax.distributed.initialize."""

import jax

from pretorched_tpu.parallel import dist


def test_initialize_single_host_noop(monkeypatch):
    monkeypatch.delenv('JAX_COORDINATOR_ADDRESS', raising=False)
    called = {}
    monkeypatch.setattr(jax.distributed, 'initialize',
                        lambda **kw: called.update(kw))
    assert dist.initialize() is False
    assert not called


def test_initialize_env_var_resolution(monkeypatch):
    monkeypatch.setenv('JAX_COORDINATOR_ADDRESS', 'coord.example:1234')
    called = {}
    monkeypatch.setattr(jax.distributed, 'initialize',
                        lambda **kw: called.update(kw))
    assert dist.initialize(num_processes=4, process_id=2) is True
    assert called == dict(coordinator_address='coord.example:1234',
                          num_processes=4, process_id=2)


def test_initialize_explicit_args(monkeypatch):
    monkeypatch.delenv('JAX_COORDINATOR_ADDRESS', raising=False)
    called = {}
    monkeypatch.setattr(jax.distributed, 'initialize',
                        lambda **kw: called.update(kw))
    assert dist.initialize('10.0.0.1:9999', 2, 0) is True
    assert called == dict(coordinator_address='10.0.0.1:9999',
                          num_processes=2, process_id=0)
