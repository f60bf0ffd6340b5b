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


def test_two_process_distributed_eval():
    """REAL multi-process integration (no monkeypatch): two subprocesses,
    2 virtual CPU devices each, joined by dist.initialize into one 4-device
    global mesh (Gloo — the CPU stand-in for a multi-host pod). Each process
    feeds only its half of the batch; the psum'd metrics must equal the
    single-process oracle. See tests/dist_eval_worker.py."""
    import os
    import subprocess
    import sys

    import socket

    worker = os.path.join(os.path.dirname(__file__), 'dist_eval_worker.py')
    # ephemeral port: bind port 0 to get a free one, then release it for the
    # coordinator (a fixed 15000+pid%10000 could collide with an in-use port)
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ)
    procs = [subprocess.Popen([sys.executable, worker, str(pid), port],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for pid in (0, 1)]
    outs = []
    try:
        for p_ in procs:
            out, _ = p_.communicate(timeout=300)
            outs.append(out)
    finally:
        # on a communicate() timeout the sibling worker would otherwise leak
        for p_ in procs:
            if p_.poll() is None:
                p_.kill()
                p_.wait()
    for pid, (p_, out) in enumerate(zip(procs, outs)):
        assert p_.returncode == 0, f'worker {pid} failed:\n{out[-3000:]}'
        assert f'DIST-EVAL-OK proc={pid}' in out, out[-3000:]
        # the same worker then runs two mesh-sharded train steps fed via
        # parallel.global_batch and must match a single-process oracle
        assert f'DIST-TRAIN-OK proc={pid}' in out, out[-3000:]
