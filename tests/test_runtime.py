"""Multi-host rendezvous (reference utils/dist_utils.py:215-237).

The mock tests pin the env-triggered code path; the two-process test below
runs a REAL jax.distributed rendezvous on the CPU backend (round-4 VERDICT
#2 — previously this was the only load-bearing subsystem validated purely
by mock).
"""

import os
import re
import socket
import subprocess
import sys

import jax.numpy as jnp
import pytest

import devit_tpu.runtime as R


def test_no_env_no_rendezvous(monkeypatch):
    calls = []
    monkeypatch.setattr(R.jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    monkeypatch.delenv("DEVIT_MULTIHOST", raising=False)
    monkeypatch.delenv("DEVIT_COORDINATOR", raising=False)
    monkeypatch.setattr(R, "_DONE", False)
    R.setup_runtime()
    assert calls == []


def test_explicit_coordinator_env(monkeypatch):
    calls = []
    monkeypatch.setattr(R.jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    monkeypatch.setenv("DEVIT_COORDINATOR", "10.0.0.1:1234")
    monkeypatch.setenv("DEVIT_NUM_PROCESSES", "2")
    monkeypatch.setenv("DEVIT_PROCESS_ID", "0")
    monkeypatch.setattr(R, "_DONE", False)
    R.setup_runtime()
    assert calls == [{"coordinator_address": "10.0.0.1:1234",
                      "num_processes": 2, "process_id": 0}]


def test_multihost_autodetect(monkeypatch):
    calls = []
    monkeypatch.setattr(R.jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    monkeypatch.setenv("DEVIT_MULTIHOST", "1")
    monkeypatch.delenv("DEVIT_COORDINATOR", raising=False)
    monkeypatch.setattr(R, "_DONE", False)
    R.setup_runtime()
    assert calls == [{}]


def test_main_process_io_gating(monkeypatch, tmp_path):
    """Multihost rank-gated I/O (reference dist_utils.py:206-212
    is_main_process/save_on_master + utils/logger.py per-rank files):
    non-main processes skip msgpack checkpoint writes, all fit() file
    artifacts, and the console handler, and log to log_rank{r}.txt."""
    import logging

    import jax

    from devit_tpu.cli.common import make_saver
    from devit_tpu.train import loop as L
    from devit_tpu.train.meters import create_logger

    assert R.is_main_process()  # single-process default

    monkeypatch.setattr(jax, "process_index", lambda: 1)
    assert not R.is_main_process()

    # msgpack saver is a no-op off-main (orbax would stay collective)
    args = type("A", (), {"ckpt_format": "msgpack"})()
    ck = tmp_path / "ck.msgpack"
    make_saver(args)(str(ck), {"a": 1})
    assert not ck.exists()

    # per-rank log file; no console handler off-main
    lg = create_logger(str(tmp_path), name="devit_rank1_test")
    lg.info("hello")
    assert (tmp_path / "log_rank1.txt").exists()
    assert not (tmp_path / "log.txt").exists()
    assert not any(type(h) is logging.StreamHandler for h in lg.handlers)

    # fit() writes no stats/result/checkpoint files off-main (the save_fn
    # itself must still be CALLED every epoch — orbax saves are collective)
    calls = []
    out = tmp_path / "fit_out"
    L.fit(carry=0,
          step_fn=None,
          train_batches_fn=lambda e: [],
          eval_fn=lambda c: {"acc1": 1.0, "acc5": 1.0},
          epochs=1, rng=jax.random.key(0), output_dir=str(out),
          log_fn=lambda *a, **k: None,
          save_state_fn=lambda path, c, e: calls.append(path))
    assert calls, "save_state_fn must still run off-main (orbax collective)"
    assert not (out / "log_stats.txt").exists()
    assert not (out / "result.txt").exists()

    # back on main: saver writes for real
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    make_saver(args)(str(ck), {"a": jnp.zeros((2,))})
    assert ck.exists()


def _spawn_worker(nproc, pid, port):
    """Launch tests/multihost_worker.py in a CLEAN jax environment (the
    pytest process's XLA_FLAGS/8-device forcing must not leak in)."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "DEVIT_COORDINATOR",
                        "DEVIT_NUM_PROCESSES", "DEVIT_PROCESS_ID",
                        "DEVIT_MULTIHOST", "PYTHONPATH")}
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    return subprocess.Popen(
        [sys.executable, worker, str(nproc), str(pid), str(port)],
        cwd=os.path.dirname(os.path.dirname(worker)) or "/root/repo",
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


def _worker_vals(out: str) -> dict:
    vals = {}
    for tag in ("WORKER_LOSS", "WORKER_EVAL", "WORKER_ENS"):
        m = re.search(rf"{tag} ([0-9.eE+-]+)", out)
        assert m, f"worker printed no {tag}:\n{out[-2000:]}"
        vals[tag] = float(m.group(1))
    return vals


def test_real_two_process_rendezvous():
    """Genuine jax.distributed.initialize() across two OS processes on the
    CPU backend: after setup_runtime() the device view spans both processes
    (4 global devices, 2 local each), one data-parallel stage-2 step runs on
    a process-spanning ('data',) mesh, and the loss matches the
    single-process run of the identical program. This is what the reference
    exercises on every torch.distributed.launch (dist_utils.py:215-237)."""
    # single-process baseline (4 virtual devices, same mesh topology);
    # nproc=1 never touches the coordinator port
    base = _spawn_worker(1, 0, 0)
    base_out, _ = base.communicate(timeout=240)
    assert base.returncode == 0, base_out[-2000:]
    expected = _worker_vals(base_out)

    # pick the free port RIGHT before spawning the pair — reserving it before
    # the ~1 min baseline run left a wide window for another process to grab
    # it, flaking jax.distributed.initialize's coordinator bind
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    p0 = _spawn_worker(2, 0, port)
    p1 = _spawn_worker(2, 1, port)
    try:
        out0, _ = p0.communicate(timeout=240)
        out1, _ = p1.communicate(timeout=240)
    except subprocess.TimeoutExpired:
        p0.kill()
        p1.kill()
        pytest.fail("two-process rendezvous timed out (coordinator bind?)")
    assert p0.returncode == 0, out0[-2000:]
    assert p1.returncode == 0, out1[-2000:]
    v0 = _worker_vals(out0)
    v1 = _worker_vals(out1)
    # replicated outputs identical across processes, and each leg matches the
    # single-process run of the identical program: the stage-2 data-parallel
    # loss, the globally-summed eval counters (the reference's
    # synchronize_between_processes analogue), and the stage-5 ensemble step
    # with the DIV axis spanning the two processes
    assert v0 == v1, (v0, v1)
    for tag, got in v0.items():
        assert abs(got - expected[tag]) < 1e-5, (tag, got, expected[tag])
