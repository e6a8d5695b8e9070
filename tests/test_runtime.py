"""Multi-host rendezvous gating (reference utils/dist_utils.py:215-237).

Real multi-host can't be exercised here (one chip via tunnel); this pins the
env-triggered code path with a mocked jax.distributed.initialize.
"""

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
