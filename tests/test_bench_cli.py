"""The bench subcommand's mode plumbing (throughput / latency / train):
_bench_main communicates with bench.py via env vars — stale vars must never
flip the driver's throughput contract."""

import os

from devit_tpu.cli.__main__ import build_parser


def _run_capturing_env(argv, monkeypatch):
    captured = {}

    def fake_run_path(path, run_name=None):
        for k in ("DEVIT_BENCH_BATCH", "DEVIT_BENCH_LATENCY", "DEVIT_BENCH_TRAIN"):
            captured[k] = os.environ.get(k)

    import runpy

    monkeypatch.setattr(runpy, "run_path", fake_run_path)
    args = build_parser().parse_args(argv)
    args.fn(args)
    return captured


def test_bench_default_clears_stale_modes(monkeypatch):
    monkeypatch.setenv("DEVIT_BENCH_LATENCY", "1,16")
    monkeypatch.setenv("DEVIT_BENCH_TRAIN", "1")
    env = _run_capturing_env(["bench"], monkeypatch)
    assert env["DEVIT_BENCH_BATCH"] == "256"
    assert env["DEVIT_BENCH_LATENCY"] is None
    assert env["DEVIT_BENCH_TRAIN"] is None


def test_bench_train_mode(monkeypatch):
    env = _run_capturing_env(["bench", "--train", "--batch-size", "128"],
                             monkeypatch)
    assert env["DEVIT_BENCH_TRAIN"] == "1"
    assert env["DEVIT_BENCH_BATCH"] == "128"


def test_bench_latency_mode(monkeypatch):
    env = _run_capturing_env(["bench", "--latency", "1,16,256"], monkeypatch)
    assert env["DEVIT_BENCH_LATENCY"] == "1,16,256"
    assert env["DEVIT_BENCH_TRAIN"] is None


def test_watchdog_prints_lastgood_on_deadline():
    """The deadline watchdog (armed BEFORE backend init) must print ONE
    honestly-marked JSON line from bench_lastgood.json when the tunnel stalls
    — round 4's driver bench died rc=124 with NO output in a slow period
    where a trivial program's first round-trip stalled 13+ minutes. Runs the
    real bench.py as a subprocess with a 2 s deadline; the watchdog fires
    long before any program could compile."""
    import json
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # strip mode vars the earlier tests' _bench_main calls left in os.environ
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("DEVIT_BENCH_")}
    env["DEVIT_BENCH_DEADLINE"] = "2"
    env.pop("PYTHONPATH", None)  # breaks axon PJRT plugin discovery
    out = subprocess.run(
        [sys.executable, os.path.join(root, "bench.py")], cwd=root, env=env,
        capture_output=True, text=True, timeout=240)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1, (out.stdout, out.stderr[-2000:])
    rec = json.loads(lines[0])
    assert rec["stale"] is True
    # either failure mode is fine — what matters is the single stale line:
    # the 2 s deadline (watchdog) or a backend-discovery crash under this
    # test env (fatal-error fallback, fires even faster)
    assert ("deadline" in rec["note"]) or ("fatal error" in rec["note"])
    assert rec["timed_out_after_s"] > 0
    assert rec["unit"] == "img/s"
    lastgood = os.path.join(root, "bench_lastgood.json")
    if os.path.exists(lastgood):  # committed, but tolerate a cleaned tree
        with open(lastgood) as fh:
            last = json.load(fh)
        assert rec["value"] == last["value"]
        assert rec["measured_at"] == last["measured_at"]
    else:
        assert rec["value"] is None
    assert out.returncode == 0  # the driver must see a clean JSON exit
