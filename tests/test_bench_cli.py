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
