"""End-to-end five-stage pipeline on synthetic data at toy geometry —
the integration test the reference never had (SURVEY.md §4)."""

import os

import numpy as np
import pytest

from devit_tpu.cli.__main__ import build_parser


TINY_MODEL = [
    "--input-size", "32", "--patch-size", "8",
    "--embed-dim", "32", "--depth", "2", "--num-heads", "2",
    "--drop-path", "0.0",
]
TINY_OPT = [
    "--batch-size", "32", "--eval-batch-size", "64", "--epochs", "1",
    "--warmup-epochs", "0", "--cooldown-epochs", "0", "--lr", "1e-3",
]
DATA = ["--dataset", "synthetic:8:256:32", "--num_division", "2"]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("pipeline"))


def run(argv):
    args = build_parser().parse_args(argv)
    return args.fn(args)


def test_stage1_split(workdir):
    out = os.path.join(workdir, "split")
    path = run(["split", *DATA, "--output_dir", out])
    assert os.path.exists(path)
    from devit_tpu.data.splitter import DivisionManifest

    man = DivisionManifest.load(path)
    assert man.num_division == 2 and sum(len(d) for d in man.divisions) == 8


def test_stage2_train_sub(workdir):
    out = os.path.join(workdir, "sub-dataset0")
    best = run([
        "train_sub", *TINY_MODEL, *TINY_OPT, *DATA,
        "--manifest", os.path.join(workdir, "split", "division2", "manifest.json"),
        "--start-division", "0", "--output_dir", out,
        "--no-repeated-aug", "--aa", "",
    ])
    assert os.path.exists(os.path.join(out, "checkpoint.msgpack"))
    assert best >= 0.0


def test_stage3_shrink(workdir):
    out = os.path.join(workdir, "shrink0")
    result = run([
        "shrink", *TINY_MODEL, *TINY_OPT, *DATA,
        "--model", "dedeit",
        "--manifest", os.path.join(workdir, "split", "division2", "manifest.json"),
        "--model-path", os.path.join(workdir, "sub-dataset0", "checkpoint.msgpack"),
        "--start-division", "0", "--output_dir", out,
        "--population", "4", "--shrink-ratio", "0.3", "--ub", "0.8",
        "--candidate-chunk", "2",
    ])
    assert os.path.exists(os.path.join(out, "shrinked_policy.npy"))
    pols = np.load(os.path.join(out, "shrinked_policy.npy"))
    accs = np.load(os.path.join(out, "shrinked_accuracy.npy"))
    assert pols.shape == (4, 4) and accs.shape == (4,)  # 2 layers -> 4 dims


def test_stage4_distill(workdir):
    out = os.path.join(workdir, "distill0")
    best = run([
        "distill", *TINY_MODEL, *TINY_OPT, *DATA,
        "--manifest", os.path.join(workdir, "split", "division2", "manifest.json"),
        "--model-path", os.path.join(workdir, "sub-dataset0", "checkpoint.msgpack"),
        "--policy-path", os.path.join(workdir, "shrink0"),
        "--start-division", "0", "--output_dir", out,
        "--gama", "0.2", "0.1", "0.3",
        "--no-repeated-aug", "--aa", "",
    ])
    assert os.path.exists(os.path.join(out, "checkpoint.msgpack"))


def test_stage5_ensemble(workdir):
    # train division 1 quickly so both checkpoints exist
    out1 = os.path.join(workdir, "sub-dataset1")
    run([
        "train_sub", *TINY_MODEL, *TINY_OPT, *DATA,
        "--manifest", os.path.join(workdir, "split", "division2", "manifest.json"),
        "--start-division", "1", "--output_dir", out1,
        "--no-repeated-aug", "--aa", "",
    ])
    # rename into the sub-dataset{i}/checkpoint layout the ensemble stage expects
    subroot = workdir
    out = os.path.join(workdir, "ensemble")
    best = run([
        "ensemble", *TINY_MODEL, *TINY_OPT, *DATA,
        "--model", "dedeit",
        "--manifest", os.path.join(workdir, "split", "division2", "manifest.json"),
        "--sub-model-path", subroot,
        "--teacher-size", "48",
        "--distillation-type", "none",
        "--output_dir", out,
        "--no-repeated-aug", "--aa", "",
    ])
    assert os.path.exists(os.path.join(out, "checkpoint.msgpack"))
    assert best >= 0.0


def test_profile_flag_writes_trace(workdir):
    out = os.path.join(workdir, "prof")
    trace_dir = os.path.join(workdir, "trace")
    run([
        "train_sub", *TINY_MODEL, *TINY_OPT, *DATA,
        "--start-division", "0", "--output_dir", out,
        "--no-repeated-aug", "--aa", "", "--profile-dir", trace_dir,
    ])
    # jax.profiler writes plugins/profile/<ts>/*.xplane.pb under the logdir
    found = []
    for root, _dirs, files in os.walk(trace_dir):
        found += [f for f in files if f.endswith(".xplane.pb") or f.endswith(".trace.json.gz")]
    assert found, f"no profiler artifacts under {trace_dir}"
