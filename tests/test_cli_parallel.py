"""The product CLI stages execute multi-device (VERDICT r1 items 2 & 5):

- train_sub_main runs data-parallel over the 8-device mesh and produces the
  same checkpoint as identity (single-device) placement.
- ensemble_main runs on the ('div','data') mesh with division-sharded stacked
  params and matches identity placement.
- ensemble --resume across an epoch boundary reproduces the uninterrupted run
  (both optimizer states restored — reference ensemble.py:390-402).

All runs drive the real argparse surface via build_parser().
"""

import os

import numpy as np
import pytest

import jax

import devit_tpu.cli.common as C
import devit_tpu.cli.stages  # noqa: F401  (stages looks helpers up on C at call time)
from devit_tpu.cli.__main__ import build_parser
from devit_tpu.io.checkpoint import restore_pytree

TINY_MODEL = [
    "--input-size", "32", "--patch-size", "8",
    "--embed-dim", "32", "--depth", "2", "--num-heads", "2",
    "--drop-path", "0.0",
]
TINY_OPT = [
    "--batch-size", "32", "--eval-batch-size", "64", "--epochs", "1",
    "--warmup-epochs", "0", "--cooldown-epochs", "0", "--lr", "1e-3",
]
DATA = ["--dataset", "synthetic:8:128:32", "--num_division", "2",
        "--no-repeated-aug", "--aa", ""]


def run(argv):
    args = build_parser().parse_args(argv)
    return args.fn(args)


def max_leaf_diff(a, b):
    fa, fb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    return max(
        float(np.max(np.abs(np.asarray(x, np.float32) - np.asarray(y, np.float32))))
        for x, y in zip(fa, fb)
    )


def _identity_data_ctx(log=None):
    ident = lambda tree: tree
    return ident, ident, None


def _identity_ens_ctx(num_divisions, log=None):
    ident = lambda tree: tree
    return ident, ident, ident, None


def test_train_sub_cli_is_data_parallel_and_matches_identity(tmp_path, monkeypatch):
    seen = {}
    real = C.data_parallel_context

    def spy(log=None):
        pb, pr, mesh = real(log)
        seen["mesh"] = mesh
        return pb, pr, mesh

    monkeypatch.setattr(C, "data_parallel_context", spy)
    out_dp = str(tmp_path / "dp")
    run(["train_sub", *TINY_MODEL, *TINY_OPT, *DATA,
         "--start-division", "0", "--output_dir", out_dp])
    assert seen["mesh"] is not None, "CLI stage did not build the data mesh"
    assert seen["mesh"].devices.size == 8

    monkeypatch.setattr(C, "data_parallel_context", _identity_data_ctx)
    out_1 = str(tmp_path / "single")
    run(["train_sub", *TINY_MODEL, *TINY_OPT, *DATA,
         "--start-division", "0", "--output_dir", out_1])

    a = restore_pytree(os.path.join(out_dp, "checkpoint_temp.msgpack"), None)
    b = restore_pytree(os.path.join(out_1, "checkpoint_temp.msgpack"), None)
    d = max_leaf_diff(a["params"], b["params"])
    # bf16 activations: the sharded all-reduce sums grads in a different
    # order than the single-device reduction; observed max diff ~1e-4 after
    # one epoch. A real sharding bug (wrong batch slice, missing psum)
    # produces diffs orders of magnitude larger.
    assert d < 5e-4, f"data-parallel params diverged from single-device: {d}"


def test_ensemble_cli_division_mesh_matches_identity(tmp_path, monkeypatch):
    seen = {}
    real = C.ensemble_parallel_context

    def spy(num_divisions, log=None):
        out = real(num_divisions, log)
        seen["mesh"] = out[3]
        return out

    monkeypatch.setattr(C, "ensemble_parallel_context", spy)
    out_dp = str(tmp_path / "ens_dp")
    run(["ensemble", *TINY_MODEL, *TINY_OPT, *DATA, "--model", "dedeit",
         "--teacher-size", "48", "--distillation-type", "none",
         "--output_dir", out_dp])
    assert seen["mesh"] is not None
    assert dict(seen["mesh"].shape) == {"div": 2, "data": 4}

    monkeypatch.setattr(C, "ensemble_parallel_context", _identity_ens_ctx)
    out_1 = str(tmp_path / "ens_single")
    run(["ensemble", *TINY_MODEL, *TINY_OPT, *DATA, "--model", "dedeit",
         "--teacher-size", "48", "--distillation-type", "none",
         "--output_dir", out_1])

    a = restore_pytree(os.path.join(out_dp, "checkpoint_temp.msgpack"), None)
    b = restore_pytree(os.path.join(out_1, "checkpoint_temp.msgpack"), None)
    d = max(max_leaf_diff(a["backbone_params"], b["backbone_params"]),
            max_leaf_diff(a["ens_params"], b["ens_params"]))
    # bf16 reduction-order noise (see comment in the train_sub test above)
    assert d < 5e-4, f"division-parallel ensemble diverged from single-device: {d}"


def test_ensemble_resume_reproduces_uninterrupted_run(tmp_path, monkeypatch):
    # explicit flags (no positional TINY_OPT surgery): same optimizer recipe
    # as the other runs, minus --epochs which each run sets itself below
    base = ["ensemble", *TINY_MODEL,
            "--batch-size", "32", "--eval-batch-size", "64",
            "--warmup-epochs", "0", "--cooldown-epochs", "0", "--lr", "1e-3",
            *DATA,
            "--model", "dedeit", "--teacher-size", "48",
            "--distillation-type", "none"]

    out_full = str(tmp_path / "full")
    run([*base, "--epochs", "2", "--output_dir", out_full])

    # Interrupted run: SAME --epochs 2 (the cosine schedule's t_initial is the
    # total epoch count — timm semantics — so changing --epochs changes the
    # epoch-0 LRs), crash simulated at the first epoch boundary by capping
    # fit()'s epoch loop at 1; checkpoint_temp.msgpack is the per-epoch crash
    # artifact the real failure path leaves behind (train/loop.py).
    import devit_tpu.cli.stages as stages_mod
    real_fit = stages_mod.fit

    def fit_one_epoch(*args, **kw):
        kw["epochs"] = 1
        return real_fit(*args, **kw)

    out_part = str(tmp_path / "part")
    monkeypatch.setattr(stages_mod, "fit", fit_one_epoch)
    run([*base, "--epochs", "2", "--output_dir", out_part])
    monkeypatch.setattr(stages_mod, "fit", real_fit)
    run([*base, "--epochs", "2", "--output_dir", out_part,
         "--resume", os.path.join(out_part, "checkpoint_temp.msgpack")])

    a = restore_pytree(os.path.join(out_full, "checkpoint_temp.msgpack"), None)
    b = restore_pytree(os.path.join(out_part, "checkpoint_temp.msgpack"), None)
    assert int(np.asarray(a["epoch"])) == int(np.asarray(b["epoch"])) == 1
    for key in ("backbone_params", "ens_params", "bb_opt_state", "ens_opt_state"):
        d = max_leaf_diff(a[key], b[key])
        assert d < 1e-5, f"{key} differs after resume: {d}"
