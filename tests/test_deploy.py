"""Deploy stage: compact-artifact roundtrip and the CLI deploy command."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from devit_tpu.cli.__main__ import build_parser
from devit_tpu.configs import get_vit_config
from devit_tpu.models.compact_vit import (
    compact_forward, compact_vit_ragged, load_compact, save_compact,
)
from devit_tpu.models.vit import Gates, VisionTransformer


def test_compact_save_load_roundtrip(tmp_path):
    cfg = get_vit_config("dedeit", img_size=32, patch_size=8, embed_dim=64,
                         depth=2, num_heads=4, num_classes=9)
    model = VisionTransformer(cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    params = model.init(jax.random.key(1), x)["params"]
    gates = Gates(jnp.ones((2, 4)).at[0, 0].set(0), jnp.ones((2, 256)).at[1, :56].set(0))
    cm = compact_vit_ragged(params, gates, cfg, neuron_multiple=8)
    path = str(tmp_path / "compact.msgpack")
    save_compact(path, cm)
    cm2 = load_compact(path)
    assert [l["num_heads"] for l in cm2.layers] == [l["num_heads"] for l in cm.layers]
    a = compact_forward(cm, x, patch_size=8, dtype=jnp.float32,
                        use_pallas=False, fast_math=False)
    b = compact_forward(cm2, x, patch_size=8, dtype=jnp.float32,
                        use_pallas=False, fast_math=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_deploy_cli(tmp_path):
    # fabricate two division checkpoints with gates (distill-stage layout)
    from devit_tpu.io.checkpoint import save_pytree

    cfg = get_vit_config("dedeit", img_size=32, patch_size=8, embed_dim=32,
                         depth=2, num_heads=2, num_classes=4)
    model = VisionTransformer(cfg, dtype=jnp.float32)
    x = jnp.zeros((2, 32, 32, 3))
    for i in range(2):
        params = model.init(jax.random.key(i), x)["params"]
        gates = {"head": np.ones((2, 2), np.float32),
                 "neuron": np.concatenate([np.ones((2, 96), np.float32),
                                           np.zeros((2, 32), np.float32)], axis=1)}
        save_pytree(str(tmp_path / f"sub-dataset{i}" / "checkpoint.msgpack"),
                    {"params": params, "gates": gates, "epoch": np.int32(0)})

    args = build_parser().parse_args([
        "deploy", "--model", "dedeit",
        "--input-size", "32", "--patch-size", "8",
        "--embed-dim", "32", "--depth", "2", "--num-heads", "2",
        "--num_division", "2",
        "--sub-model-path", str(tmp_path),
        "--deploy-num-classes", "4",
        "--neuron-multiple", "8",
        "--output_dir", str(tmp_path / "deploy"),
    ])
    report = args.fn(args)
    assert len(report) == 2
    assert os.path.exists(str(tmp_path / "deploy" / "sub-dataset0" / "compact.msgpack"))
    assert os.path.exists(str(tmp_path / "deploy" / "deploy_report.json"))
    cm = load_compact(str(tmp_path / "deploy" / "sub-dataset0" / "compact.msgpack"))
    out = compact_forward(cm, x, patch_size=8, dtype=jnp.float32,
                          use_pallas=False, fast_math=False)
    assert out.shape == (2, 4)


def test_ensemble_eval_from_compact_artifacts(tmp_path):
    """deploy -> ensemble --eval --compact-path: the serving path end-to-end."""
    from devit_tpu.io.checkpoint import save_pytree
    from devit_tpu.models.compact_vit import compact_vit_ragged, save_compact

    cfg = get_vit_config("dedeit", img_size=32, patch_size=8, embed_dim=32,
                         depth=2, num_heads=2, num_classes=4)
    model = VisionTransformer(cfg, dtype=jnp.float32)
    x = jnp.zeros((2, 32, 32, 3))
    for i in range(2):
        params = model.init(jax.random.key(i), x, features_only=True)["params"]
        gates = Gates(jnp.ones((2, 2)), jnp.ones((2, 128)))
        cm = compact_vit_ragged(params, gates, cfg, neuron_multiple=8)
        save_compact(str(tmp_path / f"sub-dataset{i}" / "compact.msgpack"), cm)

    args = build_parser().parse_args([
        "ensemble", "--model", "dedeit",
        "--input-size", "32", "--patch-size", "8",
        "--embed-dim", "32", "--depth", "2", "--num-heads", "2",
        "--dataset", "synthetic:8:128:32", "--num_division", "2",
        "--compact-path", str(tmp_path),
        "--teacher-size", "48",
        # 128 val images / bs48 -> ragged 32-sample tail: exercises the
        # pad-to-steady-shape path (no per-shape recompile of the D programs)
        "--eval-batch-size", "48",
        "--eval",
        "--output_dir", str(tmp_path / "out"),
    ])
    acc1 = args.fn(args)
    assert 0.0 <= acc1 <= 100.0


def test_ensemble_applies_distill_checkpoint_gates(tmp_path):
    """Stage 5 must train/eval the backbones GATED when the sub-model
    checkpoints came from the distill stage (which stores its shrink gates in
    the checkpoint): the deployed compact artifacts serve gated features, so
    EnsMLP must fuse the same. (The reference's gates are non-persistent
    module attributes — its ensemble silently re-enables pruned units; a
    resolved reference bug.)"""
    from devit_tpu.io.checkpoint import save_pytree

    cfg = get_vit_config("dedeit", img_size=32, patch_size=8, embed_dim=32,
                         depth=2, num_heads=2, num_classes=4)
    model = VisionTransformer(cfg, dtype=jnp.float32)
    x = jnp.zeros((2, 32, 32, 3))
    for i in range(2):
        params = model.init(jax.random.key(i), x)["params"]
        gates = {"head": np.ones((2, 2), np.float32),
                 "neuron": np.concatenate([np.ones((2, 96), np.float32),
                                           np.zeros((2, 32), np.float32)], axis=1)}
        save_pytree(str(tmp_path / f"sub-dataset{i}" / "checkpoint.msgpack"),
                    {"params": params, "gates": gates, "epoch": np.int32(0)})

    out = str(tmp_path / "ens")
    args = build_parser().parse_args([
        "ensemble", "--model", "dedeit",
        "--input-size", "32", "--patch-size", "8",
        "--embed-dim", "32", "--depth", "2", "--num-heads", "2",
        "--dataset", "synthetic:4:64:32", "--num_division", "2",
        "--sub-model-path", str(tmp_path),
        "--teacher-size", "48", "--distillation-type", "none",
        "--eval-batch-size", "32", "--eval",
        "--output_dir", out,
        "--no-repeated-aug", "--aa", "",
    ])
    acc1 = args.fn(args)
    assert 0.0 <= acc1 <= 100.0
    with open(os.path.join(out, "log.txt")) as f:
        assert "applied shrink gates" in f.read()


def test_gated_ensemble_checkpoint_resume_and_deploy(tmp_path):
    """A GATED stage-5 run persists its stacked gates in the checkpoint;
    --resume restores through the gate-carrying template, and
    deploy --ensemble-path compacts with those gates (no distill ckpts
    needed)."""
    from devit_tpu.io.checkpoint import restore_pytree, save_pytree

    cfg = get_vit_config("dedeit", img_size=32, patch_size=8, embed_dim=32,
                         depth=2, num_heads=2, num_classes=4)
    model = VisionTransformer(cfg, dtype=jnp.float32)
    x = jnp.zeros((2, 32, 32, 3))
    for i in range(2):
        params = model.init(jax.random.key(i), x)["params"]
        gates = {"head": np.ones((2, 2), np.float32),
                 "neuron": np.concatenate([np.ones((2, 96), np.float32),
                                           np.zeros((2, 32), np.float32)], axis=1)}
        save_pytree(str(tmp_path / f"sub-dataset{i}" / "checkpoint.msgpack"),
                    {"params": params, "gates": gates, "epoch": np.int32(0)})

    out = str(tmp_path / "ens")
    base = [
        "ensemble", "--model", "dedeit",
        "--input-size", "32", "--patch-size", "8",
        "--embed-dim", "32", "--depth", "2", "--num-heads", "2",
        "--drop-path", "0.0",
        "--dataset", "synthetic:4:64:32", "--num_division", "2",
        "--sub-model-path", str(tmp_path),
        "--teacher-size", "48", "--distillation-type", "none",
        "--batch-size", "16", "--eval-batch-size", "32",
        "--warmup-epochs", "0", "--cooldown-epochs", "0",
        "--no-repeated-aug", "--aa", "", "--mixup", "0", "--cutmix", "0",
        "--reprob", "0",
        "--output_dir", out,
    ]
    args = build_parser().parse_args(base + ["--epochs", "1"])
    args.fn(args)
    ckpt = restore_pytree(os.path.join(out, "checkpoint.msgpack"), None)
    assert "gates" in ckpt and ckpt["gates"]["head"].shape == (2, 2, 2)

    # resume into a second epoch through the gate-carrying template
    args = build_parser().parse_args(base + [
        "--epochs", "2", "--resume", os.path.join(out, "checkpoint_temp.msgpack")])
    args.fn(args)
    with open(os.path.join(out, "log.txt")) as f:
        log = f.read()
    assert "resumed ensemble (params, optimizer states, EMA)" in log

    # deploy straight from the gated ensemble checkpoint
    dargs = build_parser().parse_args([
        "deploy", "--model", "dedeit",
        "--input-size", "32", "--patch-size", "8",
        "--embed-dim", "32", "--depth", "2", "--num-heads", "2",
        "--num_division", "2",
        "--ensemble-path", os.path.join(out, "checkpoint.msgpack"),
        "--deploy-num-classes", "4", "--neuron-multiple", "8",
        "--output_dir", str(tmp_path / "deploy"),
    ])
    report = dargs.fn(dargs)
    assert len(report) == 2
    cm = load_compact(str(tmp_path / "deploy" / "sub-dataset0" / "compact.msgpack"))
    # the persisted 96/128-neuron gates survived into the compact widths
    assert all(lp["fc1_kernel"].shape[1] == 96 for lp in cm.layers)


def test_resume_ungated_checkpoint_into_gated_run(tmp_path):
    """An old stage-5 checkpoint saved WITHOUT gates must still restore
    optimizer states + epoch when resumed into a gated run (the resume
    template falls back to the gate-less structure instead of silently
    degrading to params-only)."""
    import types

    import optax

    from devit_tpu.cli.stages import _ensemble_ckpt_tree, _try_resume_ensemble
    from devit_tpu.io.checkpoint import save_pytree
    from devit_tpu.train.state import TrainState

    tx = optax.adamw(1e-3)
    bb = TrainState.create({"w": jnp.arange(4.0)}, tx)
    ens = TrainState.create({"k": jnp.ones((2, 2))}, tx)
    # advance the saved state so restored != fresh
    bb_trained = bb.replace(params={"w": jnp.arange(4.0) + 7.0})
    path = str(tmp_path / "old.msgpack")
    save_pytree(path, _ensemble_ckpt_tree(bb_trained, ens, 3, None))

    gates = Gates(head=jnp.ones((2, 2, 2)), neuron=jnp.ones((2, 2, 8)))
    log = types.SimpleNamespace(info=lambda *a, **k: None)
    args = types.SimpleNamespace(resume=path)
    bb2, ens2, start = _try_resume_ensemble(args, bb, ens, log, gates=gates)
    assert start == 4
    np.testing.assert_array_equal(np.asarray(bb2.params["w"]),
                                  np.arange(4.0) + 7.0)
    # optimizer state restored through the fallback template (not reset):
    # structure intact and usable
    assert jax.tree_util.tree_structure(bb2.opt_state) == \
        jax.tree_util.tree_structure(bb.opt_state)
