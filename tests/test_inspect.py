"""`devit inspect` — artifact introspection across every format we produce."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from devit_tpu.cli.inspect_ckpt import inspect_main, summarize_artifact
from devit_tpu.configs import get_vit_config
from devit_tpu.data.splitter import DivisionManifest
from devit_tpu.io.checkpoint import params_to_torch_vit, save_pytree
from devit_tpu.models.compact_vit import compact_vit_ragged, save_compact
from devit_tpu.models.vit import Gates, VisionTransformer

CFG = get_vit_config("dedeit", img_size=32, patch_size=8, embed_dim=64,
                     depth=3, num_heads=4, num_classes=9)


@pytest.fixture(scope="module")
def vit_params():
    model = VisionTransformer(CFG, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3))
    return model.init(jax.random.key(0), x)["params"]


def _gates(head_keep=2, neuron_keep=96):
    rng = np.random.default_rng(0)
    head = np.zeros((CFG.depth, CFG.num_heads), np.float32)
    neuron = np.zeros((CFG.depth, CFG.hidden_dim), np.float32)
    for l in range(CFG.depth):
        head[l, rng.choice(CFG.num_heads, head_keep, replace=False)] = 1
        neuron[l, rng.choice(CFG.hidden_dim, neuron_keep, replace=False)] = 1
    return Gates(jnp.asarray(head), jnp.asarray(neuron))


def test_inspect_stage_checkpoint(tmp_path, vit_params):
    g = _gates()
    path = str(tmp_path / "checkpoint_temp.msgpack")
    save_pytree(path, {
        "params": vit_params,
        "ema_params": vit_params,
        "opt_state": {"count": np.int32(7)},
        "gates": {"head": np.asarray(g.head), "neuron": np.asarray(g.neuron)},
        "epoch": np.int32(4),
    })
    info = summarize_artifact(path)
    assert info["format"] == "msgpack"
    assert info["kind"] == "stage checkpoint"
    geo = info["geometry"]
    assert geo["family"] == "vit"
    assert geo["depth"] == CFG.depth
    assert geo["embed_dim"] == 64
    assert geo["mlp_hidden"] == CFG.hidden_dim
    assert geo["num_classes"] == 9
    assert geo["patch_size"] == 8 and geo["img_size"] == 32
    assert geo["distilled"] is True and geo["seq_len"] == 18
    assert info["epoch"] == 4
    assert info["has_ema"] and info["has_opt_state"]
    assert info["gates"]["head"]["kept_per_layer"] == [2, 2, 2]
    assert info["gates"]["neuron"]["total_per_layer"] == CFG.hidden_dim
    assert info["param_count"] > 0 and info["leaf_count"] > 10


def test_inspect_torch_state_dict(tmp_path, vit_params):
    torch = pytest.importorskip("torch")
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in params_to_torch_vit(
              jax.tree_util.tree_map(np.asarray, vit_params), CFG.depth).items()}
    path = str(tmp_path / "checkpoint.pth")
    torch.save(sd, path)
    info = summarize_artifact(path)
    assert info["format"] == "torch"
    geo = info["geometry"]
    assert geo["family"] == "vit"
    assert geo["depth"] == CFG.depth
    assert geo["embed_dim"] == 64
    assert geo["num_classes"] == 9
    assert geo["distilled"] is True


def test_inspect_compact_artifact(tmp_path, vit_params):
    cm = compact_vit_ragged(vit_params, _gates(), CFG,
                            head_multiple=1, neuron_multiple=8)
    path = str(tmp_path / "division0.msgpack")
    save_compact(path, cm)
    info = summarize_artifact(path)
    assert info["kind"] == "compact serving artifact"
    geo = info["geometry"]
    assert geo["family"] == "vit-compact"
    assert geo["depth"] == CFG.depth
    assert geo["kept_heads_per_layer"] == [2, 2, 2]
    assert geo["kept_neurons_per_layer"] == [96, 96, 96]
    assert geo["num_classes"] == 9
    assert geo["distilled"] is True


def test_inspect_shrink_npy_and_manifest(tmp_path):
    pol = np.array([[0.1] * 6, [0.3] * 6, [0.2] * 6], np.float32)
    acc = np.array([55.0, 71.5, 60.0], np.float32)
    np.save(tmp_path / "shrinked_policy.npy", pol)
    np.save(tmp_path / "shrinked_accuracy.npy", acc)
    info = summarize_artifact(str(tmp_path / "shrinked_policy.npy"))
    assert info["best_index"] == 1
    assert info["best_accuracy"] == pytest.approx(71.5)
    assert info["best_policy"]["neuron_sparsity"] == pytest.approx([0.3] * 3)
    assert info["best_policy"]["head_sparsity"] == pytest.approx([0.3] * 3)

    man = DivisionManifest.create(num_classes=10, num_division=3, seed=42)
    man.save(str(tmp_path / "manifest.json"))
    info = summarize_artifact(str(tmp_path / "manifest.json"))
    assert info["kind"] == "division manifest (stage 1)"
    assert info["num_divisions"] == 3
    assert sum(info["classes_per_division"]) == 10
    assert info["seed"] == 42


def test_inspect_cct_checkpoint_not_misreported_as_vit(tmp_path):
    """CCT blocks contain both 'pre_norm' and 'qkv' — the ViT signature must
    not claim them (regression: every CCT tree printed family='vit')."""
    from devit_tpu.configs import get_cct_config
    from devit_tpu.models.cct import CCT

    cfg = get_cct_config("cct_2_3x2_32", num_classes=7)
    model = CCT(cfg, dtype=jnp.float32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
    path = str(tmp_path / "checkpoint_temp.msgpack")
    save_pytree(path, {"params": params, "epoch": np.int32(2)})
    info = summarize_artifact(path)
    geo = info["geometry"]
    assert geo["family"] == "cct"
    assert geo["depth"] == 2
    assert geo["embed_dim"] == cfg.embed_dim
    assert geo["num_classes"] == 7
    assert geo["n_conv_layers"] == 2
    assert geo["seq_pool"] is True


def test_inspect_orbax_msgpack_name_redirect(tmp_path, vit_params):
    """--ckpt-format orbax rewrites 'checkpoint.msgpack' -> 'checkpoint.orbax'
    on save; inspect must accept the documented .msgpack name the same way
    restore_pytree does, and label the format orbax."""
    from devit_tpu.io.checkpoint import save_pytree_orbax, wait_for_checkpoints

    orbax_path = str(tmp_path / "checkpoint.orbax")
    save_pytree_orbax(orbax_path, {"params": vit_params, "epoch": np.int32(3)})
    wait_for_checkpoints()
    info = summarize_artifact(str(tmp_path / "checkpoint.msgpack"))
    assert info["format"] == "orbax"
    assert info["kind"] == "stage checkpoint"
    assert info["geometry"]["family"] == "vit"
    assert info["epoch"] == 3

    class A:
        paths = [str(tmp_path / "checkpoint.msgpack")]
        json = True

    assert inspect_main(A()) == 0  # existence check follows the redirect too


def test_inspect_state_dict_wrapped_torch(tmp_path, vit_params):
    """{'state_dict': ...}-wrapped torch checkpoints unwrap to real geometry
    (regression: detected as training checkpoint but never unwrapped ->
    family unknown, 0 params)."""
    torch = pytest.importorskip("torch")
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in params_to_torch_vit(
              jax.tree_util.tree_map(np.asarray, vit_params), CFG.depth).items()}
    path = str(tmp_path / "export.pth")
    torch.save({"state_dict": sd, "epoch": 11}, path)
    info = summarize_artifact(path)
    assert info["kind"] == "reference training checkpoint"
    assert info["epoch"] == 11
    assert info["geometry"]["family"] == "vit"
    assert info["geometry"]["embed_dim"] == 64
    assert info["param_count"] > 0


def test_inspect_unrecognized_npz_does_not_crash(tmp_path):
    path = str(tmp_path / "random.npz")
    np.savez(path, a=np.zeros((3, 4)), b=np.ones(5))
    info = summarize_artifact(path)
    assert info["format"] == "npz"
    assert info["kind"] == "npz archive (unrecognized layout)"
    assert set(info["keys"]) == {"a", "b"}
    assert info["param_count"] == 17


def test_inspect_cli_json(tmp_path, vit_params, capsys):
    p1 = str(tmp_path / "a.msgpack")
    save_pytree(p1, {"params": vit_params, "epoch": np.int32(0)})

    class A:
        paths = [p1]
        json = True

    assert inspect_main(A()) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["kind"] == "stage checkpoint"
    assert out["geometry"]["embed_dim"] == 64

    class B:
        paths = [p1, p1]
        json = False

    assert inspect_main(B()) == 0
    human = capsys.readouterr().out
    assert "geometry: family=vit" in human and human.count("format:") == 2

    class C:
        paths = [str(tmp_path / "missing.msgpack")]
        json = False

    with pytest.raises(FileNotFoundError):
        inspect_main(C())
