"""Shared CLI plumbing: argparse groups mirroring the reference's ~80 flags
(train_subdata.py:36-190 et al., kept name-compatible), dataset/model
builders, and jitted preprocessing helpers."""

from __future__ import annotations

import argparse
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from devit_tpu.configs import get_vit_config
from devit_tpu.data.datasets import ArrayDataset, BatchIterator, build_dataset
from devit_tpu.data.mixup import MixupConfig
from devit_tpu.data.pipeline import (
    AugmentConfig, eval_transform, finish_transform, train_transform,
)
from devit_tpu.data.splitter import DivisionManifest
from devit_tpu.io.checkpoint import (
    load_torch_state_dict, resize_pos_embed, restore_pytree, save_pytree,
    torch_vit_to_params,
)
from devit_tpu.models.vit import VisionTransformer
from devit_tpu.train.meters import create_logger
from devit_tpu.train.optim import OptimConfig


def add_model_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--model", default="deit_base_distilled_patch16_224", type=str)
    p.add_argument("--model-path", type=str, default=None,
                   help="pretrained checkpoint (.pth or .msgpack)")
    p.add_argument("--input-size", default=224, type=int)
    p.add_argument("--patch-size", default=16, type=int)
    p.add_argument("--drop", type=float, default=0.0)
    p.add_argument("--drop-path", type=float, default=0.1)
    p.add_argument("--model-ema", action="store_true", default=True)
    p.add_argument("--no-model-ema", action="store_false", dest="model_ema")
    p.add_argument("--model-ema-decay", type=float, default=0.99996)
    # geometry overrides (None = registry defaults) — used by smoke tests
    p.add_argument("--embed-dim", type=int, default=None)
    p.add_argument("--depth", type=int, default=None)
    p.add_argument("--num-heads", type=int, default=None)
    p.add_argument("--use-pallas", dest="use_pallas", action="store_true", default=None)
    p.add_argument("--no-pallas", dest="use_pallas", action="store_false")
    p.add_argument("--dtype", choices=["bfloat16", "float32"], default="bfloat16",
                   help="compute dtype for models and the data pipeline. "
                        "bfloat16 is the TPU production setting (the bf16 "
                        "analogue of the reference's AMP policy); float32 "
                        "for numerics verification / CPU parity runs")


def add_optim_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--batch-size", default=64, type=int)
    p.add_argument("--eval-batch-size", default=512, type=int)  # reference default
    p.add_argument("--epochs", default=5, type=int)
    p.add_argument("--opt", default="adamw", type=str,
                   help="adamw|adam|sgd|nesterov|momentum (timm create_optimizer "
                        "names, train_subdata.py:61; others rejected loudly)")
    p.add_argument("--opt-betas", default=None, type=float, nargs="+",
                   help="optimizer betas override (reference default: None)")
    p.add_argument("--momentum", type=float, default=0.9,
                   help="SGD momentum (train_subdata.py:69)")
    p.add_argument("--opt-eps", default=1e-8, type=float)
    p.add_argument("--clip-grad", type=float, default=None)
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--warmup-lr", type=float, default=1e-6)
    p.add_argument("--min-lr", type=float, default=1e-5)
    p.add_argument("--sched", default="cosine", type=str,
                   help="cosine|step|constant (timm create_scheduler names, "
                        "train_subdata.py:74; others rejected loudly)")
    p.add_argument("--decay-epochs", type=float, default=30,
                   help="epoch interval for --sched step (train_subdata.py:89)")
    p.add_argument("--decay-rate", "--dr", type=float, default=0.1, dest="decay_rate",
                   help="LR decay rate for --sched step (train_subdata.py:98)")
    p.add_argument("--lr-noise", type=float, nargs="+", default=None,
                   help="LR noise on/off epoch percentages (timm; requires "
                        "--sched-per-epoch, where it is bit-exact)")
    p.add_argument("--lr-noise-pct", type=float, default=0.67)
    p.add_argument("--lr-noise-std", type=float, default=1.0,
                   help="accepted-and-inert, exactly as in timm-0.5.4 "
                        "(its _add_noise never uses noise_std)")
    p.add_argument("--warmup-epochs", type=int, default=5)
    p.add_argument("--cooldown-epochs", type=int, default=10)
    p.add_argument("--scale-lr", action="store_true", default=True,
                   help="linear scale lr by global_batch/512 (train_subdata.py:405)")
    p.add_argument("--no-scale-lr", action="store_false", dest="scale_lr")
    p.add_argument("--sched-per-epoch", action="store_true",
                   help="bit-parity LR mode: the reference's per-epoch timm "
                        "staircase incl. its one-epoch step(epoch) lag "
                        "(train_subdata.py:449) instead of the smooth "
                        "per-step cosine")


def add_aug_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--color-jitter", type=float, default=0.4)
    p.add_argument("--aa", type=str, default="rand-m9-mstd0.5-inc1")
    p.add_argument("--no-aug", action="store_true")
    p.add_argument("--train-interpolation", type=str, default="bicubic",
                   choices=["bicubic", "bilinear", "random"],
                   help="RRC resample filter (train_subdata.py:107)")
    p.add_argument("--smoothing", type=float, default=0.1)
    p.add_argument("--repeated-aug", action="store_true", default=True)
    p.add_argument("--no-repeated-aug", action="store_false", dest="repeated_aug")
    p.add_argument("--reprob", type=float, default=0.25)
    p.add_argument("--remode", type=str, default="pixel",
                   choices=["pixel", "rand", "const"],
                   help="random-erasing fill (train_subdata.py:117)")
    p.add_argument("--recount", type=int, default=1,
                   help="random-erasing max box count (train_subdata.py:119)")
    p.add_argument("--aug-backend", choices=["auto", "host", "device"],
                   default="auto",
                   help="where train augmentation runs: host = PIL in the "
                        "prefetch workers (reference CPU-worker split; auto "
                        "picks this for RandAugment training), device = the "
                        "pure-JAX pipeline compiled into the step")
    p.add_argument("--mixup", type=float, default=0.8)
    p.add_argument("--cutmix", type=float, default=1.0)
    p.add_argument("--cutmix-minmax", type=float, nargs="+", default=None,
                   help="cutmix min/max box-side ratio; overrides the Beta "
                        "box and forces cutmix on (timm, train_subdata.py:129)")
    p.add_argument("--mixup-prob", type=float, default=1.0)
    p.add_argument("--mixup-switch-prob", type=float, default=0.5)
    p.add_argument("--mixup-mode", choices=["batch", "pair", "elem"],
                   default="batch", help="timm Mixup mode (train_subdata.py:135)")


def add_distill_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--teacher-model", default="deit_base_distilled_patch16_224", type=str)
    p.add_argument("--teacher-path", type=str, default=None)
    p.add_argument("--distillation-type", default="none", choices=["none", "soft", "hard"])
    p.add_argument("--distillation-token", action="store_true")
    p.add_argument("--distillation-alpha", default=0.5, type=float)
    p.add_argument("--distillation-tau", default=1.0, type=float)


def add_data_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--data-path", default="./datasets", type=str)
    p.add_argument("--dataset", "--data-set", dest="dataset",
                   default="cifar100", type=str,
                   help="cifar100|cifar10|IMNET|INAT|INAT19|flowers|cars|pets|"
                        "synthetic[:K[:N[:S]]] (--data-set accepted for "
                        "reference flag-name compatibility)")
    p.add_argument("--inat-category", default="name",
                   choices=["kingdom", "phylum", "class", "order",
                            "supercategory", "family", "genus", "name"],
                   help="iNaturalist taxonomic label rank (train_subdata.py:162)")
    p.add_argument("--num_division", default=4, type=int)
    p.add_argument("--start-division", default=0, type=int)
    p.add_argument("--manifest", type=str, default=None,
                   help="manifest.json from the split stage")
    p.add_argument("--output_dir", default="./output", type=str)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--resume", default="", type=str)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--profile-dir", type=str, default=None,
                   help="write a jax.profiler trace of the first trained epoch")
    p.add_argument("--tensorboard", action="store_true",
                   help="also write TensorBoard scalars to output_dir "
                        "(reference tags Train/*, Test/Top1|Top5|loss, "
                        "train_subdata.py:437-472); the JSONL artifacts are "
                        "always written")
    p.add_argument("--ckpt-format", choices=["msgpack", "orbax"], default="msgpack",
                   help="orbax = async directory checkpoints (training "
                        "continues while the write flushes); --resume and "
                        "--model-path auto-detect either format")


def parse_ra_string(
    aa: Optional[str],
) -> Tuple[bool, int, float, int, bool, bool]:
    """'rand-m9-n2-mstd0.5-inc1[-w0]' ->
    (enabled, magnitude, mag_std, num_ops, inc, weighted).

    The full timm-0.5.4 RA recipe grammar: m/n/mstd/inc plus the w0
    op-choice weights (_RAND_CHOICE_WEIGHTS_0); recipes WITHOUT inc1 select
    the non-increasing transform set (different posterize/solarize/enhance
    level maps — both RA backends implement both sets). Rejected loudly
    rather than silently ignored: wN for N!=0 (timm-0.5.4
    _select_rand_weights asserts weight_idx == 0), w0 together with inc1
    (timm-0.5.4 KeyErrors — _RAND_CHOICE_WEIGHTS_0 lacks the *Increasing
    names), and timm>=0.6-only components (mmaxN, pP)."""
    if not aa or not aa.startswith("rand"):
        return False, 9, 0.5, 2, True, False
    mag, std, num_ops, inc, weighted = 9, 0.5, 2, False, False
    for part in aa.split("-")[1:]:
        if part.startswith("mstd"):
            std = float(part[4:])
        elif part.startswith("mmax") or part.startswith("p"):
            raise ValueError(
                f"--aa component {part!r} is timm>=0.6 only (the pinned "
                "0.5.4 grammar has no mmax/p); remove it from the recipe")
        elif part.startswith("w"):
            if part != "w0":
                raise ValueError(
                    f"--aa component {part!r}: timm-0.5.4 has exactly one "
                    "weight set (_select_rand_weights asserts weight_idx=="
                    "0) — use w0")
            weighted = True
        elif part.startswith("m") and part[1:].isdigit():
            mag = int(part[1:])
        elif part.startswith("n") and part[1:].isdigit():
            num_ops = int(part[1:])
        elif part.startswith("inc"):
            inc = bool(int(part[3:]))
        elif part:
            raise ValueError(f"unrecognized --aa component {part!r}")
    if weighted and inc:
        raise ValueError(
            f"--aa {aa!r}: w0 together with inc1 crashes timm-0.5.4 "
            "(_RAND_CHOICE_WEIGHTS_0 has no *Increasing keys) — drop one")
    return True, mag, std, num_ops, inc, weighted


def dtype_from_args(args):
    import jax.numpy as _jnp

    return {"bfloat16": _jnp.bfloat16, "float32": _jnp.float32}[
        getattr(args, "dtype", "bfloat16")]


def augment_config_from_args(args, img_size: int, source_size: int) -> AugmentConfig:
    aa = getattr(args, "aa", None)
    ra, mag, std, num_ops, ra_inc, ra_weighted = parse_ra_string(aa)
    # '--aa original' / '--aa cifar10': the AutoAugment policies the reference
    # tree itself carries (utils/autoaug.py; its entry scripts advertise the
    # flag, train_subdata.py:103-105) — see data/autoaugment.py
    autoaug = aa if aa in ("original", "cifar10") else None
    if aa and not ra and autoaug is None:
        raise ValueError(
            f"unrecognized --aa {aa!r}: expected a 'rand-*' RandAugment "
            "recipe, 'original'/'cifar10' (the AutoAugment policies in the "
            "reference's utils/autoaug.py), or '' to disable")
    reprob = args.reprob
    no_aug = bool(getattr(args, "no_aug", False))
    if no_aug:
        # reference no_aug (get_dataset.py:74-78 -> timm create_transform
        # transforms_noaug_train): deterministic resize+center-crop+normalize,
        # auto-augment AND random erasing off
        ra = False
        autoaug = None
        reprob = 0.0
    return AugmentConfig(
        img_size=img_size,
        no_aug=no_aug,
        color_jitter=args.color_jitter,
        reprob=reprob,
        re_mode=getattr(args, "remode", "pixel"),
        re_count=getattr(args, "recount", 1),
        interpolation=getattr(args, "train_interpolation", "bicubic"),
        randaugment=ra,
        ra_magnitude=mag,
        ra_std=std,
        ra_num_ops=num_ops,
        ra_inc=ra_inc,
        ra_weighted=ra_weighted,
        autoaugment=autoaug,
        small_image=img_size == source_size and source_size <= 64,
    )


def mixup_config_from_args(args, num_classes: int) -> Optional[MixupConfig]:
    minmax = getattr(args, "cutmix_minmax", None)
    if minmax is not None and len(minmax) != 2:
        raise ValueError("--cutmix-minmax takes exactly two floats (timm asserts len==2)")
    # reference activation test: mixup > 0 or cutmix > 0 or cutmix_minmax
    # is not None (train_subdata.py:379)
    if args.mixup <= 0 and args.cutmix <= 0 and minmax is None:
        return None
    return MixupConfig(
        mixup_alpha=args.mixup, cutmix_alpha=args.cutmix,
        cutmix_minmax=tuple(minmax) if minmax is not None else None,
        prob=args.mixup_prob, switch_prob=args.mixup_switch_prob,
        mode=getattr(args, "mixup_mode", "batch"),
        label_smoothing=args.smoothing, num_classes=num_classes,
    )


def optim_config_from_args(args, global_batch: int) -> OptimConfig:
    betas = getattr(args, "opt_betas", None)
    if betas is not None and len(betas) != 2:
        raise ValueError(f"--opt-betas expects two values, got {betas}")
    cfg = OptimConfig(
        lr=args.lr, min_lr=args.min_lr, warmup_lr=args.warmup_lr,
        warmup_epochs=args.warmup_epochs, cooldown_epochs=args.cooldown_epochs,
        epochs=args.epochs, weight_decay=args.weight_decay, opt_eps=args.opt_eps,
        clip_grad=args.clip_grad, scale_lr_by_batch=args.scale_lr,
        global_batch=global_batch,
        sched_per_epoch=getattr(args, "sched_per_epoch", False),
        opt=getattr(args, "opt", "adamw"),
        momentum=getattr(args, "momentum", 0.9),
        sched=getattr(args, "sched", "cosine"),
        decay_epochs=getattr(args, "decay_epochs", 30.0),
        decay_rate=getattr(args, "decay_rate", 0.1),
        lr_noise=(tuple(args.lr_noise)
                  if getattr(args, "lr_noise", None) else None),
        lr_noise_pct=getattr(args, "lr_noise_pct", 0.67),
        lr_noise_std=getattr(args, "lr_noise_std", 1.0),
        seed=getattr(args, "seed", 42),
    )
    if betas is not None:
        cfg.beta1, cfg.beta2 = float(betas[0]), float(betas[1])
    return cfg


def build_division_data(args) -> Tuple[ArrayDataset, ArrayDataset, DivisionManifest]:
    """Full train/val sets + manifest; callers take division views."""
    cat = getattr(args, "inat_category", "name")
    train_ds = build_dataset(args.dataset, args.data_path, train=True,
                             img_size=args.input_size, inat_category=cat)
    val_ds = build_dataset(args.dataset, args.data_path, train=False,
                           img_size=args.input_size, inat_category=cat)
    if args.manifest:
        if not os.path.exists(args.manifest):
            # a typo'd path must not silently train on a regenerated split
            raise FileNotFoundError(f"--manifest {args.manifest} does not exist")
        manifest = DivisionManifest.load(args.manifest)
    else:
        manifest = DivisionManifest.create(train_ds.num_classes, args.num_division, seed=42)
    return train_ds, val_ds, manifest


def is_cct(name: str) -> bool:
    return name.startswith("cct") or name.startswith("decct")


def model_seq_length(cfg) -> int:
    """True token-sequence length of a model config, for the analytic
    MACs/params budget: CCT derives it from the tokenizer geometry
    (CCTConfig.sequence_length), ViT/DeiT from patches + prefix tokens."""
    if hasattr(cfg, "sequence_length"):
        return int(cfg.sequence_length())
    return int(cfg.seq_len)


def build_backbone(name: str, num_classes: int, args, resize_dim=None):
    """Family-dispatching model factory (ViT/DeiT vs CCT)."""
    if is_cct(name):
        from devit_tpu.models.cct import create_cct

        overrides = dict(
            img_size=args.input_size,
            num_classes=num_classes,
            dropout=args.drop,
            stochastic_depth=args.drop_path,
            resize_dim=resize_dim,
            dtype=dtype_from_args(args),
        )
        for flag, key in (("embed_dim", "embed_dim"), ("depth", "num_layers"),
                          ("num_heads", "num_heads")):
            v = getattr(args, flag, None)
            if v is not None:
                overrides[key] = v
        return create_cct(name, **overrides)
    return build_model(name, num_classes, args, resize_dim=resize_dim)


def build_model(name: str, num_classes: int, args, resize_dim=None) -> VisionTransformer:
    overrides = dict(
        img_size=args.input_size,
        patch_size=getattr(args, "patch_size", 16),
        num_classes=num_classes,
        drop_rate=args.drop,
        drop_path_rate=args.drop_path,
        resize_dim=resize_dim,
    )
    for flag, key in (("embed_dim", "embed_dim"), ("depth", "depth"), ("num_heads", "num_heads")):
        v = getattr(args, flag, None)
        if v is not None:
            overrides[key] = v
    # Pallas fused attention by default on real TPUs (1.6x train step, 1.56x
    # eval forward); interpret-mode would slow CPU tests, so gate on backend.
    use_pallas = getattr(args, "use_pallas", None)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    return VisionTransformer(get_vit_config(name, **overrides),
                             dtype=dtype_from_args(args), use_pallas=use_pallas)


def load_params_for(model: VisionTransformer, path: str, template_params):
    """Load .pth (torch) or .msgpack checkpoints into the model's param tree,
    with head-shape filtering + pos-embed interpolation on mismatch
    (shrink.py:298-332 behaviour)."""
    if path.endswith(".pth") or path.endswith(".pt"):
        cfg = model.cfg
        sd = load_torch_state_dict(path)
        if hasattr(cfg, "num_layers"):  # CCT family (configs.CCTConfig)
            from devit_tpu.io.checkpoint import torch_cct_to_params

            params = torch_cct_to_params(sd, num_layers=cfg.num_layers,
                                         n_conv_layers=cfg.n_conv_layers)
        else:
            params = torch_vit_to_params(sd, depth=cfg.depth)
    else:
        restored = restore_pytree(path, None)
        params = restored.get("params", restored) if isinstance(restored, dict) else restored
    return merge_params_into(model, params, template_params)


# Fresh-classifier roots that are EXPECTED to keep their init when loading a
# pretrained backbone (reference shrink.py:298-332 filters exactly the head
# keys). Everything else keeping init is a geometry mismatch.
_HEAD_PARAM_ROOTS = ("head", "head_dist", "fc")


def _is_head_root(root: str) -> bool:
    # the ViT resize heads are resize_mlp / resize_att_mlp /
    # resize_encoder_mlp (models/vit.py) — a stage-2 checkpoint legitimately
    # lacks all three when stage 4 builds the student with resize_dim set
    return root in _HEAD_PARAM_ROOTS or root.startswith("resize")


def _n_params(v) -> int:
    # v may be a whole missing SUBTREE (dict), not just a leaf — count leaves
    return sum(int(np.size(l)) for l in jax.tree_util.tree_leaves(v))


def merge_params_into(model: VisionTransformer, params, template_params,
                      log=None, max_init_fraction: float = 0.25):
    """By-name merge of an already-loaded param tree into the model's
    template (load_params_for's tail, exposed for callers that restored the
    checkpoint themselves — e.g. the ensemble stage reads params AND gates
    from one restore instead of deserializing each checkpoint twice).

    Mismatch handling (loud, unlike the silent round-3 version):
      * ViT `pos_embed` -> bicubic grid resize (de_vit.py:452-473);
        CCT `positional_emb` -> bilinear resize (helpers.py:26-32 pe_check,
        num_tokens=0 under seq-pool).
      * every other missing/shape-mismatched key keeps its init and is
        LOGGED (the reference's shrink.py at least prints dropped keys);
      * if the kept-init fraction of NON-head parameters exceeds
        `max_init_fraction`, raise — a wrong-geometry checkpoint must not
        train from random weights silently.
    """
    cfg = model.cfg
    is_cct = hasattr(cfg, "num_layers")  # CCTConfig
    if log is None:
        import logging

        log = logging.getLogger("devit_tpu")
    kept_init = []  # (path, reason, n_params)

    def resize_pe(nv, tpl_shape):
        if is_cct:
            from devit_tpu.io.checkpoint import resize_cct_pos_embed

            return resize_cct_pos_embed(nv, tpl_shape[1],
                                        0 if cfg.seq_pool else 1)
        return resize_pos_embed(nv, cfg.seq_len, cfg.num_prefix_tokens)

    def merge(tpl, new, path):
        out = {}
        for k, v in tpl.items():
            p = f"{path}/{k}" if path else str(k)
            if not isinstance(new, dict) or k not in new:
                # `new` not a dict: the checkpoint has a LEAF where the model
                # has a subtree (foreign layout) — treat the whole subtree as
                # missing rather than letting numpy's elementwise `in` run
                out[k] = v  # missing (e.g. fresh head) -> keep init
                kept_init.append((p, "missing from checkpoint", _n_params(v)))
            elif isinstance(v, dict):
                if not isinstance(new[k], dict):
                    out[k] = v
                    kept_init.append((p, "checkpoint has a leaf where the "
                                         "model has a subtree", _n_params(v)))
                else:
                    out[k] = merge(v, new[k], p)
            else:
                nv = np.asarray(new[k])
                if nv.shape != v.shape:
                    rv = None
                    if k in ("pos_embed", "positional_emb"):
                        try:
                            rv = np.asarray(resize_pe(nv, v.shape))
                        except ValueError:
                            rv = None  # non-square grid etc. -> keep init
                        # prefix-token mismatches can slip past the grid-size
                        # check (e.g. 197 vs 196 truncate to the same
                        # int(sqrt)); never insert a wrong-shaped array
                        if rv is not None and rv.shape != tuple(v.shape):
                            rv = None
                    if rv is not None:
                        out[k] = jnp.asarray(rv)
                        log.info("checkpoint load: resized %s %s -> %s",
                                 p, nv.shape, v.shape)
                    else:
                        out[k] = v  # shape mismatch (e.g. head) -> keep init
                        kept_init.append(
                            (p, f"shape {nv.shape} != model {v.shape}",
                             int(np.size(v))))
                else:
                    out[k] = jnp.asarray(nv)
        return out

    merged = merge(template_params, params, "")
    if kept_init:
        for p, reason, _ in kept_init:
            log.info("checkpoint load: kept init for %s (%s)", p, reason)
        non_head = [e for e in kept_init
                    if not _is_head_root(e[0].split("/", 1)[0])]
        non_head_total = sum(
            int(np.size(leaf))
            for k, sub in template_params.items() if not _is_head_root(str(k))
            for leaf in jax.tree_util.tree_leaves(sub))
        frac = sum(s for _, _, s in non_head) / max(1, non_head_total)
        if frac > max_init_fraction:
            offenders = ", ".join(p for p, _, _ in non_head[:6])
            raise ValueError(
                f"checkpoint/model geometry mismatch: {frac:.0%} of non-head "
                f"parameters would keep their random init (first offenders: "
                f"{offenders}). Refusing to train from effectively random "
                f"weights — check --model geometry vs the checkpoint.")
    return merged


def make_saver(args):
    """Stage checkpoint writer honoring --ckpt-format. For orbax the
    '.msgpack' suffix becomes '.orbax' (a checkpoint directory); saves are
    async — fit() waits for durability at the end of training."""
    from devit_tpu.runtime import is_main_process

    if getattr(args, "ckpt_format", "msgpack") == "orbax":
        from devit_tpu.io.checkpoint import save_pytree_orbax

        # NOT gated on the main process: orbax distributed save is a
        # collective (every process persists its addressable shards) — the
        # multihost-correct format for cross-process-sharded trees
        def save(path, tree):
            if path.endswith(".msgpack"):
                path = path[: -len(".msgpack")] + ".orbax"
            save_pytree_orbax(path, tree)

        return save
    if not is_main_process():
        # reference save_on_master (dist_utils.py:210-212): non-main hosts
        # skip the msgpack write — replicated state means process 0's copy is
        # the whole checkpoint (cross-process-SHARDED trees need --ckpt-format
        # orbax; jax.device_get of non-addressable shards fails loudly)
        return lambda path, tree: None
    return save_pytree


def make_eval_prepare(img_size: int, dtype=jnp.bfloat16):
    fn = jax.jit(lambda x: eval_transform(x, img_size=img_size, dtype=dtype))
    return lambda images: fn(jnp.asarray(images))


def train_steps_per_epoch(train_ds, args) -> int:
    """Steps the train BatchIterator will actually yield per epoch (repeated
    augmentation truncates the epoch — the schedule must match). A division
    smaller than the batch size would silently train ZERO steps per epoch
    under drop_last; fail loudly instead."""
    n = len(BatchIterator(train_ds, args.batch_size, shuffle=True,
                          repeated_aug=3 if args.repeated_aug else 0))
    if n == 0:
        raise ValueError(
            f"division has {len(train_ds)} samples — fewer than one "
            f"drop_last batch of {args.batch_size}; lower --batch-size")
    return n


def make_train_prepare(aug_cfg: AugmentConfig, dtype=jnp.bfloat16):
    fn = jax.jit(lambda r, x: train_transform(r, x, aug_cfg, dtype=dtype))
    return lambda rng, images: fn(rng, jnp.asarray(images))


def make_train_pipeline(args, aug_cfg: AugmentConfig, dtype=jnp.bfloat16):
    """(prep_fn, host_transform) — pick where train augmentation runs.

    auto: RandAugment and AutoAugment training use the HOST PIL pipeline in the prefetch
    workers (data/host_augment.py — the reference's own CPU-worker split;
    measured on v5e bs256 224^2 the device pipeline's geometric RA ops cost
    ~21 s/batch because per-sample warp grids become unshared-index gathers
    under the vmapped op switch, vs 30 ms for the intensity ops), with the
    device doing normalize + random-erasing (finish_transform). Non-RA and
    small-image training keeps the cheap all-device path."""
    backend = getattr(args, "aug_backend", "auto")
    if aug_cfg.no_aug:
        # deterministic no-aug path is device-only (normalize + resize);
        # the host PIL pipeline applies RRC/hflip unconditionally and would
        # silently re-randomize a run the user asked to be deterministic
        return make_train_prepare(aug_cfg, dtype=dtype), None
    use_host = backend == "host" or (backend == "auto" and (
        aug_cfg.autoaugment is not None
        or (aug_cfg.randaugment and not aug_cfg.small_image)))
    if backend == "device" and aug_cfg.autoaugment is not None:
        raise ValueError(
            "--aa original/cifar10 (AutoAugment) is host-PIL only: its "
            "geometric ops are the ones measured unusable on-device "
            "(data/host_augment.py docstring); drop --aug-backend device")
    if (backend == "host" and not aug_cfg.randaugment
            and aug_cfg.autoaugment is None and aug_cfg.color_jitter > 0):
        raise ValueError(
            "--aug-backend host implements the RandAugment/AutoAugment "
            "policies only; color-jitter training (--aa '') uses the device "
            "pipeline (auto does)")
    if use_host:
        from devit_tpu.data.host_augment import make_host_train_augment

        host_tf = make_host_train_augment(aug_cfg, seed=args.seed)
        fn = jax.jit(lambda r, x: finish_transform(r, x, aug_cfg, dtype=dtype))
        return (lambda rng, images: fn(rng, jnp.asarray(images))), host_tf
    return make_train_prepare(aug_cfg, dtype=dtype), None


def setup(args):
    from devit_tpu.runtime import setup_runtime

    setup_runtime()
    os.makedirs(args.output_dir, exist_ok=True)
    log = create_logger(args.output_dir)
    # record the full flag set (the reference pickles args into
    # training_args.bin, train_subdata.py:481; json here)
    import json

    try:
        with open(os.path.join(args.output_dir, "training_args.json"), "w") as f:
            json.dump({k: v for k, v in vars(args).items() if k != "fn"},
                      f, indent=1, default=str)
    except Exception:
        pass
    return log


def data_parallel_context(log=None):
    """The DDP replacement wired into the product stages (the reference trains
    every stage under 8-GPU DDP, train_subdata.py:399-401 + README.md:50).

    Returns (place_batch, place_replicated, mesh). With one device both
    placers are identity and mesh is None. With N devices, batches shard
    over a ('data',) mesh, state/teacher replicate, and XLA SPMD inserts the
    gradient all-reduce over ICI (dist_utils.py:215-237 equivalent).

    place_batch falls back to replication for a leading dim not divisible by
    the device count (e.g. the last drop_last=False eval batch) — replicated
    inputs compute the same answer, just without the speedup.
    """
    from devit_tpu.parallel import mesh as M

    n = jax.device_count()
    if n <= 1:
        ident = lambda tree: tree
        return ident, ident, None
    mesh = M.data_mesh()
    if log is not None:
        log.info(f"data-parallel: batches sharded over {n} devices")

    return (_make_place_batch(mesh, n, log),
            (lambda tree: M.replicate_tree(tree, mesh)), mesh)


def _make_place_batch(mesh, data_n: int, log):
    """Batch placer: shard the leading dim over 'data'; a non-divisible batch
    replicates instead (correct, no speedup). Intended for the drop_last=False
    eval tail — a non-divisible TRAINING batch size would silently lose all
    data parallelism, so the fallback warns once."""
    from devit_tpu.parallel import mesh as M

    warned = []

    def place_batch(tree):
        def put(x):
            leading = getattr(x, "shape", ())[:1]
            if leading and leading[0] % data_n == 0:
                sh = M.batch_sharding(mesh)
            else:
                sh = M.replicated(mesh)
                if not warned and log is not None:
                    warned.append(True)
                    log.info(f"WARNING: batch dim {leading} not divisible by "
                             f"{data_n} devices — replicating (no data-parallel "
                             "speedup for such batches)")
            # device_put places host numpy straight into each shard (no
            # intermediate full copy on the default device)
            return jax.device_put(x, sh)

        return jax.tree_util.tree_map(put, tree)

    return place_batch


def ensemble_parallel_context(num_divisions: int, log=None):
    """('div','data') mesh for stage 5: division-stacked params/gates shard
    over 'div' (each sub-model on a sub-mesh), the batch shards over 'data',
    the EnsMLP token fusion becomes an all-gather over ICI (SURVEY.md §2.7
    "TPU mapping"). Returns (place_batch, place_replicated, place_division,
    mesh); identities + None on a single device."""
    from devit_tpu.parallel import mesh as M

    n = jax.device_count()
    if n <= 1:
        ident = lambda tree: tree
        return ident, ident, ident, None
    mesh = M.ensemble_mesh(num_divisions)
    data_n = mesh.shape[M.DATA_AXIS]
    if log is not None:
        log.info(f"ensemble mesh over {n} devices: {dict(mesh.shape)}")

    return (
        _make_place_batch(mesh, data_n, log),
        (lambda tree: M.replicate_tree(tree, mesh)),
        (lambda tree: M.shard_division_tree(tree, mesh, num_divisions)),
        mesh,
    )


def first_train_batch(train_ds, batch_size: int, seed: int = 0):
    """One drop_last batch for the single-batch HSIC ranking (imp_rank.py
    ranks on exactly one loader batch). A division smaller than the batch
    would otherwise surface as a bare StopIteration from next(iter(...))."""
    for batch in BatchIterator(train_ds, batch_size, shuffle=True, seed=seed,
                               prefetch=0):
        return batch
    raise ValueError(
        f"division has {len(train_ds)} samples — fewer than one drop_last "
        f"ranking batch of {batch_size}; lower --batch-size")
