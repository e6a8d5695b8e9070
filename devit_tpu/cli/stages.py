"""The five pipeline stages as CLI subcommands.

Mirrors the reference entry scripts: splite_dataset.py (split),
train_subdata.py (train_sub), shrink.py (shrink), distill_sub.py (distill),
ensemble.py (ensemble) — same flag names, same artifacts
(shrinked_policy.npy/shrinked_accuracy.npy, checkpoint + best checkpoint,
result.txt, log_stats.txt), TPU-native execution.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from devit_tpu.cli import common as C
from devit_tpu.core.rank import attn_head_rank, build_gates, mlp_neuron_rank
from devit_tpu.core.shrink import model_shrink
from devit_tpu.data.datasets import BatchIterator, build_dataset
from devit_tpu.data.splitter import DivisionManifest
from devit_tpu.io.checkpoint import restore_pytree
from devit_tpu.models.ensemble import (
    EnsMLP, init_multivit, stack_division_gates, stack_division_params,
)
from devit_tpu.models.vit import Gates, full_gates
from devit_tpu.train import steps as S
from devit_tpu.train.loop import fit, run_eval
from devit_tpu.train.optim import make_optimizer
from devit_tpu.train.state import TrainState




def _try_resume(args, state, log, extra_template=None):
    """Restore {params, ema, opt_state, epoch} from --resume (the
    checkpoint_temp.msgpack written every epoch — train_subdata.py:450-459
    semantics). Returns (state, start_epoch).

    extra_template: template entries for any EXTRA keys the stage's
    save_state writes (e.g. distill's gates) — the orbax restorer rejects a
    template whose structure doesn't match the checkpoint (msgpack merely
    drops unknown keys)."""
    if not args.resume:
        return state, 0
    tpl = {"params": state.params, "ema_params": state.ema_params,
           "opt_state": state.opt_state, "epoch": np.int32(0),
           **(extra_template or {})}
    ckpt = restore_pytree(args.resume, tpl)
    state = state.replace(
        params=ckpt["params"],
        ema_params=ckpt.get("ema_params", state.ema_params),
        opt_state=ckpt.get("opt_state", state.opt_state),
        step=state.step,
    )
    start_epoch = int(ckpt.get("epoch", -1)) + 1
    log.info(f"resumed from {args.resume} at epoch {start_epoch}")
    return state, start_epoch


def _ensemble_ckpt_tree(bb_state, ens_state, epoch: int, gates=None):
    """Resumable stage-5 state: both param sets, both optimizer states, and
    both EMA trees (the reference saves optimizer+ens_optimizer+epoch and
    maintains ModelEma on both models, ensemble.py:315-327, 390-402). The
    division-stacked shrink gates are persisted too (when the backbones are
    gated) so `deploy --ensemble-path` can compact the ENSEMBLE-trained
    backbones — the weights that actually serve — without consulting the
    distill checkpoints."""
    tree = {"backbone_params": bb_state.params, "ens_params": ens_state.params,
            "bb_opt_state": bb_state.opt_state, "ens_opt_state": ens_state.opt_state,
            "bb_ema": bb_state.ema_params, "ens_ema": ens_state.ema_params,
            "epoch": np.int32(epoch)}
    if gates is not None:
        tree["gates"] = {"head": np.asarray(jax.device_get(gates.head)),
                         "neuron": np.asarray(jax.device_get(gates.neuron))}
    return tree


def _try_resume_ensemble(args, bb_state, ens_state, log, gates=None):
    """Restore both optimizers + epoch from --resume (ensemble.py:390-402).
    Old/weights-only checkpoints (params + epoch, no opt states) still resume
    the params. Returns (bb_state, ens_state, start_epoch)."""
    if not getattr(args, "resume", None):
        return bb_state, ens_state, 0
    try:
        # try the gate-carrying template first, then the gate-less one: a
        # checkpoint written before gates were persisted (or a gated ckpt
        # resumed into an ungated run) must still restore optimizer states
        # + EMA, not silently degrade to params-only
        templates = [_ensemble_ckpt_tree(bb_state, ens_state, 0, gates)]
        if gates is not None:
            templates.append(_ensemble_ckpt_tree(bb_state, ens_state, 0, None))
        ckpt = None
        for i, tpl in enumerate(templates):
            try:
                ckpt = restore_pytree(args.resume, tpl)
                break
            except Exception:
                if i == len(templates) - 1:
                    raise
        bb_state = bb_state.replace(params=ckpt["backbone_params"],
                                    opt_state=ckpt["bb_opt_state"],
                                    ema_params=ckpt.get("bb_ema", bb_state.ema_params))
        ens_state = ens_state.replace(params=ckpt["ens_params"],
                                      opt_state=ckpt["ens_opt_state"],
                                      ema_params=ckpt.get("ens_ema", ens_state.ema_params))
        log.info(f"resumed ensemble (params, optimizer states, EMA) from {args.resume}")
    except Exception as e:
        raw = restore_pytree(args.resume, None)
        if "backbone_params" not in raw or "ens_params" not in raw:
            raise RuntimeError(
                f"{args.resume} is not an ensemble checkpoint "
                f"(keys: {sorted(raw) if isinstance(raw, dict) else type(raw)})"
            ) from e
        bb_state = bb_state.replace(params=jax.tree_util.tree_map(
            lambda t, n: jnp.asarray(n), bb_state.params, raw["backbone_params"]))
        ens_state = ens_state.replace(params=jax.tree_util.tree_map(
            lambda t, n: jnp.asarray(n), ens_state.params, raw["ens_params"]))
        ckpt = raw
        log.info(f"WARNING: resumed PARAMS ONLY from {args.resume} — optimizer "
                 f"states could not be restored ({type(e).__name__}: {e}); "
                 "Adam moments and schedule restart from zero")
    start_epoch = int(np.asarray(ckpt.get("epoch", -1))) + 1
    log.info(f"resuming ensemble at epoch {start_epoch}")
    return bb_state, ens_state, start_epoch


# ------------------------------------------------------------------ split


def split_main(args) -> str:
    """Stage 1: build + save the division manifest (splite_dataset.py:29-176,
    manifest instead of file copies)."""
    log = C.setup(args)
    from devit_tpu.data.datasets import DATASET_NUM_CLASSES

    if args.dataset.startswith("synthetic"):
        num_classes = int(args.dataset.split(":")[1]) if ":" in args.dataset else 100
    else:
        num_classes = DATASET_NUM_CLASSES.get(args.dataset)
        if num_classes is None:
            # INAT/INAT19: the class count is data-dependent but lives in
            # categories.json — read that alone; a full build_dataset here
            # would decode the ~437k-image split (hours) for one integer
            from devit_tpu.data.fine_grained import inat_num_classes

            num_classes = inat_num_classes(
                args.data_path, getattr(args, "inat_category", "name"))
    manifest = DivisionManifest.create(num_classes, args.num_division, seed=42)
    out = os.path.join(args.output_dir, f"division{args.num_division}")
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "manifest.json")
    manifest.save(path)
    log.info(f"wrote {path}: {args.num_division} divisions over {num_classes} classes")
    for i, d in enumerate(manifest.divisions):
        log.info(f"  division {i}: {len(d)} classes")
    if getattr(args, "materialize", False):
        from devit_tpu.data.splitter import materialize_imagefolder

        materialize_imagefolder(
            manifest, args.data_path, out,
            link=not getattr(args, "materialize_copy", False), log=log)
    return path


# ------------------------------------------------------------------ train_sub


def train_sub_main(args) -> float:
    """Stage 2: finetune one division's sub-model (train_subdata.py:320-503)."""
    log = C.setup(args)
    train_full, val_full, manifest = C.build_division_data(args)
    div = args.start_division
    train_ds = train_full.division_view(manifest, div)
    val_ds = val_full.division_view(manifest, div)
    num_classes = train_ds.num_classes
    log.info(f"division {div}: {len(train_ds)} train / {len(val_ds)} val, {num_classes} classes")

    model = C.build_backbone(args.model, num_classes, args)
    sample = jnp.zeros((2, args.input_size, args.input_size, 3), jnp.bfloat16)
    variables = model.init(jax.random.key(args.seed), sample)
    params = variables["params"]
    if args.model_path:
        params = C.load_params_for(model, args.model_path, params)

    teacher = t_vars = None
    if args.distillation_type != "none":
        if not args.teacher_path:
            # a RANDOM-INIT teacher would silently pull half the loss toward
            # noise; the reference hard-fails on the missing checkpoint too
            # (train_subdata.py:216 torch.load)
            raise ValueError(
                f"--distillation-type {args.distillation_type} requires "
                "--teacher-path (a trained teacher checkpoint)")
        teacher = C.build_backbone(args.teacher_model, num_classes, args)
        t_tpl = teacher.init(jax.random.key(0), sample, distill_token=args.distillation_token)
        t_params = C.load_params_for(teacher, args.teacher_path, t_tpl["params"])
        t_vars = {"params": t_params}

    steps_per_epoch = C.train_steps_per_epoch(train_ds, args)
    opt_cfg = C.optim_config_from_args(args, args.batch_size)
    tx = make_optimizer(opt_cfg, steps_per_epoch)
    state = TrainState.create(params, tx, use_ema=args.model_ema, ema_decay=args.model_ema_decay)

    aug_cfg = C.augment_config_from_args(args, args.input_size, train_ds.images.shape[1])
    mix_cfg = C.mixup_config_from_args(args, num_classes)
    prep_train, host_tf = C.make_train_pipeline(args, aug_cfg, dtype=C.dtype_from_args(args))
    prep_eval = C.make_eval_prepare(args.input_size, dtype=C.dtype_from_args(args))

    raw_step = S.make_stage2_step(
        model, teacher, mixup=mix_cfg, smoothing=args.smoothing,
        distillation_type=args.distillation_type,
        distillation_alpha=args.distillation_alpha,
        distillation_tau=args.distillation_tau,
        distill_token=args.distillation_token,
    )
    jstep = jax.jit(raw_step)

    place_batch, place_rep, _dp_mesh = C.data_parallel_context(log)

    def step_fn(state, images, labels, rng):
        r_aug, r_step = jax.random.split(rng)
        x = prep_train(r_aug, place_batch(images))
        return jstep(state, t_vars, x, place_batch(labels), r_step)

    eval_step = jax.jit(S.make_eval_step(model))

    def eval_fn(state):
        # raw params, not EMA: the reference's per-epoch eval and best-ckpt
        # selection use the live model (train_subdata.py:468); the EMA is
        # saved in checkpoints but never evaluated there.
        variables = {"params": state.params}
        batches = BatchIterator(val_ds, args.eval_batch_size, shuffle=False, drop_last=False)
        return run_eval(eval_step, variables, None, batches,
                        prepare=lambda im: prep_eval(place_batch(im)))

    def save_state(path, state, epoch):
        C.make_saver(args)(path, {"params": state.params, "ema_params": state.ema_params,
                           "opt_state": state.opt_state, "epoch": np.int32(epoch)})

    state, start_epoch = _try_resume(args, state, log)
    state = place_rep(state)
    if t_vars is not None:
        t_vars = place_rep(t_vars)

    if args.eval:
        m = eval_fn(state)
        log.info(f"eval only: acc1 {m['acc1']:.2f}")
        return m["acc1"]

    def train_batches(epoch):
        it = BatchIterator(train_ds, args.batch_size, shuffle=True, seed=args.seed,
                           repeated_aug=3 if args.repeated_aug else 0,
                           host_transform=host_tf)
        it.set_epoch(epoch)
        return it

    state, best = fit(
        carry=state, step_fn=step_fn, train_batches_fn=train_batches, eval_fn=eval_fn,
        epochs=args.epochs, rng=jax.random.key(args.seed + 1),
        output_dir=args.output_dir, log_fn=log.info, save_state_fn=save_state,
        profile_dir=getattr(args, "profile_dir", None),
        tensorboard=getattr(args, "tensorboard", False),
        start_epoch=start_epoch,
    )
    log.info(f"best acc1: {best:.2f}")
    return best


# ------------------------------------------------------------------ shrink


def shrink_main(args):
    """Stage 3: HSIC rank + MACs-constrained policy search (shrink.py:203-418).
    Fixes the reference's undefined-args bugs (SURVEY.md §7) by construction."""
    log = C.setup(args)
    train_full, val_full, manifest = C.build_division_data(args)
    div = args.start_division
    train_ds = train_full.division_view(manifest, div)
    val_ds = val_full.division_view(manifest, div)
    num_classes = train_ds.num_classes

    model = C.build_backbone(args.model, num_classes, args)
    cfg = model.cfg
    sample = jnp.zeros((2, args.input_size, args.input_size, 3), jnp.bfloat16)
    params = model.init(jax.random.key(0), sample)["params"]
    if args.model_path:
        params = C.load_params_for(model, args.model_path, params)
    variables = {"params": params}

    prep_eval = C.make_eval_prepare(args.input_size, dtype=C.dtype_from_args(args))
    # data-parallel policy evaluation: replicate params, shard val batches
    # (the reference wraps this stage in DDP too, shrink.py:337-339)
    place_batch, place_rep, _dp_mesh = C.data_parallel_context(log)
    variables = place_rep(variables)

    # one train batch for ranking (imp_rank.py:21-23)
    images, _ = C.first_train_batch(train_ds, args.batch_size, seed=args.seed)
    rank_apply = jax.jit(
        lambda v, x, g, c: model.apply(v, x, gates=g, capture_rank_stats=c),
        static_argnums=(3,),
    )
    x = prep_eval(place_batch(images))
    neuron_rank = mlp_neuron_rank(rank_apply, variables, x)
    head_rank = attn_head_rank(rank_apply, variables, x)
    log.info(f"ranked {neuron_rank.shape} neurons, {head_rank.shape} heads")

    def apply_logits(v, imgs, gates):
        return model.apply(v, imgs, gates=gates).logits

    def val_batches():
        # RAW host batches: evaluate_policies pads the ragged tail FIRST and
        # only then runs the jitted eval transform (one compiled shape, no
        # device->host round trip through pad_batch_to_steady)
        for imgs, labels in BatchIterator(val_ds, args.eval_batch_size, shuffle=False,
                                          drop_last=False):
            yield imgs, np.asarray(labels)

    # the reference 9.19 anchor and its seq=197 hardcode only apply to the
    # canonical dedeit geometry (shrink_imp.py:75,144 — real dedeit seq is
    # 198 with the dist token; kept verbatim for workload parity). Any other
    # geometry budgets at its TRUE sequence length — CCT at 32 px has seq 64,
    # and a 197 budget would skew the neuron-vs-head trade-off the policy
    # sampler optimizes (VERDICT r2 weak #3).
    canonical = cfg.depth == 12 and cfg.embed_dim == 384 and cfg.num_heads == 6
    seq_length = 197 if canonical else C.model_seq_length(cfg)
    result = model_shrink(
        apply_logits, variables, neuron_rank, head_rank, val_batches,
        layer=cfg.depth, shrink_ratio=args.shrink_ratio, population=args.population,
        lb=args.lb, ub=args.ub, emb=cfg.embed_dim, head=cfg.num_heads,
        seq_length=seq_length, mlp_ratio=cfg.mlp_ratio,
        full_gmacs=9.19 if canonical else None,
        candidate_chunk=args.candidate_chunk, seed=args.seed, log=log,
        prepare=lambda imgs: prep_eval(place_batch(imgs)),
    )
    np.save(os.path.join(args.output_dir, "shrinked_policy.npy"), result.policies)
    np.save(os.path.join(args.output_dir, "shrinked_accuracy.npy"), result.accuracies)
    np.save(os.path.join(args.output_dir, "neuron_rank.npy"), neuron_rank)
    np.save(os.path.join(args.output_dir, "head_rank.npy"), head_rank)
    log.info(f"best policy acc {result.accuracies.max():.2f} -> {args.output_dir}")
    return result


# ------------------------------------------------------------------ distill (DEKD)


def distill_main(args) -> float:
    """Stage 4: DEKD (distill_sub.py:243-478 + engine.train_1epoch_qkv)."""
    log = C.setup(args)
    train_full, val_full, manifest = C.build_division_data(args)
    div = args.start_division
    train_ds = train_full.division_view(manifest, div)
    val_ds = val_full.division_view(manifest, div)
    num_classes = train_ds.num_classes

    if not args.teacher_path:
        # DEKD consumes the teacher's middle-layer qkv for EVERY gama loss,
        # not just the logit distillation — a random-init teacher silently
        # corrupts the student. The reference hard-fails on the missing
        # checkpoint (distill_sub.py:229-230 torch.load).
        raise ValueError(
            "distill (DEKD) requires --teacher-path: the relation losses "
            "match the teacher's middle-layer Q/K/V (engine.py:91-106); "
            "the pipeline subcommand wires this automatically")
    teacher = C.build_backbone(args.teacher_model, num_classes, args)
    sample = jnp.zeros((2, args.input_size, args.input_size, 3), jnp.bfloat16)
    t_tpl = teacher.init(jax.random.key(0), sample, capture_qkv="middle")
    t_params = C.load_params_for(teacher, args.teacher_path, t_tpl["params"])
    t_vars = {"params": t_params}

    # student gets resize heads to teacher width when token-distilling
    # (distill_sub.py:211-221)
    resize_dim = teacher.cfg.embed_dim if args.distillation_token else None
    student = C.build_backbone(args.model, num_classes, args, resize_dim=resize_dim)
    s_params = student.init(jax.random.key(args.seed), sample, capture_qkv="middle",
                            distill_token=args.distillation_token)["params"]
    if args.model_path:
        s_params = C.load_params_for(student, args.model_path, s_params)
    variables = {"params": s_params}

    # shrink policy: argmax accuracy row; first L entries = neuron sparsity,
    # next L = head sparsity (distill_sub.py:384-389)
    L = student.cfg.depth
    if args.policy_path:
        policies = np.load(os.path.join(args.policy_path, "shrinked_policy.npy"))
        accs = np.load(os.path.join(args.policy_path, "shrinked_accuracy.npy"))
        best = policies[int(np.argmax(accs))]
        neuron_sparsity, head_sparsity = best[:L], best[L : 2 * L]
        rank_file = os.path.join(args.policy_path, "neuron_rank.npy")
        prep_eval0 = C.make_eval_prepare(args.input_size, dtype=C.dtype_from_args(args))
        if os.path.exists(rank_file):
            # our stage 3 persists its ranks, so the gates applied here are
            # EXACTLY the ones the chosen policy's accuracy was measured
            # with (pipeline coherence). The reference instead re-ranks on a
            # fresh random batch (distill_sub.py:391-401), which can select
            # different heads/neurons than its own policy search scored —
            # the fallback below reproduces that recipe for reference-made
            # stage-3 outputs, which carry no rank files.
            neuron_rank = np.load(rank_file)
            head_rank = np.load(os.path.join(args.policy_path, "head_rank.npy"))
        else:
            # re-rank on one batch (distill_sub.py:391-401)
            images, _ = C.first_train_batch(train_ds, args.batch_size)
            rank_apply = jax.jit(
                lambda v, x, g, c: student.apply(v, x, gates=g, capture_rank_stats=c),
                static_argnums=(3,),
            )
            x = prep_eval0(images)
            neuron_rank = mlp_neuron_rank(rank_apply, variables, x)
            # the reference applies the neuron mask BEFORE ranking heads
            # (distill_sub.py:391-401: mlp_neuron_shrink, THEN
            # attn_head_rank) — the head HSIC scores must see the
            # neuron-gated network, not the clean one
            ngates = build_gates(
                neuron_rank, np.tile(np.arange(student.cfg.num_heads), (L, 1)),
                neuron_sparsity, np.zeros(L))
            head_rank = attn_head_rank(rank_apply, variables, x, gates=ngates)
        gates = build_gates(neuron_rank, head_rank, neuron_sparsity, head_sparsity)
        log.info(f"applied shrink policy: mean neuron sparsity "
                 f"{np.mean(neuron_sparsity):.2f}, head {np.mean(head_sparsity):.2f}")
    else:
        gates = full_gates(student.cfg)

    steps_per_epoch = C.train_steps_per_epoch(train_ds, args)
    tx = make_optimizer(C.optim_config_from_args(args, args.batch_size), steps_per_epoch)
    state = TrainState.create(s_params, tx, use_ema=args.model_ema,
                              ema_decay=args.model_ema_decay)

    aug_cfg = C.augment_config_from_args(args, args.input_size, train_ds.images.shape[1])
    mix_cfg = C.mixup_config_from_args(args, num_classes)
    prep_train, host_tf = C.make_train_pipeline(args, aug_cfg, dtype=C.dtype_from_args(args))
    prep_eval = C.make_eval_prepare(args.input_size, dtype=C.dtype_from_args(args))

    jstep = jax.jit(S.make_dekd_step(
        student, teacher, gamma=tuple(args.gama),
        mixup=mix_cfg, smoothing=args.smoothing,
        distillation_type=args.distillation_type,
        distillation_alpha=args.distillation_alpha,
        distillation_tau=args.distillation_tau,
        distillation_inter=getattr(args, "distillation_inter", True),
    ))

    place_batch, place_rep, _dp_mesh = C.data_parallel_context(log)

    def step_fn(state, images, labels, rng):
        r_aug, r_step = jax.random.split(rng)
        x = prep_train(r_aug, place_batch(images))
        return jstep(state, t_vars, gates, x, place_batch(labels), r_step)

    eval_step = jax.jit(S.make_eval_step(student))

    def eval_fn(state):
        # raw params, not EMA (distill_sub.py:435 evaluates the live model;
        # EMA is checkpointed but never drives best-ckpt selection)
        v = {"params": state.params}
        batches = BatchIterator(val_ds, args.eval_batch_size, shuffle=False, drop_last=False)
        return run_eval(eval_step, v, gates, batches,
                        prepare=lambda im: prep_eval(place_batch(im)))

    def save_state(path, state, epoch):
        C.make_saver(args)(path, {"params": state.params, "ema_params": state.ema_params,
                           "opt_state": state.opt_state,
                           "gates": {"head": np.asarray(gates.head),
                                     "neuron": np.asarray(gates.neuron)},
                           "epoch": np.int32(epoch)})

    state, start_epoch = _try_resume(
        args, state, log,
        extra_template={"gates": {"head": np.asarray(gates.head),
                                  "neuron": np.asarray(gates.neuron)}})
    state = place_rep(state)
    t_vars = place_rep(t_vars)
    gates = place_rep(gates)

    def train_batches(epoch):
        it = BatchIterator(train_ds, args.batch_size, shuffle=True, seed=args.seed,
                           repeated_aug=3 if args.repeated_aug else 0,
                           host_transform=host_tf)
        it.set_epoch(epoch)
        return it

    state, best = fit(
        carry=state, step_fn=step_fn, train_batches_fn=train_batches, eval_fn=eval_fn,
        epochs=args.epochs, rng=jax.random.key(args.seed + 1),
        output_dir=args.output_dir, log_fn=log.info, save_state_fn=save_state,
        profile_dir=getattr(args, "profile_dir", None),
        tensorboard=getattr(args, "tensorboard", False),
        start_epoch=start_epoch,
    )
    log.info(f"DEKD best acc1: {best:.2f}")
    return best


# ------------------------------------------------------------------ ensemble


def _ensemble_eval_compact(args, log, val_ds, num_classes, D) -> float:
    """Collaborative-inference eval straight from deploy-stage compact
    artifacts (the serving path bench.py measures)."""
    from devit_tpu.models.compact_vit import load_compact
    from devit_tpu.models.ensemble import EnsMLP

    cms = [load_compact(os.path.join(args.compact_path, f"sub-dataset{i}", "compact.msgpack"))
           for i in range(D)]
    sub_size = cms[0].embed["pos_embed"].shape[-1]
    # family from the artifact, not hardcoded: undistilled backbones emit no
    # dist tokens and need the single-token 'vit' fusion head
    family = "deit" if cms[0].distilled else "vit"
    ens = EnsMLP(num_classes=num_classes, sub_size=sub_size, num_divisions=D,
                 teacher_size=args.teacher_size, family=family)
    if args.ens_path:
        ckpt = restore_pytree(args.ens_path, None)
        ens_params = ckpt.get("ens_params", ckpt.get("params", ckpt))
        ens_vars = {"params": ens_params}
    else:
        cls_t = jnp.zeros((D, 2, sub_size))
        ens_vars = ens.init(jax.random.key(0), cls_t, cls_t)

    prep_eval = C.make_eval_prepare(args.input_size, dtype=C.dtype_from_args(args))

    if len(jax.local_devices()) > 1:
        # deployment topology: each division committed to its own chip,
        # tokens gathered to the fusion chip (parallel/serve.py)
        from devit_tpu.parallel.serve import make_collaborative_server

        fwd = make_collaborative_server(
            cms, lambda ev, c, t: ens.apply(ev, c, t), ens_vars,
            patch_size=args.patch_size)
        stream_fn = fwd.stream
        log.info(f"collaborative serving over {len(jax.local_devices())} devices: "
                 f"divisions on {[str(d) for d in fwd.division_devices]}, "
                 f"fusion on {fwd.fusion_device}")
    else:
        # single chip: one fused program, one dispatch per batch (over the
        # tunnel each dispatch costs ~0.7 ms, so D+1 per-division dispatches
        # would be pure overhead here; same math as serve.py on one device)
        from devit_tpu.models.compact_vit import stack_division_features

        @jax.jit
        def fwd(ev, img):
            cls_stack, dist_stack = stack_division_features(
                cms, img, patch_size=args.patch_size)
            return ens.apply(ev, cls_stack, dist_stack).logits

        stream_fn = None

    from devit_tpu.data.datasets import pad_batch_to_steady

    totals = {"top1": 0, "top5": 0, "count": 0}
    batch_size = args.eval_batch_size
    metas = []  # (labels, n_real) queued at dispatch, consumed at materialize

    def prepared_batches():
        nonlocal batch_size
        for imgs, labels in BatchIterator(val_ds, args.eval_batch_size,
                                          shuffle=False, drop_last=False):
            # pad the ragged tail batch to the steady shape: a new shape would
            # recompile every division program (30-90 s each over the tunnel)
            imgs, labels, batch_size, n = pad_batch_to_steady(imgs, labels,
                                                              batch_size)
            metas.append((np.asarray(labels)[:n], n))
            yield prep_eval(imgs)

    if stream_fn is not None:
        # pipelined serving loop: batch k materializes only after k+1/k+2 are
        # dispatched, so fusion overlaps the divisions' later-batch forwards
        results = stream_fn(ens_vars, prepared_batches())
    else:
        results = (jax.device_get(fwd(ens_vars, imgs))
                   for imgs in prepared_batches())

    for logits in results:
        labels, n = metas.pop(0)
        logits = logits[:n]
        pred = np.argsort(-logits, axis=-1)
        totals["top1"] += int((pred[:, 0] == labels).sum())
        k = min(5, logits.shape[-1])
        totals["top5"] += int((pred[:, :k] == labels[:, None]).any(-1).sum())
        totals["count"] += len(labels)
    n = max(totals["count"], 1)
    acc1 = 100 * totals["top1"] / n
    log.info(f"compact ensemble eval: acc1 {acc1:.2f} acc5 {100 * totals['top5'] / n:.2f}")
    return acc1


def _run_ensemble_training(args, log, label, train_ds, val_ds, num_classes,
                           D, bb_params, ens_params, build_steps, t_vars,
                           gates) -> float:
    """Shared stage-5 training tail for the ViT and CCT ensemble families:
    dual optimizers + dual EMA (ensemble.py:315-348), resume, ('div','data')
    mesh placement, the train/eval/save loops. The only family-specific
    pieces come in through build_steps(mix_cfg) -> (jstep, ens_eval)."""
    steps_per_epoch = C.train_steps_per_epoch(train_ds, args)
    # two optimizers: backbone lr vs ens lr (ensemble.py:343-348). ens_lr is
    # compared against None so `--ens-lr 0` freezes the fusion head instead
    # of silently falling back to --lr
    bb_cfg = C.optim_config_from_args(args, args.batch_size)
    ens_lr = args.ens_lr if args.ens_lr is not None else args.lr
    ens_cfg = type(bb_cfg)(**{**bb_cfg.__dict__, "lr": ens_lr})
    # EMA on both models, like the reference's dual ModelEma (ensemble.py:315-327)
    bb_state = TrainState.create(bb_params, make_optimizer(bb_cfg, steps_per_epoch),
                                 use_ema=args.model_ema, ema_decay=args.model_ema_decay)
    ens_state = TrainState.create(ens_params, make_optimizer(ens_cfg, steps_per_epoch),
                                  use_ema=args.model_ema, ema_decay=args.model_ema_decay)

    aug_cfg = C.augment_config_from_args(args, args.input_size, train_ds.images.shape[1])
    mix_cfg = C.mixup_config_from_args(args, num_classes)
    prep_train, host_tf = C.make_train_pipeline(args, aug_cfg, dtype=C.dtype_from_args(args))
    prep_eval = C.make_eval_prepare(args.input_size, dtype=C.dtype_from_args(args))
    jstep, ens_eval = build_steps(mix_cfg)

    bb_state, ens_state, start_epoch = _try_resume_ensemble(
        args, bb_state, ens_state, log, gates)

    # division+data parallel: stacked params/gates shard over 'div', batch
    # over 'data', EnsMLP replicated — token fusion all-gathers over ICI
    place_batch, place_rep, place_div, _ens_mesh = C.ensemble_parallel_context(D, log)
    bb_state = place_div(bb_state)
    ens_state = place_rep(ens_state)
    if t_vars is not None:
        t_vars = place_rep(t_vars)
    if gates is not None:
        gates = place_div(gates)

    def step_fn(carry, images, labels, rng):
        bb_state, ens_state = carry
        r_aug, r_step = jax.random.split(rng)
        x = prep_train(r_aug, place_batch(images))
        bb_state, ens_state, metrics = jstep(
            bb_state, ens_state, t_vars, gates, x, place_batch(labels), r_step
        )
        return (bb_state, ens_state), metrics

    def eval_fn(carry):
        bb_state, ens_state = carry
        batches = BatchIterator(val_ds, args.eval_batch_size, shuffle=False,
                                drop_last=False)
        return run_eval(
            lambda vs, g, im, lb: ens_eval(vs[0], vs[1], g, im, place_batch(lb)),
            ({"params": bb_state.params}, {"params": ens_state.params}),
            gates, batches, prepare=lambda im: prep_eval(place_batch(im)))

    def save_state(path, carry, epoch):
        bb_state, ens_state = carry
        C.make_saver(args)(path, _ensemble_ckpt_tree(bb_state, ens_state, epoch,
                                                     gates))

    def train_batches(epoch):
        it = BatchIterator(train_ds, args.batch_size, shuffle=True, seed=args.seed,
                           repeated_aug=3 if args.repeated_aug else 0,
                           host_transform=host_tf)
        it.set_epoch(epoch)
        return it

    if args.eval:
        m = eval_fn((bb_state, ens_state))
        log.info(f"{label} eval: acc1 {m['acc1']:.2f}")
        return m["acc1"]

    carry, best = fit(
        carry=(bb_state, ens_state), step_fn=step_fn, train_batches_fn=train_batches,
        eval_fn=eval_fn, epochs=args.epochs, rng=jax.random.key(args.seed + 2),
        output_dir=args.output_dir, log_fn=log.info, save_state_fn=save_state,
        profile_dir=getattr(args, "profile_dir", None),
        tensorboard=getattr(args, "tensorboard", False),
        start_epoch=start_epoch,
    )
    log.info(f"{label} best acc1: {best:.2f}")
    return best


def ensemble_main(args) -> float:
    """Stage 5: token-fusion ensemble over N frozen-architecture backbones
    (ensemble.py:245-456). Sub-model checkpoints load by NAME into the stacked
    pytree (replacing the positional dict_map trick, ensemble.py:192-200)."""
    log = C.setup(args)
    cat = getattr(args, "inat_category", "name")
    train_ds = build_dataset(args.dataset, args.data_path, train=True,
                             img_size=args.input_size, inat_category=cat)
    val_ds = build_dataset(args.dataset, args.data_path, train=False,
                           img_size=args.input_size, inat_category=cat)
    num_classes = train_ds.num_classes
    D = args.num_division
    # no manifest needed: stage 5 trains the fusion over the FULL label set
    # (ensemble.py:261 builds the undivided dataset); divisions enter only
    # through the per-division checkpoints/gates loaded below

    if args.compact_path:
        return _ensemble_eval_compact(args, log, val_ds, num_classes, D)
    cct_family = C.is_cct(args.model)
    if cct_family:
        return _ensemble_cct_main(args, log, train_ds, val_ds, num_classes, D)
    backbone = C.build_model(args.model, 0, args)  # heads never materialised
    sample = jnp.zeros((2, args.input_size, args.input_size, 3), jnp.bfloat16)

    ckpt_gates = []
    if args.sub_model_path:
        div_params = []
        tpl = backbone.init(jax.random.key(0), sample, features_only=True)["params"]
        for i in range(D):
            p = os.path.join(args.sub_model_path, f"sub-dataset{i}", "checkpoint.msgpack")
            pth = os.path.join(args.sub_model_path, f"sub-dataset{i}", "checkpoint.pth")
            # prefer .pth only when it actually exists; otherwise keep the
            # .msgpack name so restore_pytree's .orbax sibling auto-detect works
            if not os.path.exists(p) and os.path.exists(pth):
                p = pth
            if p.endswith((".pth", ".pt")):
                # .pth checkpoints carry no gates; record the gap so a mixed
                # .pth/.msgpack set falls through the all(...) guard below
                # instead of stacking a short (k<D) gate list
                div_params.append(C.load_params_for(backbone, p, tpl))
                ckpt_gates.append(None)
            else:
                # ONE restore feeds both the by-name param merge and the
                # gate extraction (these checkpoints are hundreds of MB at
                # full scale — don't deserialize each twice)
                raw = restore_pytree(p, None)
                params = raw.get("params", raw) if isinstance(raw, dict) else raw
                div_params.append(C.merge_params_into(backbone, params, tpl))
                ckpt_gates.append(raw.get("gates") if isinstance(raw, dict) else None)
        stacked = {"params": stack_division_params(div_params)}
    else:
        stacked = init_multivit(backbone, jax.random.key(args.seed), sample, D)

    gates = None
    if args.gates_path:
        loaded = []
        for i in range(D):
            g = restore_pytree(os.path.join(args.gates_path, f"sub-dataset{i}", "gates.msgpack"), None)
            loaded.append(Gates(jnp.asarray(g["head"]), jnp.asarray(g["neuron"])))
        gates = stack_division_gates(loaded)
    elif ckpt_gates and all(g is not None for g in ckpt_gates):
        # distill-stage checkpoints carry their shrink gates (save_state,
        # stage 4): apply them so EnsMLP trains on the SAME gated features the
        # deployed compact artifacts serve. (The reference's gates are
        # non-persistent module attributes, so its ensemble silently re-
        # enables every pruned head/neuron with stale weights — a resolved
        # reference bug, SURVEY.md §7: the deployment story is shrunk models.)
        gates = stack_division_gates(
            [Gates(jnp.asarray(g["head"]), jnp.asarray(g["neuron"]))
             for g in ckpt_gates])
        log.info("applied shrink gates from the distill checkpoints")

    family = "deit" if backbone.cfg.distilled else "vit"
    ens = EnsMLP(num_classes=num_classes, sub_size=backbone.cfg.embed_dim,
                 num_divisions=D, teacher_size=args.teacher_size, family=family)
    cls_t = jnp.zeros((D, 2, backbone.cfg.embed_dim))
    ens_vars = ens.init(jax.random.key(args.seed + 1), cls_t, cls_t, distill=True, train=True)

    teacher = t_vars = None
    if args.distillation_type != "none":
        if not args.teacher_path:
            raise ValueError(
                f"--distillation-type {args.distillation_type} requires "
                "--teacher-path (the stage-5 EnsLoss matches the global "
                "teacher's tokens/logits, ensemble.py:359-361)")
        teacher = C.build_model(args.teacher_model, num_classes, args)
        t_tpl = teacher.init(jax.random.key(0), sample, distill_token=True)
        t_params = C.load_params_for(teacher, args.teacher_path, t_tpl["params"])
        t_vars = {"params": t_params}

    return _run_ensemble_training(
        args, log, "ensemble", train_ds, val_ds, num_classes, D,
        stacked["params"], ens_vars["params"],
        build_steps=lambda mix_cfg: (
            jax.jit(S.make_ensemble_train_step(
                backbone, ens, teacher, mixup=mix_cfg, smoothing=args.smoothing,
                distillation_type=args.distillation_type,
                distillation_alpha=args.distillation_alpha,
                distillation_tau=args.distillation_tau,
            )),
            jax.jit(S.make_ensemble_eval_step(backbone, ens))),
        t_vars=t_vars, gates=gates)


def _ensemble_cct_main(args, log, train_ds, val_ds, num_classes, D) -> float:
    """CCT collaborative ensemble (MultiCCT + EnsembleCCT,
    ensemble_models.py:93-151)."""
    from devit_tpu.models.ensemble import EnsembleCCT

    backbone = C.build_backbone(
        args.model if args.model.startswith("decct") else "de" + args.model,
        num_classes, args,
    )
    assert backbone.cfg.backbone, "CCT ensemble needs the headless backbone"
    sample = jnp.zeros((2, args.input_size, args.input_size, 3), jnp.bfloat16)

    ckpt_gates = []
    if args.sub_model_path:
        div_params = []
        tpl = backbone.init(jax.random.key(0), sample)["params"]
        for i in range(D):
            path = os.path.join(args.sub_model_path, f"sub-dataset{i}", "checkpoint.msgpack")
            # by-name merge (not tree_map): the DEKD checkpoints carry the
            # classifier `fc` the headless backbone lacks, and merge drops it
            # (ensemble.py loads the full CCT then takes backbone features).
            # One restore feeds both the merge and the gate extraction.
            raw = restore_pytree(path, None)
            params = raw.get("params", raw) if isinstance(raw, dict) else raw
            div_params.append(C.merge_params_into(backbone, params, tpl))
            ckpt_gates.append(raw.get("gates") if isinstance(raw, dict) else None)
        stacked = {"params": stack_division_params(div_params)}
    else:
        keys = jax.random.split(jax.random.key(args.seed), D)
        stacked = jax.vmap(lambda k: backbone.init(k, sample))(keys)

    gates = None
    if ckpt_gates and all(g is not None for g in ckpt_gates):
        # same resolved reference bug as the ViT path: train the fusion head
        # on the SAME gated features the shrunk divisions serve (the
        # reference's gates are non-persistent module attributes, silently
        # dropped by its ensemble stage)
        gates = stack_division_gates(
            [Gates(jnp.asarray(g["head"]), jnp.asarray(g["neuron"]))
             for g in ckpt_gates])
        log.info("applied shrink gates from the distill checkpoints")

    ens = EnsembleCCT(num_classes=num_classes, sub_size=backbone.cfg.embed_dim,
                      num_divisions=D, teacher_size=args.teacher_size)
    feats0 = jnp.zeros((D, 2, backbone.cfg.embed_dim))
    ens_vars = ens.init(jax.random.key(args.seed + 1), feats0, distill=True, train=True)

    teacher = t_vars = None
    if args.distillation_type != "none":
        if not args.teacher_path:
            raise ValueError(
                f"--distillation-type {args.distillation_type} requires "
                "--teacher-path (a trained CCT teacher checkpoint)")
        teacher = C.build_backbone(args.teacher_model, num_classes, args)
        # load via load_params_for like the ViT branch: handles .pth teachers
        # (torch_cct_to_params) and runs merge_params_into's loud
        # geometry/kept-init guard instead of feeding an unvalidated tree
        # straight into the jit trace
        t_tpl = teacher.init(jax.random.key(0), sample)
        t_params = C.load_params_for(teacher, args.teacher_path, t_tpl["params"])
        t_vars = {"params": t_params}

    return _run_ensemble_training(
        args, log, "CCT ensemble", train_ds, val_ds, num_classes, D,
        stacked["params"], ens_vars["params"],
        build_steps=lambda mix_cfg: (
            jax.jit(S.make_cct_ensemble_train_step(
                backbone, ens, teacher, mixup=mix_cfg, smoothing=args.smoothing,
                distillation_type=args.distillation_type,
                distillation_alpha=args.distillation_alpha,
                distillation_tau=args.distillation_tau,
            )),
            jax.jit(S.make_cct_ensemble_eval_step(backbone, ens))),
        t_vars=t_vars, gates=gates)


# ------------------------------------------------------------------ pipeline


def pipeline_main(args):
    """One-shot orchestrator: split → per-division (train_sub → shrink →
    distill) → ensemble → deploy under a single output root — the chain the
    reference documents as five manual commands (README.md:40-69) plus our
    deploy stage. Stages whose final artifact already exists are skipped
    (re-run a stage by deleting its directory or passing --force), so an
    interrupted pipeline resumes at the stage boundary; WITHIN a stage the
    per-epoch checkpoint_temp + --resume machinery still applies.

    Layout under --output_dir:
      division{D}/manifest.json   sub-model{i}/   shrink{i}/
      sub-dataset{i}/ (distilled) ensemble/       deploy/
    """
    import argparse

    log = C.setup(args)
    root = args.output_dir
    selected = [s.strip() for s in args.stages.split(",") if s.strip()]
    known = ["split", "train_sub", "shrink", "distill", "ensemble", "deploy"]
    bad = [s for s in selected if s not in known]
    if bad:
        raise ValueError(f"unknown pipeline stage(s) {bad}; choose from {known}")

    # the pipeline parser defaults --lr/--weight-decay to None sentinels so
    # an EXPLICIT --lr 5e-4 is distinguishable from unset; resolve the
    # generic optim defaults here for stages 2-4, and the ensemble recipe
    # (ensemble.py lr 1e-5 / wd 0.05) below only when genuinely unset
    shared_lr, shared_wd = args.lr, args.weight_decay
    base_optim = {"lr": shared_lr if shared_lr is not None else 5e-4,
                  "weight_decay": shared_wd if shared_wd is not None else 0.0}

    def ns(**overrides):
        d = {k: v for k, v in vars(args).items() if k not in ("fn", "stages", "force")}
        d.update(base_optim)
        d.update(overrides)
        return argparse.Namespace(**d)

    def artifact_exists_abs(p):
        # make_saver rewrites '.msgpack' -> '.orbax' under --ckpt-format
        # orbax; accept either artifact so completed stages are skipped
        # regardless of the checkpoint format
        return os.path.exists(p) or (
            p.endswith(".msgpack")
            and os.path.exists(p[: -len(".msgpack")] + ".orbax"))

    def artifact_exists(*path):
        return artifact_exists_abs(os.path.join(root, *path))

    def stage_resume(stage_dir):
        """Intra-stage resume (the docstring's promise): a killed stage
        leaves <stage_dir>/checkpoint_temp.msgpack (per-epoch crash
        artifact); re-running the pipeline resumes it instead of silently
        retraining from epoch 0."""
        if args.force:
            # --force means retrain from scratch. A COMPLETED stage also
            # leaves checkpoint_temp behind; resuming it sets
            # start_epoch == epochs and fit() would run ZERO epochs — the
            # "forced" stage would silently be a no-op.
            return ""
        ptmp = os.path.join(stage_dir, "checkpoint_temp.msgpack")
        if artifact_exists_abs(ptmp):
            if not os.path.exists(ptmp):
                ptmp = ptmp[: -len(".msgpack")] + ".orbax"
            log.info(f"pipeline: resuming interrupted stage from {ptmp}")
            return ptmp
        return ""

    def done(*path):
        return not args.force and artifact_exists(*path)

    manifest = os.path.join(root, f"division{args.num_division}", "manifest.json")
    results = {}
    if "split" in selected:
        if done(f"division{args.num_division}", "manifest.json"):
            log.info("pipeline: split artifact exists — skipping")
        else:
            split_main(ns(output_dir=root))

    for d in range(args.num_division):
        sub = os.path.join(root, f"sub-model{d}")
        if "train_sub" in selected:
            if done(f"sub-model{d}", "checkpoint.msgpack"):
                log.info(f"pipeline: stage-2 division {d} exists — skipping")
            else:
                results[f"train_sub{d}"] = train_sub_main(
                    ns(start_division=d, output_dir=sub, manifest=manifest,
                       resume=stage_resume(sub)))
        shrink_dir = os.path.join(root, f"shrink{d}")
        ckpt = os.path.join(sub, "checkpoint.msgpack")
        if "shrink" in selected:
            if done(f"shrink{d}", "shrinked_policy.npy"):
                log.info(f"pipeline: shrink division {d} exists — skipping")
            else:
                shrink_main(ns(start_division=d, output_dir=shrink_dir,
                               manifest=manifest, model_path=ckpt, resume=""))
        if "distill" in selected:
            if done(f"sub-dataset{d}", "checkpoint.msgpack"):
                log.info(f"pipeline: distill division {d} exists — skipping")
            else:
                # DEKD needs a REAL teacher (the relation losses consume its
                # middle-layer qkv; distill_main refuses a random one).
                # Explicit --teacher-path is treated as a root holding
                # per-division teacher checkpoints (the reference's
                # teacher_path/sub-dataset{i}/checkpoint.pth layout,
                # distill_sub.py:229, with our stage-2 sub-model{i} layout
                # and a literal file as fallbacks). Without it, SELF-distill
                # from the division's own stage-2 checkpoint (--model as its
                # own teacher) — the strongest trained teacher the pipeline
                # has actually built.
                if args.teacher_path:
                    t_model = args.teacher_model
                    cands = [os.path.join(args.teacher_path,
                                          f"sub-dataset{d}", "checkpoint.msgpack"),
                             os.path.join(args.teacher_path,
                                          f"sub-model{d}", "checkpoint.msgpack"),
                             args.teacher_path]
                    t_path = next((c for c in cands if artifact_exists_abs(c)),
                                  cands[-1])
                else:
                    t_model, t_path = args.model, ckpt
                    log.info(f"pipeline: no --teacher-path — division {d} "
                             f"self-distills from its stage-2 checkpoint "
                             f"({args.model} as its own teacher)")
                # DEKD always distills (the reference's distill_sub defaults:
                # hard + clip 1.0); the shared --distillation-type flag
                # governs stages 2/5, where 'none' is the working default
                # when no teacher checkpoint is supplied
                results[f"distill{d}"] = distill_main(
                    ns(start_division=d,
                       output_dir=os.path.join(root, f"sub-dataset{d}"),
                       manifest=manifest, model_path=ckpt,
                       policy_path=shrink_dir,
                       resume=stage_resume(os.path.join(root, f"sub-dataset{d}")),
                       teacher_model=t_model, teacher_path=t_path,
                       distillation_type=(args.distillation_type
                                          if args.distillation_type != "none"
                                          else "hard"),
                       clip_grad=(args.clip_grad if args.clip_grad is not None
                                  else 1.0)))

    if "ensemble" in selected:
        if done("ensemble", "checkpoint.msgpack"):
            log.info("pipeline: ensemble exists — skipping")
        else:
            # the ensemble subcommand pins the reference stage-5 recipe
            # (ensemble.py lr 1e-5 / weight-decay 0.05 — cli/__main__.py
            # ep.set_defaults); apply it unless the user EXPLICITLY set the
            # shared flag (None sentinel) or the stage-5 override
            # (fine-tuning distilled backbones at 5e-4 destroys them)
            ens_overrides = {}
            if getattr(args, "ens_backbone_lr", None) is not None:
                ens_overrides["lr"] = args.ens_backbone_lr
            elif shared_lr is None:
                ens_overrides["lr"] = 1e-5
            if getattr(args, "ens_weight_decay", None) is not None:
                ens_overrides["weight_decay"] = args.ens_weight_decay
            elif shared_wd is None:
                ens_overrides["weight_decay"] = 0.05
            results["ensemble"] = ensemble_main(
                ns(output_dir=os.path.join(root, "ensemble"),
                   sub_model_path=root, manifest=manifest,
                   resume=stage_resume(os.path.join(root, "ensemble")),
                   compact_path=None, ens_path=None, gates_path=None,
                   **ens_overrides))
    if "deploy" in selected and C.is_cct(args.model):
        # structural compaction (models/compact_vit.py) is ViT-family only;
        # CCT divisions serve via the gated stacked path, whose uniform
        # widths need no ragged per-division programs (PARITY.md)
        log.info("pipeline: deploy (ragged compaction) is ViT-only — "
                 "skipping for the CCT family")
    elif "deploy" in selected:
        if done("deploy", "deploy_report.json"):
            log.info("pipeline: deploy artifacts exist — skipping")
        else:
            # deploy from the stage-5 ensemble checkpoint when it exists
            # (what actually serves); with a stage subset that skipped
            # 'ensemble', fall back to the per-division distill checkpoints
            # rather than crashing on the missing path
            ens_ckpt = os.path.join(root, "ensemble", "checkpoint.msgpack")
            if not artifact_exists("ensemble", "checkpoint.msgpack"):
                log.info("pipeline: no ensemble checkpoint — deploying from "
                         "the distill checkpoints")
                ens_ckpt = None
            deploy_main(ns(output_dir=os.path.join(root, "deploy"),
                           ensemble_path=ens_ckpt,
                           sub_model_path=root,
                           deploy_num_classes=args.deploy_num_classes))
    log.info(f"pipeline complete: {sorted(results)}")
    return results


# ------------------------------------------------------------------ deploy


def _deploy_division_sources(args, cfg, log):
    """Yield (division, params, gates) to compact.

    Two sources:
    - --ensemble-path: the stage-5 ensemble checkpoint — division-stacked
      backbones AS TRAINED BY THE FUSION STAGE (what actually serves), with
      the persisted stacked gates when the backbones were gated;
    - --sub-model-path: per-division distill checkpoints (params + gates),
      the pre-fusion deployment the reference's pipeline describes."""
    if getattr(args, "ensemble_path", None):
        ckpt = restore_pytree(args.ensemble_path, None)
        stacked = ckpt["backbone_params"]
        g = ckpt.get("gates")
        # the checkpoint's stacked leading axis is authoritative for D: a
        # mismatched --num_division would otherwise IndexError (too large)
        # or silently deploy a prefix of the divisions (too small)
        ckpt_D = int(jax.tree_util.tree_leaves(stacked)[0].shape[0])
        if ckpt_D != args.num_division:
            log.info(f"NOTE: checkpoint has {ckpt_D} divisions; deploying all "
                     f"of them (--num_division {args.num_division} ignored)")
        log.info(f"deploying ensemble-trained backbones from {args.ensemble_path}"
                 + ("" if g is not None else " (ungated)"))
        for i in range(ckpt_D):
            params = jax.tree_util.tree_map(lambda a: np.asarray(a)[i], stacked)
            gates = (Gates(jnp.asarray(np.asarray(g["head"])[i]),
                           jnp.asarray(np.asarray(g["neuron"])[i]))
                     if g is not None else full_gates(cfg))
            yield i, params, gates
        return
    if not args.sub_model_path:
        raise ValueError("deploy needs --sub-model-path (distill checkpoints) "
                         "or --ensemble-path (stage-5 checkpoint)")
    for i in range(args.num_division):
        path = os.path.join(args.sub_model_path, f"sub-dataset{i}", "checkpoint.msgpack")
        ckpt = restore_pytree(path, None)
        # raw params: the reference's best checkpoint.pth is the live model
        # state_dict (distill_sub.py:450) — EMA is never deployed there
        params = ckpt.get("params", ckpt)
        if "gates" in ckpt and ckpt["gates"] is not None:
            g = ckpt["gates"]
            gates = Gates(jnp.asarray(g["head"]), jnp.asarray(g["neuron"]))
        else:
            gates = full_gates(cfg)
        yield i, params, gates


def deploy_main(args):
    """Build the serving artifact: load each division's checkpoint (distill
    outputs, or the stage-5 ensemble checkpoint via --ensemble-path), ragged-
    compact it (equivalence with the gated model is test-guaranteed), and
    save per-division compact models + an analytic MACs report. This realises
    the MACs savings the reference only ever computes on paper
    (compute_metric.py)."""
    from devit_tpu.core.metrics import cal_shrink_macs, cal_shrink_paras
    from devit_tpu.models.compact_vit import compact_vit_ragged, save_compact
    from devit_tpu.core.rank import check_sparsity

    log = C.setup(args)
    model = C.build_model(args.model, args.deploy_num_classes, args)
    cfg = model.cfg
    report = []
    for i, params, gates in _deploy_division_sources(args, cfg, log):
        cm = compact_vit_ragged(params, gates, cfg,
                                neuron_multiple=args.neuron_multiple)
        out = os.path.join(args.output_dir, f"sub-dataset{i}", "compact.msgpack")
        save_compact(out, cm)
        n_sp, h_sp = check_sparsity(gates)
        # 197 only for the canonical dedeit geometry (the reference hardcode,
        # shrink_imp.py:75); everything else reports at its true seq length
        canonical = cfg.depth == 12 and cfg.embed_dim == 384 and cfg.num_heads == 6
        seq_length = 197 if canonical else C.model_seq_length(cfg)
        macs = cal_shrink_macs(list(n_sp), list(h_sp), emb=cfg.embed_dim,
                               seq_length=seq_length, mlp_ratio=cfg.mlp_ratio,
                               head=cfg.num_heads, layer=cfg.depth)
        paras = cal_shrink_paras(list(n_sp), list(h_sp), emb=cfg.embed_dim,
                                 seq_length=seq_length, mlp_ratio=cfg.mlp_ratio,
                                 head=cfg.num_heads, layer=cfg.depth)
        kept_h = sum(lp["num_heads"] for lp in cm.layers)
        log.info(f"division {i}: {macs:.3f} GMACs, {paras:.1f} M params, "
                 f"{kept_h}/{cfg.depth * cfg.num_heads} heads -> {out}")
        report.append({"division": i, "gmacs": macs, "mparams": paras})
    import json as _json

    with open(os.path.join(args.output_dir, "deploy_report.json"), "w") as f:
        _json.dump(report, f, indent=1)
    return report


# ------------------------------------------------------------------ convert


def convert_main(args):
    """Standalone checkpoint conversion — the implicit converters behind
    --model-path/--teacher-path/--resume exposed as a tool for migrating
    users (docs/MIGRATION.md "Checkpoint compatibility").

    Formats by extension:
      in:  .pth/.pt (reference-layout torch state dict, ViT or CCT family —
           auto-detected from the keys), .npz (Flax ViT, de_vit.py:372-449),
           .msgpack / .orbax (ours; full {params, ema_params, ...} trees)
      out: .msgpack / .orbax (full tree preserved), .pth/.pt (ViT family
           only: reference-layout state dict via params_to_torch_vit —
           loadable by the reference's de_vit.VisionTransformer)

    Geometry (depth, CCT conv stages) is inferred from the checkpoint itself;
    no model flags needed. --ema exports the EMA parameters instead of the
    raw ones (reference _load_checkpoint_for_ema interop).
    """
    from devit_tpu.io.checkpoint import (
        load_flax_npz_vit, load_torch_state_dict, params_to_torch_vit,
        save_pytree, save_pytree_orbax, torch_cct_to_params,
        torch_vit_to_params, wait_for_checkpoints,
    )

    src, dst = args.src, args.dst
    if src.endswith((".pth", ".pt")):
        sd = load_torch_state_dict(src)
        if any(k.startswith("classifier.blocks.") for k in sd):
            L = 1 + max(int(k.split(".")[2]) for k in sd
                        if k.startswith("classifier.blocks."))
            nconv = 1 + max(int(k.split(".")[2]) for k in sd
                            if k.startswith("tokenizer.conv_layers."))
            tree = {"params": torch_cct_to_params(
                sd, num_layers=L, n_conv_layers=nconv)}
        elif any(k.startswith("blocks.") for k in sd):
            L = 1 + max(int(k.split(".")[1]) for k in sd
                        if k.startswith("blocks."))
            tree = {"params": torch_vit_to_params(sd, depth=L)}
        else:
            raise ValueError(
                f"{src}: no blocks.* / classifier.blocks.* keys — not a "
                "reference-layout ViT/CCT state dict")
    elif src.endswith(".npz"):
        w = np.load(src)
        L = 1 + max(int(k.split("encoderblock_")[1].split("/")[0])
                    for k in w.files if "encoderblock_" in k)
        tree = {"params": load_flax_npz_vit(src, depth=L)}
    else:
        tree = restore_pytree(src, None)
        if not (isinstance(tree, dict) and "params" in tree):
            tree = {"params": tree}

    params = tree["params"]
    if args.ema:
        if tree.get("ema_params") is None:
            raise ValueError(f"--ema: no ema_params in {src}")
        params = tree["ema_params"]

    if dst.endswith((".pth", ".pt")):
        if not (isinstance(params, dict) and "qkv" in params.get("blocks", {})):
            raise ValueError(
                "torch export is ViT-family only (params_to_torch_vit); "
                "CCT checkpoints convert torch->ours but not back")
        import torch

        depth = int(np.asarray(params["blocks"]["qkv"]["kernel"]).shape[0])
        out_sd = {k: torch.from_numpy(np.ascontiguousarray(v))
                  for k, v in params_to_torch_vit(params, depth).items()}
        torch.save(out_sd, dst)
        if "gates" in tree:
            print("note: shrink gates are not representable in the torch "
                  "state dict (the reference keeps them non-persistent); "
                  "apply them there via core/imp_rank masks")
    elif dst.endswith(".orbax"):
        out = dict(tree, params=params) if args.ema else tree
        save_pytree_orbax(dst, out)
        wait_for_checkpoints()
    elif dst.endswith(".msgpack"):
        out = dict(tree, params=params) if args.ema else tree
        save_pytree(dst, out)
    else:
        raise ValueError(f"{dst}: expected .msgpack, .orbax, .pth or .pt")
    n = sum(int(np.asarray(x).size) for x in jax.tree_util.tree_leaves(params))
    print(f"converted {src} -> {dst} ({n/1e6:.2f}M params"
          f"{', ema' if args.ema else ''})")
    return dst


# ------------------------------------------------------------------ ingest


def ingest_main(args):
    """Pre-build the decoded dataset cache (train + val) so the first
    training run doesn't pay the one-time decode. Threaded decode
    (DEVIT_INGEST_THREADS); caches over DEVIT_MMAP_BYTES land in a uint8
    memmap next to the data (ImageNet-scale; see data/datasets.py
    decode_files_to_dataset)."""
    import time

    for train in (True, False):
        t0 = time.time()
        ds = build_dataset(args.dataset, args.data_path, train,
                           img_size=args.input_size,
                           inat_category=getattr(args, "inat_category", "name"))
        kind = type(ds.images).__name__
        print(f"{args.dataset} {'train' if train else 'val'}: {len(ds)} "
              f"images, {ds.num_classes} classes, cache={kind} "
              f"({time.time() - t0:.1f}s)")
    return 0
