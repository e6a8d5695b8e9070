"""Ensemble fusion, train steps, and multi-device sharding tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from devit_tpu.configs import get_vit_config
from devit_tpu.data.mixup import MixupConfig, mixup_cutmix
from devit_tpu.models.ensemble import (
    EnsMLP, ensemble_forward, init_multivit, multivit_features,
    stack_division_gates, stack_division_params,
)
from devit_tpu.models.vit import Gates, VisionTransformer, full_gates
from devit_tpu.parallel import mesh as M
from devit_tpu.train.optim import OptimConfig, cosine_schedule, make_optimizer
from devit_tpu.train.state import TrainState
from devit_tpu.train import steps as S

TINY = dict(img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=4, num_classes=7)


def tiny(name="dedeit", **kw):
    return VisionTransformer(get_vit_config(name, **{**TINY, **kw}), dtype=jnp.float32)


@pytest.fixture(scope="module")
def ens_setup():
    model = tiny()
    x = jnp.zeros((2, 32, 32, 3))
    stacked = init_multivit(model, jax.random.key(0), x, num_divisions=4)
    ens = EnsMLP(num_classes=28, sub_size=64, num_divisions=4, teacher_size=96,
                 family="deit", dtype=jnp.float32)
    cls_t = jnp.zeros((4, 2, 64))
    ens_vars = ens.init(jax.random.key(1), cls_t, cls_t, distill=True, train=True)
    return model, stacked, ens, ens_vars


def test_multivit_stacked_matches_sequential(ens_setup):
    """vmapped division forward == per-division sequential forwards."""
    model, stacked, _, _ = ens_setup
    x = jax.random.normal(jax.random.key(2), (2, 32, 32, 3))
    cls_t, dist_t = multivit_features(model, stacked, x)
    assert cls_t.shape == (4, 2, 64) and dist_t.shape == (4, 2, 64)
    for d in range(4):
        vars_d = jax.tree_util.tree_map(lambda a: a[d], stacked)
        out = model.apply(vars_d, x, features_only=True)
        np.testing.assert_allclose(cls_t[d], out.cls_feat, rtol=2e-5, atol=2e-5)


def test_ensmlp_fusion_order(ens_setup):
    """Fusion must be division-major per batch element (torch.stack(x,1).view)."""
    _, _, ens, ens_vars = ens_setup
    cls_t = jnp.arange(4 * 2 * 64, dtype=jnp.float32).reshape(4, 2, 64)
    out = ens.apply(ens_vars, cls_t, cls_t, distill=True, train=True)
    # check via manual fuse and the same params
    fused = cls_t.transpose(1, 0, 2).reshape(2, 256)
    w = ens_vars["params"]["cls_mlp"]["kernel"]
    b = ens_vars["params"]["cls_mlp"]["bias"]
    np.testing.assert_allclose(out.ens_tokens[0], fused @ w + b, rtol=1e-4)
    assert out.logits.shape == (2, 28)
    np.testing.assert_allclose(out.logits, (out.cls_logits + out.dist_logits) / 2, rtol=1e-5)


def test_ensemble_forward_path(ens_setup):
    model, stacked, ens, ens_vars = ens_setup
    x = jax.random.normal(jax.random.key(3), (2, 32, 32, 3))
    out = ensemble_forward(model, ens, stacked, ens_vars, x)
    assert out.logits.shape == (2, 28)
    assert out.ens_tokens is None  # eval mode: no token outputs


def test_ensemble_division_sharding(ens_setup):
    """Stacked params shard over 'div', batch over 'data' on the 8-device CPU
    mesh; result matches the unsharded forward (SURVEY.md §2.7)."""
    model, stacked, ens, ens_vars = ens_setup
    mesh = M.ensemble_mesh(num_divisions=4)
    assert mesh.shape == {"div": 4, "data": 2}
    x = jax.random.normal(jax.random.key(4), (4, 32, 32, 3))

    stacked_sh = M.shard_division_tree(stacked, mesh)
    ens_sh = M.replicate_tree(ens_vars, mesh)
    x_sh = jax.device_put(x, M.batch_sharding(mesh))

    fwd = jax.jit(lambda sv, ev, xx: ensemble_forward(model, ens, sv, ev, xx).logits)
    # explicit NamedShardings carry the mesh; no context manager needed
    sharded = fwd(stacked_sh, ens_sh, x_sh)
    plain = fwd(stacked, ens_vars, x)
    np.testing.assert_allclose(sharded, plain, rtol=2e-4, atol=2e-4)


def test_stage2_step_trains():
    model = tiny()
    x = jnp.ones((4, 32, 32, 3))
    params = model.init(jax.random.key(0), x)["params"]
    tx = make_optimizer(OptimConfig(lr=1e-3, epochs=2, warmup_epochs=0, cooldown_epochs=0), 10)
    state = TrainState.create(params, tx, use_ema=True)
    step = jax.jit(S.make_stage2_step(model, mixup=MixupConfig(num_classes=7), smoothing=0.1))
    labels = jnp.array([0, 1, 2, 3])
    state2, metrics = step(state, None, x, labels, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
    # params actually moved; EMA moved less
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, state2.params)
    assert max(jax.tree_util.tree_leaves(d)) > 0


def test_dekd_step_trains():
    student = tiny("dedeit")
    teacher = tiny("deit_base_distilled_patch16_224", embed_dim=128, num_heads=8)
    x = jnp.ones((4, 32, 32, 3))
    s_params = student.init(jax.random.key(0), x)["params"]
    t_vars = teacher.init(jax.random.key(1), x)
    tx = make_optimizer(OptimConfig(lr=1e-3, epochs=2, warmup_epochs=0, cooldown_epochs=0), 10)
    state = TrainState.create(s_params, tx)
    step = jax.jit(S.make_dekd_step(student, teacher, gamma=(0.2, 0.1, 0.3),
                                    distillation_type="hard"))
    gates = full_gates(student.cfg)
    labels = jnp.array([0, 1, 2, 3])
    state2, metrics = step(state, t_vars, gates, x, labels, jax.random.key(2))
    for k in ("loss", "cls_loss", "q_loss", "k_loss", "v_loss"):
        assert np.isfinite(float(metrics[k])), k


def test_dekd_step_inter_off_cls_only():
    """distillation_inter=False (engine.py:69 else-branch intent): no QKV
    capture, loss is the cls distillation term alone."""
    student = tiny("dedeit")
    teacher = tiny("deit_base_distilled_patch16_224", embed_dim=128, num_heads=8)
    x = jnp.ones((4, 32, 32, 3))
    s_params = student.init(jax.random.key(0), x)["params"]
    t_vars = teacher.init(jax.random.key(1), x)
    tx = make_optimizer(OptimConfig(lr=1e-3, epochs=2, warmup_epochs=0, cooldown_epochs=0), 10)
    state = TrainState.create(s_params, tx)
    step = jax.jit(S.make_dekd_step(student, teacher, distillation_type="hard",
                                    distillation_inter=False))
    gates = full_gates(student.cfg)
    labels = jnp.array([0, 1, 2, 3])
    state2, metrics = step(state, t_vars, gates, x, labels, jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))
    assert "q_loss" not in metrics and "k_loss" not in metrics
    assert float(metrics["loss"]) == pytest.approx(float(metrics["cls_loss"]), rel=1e-6)
    assert int(state2.step) == 1


def test_ensemble_train_step_two_optimizers(ens_setup):
    model, stacked, ens, ens_vars = ens_setup
    teacher = tiny("deit_base_distilled_patch16_224", embed_dim=96, num_heads=4,
                   num_classes=28, resize_dim=None)
    x = jnp.ones((4, 32, 32, 3))
    t_vars = teacher.init(jax.random.key(5), x, distill_token=True)
    tx = make_optimizer(OptimConfig(lr=1e-3, epochs=2, warmup_epochs=0, cooldown_epochs=0), 10)
    bb_state = TrainState.create(stacked["params"], tx)
    ens_state = TrainState.create(ens_vars["params"], tx)
    step = jax.jit(S.make_ensemble_train_step(model, ens, teacher,
                                              distillation_type="hard"))
    gates = stack_division_gates([full_gates(model.cfg)] * 4)
    labels = jnp.array([0, 1, 2, 3])
    bb2, ens2, metrics = step(bb_state, ens_state, t_vars, gates, x, labels, jax.random.key(6))
    assert np.isfinite(float(metrics["loss"]))
    assert int(bb2.step) == 1 and int(ens2.step) == 1


def test_eval_step_counts():
    model = tiny()
    x = jnp.ones((4, 32, 32, 3))
    variables = model.init(jax.random.key(0), x)
    step = jax.jit(S.make_eval_step(model))
    out = step(variables, None, x, jnp.array([0, 1, 2, 3]))
    assert int(out["count"]) == 4
    assert 0 <= int(out["top1"]) <= int(out["top5"]) <= 4


def test_mixup_cutmix_properties():
    cfg = MixupConfig(num_classes=7, label_smoothing=0.1)
    x = jax.random.uniform(jax.random.key(0), (6, 16, 16, 3))
    y = jnp.array([0, 1, 2, 3, 4, 5])
    xm, tm = mixup_cutmix(jax.random.key(1), x, y, cfg)
    assert xm.shape == x.shape and tm.shape == (6, 7)
    np.testing.assert_allclose(jnp.sum(tm, axis=-1), 1.0, rtol=1e-5)
    # disabled -> smoothed one-hot only
    cfg_off = MixupConfig(mixup_alpha=0.0, cutmix_alpha=0.0, num_classes=7)
    xo, to = mixup_cutmix(jax.random.key(1), x, y, cfg_off)
    np.testing.assert_allclose(xo, x)
    assert float(to[0, 0]) > 0.85


def test_mixup_modes_pair_elem_minmax():
    """timm mode='pair'/'elem' and cutmix_minmax semantics
    (train_subdata.py:125-137)."""
    x = jax.random.uniform(jax.random.key(0), (8, 16, 16, 3))
    y = jnp.arange(8) % 4

    # pair mode: each (i, B-1-i) pair shares lam -> symmetric target mass on
    # the original class; both members mix with the same coefficient
    cfg_p = MixupConfig(num_classes=4, label_smoothing=0.0, mode="pair")
    xp, tp = mixup_cutmix(jax.random.key(3), x, y, cfg_p)
    assert xp.shape == x.shape and tp.shape == (8, 4)
    np.testing.assert_allclose(jnp.sum(tp, axis=-1), 1.0, rtol=1e-5)
    own = tp[jnp.arange(8), y]  # per-sample lam (smoothing 0)
    np.testing.assert_allclose(own, own[::-1], rtol=1e-5)

    # elem mode: per-sample lam, generally NOT symmetric
    cfg_e = MixupConfig(num_classes=4, label_smoothing=0.0, mode="elem")
    xe, te = mixup_cutmix(jax.random.key(4), x, y, cfg_e)
    np.testing.assert_allclose(jnp.sum(te, axis=-1), 1.0, rtol=1e-5)
    own_e = te[jnp.arange(8), y]
    assert not np.allclose(np.asarray(own_e), np.asarray(own_e)[::-1])

    # cutmix_minmax: always cutmix, lam bounded by the [0.2,0.4]-side box ->
    # area in [0.04, 0.16], lam in [0.84, 0.96] (up to integer rounding)
    cfg_m = MixupConfig(mixup_alpha=0.0, cutmix_alpha=0.0,
                        cutmix_minmax=(0.2, 0.4), switch_prob=1.0,
                        num_classes=4, label_smoothing=0.0)
    assert cfg_m.active  # minmax forces cutmix_alpha=1.0 like timm.__init__
    lams = []
    for s in range(8):
        _, tmm = mixup_cutmix(jax.random.key(10 + s), x, y, cfg_m)
        lams.append(float(tmm[0, y[0]]))
    assert all(0.80 <= l <= 0.97 for l in lams), lams
    # boxes vary across draws (not the degenerate Beta path)
    assert max(lams) - min(lams) > 1e-4

    # pair mode rejects odd batches like timm's assert
    import pytest as _pytest
    with _pytest.raises(ValueError):
        mixup_cutmix(jax.random.key(0), x[:5], y[:5], cfg_p)


def test_cosine_schedule_shape():
    cfg = OptimConfig(lr=5e-4, warmup_lr=1e-6, min_lr=1e-5, epochs=20,
                      warmup_epochs=5, cooldown_epochs=10)
    sched = cosine_schedule(cfg, steps_per_epoch=10)
    assert abs(float(sched(0)) - 1e-6) < 1e-7
    # timm warmup_prefix=False: the cosine counts t from 0 INCLUDING warmup,
    # so the first post-warmup step sits on the t/epochs cosine, not at peak
    import math

    def timm_cos(t, total=200):
        return 1e-5 + 0.5 * (5e-4 - 1e-5) * (1 + math.cos(math.pi * t / total))

    assert abs(float(sched(50)) - timm_cos(50)) < 1e-7
    assert abs(float(sched(120)) - timm_cos(120)) < 1e-7
    assert abs(float(sched(199)) - timm_cos(199)) < 1e-7
    assert abs(float(sched(250)) - 1e-5) < 1e-9  # past t_initial: min_lr floor
    # cooldown_epochs must NOT shrink the cosine window (the reference's loop
    # never enters timm's appended cooldown): same schedule with cooldown 0
    cfg_nc = OptimConfig(lr=5e-4, warmup_lr=1e-6, min_lr=1e-5, epochs=20,
                         warmup_epochs=5, cooldown_epochs=0)
    sched_nc = cosine_schedule(cfg_nc, steps_per_epoch=10)
    assert abs(float(sched(120)) - float(sched_nc(120))) < 1e-12
    # LR scaling
    cfg2 = OptimConfig(lr=5e-4, scale_lr_by_batch=True, global_batch=1024)
    assert abs(cfg2.scaled_lr() - 1e-3) < 1e-9


def test_sched_per_epoch_timm_staircase():
    """--sched-per-epoch (VERDICT r3 #9): the reference's per-epoch LR
    trajectory bit-for-bit — timm-0.5.4 CosineLRScheduler(t_in_epochs=True)
    driven by `lr_scheduler.step(epoch)` at the END of epoch `epoch`
    (train_subdata.py:449). Expected values computed here by an independent
    pure-Python simulation of that loop (timm defaults: t_mul=1,
    warmup_prefix=False, cycle_limit=1)."""
    import math

    spe = 10
    cfg = OptimConfig(lr=5e-4, warmup_lr=1e-6, min_lr=1e-5, epochs=20,
                      warmup_epochs=5, cooldown_epochs=10, sched_per_epoch=True)
    sched = cosine_schedule(cfg, steps_per_epoch=spe)

    def timm_get_lr(t):  # cosine_lr.py _get_lr at the reference's settings
        if t < 5:
            return 1e-6 + t * (5e-4 - 1e-6) / 5
        if t >= 20:  # i >= cycle_limit=1
            return 1e-5
        return 1e-5 + 0.5 * (5e-4 - 1e-5) * (1 + math.cos(math.pi * t / 20))

    # epoch 0 runs at the constructor-set warmup_lr; step(e) after epoch e
    # sets epoch e+1's LR to _get_lr(e) — the one-epoch lag
    lr_by_epoch = [1e-6] + [timm_get_lr(e) for e in range(0, 24)]
    for e in range(25):
        for s in (0, spe - 1):  # constant within an epoch (staircase)
            got = float(sched(e * spe + s))
            assert abs(got - lr_by_epoch[e]) < 1e-8, (e, s, got, lr_by_epoch[e])
    # lag quirks pinned: epochs 0 AND 1 both at warmup_lr; peak never reached
    assert float(sched(0)) == float(sched(spe))
    assert max(float(sched(e * spe)) for e in range(25)) < 5e-4
    # warmup_epochs=0: epoch 0 then runs at the base (peak) LR, like timm's
    # constructor leaving the group LR untouched
    cfg0 = OptimConfig(lr=5e-4, min_lr=1e-5, epochs=20, warmup_epochs=0,
                       sched_per_epoch=True)
    assert abs(float(cosine_schedule(cfg0, spe)(0)) - 5e-4) < 1e-8


def test_ensemble_train_step_uses_stochastic_depth():
    """Stage-5 backbones must train with drop-path ACTIVE (the reference sets
    model.train(True) in train_1epoch_ens_disjoint, engine.py:146, on
    backbones built with drop_path=args.drop_path, ensemble_models.py:14):
    with a large drop-path rate, different rngs must give different losses,
    and the eval-mode forward must differ from the train-mode one."""
    from devit_tpu.models.ensemble import EnsMLP, init_multivit

    model = tiny(drop_path_rate=0.9)
    x = jnp.ones((4, 32, 32, 3))
    stacked = init_multivit(model, jax.random.key(0), x, num_divisions=2)
    ens = EnsMLP(num_classes=7, sub_size=model.cfg.embed_dim, num_divisions=2,
                 teacher_size=None, family="deit", dtype=jnp.float32)
    tok = jnp.zeros((2, 4, model.cfg.embed_dim))
    ens_vars = ens.init(jax.random.key(9), tok, tok)
    tx = make_optimizer(OptimConfig(lr=1e-3, epochs=2, warmup_epochs=0,
                                    cooldown_epochs=0), 10)
    bb_state = TrainState.create(stacked["params"], tx)
    ens_state = TrainState.create(ens_vars["params"], tx)
    step = jax.jit(S.make_ensemble_train_step(
        model, ens, mixup=None, smoothing=0.0, distillation_type="none"))
    labels = jnp.array([0, 1, 2, 3])
    losses = []
    for seed in (1, 2, 3):
        _, _, m = step(bb_state, ens_state, None, None, x, labels,
                       jax.random.key(seed))
        losses.append(float(m["loss"]))
    assert len(set(losses)) > 1, f"drop-path inactive: identical losses {losses}"


def test_step_builders_reject_distillation_without_teacher():
    """Distillation without a teacher (or without a token-projection width on
    the fusion head) must fail AT BUILD TIME with a clear message, not at
    trace time with 'NoneType' has no attribute 'apply'."""
    import pytest

    from devit_tpu.configs import get_vit_config
    from devit_tpu.models.ensemble import EnsMLP
    from devit_tpu.models.vit import VisionTransformer
    from devit_tpu.train import steps as S

    cfg = get_vit_config("dedeit", img_size=16, patch_size=8, embed_dim=32,
                         depth=2, num_heads=2, num_classes=5)
    model = VisionTransformer(cfg, dtype=jnp.float32)
    ens = EnsMLP(num_classes=10, sub_size=32, num_divisions=2,
                 teacher_size=64, family="deit", dtype=jnp.float32)
    ens_no_proj = EnsMLP(num_classes=10, sub_size=32, num_divisions=2,
                         teacher_size=None, family="deit", dtype=jnp.float32)

    with pytest.raises(ValueError, match="requires a teacher"):
        S.make_stage2_step(model, None, distillation_type="hard")
    with pytest.raises(ValueError, match="requires a teacher"):
        S.make_ensemble_train_step(model, ens, None, distillation_type="hard")
    with pytest.raises(ValueError, match="teacher_size"):
        S.make_ensemble_train_step(model, ens_no_proj, model,
                                   distillation_type="hard")
    with pytest.raises(ValueError, match="requires a teacher"):
        S.make_cct_ensemble_train_step(model, ens, None,
                                       distillation_type="hard")
    # distillation off: teacher-less builds stay fine
    S.make_stage2_step(model, None, distillation_type="none")
    S.make_ensemble_train_step(model, ens_no_proj, None,
                               distillation_type="none")
