"""Parity tests for the timm create_optimizer / create_scheduler families
(--opt / --sched, reference train_subdata.py:61-98) added for full flag
coverage: sgd/nesterov/momentum/adam vs torch.optim on identical gradient
streams (torch couples L2 into the gradient for these — unlike adamw), and
the step schedule vs an independent simulation of timm-0.5.4
StepLRScheduler (incl. the per-epoch step(epoch) lag mode)."""

import dataclasses
import math
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from devit_tpu.train.optim import (
    OptimConfig, build_schedule, make_optimizer, step_schedule,
)


def _init_params():
    rng = np.random.default_rng(0)
    return {
        "kernel": rng.standard_normal((4, 3)).astype(np.float32),
        "bias": rng.standard_normal((3,)).astype(np.float32),
    }


def _grad_stream(n):
    rng = np.random.default_rng(1)
    return [
        {
            "kernel": rng.standard_normal((4, 3)).astype(np.float32),
            "bias": rng.standard_normal((3,)).astype(np.float32),
        }
        for _ in range(n)
    ]


def _run_ours(opt, wd, grads, lr=0.1, momentum=0.9, betas=(0.9, 0.999)):
    cfg = OptimConfig(lr=lr, weight_decay=wd, opt=opt, momentum=momentum,
                      beta1=betas[0], beta2=betas[1], sched="constant",
                      warmup_epochs=0, cooldown_epochs=0, epochs=1)
    tx = make_optimizer(cfg, steps_per_epoch=1)
    params = jax.tree_util.tree_map(jnp.asarray, _init_params())
    state = tx.init(params)
    for g in grads:
        g = jax.tree_util.tree_map(jnp.asarray, g)
        updates, state = tx.update(g, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    return jax.tree_util.tree_map(np.asarray, params)


def _run_torch(optimizer_ctor, wd, grads):
    init = _init_params()
    kernel = torch.tensor(init["kernel"], requires_grad=True)
    bias = torch.tensor(init["bias"], requires_grad=True)
    # timm add_weight_decay grouping: 1-d / no_weight_decay params get wd=0
    opt = optimizer_ctor([
        {"params": [kernel], "weight_decay": wd},
        {"params": [bias], "weight_decay": 0.0},
    ])
    for g in grads:
        kernel.grad = torch.tensor(g["kernel"])
        bias.grad = torch.tensor(g["bias"])
        opt.step()
    return {"kernel": kernel.detach().numpy(), "bias": bias.detach().numpy()}


@pytest.mark.parametrize("opt,nesterov", [("sgd", True), ("nesterov", True),
                                          ("momentum", False)])
def test_sgd_family_matches_torch(opt, nesterov):
    """--opt sgd/nesterov -> SGD(nesterov=True), --opt momentum ->
    SGD(nesterov=False) (timm optim_factory.py), with coupled L2 on the
    decaying group only."""
    grads = _grad_stream(6)
    ours = _run_ours(opt, wd=0.05, grads=grads)
    ref = _run_torch(
        lambda groups: torch.optim.SGD(groups, lr=0.1, momentum=0.9,
                                       nesterov=nesterov),
        wd=0.05, grads=grads)
    for k in ("kernel", "bias"):
        np.testing.assert_allclose(ours[k], ref[k], rtol=1e-5, atol=1e-6)


def test_sgd_differs_from_momentum():
    grads = _grad_stream(4)
    a = _run_ours("sgd", wd=0.0, grads=grads)
    b = _run_ours("momentum", wd=0.0, grads=grads)
    assert np.abs(a["kernel"] - b["kernel"]).max() > 1e-6


def test_adam_matches_torch_coupled_l2():
    """--opt adam: torch folds weight decay into the gradient BEFORE the
    moment updates (coupled L2) — ours must order add_decayed_weights before
    scale_by_adam, not reuse adamw's decoupled decay."""
    grads = _grad_stream(6)
    ours = _run_ours("adam", wd=0.05, grads=grads, betas=(0.9, 0.99))
    ref = _run_torch(
        lambda groups: torch.optim.Adam(groups, lr=0.1, betas=(0.9, 0.99),
                                        eps=1e-8),
        wd=0.05, grads=grads)
    for k in ("kernel", "bias"):
        np.testing.assert_allclose(ours[k], ref[k], rtol=1e-5, atol=1e-6)
    # and it is genuinely different from the decoupled adamw update
    adamw = _run_ours("adamw", wd=0.05, grads=grads, betas=(0.9, 0.99))
    assert np.abs(ours["kernel"] - adamw["kernel"]).max() > 1e-6


def test_unknown_opt_and_sched_raise():
    with pytest.raises(ValueError, match="--opt 'lamb'"):
        make_optimizer(OptimConfig(opt="lamb"), 10)
    with pytest.raises(ValueError, match="--sched 'plateau'"):
        build_schedule(OptimConfig(sched="plateau"), 10)


def test_step_schedule_smooth():
    """sched='step' default (per-step warmup, per-epoch staircase decay):
    timm StepLRScheduler._get_lr semantics — lr = peak * dr**(epoch//de), no
    min_lr floor, epochs counted from zero including warmup."""
    spe = 10
    cfg = OptimConfig(lr=1e-2, warmup_lr=1e-6, min_lr=1e-5, epochs=10,
                      warmup_epochs=1, decay_epochs=2, decay_rate=0.1,
                      sched="step")
    sched = step_schedule(cfg, spe)
    # mid-warmup: linear per-step ramp
    assert abs(float(sched(5)) - (1e-6 + (1e-2 - 1e-6) * 5 / 10)) < 1e-9
    for epoch, want in [(1, 1e-2), (2, 1e-3), (3, 1e-3), (4, 1e-4), (6, 1e-5),
                        (8, 1e-6)]:  # NO min_lr floor (StepLRScheduler has none)
        got = float(sched(epoch * spe + 3))
        assert abs(got - want) / want < 1e-5, (epoch, got, want)
    # constant within an epoch once past warmup
    assert float(sched(2 * spe)) == float(sched(2 * spe + spe - 1))


def test_step_schedule_per_epoch_lag():
    """--sched step --sched-per-epoch: the reference's step(epoch)-at-end-of-
    epoch lag applies to the step staircase exactly as to cosine: epoch e
    runs at _get_lr(max(e-1, 0))."""
    spe = 4
    cfg = OptimConfig(lr=1e-2, warmup_lr=1e-6, epochs=10, warmup_epochs=2,
                      decay_epochs=3, decay_rate=0.5, sched="step",
                      sched_per_epoch=True)
    sched = build_schedule(cfg, spe)

    def get_lr(t):  # independent timm StepLRScheduler simulation
        if t < 2:
            return 1e-6 + t * (1e-2 - 1e-6) / 2
        return 1e-2 * 0.5 ** (t // 3)

    for e in range(12):
        want = get_lr(max(e - 1, 0))
        for s in (0, spe - 1):
            got = float(sched(e * spe + s))
            assert abs(got - want) / max(want, 1e-12) < 1e-6, (e, got, want)


def test_constant_schedule_and_dispatch():
    cfg = OptimConfig(lr=3e-3, sched="constant")
    sched = build_schedule(cfg, 10)
    assert float(sched(0)) == float(sched(999)) == pytest.approx(3e-3)
    # cosine dispatch unchanged
    cfg2 = OptimConfig(lr=3e-3, sched="cosine", warmup_epochs=0, epochs=10)
    assert abs(float(build_schedule(cfg2, 10)(0)) - 3e-3) < 1e-8


def test_optim_config_from_args_betas_and_families():
    from devit_tpu.cli.common import optim_config_from_args

    args = types.SimpleNamespace(
        lr=1e-3, min_lr=1e-5, warmup_lr=1e-6, warmup_epochs=0,
        cooldown_epochs=0, epochs=2, weight_decay=0.05, opt_eps=1e-8,
        clip_grad=None, scale_lr=False, sched_per_epoch=False,
        opt="sgd", momentum=0.8, opt_betas=[0.5, 0.9], sched="step",
        decay_epochs=7.0, decay_rate=0.3,
    )
    cfg = optim_config_from_args(args, 256)
    assert (cfg.opt, cfg.momentum, cfg.sched) == ("sgd", 0.8, "step")
    assert (cfg.beta1, cfg.beta2) == (0.5, 0.9)
    assert (cfg.decay_epochs, cfg.decay_rate) == (7.0, 0.3)
    args.opt_betas = [0.5]
    with pytest.raises(ValueError, match="--opt-betas"):
        optim_config_from_args(args, 256)


def test_lr_noise_bit_parity():
    """--lr-noise under --sched-per-epoch: per-epoch multiplicative noise
    from torch.Generator(seed + t) with the rejection loop and the one-epoch
    step(epoch) lag — pinned against an independent simulation of
    timm-0.5.4 Scheduler._add_noise + the reference's end-of-epoch step."""
    from devit_tpu.train.optim import build_schedule as bs

    spe = 3
    cfg = OptimConfig(lr=1e-2, warmup_lr=1e-6, min_lr=1e-5, epochs=10,
                      warmup_epochs=2, sched="cosine", sched_per_epoch=True,
                      lr_noise=(0.3, 0.8), lr_noise_pct=0.67,
                      lr_noise_std=1.0, seed=7)
    sched = bs(cfg, spe)

    def get_lr(t):
        if t < 2:
            return 1e-6 + t * (1e-2 - 1e-6) / 2
        if t >= 10:
            return 1e-5
        return 1e-5 + 0.5 * (1e-2 - 1e-5) * (1 + math.cos(math.pi * t / 10))

    def noise(t):  # timm _add_noise, independent re-implementation
        if not (0.3 * 10 <= t < 0.8 * 10):
            return 0.0
        g = torch.Generator()
        g.manual_seed(7 + t)
        while True:
            # NO noise_std multiply: timm-0.5.4 _add_noise stores noise_std
            # but never uses it — the raw randn is tested against pct
            n = torch.randn(1, generator=g).item()
            if abs(n) < 0.67:
                return n

    # epoch 0: constructor value (un-noised); epoch e>=1: step(e-1)'s value
    for e in range(12):
        want = get_lr(0) if e == 0 else get_lr(e - 1) * (1 + noise(e - 1))
        got = float(sched(e * spe + 1))
        assert abs(got - want) / max(abs(want), 1e-12) < 1e-6, (e, got, want)
    # inside the range the noise must actually bite
    assert float(sched(5 * spe)) != pytest.approx(get_lr(4), rel=1e-9)
    # --lr-noise-std is accepted-and-inert exactly as in timm (dead there)
    cfg_std = dataclasses.replace(cfg, lr_noise_std=5.0)
    sched_std = bs(cfg_std, spe)
    for e in range(12):
        assert float(sched_std(e * spe)) == float(sched(e * spe))
    # single-value range form: t >= n*epochs
    cfg2 = OptimConfig(lr=1e-2, epochs=10, warmup_epochs=0, sched="step",
                       decay_epochs=4, decay_rate=0.5, sched_per_epoch=True,
                       lr_noise=(0.5,), seed=3)
    sched2 = bs(cfg2, spe)
    for e, t in [(3, 2), (9, 8)]:
        base = 1e-2 * 0.5 ** (t // 4)
        factor = 1.0
        if t >= 5:
            g = torch.Generator(); g.manual_seed(3 + t)
            while True:
                n = torch.randn(1, generator=g).item()
                if abs(n) < 0.67:
                    break
            factor = 1 + n
        assert float(sched2(e * spe)) == pytest.approx(base * factor, rel=1e-6)


def test_lr_noise_rejected_without_per_epoch():
    with pytest.raises(ValueError, match="--lr-noise"):
        build_schedule(OptimConfig(sched="cosine", lr_noise=(0.4,)), 10)


def test_cli_accepts_data_set_alias_and_inat_category():
    from devit_tpu.cli.__main__ import build_parser

    p = build_parser()
    args = p.parse_args(["train_sub", "--data-set", "INAT",
                         "--inat-category", "kingdom",
                         "--opt", "momentum", "--sched", "step",
                         "--decay-epochs", "20", "--dr", "0.5"])
    assert args.dataset == "INAT"
    assert args.inat_category == "kingdom"
    assert (args.opt, args.sched) == ("momentum", "step")
    assert (args.decay_epochs, args.decay_rate) == (20.0, 0.5)


def test_warmup_schedules_match_reference_module():
    """warmup_{constant,linear,cosine}_schedule vs the reference's own
    utils/scheduler.py LambdaLR classes (dead code in the reference, ported
    for surface completeness), stepped through a full run including the
    post-t_total clamp and a non-default cycles value."""
    import sys

    from ref_shim.loader import REFERENCE
    from devit_tpu.train.optim import (
        warmup_constant_schedule, warmup_cosine_schedule, warmup_linear_schedule,
    )

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import utils.scheduler as ref_sched

    base_lr, warmup, t_total = 0.3, 5, 20

    def ref_trajectory(make):
        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
        sch = make(opt)
        out = []
        for _ in range(t_total + 4):  # past t_total: clamp behavior
            out.append(sch.get_last_lr()[0])
            sch.step()
        return np.array(out)

    cases = [
        (warmup_constant_schedule(base_lr, warmup),
         lambda o: ref_sched.WarmupConstantSchedule(o, warmup)),
        (warmup_linear_schedule(base_lr, warmup, t_total),
         lambda o: ref_sched.WarmupLinearSchedule(o, warmup, t_total)),
        (warmup_cosine_schedule(base_lr, warmup, t_total),
         lambda o: ref_sched.WarmupCosineSchedule(o, warmup, t_total)),
        (warmup_cosine_schedule(base_lr, warmup, t_total, cycles=1.0),
         lambda o: ref_sched.WarmupCosineSchedule(o, warmup, t_total, cycles=1.0)),
    ]
    for ours_fn, ref_make in cases:
        ref = ref_trajectory(ref_make)
        ours = np.array([float(ours_fn(t)) for t in range(t_total + 4)])
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-8)
