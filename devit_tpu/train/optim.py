"""Optimizer / schedule / EMA factory — TPU-native equivalents of the timm
`create_optimizer` + `create_scheduler` + `ModelEma` stack the reference leans
on (SURVEY.md §1 "External load-bearing dependency").

- AdamW with the reference defaults (opt='adamw', eps=1e-8; train_subdata.py:61-71)
- cosine schedule with linear warmup (sched='cosine', warmup_lr=1e-6,
  min_lr=1e-5, warmup 5 epochs, cooldown 10; train_subdata.py:74-98). The
  reference steps its scheduler per epoch; we schedule per step (smoother,
  standard in JAX) — documented deviation.
- linear LR scaling lr * global_batch / 512 (train_subdata.py:405)
- weight-decay mask: only matrix-like kernels decay; pos_embed/cls/dist tokens,
  biases and norm scales are excluded (de_vit.py:226-228 no_weight_decay +
  timm's 1-d exclusion)
- EMA of params with decay 0.99996 (train_subdata.py:57)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import optax


@dataclasses.dataclass
class OptimConfig:
    lr: float = 5e-4
    min_lr: float = 1e-5
    warmup_lr: float = 1e-6
    warmup_epochs: int = 5
    cooldown_epochs: int = 10
    epochs: int = 100
    weight_decay: float = 0.05
    opt_eps: float = 1e-8
    beta1: float = 0.9
    beta2: float = 0.999
    clip_grad: Optional[float] = None
    scale_lr_by_batch: bool = False
    global_batch: int = 512
    # timm create_optimizer family (--opt, train_subdata.py:61-70):
    # adamw (reference default) / adam / sgd / nesterov / momentum.
    # torch couples L2 into the gradient for adam+sgd (decoupled only for
    # adamw) — reproduced below. Unknown names are rejected loudly.
    opt: str = "adamw"
    momentum: float = 0.9
    # timm create_scheduler family (--sched, train_subdata.py:74): cosine
    # (reference default) / step (StepLRScheduler: decay_rate**(t//decay_epochs))
    # / constant. plateau needs eval-metric feedback and is rejected loudly.
    sched: str = "cosine"
    decay_epochs: float = 30.0
    decay_rate: float = 0.1
    # timm LR noise (--lr-noise pct [pct], train_subdata.py:78-83): per-epoch
    # multiplicative noise drawn from torch.Generator(seed + t) — an
    # inherently per-epoch construct, so it is only supported together with
    # sched_per_epoch (where it is reproduced bit-exactly); the smooth
    # per-step default rejects it loudly.
    lr_noise: Optional[tuple] = None  # epoch-percentage range, 1 or 2 values
    lr_noise_pct: float = 0.67
    # accepted-and-inert exactly as in timm-0.5.4: its _add_noise stores
    # noise_std but the normal branch never uses it (see _timm_noise_factors)
    lr_noise_std: float = 1.0
    seed: int = 42  # timm noise_seed = getattr(args, 'seed', 42)
    # bit-parity mode: reproduce the reference's PER-EPOCH staircase exactly,
    # including the one-epoch lag of `lr_scheduler.step(epoch)` being called
    # at the END of epoch `epoch` (train_subdata.py:449) — see
    # timm_epoch_schedule. Default False: the smooth per-step cosine.
    sched_per_epoch: bool = False

    def scaled_lr(self) -> float:
        if self.scale_lr_by_batch:
            return self.lr * self.global_batch / 512.0
        return self.lr


def cosine_schedule(cfg: OptimConfig, steps_per_epoch: int) -> optax.Schedule:
    """timm-0.5.4 CosineLRScheduler semantics, as the reference builds it
    (create_scheduler with sched='cosine', train_subdata.py:410): linear
    warmup warmup_lr -> lr over warmup_epochs, then
    min_lr + 0.5*(lr - min_lr)*(1 + cos(pi * t/epochs)) with t counting from
    zero INCLUDING the warmup span (timm's warmup_prefix=False default),
    floored at min_lr from t = epochs on. timm's cooldown_epochs only
    extends the nominal run length PAST t_initial (held at min_lr) — the
    reference loop runs range(args.epochs) (train_subdata.py:441) and never
    enters it — so cooldown does NOT shrink the cosine window. Documented
    deviation: per-STEP smooth schedule instead of the reference's
    per-epoch staircase (and its step(epoch) one-epoch-lag quirk)."""
    import jax.numpy as jnp

    if cfg.sched_per_epoch:
        return timm_epoch_schedule(cfg, steps_per_epoch)

    peak = cfg.scaled_lr()
    warmup_steps = cfg.warmup_epochs * steps_per_epoch
    total_steps = max(cfg.epochs * steps_per_epoch, warmup_steps + 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = cfg.warmup_lr + (peak - cfg.warmup_lr) * step / max(warmup_steps, 1)
        progress = jnp.minimum(step / total_steps, 1.0)
        cos = cfg.min_lr + 0.5 * (peak - cfg.min_lr) * (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def step_schedule(cfg: OptimConfig, steps_per_epoch: int) -> optax.Schedule:
    """timm-0.5.4 StepLRScheduler semantics (sched='step', step_lr.py:30-38):
    warmup as for cosine, then lr = peak * decay_rate ** (t // decay_epochs)
    with t in epochs counting FROM ZERO INCLUDING the warmup span, and no
    min_lr floor (StepLRScheduler has none). The decay itself is a per-epoch
    staircase by definition; like the smooth cosine default, the warmup here
    ramps per STEP (documented deviation; --sched-per-epoch reproduces the
    per-epoch warmup + the step(epoch) lag bit-exactly)."""
    import jax.numpy as jnp

    peak = cfg.scaled_lr()
    warmup_steps = cfg.warmup_epochs * steps_per_epoch
    decay_t = max(float(cfg.decay_epochs), 1.0)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = cfg.warmup_lr + (peak - cfg.warmup_lr) * step / max(warmup_steps, 1)
        epoch = jnp.floor(step / steps_per_epoch)
        dec = peak * cfg.decay_rate ** jnp.floor(epoch / decay_t)
        return jnp.where(step < warmup_steps, warm, dec)

    return schedule


def warmup_constant_schedule(base_lr: float, warmup_steps: int) -> optax.Schedule:
    """Reference utils/scheduler.py WarmupConstantSchedule (:15-28): linear
    0->base_lr over warmup_steps, then constant. (Dead code in the reference —
    an inherited ViT-pytorch module no entry script imports — ported for a
    complete library surface; parity-pinned against the module itself.)"""
    import jax.numpy as jnp

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return base_lr * jnp.where(
            step < warmup_steps, step / jnp.maximum(1.0, warmup_steps), 1.0
        )

    return schedule


def warmup_linear_schedule(base_lr: float, warmup_steps: int, t_total: int) -> optax.Schedule:
    """Reference utils/scheduler.py WarmupLinearSchedule (:30-43): linear
    warmup then linear decay to 0 at t_total (clamped at 0 beyond)."""
    import jax.numpy as jnp

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        decay = jnp.maximum(
            0.0, (t_total - step) / jnp.maximum(1.0, t_total - warmup_steps)
        )
        return base_lr * jnp.where(step < warmup_steps, warm, decay)

    return schedule


def warmup_cosine_schedule(
    base_lr: float, warmup_steps: int, t_total: int, cycles: float = 0.5
) -> optax.Schedule:
    """Reference utils/scheduler.py WarmupCosineSchedule (:46-64): linear
    warmup then cosine decay over the remaining steps; `cycles` scales the
    cosine frequency (0.5 = one half-period, 1 -> 0), max(0, .) clamped."""
    import jax.numpy as jnp

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(1.0, t_total - warmup_steps)
        cos = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * cycles * 2.0 * progress)))
        return base_lr * jnp.where(step < warmup_steps, warm, cos)

    return schedule


def build_schedule(cfg: OptimConfig, steps_per_epoch: int) -> optax.Schedule:
    """Dispatch on cfg.sched the way timm create_scheduler does
    (train_subdata.py:74, scheduler_factory.py). Unsupported scheduler names
    fail loudly rather than silently training on the wrong trajectory (same
    policy as parse_ra_string): plateau needs eval-metric feedback that a
    pure step->lr function cannot express."""
    if cfg.lr_noise is not None and not (
        cfg.sched_per_epoch and cfg.sched in ("cosine", "step")
    ):
        raise ValueError(
            "--lr-noise is timm's per-epoch noise (applied in step(epoch), "
            "scheduler.py _add_noise) — use it with --sched-per-epoch and "
            "sched cosine|step, where it is reproduced bit-exactly"
        )
    if cfg.sched == "cosine":
        return cosine_schedule(cfg, steps_per_epoch)
    if cfg.sched == "step":
        if cfg.sched_per_epoch:
            return timm_epoch_schedule(cfg, steps_per_epoch)
        return step_schedule(cfg, steps_per_epoch)
    if cfg.sched == "constant":
        peak = cfg.scaled_lr()
        return lambda step: peak
    raise ValueError(
        f"--sched {cfg.sched!r} is not implemented (supported: cosine, step, "
        "constant). 'plateau' requires eval-metric feedback — and is BROKEN "
        "in the reference as committed: every stage calls "
        "lr_scheduler.step(epoch) with no metric (train_subdata.py:449), so "
        "timm-0.5.4 PlateauLRScheduler.step forwards metric=None into torch "
        "ReduceLROnPlateau.step, which crashes on float(None) right after "
        "warmup. 'tanh'/'poly' are not used by the reference."
    )


def timm_epoch_schedule(cfg: OptimConfig, steps_per_epoch: int) -> optax.Schedule:
    """The reference's LR trajectory BIT-EXACTLY (--sched-per-epoch): timm-0.5.4
    CosineLRScheduler with t_in_epochs=True, stepped per epoch, INCLUDING the
    one-epoch lag — every reference stage calls `lr_scheduler.step(epoch)` at
    the END of epoch `epoch` (train_subdata.py:449, distill_sub.py /
    ensemble.py / shrink.py likewise), so epoch e trains at the value computed
    for t = e-1, and epoch 0 trains at the constructor-set value.

    timm-0.5.4 semantics reproduced (scheduler.py Scheduler.step +
    cosine_lr.py _get_lr, defaults t_mul=1, warmup_prefix=False,
    cycle_limit=1 from scheduler_factory.py):
      __init__: warmup_t>0 -> groups set to warmup_lr_init  (epoch 0's LR)
      _get_lr(t): t < warmup_t -> warmup_lr_init + t*(peak-warmup_lr)/warmup_t
                  warmup_t <= t < t_initial ->
                      min_lr + 0.5*(peak-min_lr)*(1+cos(pi*t/t_initial))
                      (t counts FROM ZERO INCLUDING warmup: warmup_prefix=False)
                  t >= t_initial -> min_lr  (i >= cycle_limit=1)
    With warmup_t>0, the constructor value equals _get_lr(0), so the lagged
    trajectory is uniformly lr(epoch e) = _get_lr(max(e-1, 0)) — which also
    holds at warmup_t=0 where _get_lr(0) = peak = the constructor base value.
    Consequences the smooth schedule does not have: epochs 0 AND 1 both run
    at warmup_lr; the LR is constant within an epoch; the exact peak is never
    reached (the staircase jumps from the last warmup value into the cosine)."""
    import jax.numpy as jnp

    peak = cfg.scaled_lr()
    wt = cfg.warmup_epochs
    t_initial = max(cfg.epochs, 1)

    def get_lr(t):  # timm _get_lr, vectorized
        t = jnp.asarray(t, jnp.float32)
        warm = cfg.warmup_lr + t * (peak - cfg.warmup_lr) / max(wt, 1)
        if cfg.sched == "step":
            # timm StepLRScheduler._get_lr: no min_lr floor, no cycle end
            decayed = peak * cfg.decay_rate ** jnp.floor(
                t / max(float(cfg.decay_epochs), 1.0))
        else:
            decayed = cfg.min_lr + 0.5 * (peak - cfg.min_lr) * (
                1.0 + jnp.cos(jnp.pi * t / t_initial))
            decayed = jnp.where(t >= t_initial, cfg.min_lr, decayed)
        return jnp.where(t < wt, warm, decayed)

    if cfg.lr_noise is None:

        def schedule(step):
            epoch = jnp.asarray(step, jnp.int32) // steps_per_epoch
            return get_lr(jnp.maximum(epoch - 1, 0))

        return schedule

    # timm _add_noise reproduced bit-exactly (scheduler.py, noise_type
    # 'normal'): at step(t) the group LRs become lr*(1+noise(t)) where
    # noise(t) is rejection-sampled |N(0,std)| < pct from
    # torch.Generator(noise_seed + t); noise_range = [n*epochs for n in
    # lr_noise] (scalar if one value), applied for range[0] <= t < range[1]
    # or t >= range (scalar). Epoch 0 runs at the un-noised constructor
    # value; epoch e>=1 at get_lr(e-1)*(1+noise(e-1)) — the step(epoch) lag.
    factors = jnp.asarray(
        _timm_noise_factors(cfg, n_epochs=max(cfg.epochs + cfg.cooldown_epochs, 1) + 2)
    )

    def schedule(step):
        epoch = jnp.asarray(step, jnp.int32) // steps_per_epoch
        t = jnp.maximum(epoch - 1, 0)
        f = factors[jnp.minimum(t, factors.shape[0] - 1)]
        return get_lr(t) * jnp.where(epoch >= 1, f, 1.0)

    return schedule


def _timm_noise_factors(cfg: OptimConfig, n_epochs: int):
    """Per-epoch (1 + noise(t)) table, t = 0..n_epochs-1, matching timm-0.5.4
    Scheduler._add_noise with noise_type='normal' and
    noise_seed = getattr(args, 'seed', 42) (scheduler_factory.py:34-46)."""
    import numpy as np
    import torch

    rng = [n * cfg.epochs for n in cfg.lr_noise]
    lo, hi = (rng[0], rng[1]) if len(rng) > 1 else (rng[0], float("inf"))
    out = np.ones(n_epochs, dtype=np.float64)
    for t in range(n_epochs):
        if not (lo <= t < hi):
            continue
        g = torch.Generator()
        g.manual_seed(cfg.seed + t)
        while True:  # timm's rejection loop, verbatim semantics. NOTE:
            # noise_std is NOT applied — timm-0.5.4 _add_noise stores
            # noise_std but its normal branch never multiplies by it (the
            # raw randn is rejection-tested against noise_pct directly);
            # --lr-noise-std is accepted-and-inert here exactly as there.
            noise = torch.randn(1, generator=g).item()
            if abs(noise) < cfg.lr_noise_pct:
                break
        out[t] = 1.0 + noise
    return out


def _decay_mask(params):
    """True where weight decay applies: kernels (matrices; with nn.scan stacking
    they are >=2-D per layer slice) — not biases, norm scales, or the
    pos_embed/cls_token/dist_token parameters."""
    flat = jax.tree_util.tree_map_with_path(
        lambda path, p: _decays(path, p), params
    )
    return flat


_NO_DECAY_NAMES = {"pos_embed", "cls_token", "dist_token", "bias", "scale"}


def _decays(path, p) -> bool:
    names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
    if any(n in _NO_DECAY_NAMES for n in names):
        return False
    return p.ndim >= 2


def make_optimizer(
    cfg: OptimConfig, steps_per_epoch: int, schedule: Optional[optax.Schedule] = None
) -> optax.GradientTransformation:
    sched = schedule if schedule is not None else build_schedule(cfg, steps_per_epoch)
    chain = []
    if cfg.clip_grad is not None:
        chain.append(optax.clip_by_global_norm(cfg.clip_grad))
    opt = cfg.opt.lower()
    if opt == "adamw":
        chain.append(
            optax.adamw(
                learning_rate=sched,
                b1=cfg.beta1,
                b2=cfg.beta2,
                eps=cfg.opt_eps,
                weight_decay=cfg.weight_decay,
                mask=_decay_mask,
            )
        )
    elif opt in ("adam", "sgd", "nesterov", "momentum"):
        # torch semantics for these: weight decay is COUPLED L2 folded into
        # the gradient BEFORE the moment updates (torch/optim/{adam,sgd}.py),
        # unlike adamw's decoupled decay — so add_decayed_weights goes FIRST.
        # timm's add_weight_decay param grouping == our _decay_mask (1-d and
        # no_weight_decay params get wd=0).
        if cfg.weight_decay:
            chain.append(optax.add_decayed_weights(cfg.weight_decay, mask=_decay_mask))
        if opt == "adam":
            chain.append(optax.adam(sched, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.opt_eps))
        else:
            # timm create_optimizer: 'sgd'/'nesterov' -> SGD(nesterov=True),
            # 'momentum' -> SGD(nesterov=False) (optim_factory.py)
            chain.append(
                optax.sgd(
                    sched,
                    momentum=cfg.momentum if cfg.momentum else None,
                    nesterov=opt in ("sgd", "nesterov"),
                )
            )
    else:
        raise ValueError(
            f"--opt {cfg.opt!r} is not implemented (supported: adamw, adam, "
            "sgd, nesterov, momentum)"
        )
    return optax.chain(*chain)


def ema_update(ema_params, params, decay: float = 0.99996):
    """timm ModelEma semantics (train_subdata.py:57, :278-279)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema_params, params
    )
