"""Host-side epoch orchestration shared by all training stages.

Parity surface: the per-epoch skeleton of train_subdata.main (epoch loop
:441-499 — sampler.set_epoch, train epoch, per-epoch temp checkpoint, eval,
best-accuracy checkpoint, jsonl stats) and the NaN guard (engine.py:119-121 —
the reference sys.exit(1)s; we raise).
"""

from __future__ import annotations

import json
import math
import os
import time
from typing import Callable, Dict, Iterable, Optional

import jax

from devit_tpu.train.meters import MetricLogger


class NonFiniteLossError(RuntimeError):
    pass


def run_eval(
    eval_step: Callable, variables, gates, batches: Iterable, *, prepare=None
) -> Dict[str, float]:
    """Aggregate summed counters over the val set -> {'acc1','acc5','loss'}.

    The ragged drop_last=False tail batch is padded to the steady batch shape
    (data/datasets.pad_batch_to_steady; labels -1 are excluded from every
    counter by eval_counters) so each val geometry compiles exactly ONE eval
    program — an odd-shaped tail costs a 30-90 s tunnel compile per stage
    otherwise (VERDICT r2 weak #4)."""
    from devit_tpu.data.datasets import pad_batch_to_steady

    totals = {"loss_sum": 0.0, "top1": 0, "top5": 0, "count": 0}
    batch_size = None
    for images, labels in batches:
        images, labels, batch_size, _ = pad_batch_to_steady(images, labels,
                                                            batch_size)
        if prepare is not None:
            images = prepare(images)
        out = jax.device_get(eval_step(variables, gates, images, labels))
        for k in totals:
            totals[k] += float(out[k])
    n = max(totals["count"], 1)
    return {
        "acc1": 100.0 * totals["top1"] / n,
        "acc5": 100.0 * totals["top5"] / n,
        "loss": totals["loss_sum"] / n,
    }


def train_epoch(
    step_fn: Callable,
    carry,
    batches: Iterable,
    rng,
    *,
    epoch: int,
    log_fn=print,
    print_freq: int = 10,
    nan_abort: bool = True,
):
    """One epoch. `step_fn(carry, images, labels, rng) -> (carry, metrics)`.
    `carry` is whatever state tuple the stage threads through.

    The metrics device_get (and with it the NaN guard, engine.py:119-121)
    lags ONE step behind the dispatch: step i+1 is enqueued before step i's
    metrics are pulled, so host batch assembly and the augment dispatch
    overlap device compute instead of serializing on the per-step sync. A
    non-finite loss therefore aborts one step later than the reference —
    same outcome, one extra (discarded) step of work."""
    logger = MetricLogger(log_fn=log_fn)
    header = f"Epoch: [{epoch}]"

    def pull(metrics):
        host = {k: float(v) for k, v in jax.device_get(metrics).items()}
        if nan_abort and not math.isfinite(host.get("loss", 0.0)):
            raise NonFiniteLossError(f"Loss is {host.get('loss')}, stopping training")
        logger.update(**host)

    pending = None
    for i, (images, labels) in enumerate(logger.log_every(batches, print_freq, header)):
        rng, sub = jax.random.split(rng)
        carry, metrics = step_fn(carry, images, labels, sub)
        if pending is not None:
            pull(pending)
        pending = metrics
    if pending is not None:
        pull(pending)
    return carry, logger.averages(), rng


def fit(
    *,
    carry,
    step_fn: Callable,
    train_batches_fn: Callable[[int], Iterable],
    eval_fn: Callable[[object], Dict[str, float]],
    epochs: int,
    rng,
    output_dir: Optional[str] = None,
    log_fn=print,
    save_state_fn: Optional[Callable] = None,
    start_epoch: int = 0,
    profile_dir: Optional[str] = None,
    tensorboard: bool = False,
):
    """Standard stage driver: epoch loop + eval + best checkpointing + stats.

    - train_batches_fn(epoch) -> iterable of (images, labels)
    - eval_fn(carry) -> metrics dict with 'acc1'
    - save_state_fn(path, carry, epoch) persists resumable state
    - profile_dir: if set, the first trained epoch runs under a jax.profiler
      trace (SURVEY.md §5.1) and HBM stats are logged after it
    """
    from devit_tpu.io.checkpoint import wait_for_checkpoints
    from devit_tpu.runtime import is_main_process

    best_acc = -1.0
    # multihost: file artifacts (stats JSONL, result.txt, TB) only on the
    # main process (reference rank-gated I/O, dist_utils.py:206-212);
    # save_state_fn itself stays UNgated — make_saver decides per format
    # (msgpack: main only; orbax: collective across processes)
    main = is_main_process()
    stats_path = (os.path.join(output_dir, "log_stats.txt")
                  if output_dir and main else None)
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
    tb_writer = None
    if tensorboard and output_dir and main:
        # reference parity: TensorBoard scalars to output_dir
        # (train_subdata.py:437,460-472; tags Train/*, Test/Top1|Top5|loss).
        # Opt-in (--tensorboard): the JSONL artifacts are always written and
        # are the primary record here
        from torch.utils.tensorboard import SummaryWriter

        tb_writer = SummaryWriter(log_dir=output_dir)
    try:
        carry, best_acc = _fit_epochs(
            carry, step_fn, train_batches_fn, eval_fn, epochs,
            rng, output_dir, log_fn, save_state_fn, start_epoch, profile_dir,
            stats_path, best_acc, tb_writer, main_process=main)
    finally:
        if tb_writer is not None:
            tb_writer.close()
        # runs on EVERY exit path (incl. NonFiniteLossError / Ctrl-C): orbax
        # surfaces background-commit failures only at the next save or
        # wait_until_finished — skipping this on error would swallow a
        # checkpoint-write failure and leave the .new unpromoted
        wait_for_checkpoints()
    return carry, best_acc


def _fit_epochs(carry, step_fn, train_batches_fn, eval_fn, epochs, rng,
                output_dir, log_fn, save_state_fn, start_epoch, profile_dir,
                stats_path, best_acc, tb_writer=None, main_process=True):
    import contextlib

    from devit_tpu.utils_profile import device_memory_stats, trace

    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        profiling = profile_dir is not None and epoch == start_epoch
        ctx = trace(profile_dir) if profiling else contextlib.nullcontext()
        # per-epoch rng via fold_in (not threaded across epochs) so a resume
        # from epoch k replays exactly the keys the uninterrupted run used
        with ctx:
            carry, train_stats, _ = train_epoch(
                step_fn, carry, train_batches_fn(epoch),
                jax.random.fold_in(rng, epoch), epoch=epoch, log_fn=log_fn
            )
        if profiling:
            mem = device_memory_stats()
            log_fn(f"profiler trace -> {profile_dir}" +
                   (f" (HBM: {mem})" if mem else ""))
        if output_dir and save_state_fn is not None:
            save_state_fn(os.path.join(output_dir, "checkpoint_temp.msgpack"), carry, epoch)
        eval_stats = eval_fn(carry)
        log_fn(
            f"epoch {epoch}: train loss {train_stats.get('loss', float('nan')):.4f} "
            f"val acc1 {eval_stats['acc1']:.2f} acc5 {eval_stats['acc5']:.2f} "
            f"({time.time() - t0:.1f}s)"
        )
        if eval_stats["acc1"] > best_acc:
            best_acc = eval_stats["acc1"]
            if output_dir and save_state_fn is not None:
                save_state_fn(os.path.join(output_dir, "checkpoint.msgpack"), carry, epoch)
            if output_dir and main_process:
                with open(os.path.join(output_dir, "result.txt"), "a") as f:
                    f.write(json.dumps({"epoch": epoch, "best_acc1": best_acc}) + "\n")
        if stats_path:
            with open(stats_path, "a") as f:
                f.write(json.dumps(
                    {"epoch": epoch, **{f"train_{k}": v for k, v in train_stats.items()},
                     **{f"test_{k}": v for k, v in eval_stats.items()}}) + "\n")
        if tb_writer is not None:
            # reference tag layout (train_subdata.py:461-472): every train
            # metric under Train/ (loss, lr, cls_loss/token_loss when
            # present), eval under Test/ with Top1/Top5
            for k, v in train_stats.items():
                tb_writer.add_scalar(f"Train/{k}", float(v), epoch)
            tags = {"acc1": "Top1", "acc5": "Top5"}
            for k, v in eval_stats.items():
                tb_writer.add_scalar(f"Test/{tags.get(k, k)}", float(v), epoch)
            tb_writer.flush()
    return carry, best_acc
