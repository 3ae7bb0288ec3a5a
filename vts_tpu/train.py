"""Training driver (reference train.py:20-215).

Epoch loop: per-iter fused train step, periodic loss logging/HTML, periodic
``latest`` checkpointing; per-epoch validation metrics with the reference's
**best-checkpoint vote** — save "best" when at least half of the non-train
metrics improve (lower-better {LPIPS, AE, MSE, SIFID}, higher-better
{PSNR, SSIM}; reference train.py:162-193) — and linear LR decay.

Run:  python -m vts_tpu.train --model sinskit --dataroot synthetic://demo --data_len 3 ...
"""

from __future__ import annotations

import time
from typing import Dict

from .config import TrainOptions
from .data import create_dataset
from .models import create_model
from .utils.visualizer import Visualizer

LOWER_BETTER = ("LPIPS", "AE", "MSE", "SIFID")
HIGHER_BETTER = ("PSNR", "SSIM")


def metric_improved(name: str, new: float, old: float) -> bool:
    if any(t in name for t in LOWER_BETTER):
        return new < old
    if any(t in name for t in HIGHER_BETTER):
        return new > old
    return False


def best_vote(metrics: Dict[str, float], best: Dict[str, float]) -> bool:
    """True when at least ``total // 2`` of the non-train metrics improved —
    floor division exactly like the reference (train.py:190), so with an odd
    metric count 3/7 improvements already wins the vote."""
    names = [k for k in metrics if not k.startswith("metric_train_")]
    if not names:
        return False
    improved = sum(
        1 for k in names
        if k not in best or metric_improved(k, metrics[k], best[k]))
    return improved >= len(names) // 2


# --anneal_set whitelist: keys the fused step bakes in at TRACE time (plus
# batch_size, which the DataLoader re-chunks from its per-sample device cache
# with no re-upload).  Anything else (network arch, loss weights that alter
# the optimization problem, data geometry) is refused: an anneal must keep
# the training math per-sample identical within each phase.
_ANNEAL_KEYS = {
    "lpips_crop": int,
    "batch_size": int,
    "remat_g": str,
    "lpips_remat": str,
    "lpips_fold_axis": str,
    "lpips_head": str,
}


def apply_anneal(opt, spec: str) -> Dict[str, object]:
    """Parse ``--anneal_set`` ("k=v,k=v") and apply it to ``opt``; returns the
    changes.  Validation mirrors the model-side checks the __init__ already
    ran on the phase-1 values (sinskit.py --lpips_crop multiple-of-16)."""
    changed: Dict[str, object] = {}
    for item in (s.strip() for s in spec.split(",")):
        if not item:
            continue
        key, sep, val = item.partition("=")
        key = key.strip()
        if not sep or key not in _ANNEAL_KEYS:
            raise ValueError(
                f"--anneal_set: bad entry {item!r} (keys: "
                f"{sorted(_ANNEAL_KEYS)})")
        changed[key] = _ANNEAL_KEYS[key](val.strip())
    if changed.get("lpips_crop", 0) % 16:
        raise ValueError("--anneal_set: lpips_crop must be 0 or a multiple of 16")
    if changed.get("batch_size", 1) < 1:
        raise ValueError("--anneal_set: batch_size must be >= 1")
    for k in ("remat_g", "lpips_remat"):
        if k in changed and changed[k] not in ("auto", "on", "off", "True",
                                               "False", "1", "0"):
            raise ValueError(f"--anneal_set: {k} must be auto|on|off")
    for k, v in changed.items():
        setattr(opt, k, v)
    return changed


def train(opt=None, argv=None):
    if opt is None:
        opt = TrainOptions().parse(argv)
    from .platform import apply_platform
    apply_platform(opt)
    dataset = create_dataset(opt)
    print(f"The number of training images = {len(dataset.dataset)}")
    model = create_model(opt)
    visualizer = Visualizer(opt)

    total_iters = 0
    best_metrics: Dict[str, float] = {}
    plateau = None
    val_loader = None
    if getattr(opt, "lr_policy", "linear") == "plateau":
        from .models.base import PlateauTracker
        plateau = PlateauTracker()
    t_start = time.time()
    first = True

    spd = int(getattr(opt, "steps_per_dispatch", 1))
    chunk_buf = []
    chunk_keys = []  # per-step _sample_key (keys the D3 real-logit cache)
    # Fixed epoch-end eval target: the reference scores a FIXED validation
    # set every epoch (train.py:88-121 builds it once; the best vote at
    # :162-193 then compares like with like).  Scoring whatever batch the
    # shuffled epoch happened to end on instead makes the metric series —
    # and the vote — noisy for data_len > 1.  The first-seen SINGLE sample
    # is fixed across epochs (fixed-crop contract), so it plays the same
    # role — and keeps the per-epoch eval COST at the reference's (its
    # epoch-end metrics come from one batch-1 sample,
    # reference train.py:155-158 + singleskit batch_size=1).  Scoring the
    # whole batch instead made eval dominate the schedule at batch_size 4:
    # the round-5 405-epoch production run spent 2.62 h of its 3.65 h
    # wall-clock in the 4-sample epoch-end suite (~23 s/epoch; one sample
    # is ~5.2 s, RESULTS round 4).
    eval_batch = None

    def flush_chunk():
        import jax.numpy as jnp
        if not chunk_buf:
            return 0
        if len(chunk_buf) == 1 or spd <= 1:
            model._input = chunk_buf[0]
            model._sample_key = chunk_keys[0]
            model.optimize_parameters(epoch)
            k = 1
        else:
            stacked = {key: jnp.stack([c[key] for c in chunk_buf])
                       for key in chunk_buf[0]}
            k = model.optimize_parameters_chunk(stacked, epoch,
                                                sample_keys=list(chunk_keys))
        chunk_buf.clear()
        chunk_keys.clear()
        return k

    anneal_pending = bool(getattr(opt, "anneal_epoch", 0)) and bool(
        getattr(opt, "anneal_set", ""))
    if anneal_pending and getattr(opt, "step_mode", "fused") == "split":
        raise NotImplementedError(
            "--anneal_epoch is implemented for the fused step only "
            "(step_mode=split stages jit per-call; use fused)")

    for epoch in range(opt.epoch_count, opt.n_epochs + opt.n_epochs_decay + 1):
        epoch_start = time.time()
        if anneal_pending and epoch >= opt.anneal_epoch:
            # one-time mid-schedule config switch (e.g. cropped-LPIPS fast
            # phase → full-canvas quality tail).  The fused step bakes these
            # knobs in at trace time, so the model drops its jit wrappers;
            # the DataLoader re-chunks future epochs from its per-sample
            # device cache (no re-upload).  `>=` so a --continue_train resume
            # past the boundary still lands in phase-2 config.
            anneal_pending = False
            changed = apply_anneal(opt, opt.anneal_set)
            if "batch_size" in changed:
                dataset.batch_size = int(opt.batch_size)
            if hasattr(model, "invalidate_step_cache"):
                model.invalidate_step_cache()
            elif any(k != "batch_size" for k in changed):
                # a model without the hook would silently keep its stale
                # traced step (opt.* is baked in at trace time)
                raise NotImplementedError(
                    f"--anneal_set keys {sorted(changed)} need "
                    f"{type(model).__name__}.invalidate_step_cache()")
            print(f"[anneal] epoch {epoch}: applied {changed} "
                  f"(train step re-trace forced)")
        dataset.set_epoch(epoch)
        t_data_mark = time.time()
        for i, data in enumerate(dataset):
            t_data = time.time() - t_data_mark
            if eval_batch is None:
                eval_batch = {k: v[:1] for k, v in data.items()}
            if first:
                model.setup(data)
                if getattr(opt, "continue_train", False) or getattr(opt, "pretrained_name", None):
                    model.load_networks(opt.epoch)
                first = False
            total_iters += opt.batch_size
            t_comp_mark = time.time()
            model.set_input(data)
            if spd > 1 and hasattr(model, "optimize_parameters_chunk"):
                chunk_buf.append(dict(model._input))
                chunk_keys.append(getattr(model, "_sample_key", None))
                if len(chunk_buf) >= spd:
                    flush_chunk()
            else:
                model.optimize_parameters(epoch)
            t_comp = (time.time() - t_comp_mark) / opt.batch_size

            if total_iters % opt.print_freq == 0 or i == 0:
                cur = model.get_current_losses()
                if cur:  # chunked dispatch: empty until the first flush
                    visualizer.print_current_losses(epoch, total_iters, cur,
                                                    t_comp, t_data)
            if total_iters % opt.display_freq == 0:
                visualizer.display_current_results(model.get_current_visuals(),
                                                   epoch, save_result=True)
            if total_iters % opt.save_latest_freq == 0:
                print(f"saving the latest model (epoch {epoch}, total_iters {total_iters})")
                model.save_networks("latest")
            t_data_mark = time.time()

        flush_chunk()  # drain any partial dispatch chunk

        # ---- epoch-end validation + best vote ----
        if getattr(opt, "val_for_each_epoch", False):
            if getattr(opt, "return_patch", False):
                # patch-trained baselines validate on the FULL image
                # (reference train.py:88-121 builds a separate val dataset)
                if val_loader is None:
                    import copy as _copy
                    val_opt = _copy.copy(opt)
                    val_opt.return_patch = False
                    val_opt.data_len = 1
                    val_opt.batch_size = 1
                    val_loader = create_dataset(val_opt)
                model.set_input(next(iter(val_loader)), phase="val")
            elif eval_batch is not None:
                model.set_input(eval_batch)
            model.test()
            t_eval = time.time()
            metrics = model.compute_metrics()
            print(f"[eval] epoch {epoch} metric suite "
                  f"({getattr(opt, 'eval_mode', 'batched')}) took "
                  f"{time.time() - t_eval:.1f} s")
            visualizer.print_current_metrics(epoch, metrics)
            visualizer.save_current_metrics(epoch, metrics)
            if best_vote(metrics, best_metrics):
                print(f"saving the BEST model at epoch {epoch}")
                model.save_networks("best")
                for k, v in metrics.items():
                    if not k.startswith("metric_train_"):
                        best_metrics[k] = v
            if plateau is not None:
                lower = [v for k, v in metrics.items()
                         if not k.startswith("metric_train_")
                         and any(t in k for t in LOWER_BETTER)]
                model.lr_override = plateau.update(float(sum(lower)))

        if epoch % opt.save_epoch_freq == 0:
            print(f"saving the model at the end of epoch {epoch}, iters {total_iters}")
            model.save_networks("latest")
            model.save_networks(str(epoch))
        model.save_networks("latest")

        epoch_time = time.time() - epoch_start
        visualizer.plot_epoch_time(epoch, epoch_time)
        print(f"End of epoch {epoch} / {opt.n_epochs + opt.n_epochs_decay} \t "
              f"Time Taken: {epoch_time:.0f} sec")
        model.update_learning_rate(epoch)
        if hasattr(model, "update_fixed_params"):
            model.update_fixed_params(epoch)

    print(f"Training finished in {time.time() - t_start:.0f} s")
    return model


if __name__ == "__main__":
    train()
