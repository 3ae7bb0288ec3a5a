"""Experiment fleet launcher — the reference's tmux/GPUtil layer, TPU-native.

The reference fans 20 garments out as 20 OS processes pinned to GPUs via
tmux panes (reference experiments/tmux_launcher.py:70-163, __main__.py:26-88).
Here a fleet is either:

  * ``--mode fleet`` (default): ONE process, all garments trained
    simultaneously in a single jitted step, per-garment parameter stacks
    sharded over the mesh's garment axis (vts_tpu.parallel.fleet) — zero
    inter-garment communication, linear scaling with chips;
  * ``--mode process``: one subprocess per garment (the tmux model without
    tmux), for debugging or heterogeneous configs.

Usage:
  python -m vts_tpu.launch ours launch --materials mat1,mat2 --dataroot-template ...
  python -m vts_tpu.launch ours test   --materials ... --epoch best
  python -m vts_tpu.launch ours commands      # print the per-garment commands

Multi-host: pass ``--multihost`` (plus ``--coordinator_address`` etc. off
TPU pods) in the extra flags — ``platform.init_multihost`` runs
``jax.distributed.initialize`` before the backend comes up, after which
``jax.devices()`` spans the pod and the garment axis lays out over every
host's chips.  Each host feeds all loaders but only materializes the shards
``jax.sharding`` assigns locally (addressable_data), so host IO stays
proportional to local garments.
"""

from __future__ import annotations

import argparse
import copy
import shlex
import subprocess
import sys
import time
from typing import Dict, List

# Per-method flag presets (reference experiments/SingleG_AllMaterials_baseline_*_launcher.py
# + the edited-sketch test launcher ..._test_DALLE_sketch_launcher.py)
METHOD_PRESETS: Dict[str, Dict] = {
    "ours": dict(model="sinskit", dataset_mode="singleskit", name_suffix="sinskitG_baseline_ours"),
    "pix2pix": dict(model="pix2pix", dataset_mode="patchskit", name_suffix="pix2pix_baseline"),
    "pix2pixhd": dict(model="pix2pixhd", dataset_mode="patchskit", name_suffix="pix2pixHD_baseline"),
    "spade": dict(model="spade", dataset_mode="patchskit", name_suffix="spade_baseline"),
    "skit": dict(model="skit", dataset_mode="skit", name_suffix="skitG"),
    # test pretrained 'ours' checkpoints on edited (e.g. DALLE) sketches:
    # dataroot template should point at the *_edit_* roots (S+M only, no
    # ground truth — metrics are skipped, galleries + raw tactile written)
    "ours_edit": dict(model="sinskit", dataset_mode="singleskit",
                      name_suffix="sinskitG_baseline_ours"),
}

# the TouchClothing 20-garment material list (reference
# experiments/SingleG_AllMaterials_baseline_ours_launcher.py:26-45)
DEFAULT_MATERIALS = [
    "BlackJean", "BluePants", "BlueSports", "BrownVest", "ColorPants",
    "ColorSweater", "DenimShirt", "FlowerJeans", "FlowerShorts", "GrayPants",
    "GreenShirt", "GreenSweater", "GreenTee", "NavyHoodie", "PinkShorts",
    "PurpleShirt", "RedShirt", "WhiteTshirt", "WhiteVest", "YellowShirt",
]


def garment_command(method: str, material: str, args) -> List[str]:
    preset = METHOD_PRESETS[method]
    dataroot = args.dataroot_template.format(material=material)
    name = f"{material}_{preset['name_suffix']}"
    cmd = [sys.executable, "-m",
           "vts_tpu.train" if args.phase == "launch" else "vts_tpu.test",
           "--model", preset["model"], "--dataset_mode", preset["dataset_mode"],
           "--dataroot", dataroot, "--name", name,
           "--checkpoints_dir", args.checkpoints_dir,
           "--results_dir", args.results_dir]
    if args.phase == "test":
        cmd += ["--epoch", args.epoch]
    cmd += args.extra
    return cmd


def run_process_mode(method: str, materials: List[str], args) -> int:
    procs = []
    for m in materials:
        cmd = garment_command(method, m, args)
        print("launch:", " ".join(shlex.quote(c) for c in cmd))
        if not args.dry_run:
            procs.append((m, subprocess.Popen(cmd)))
    rc = 0
    for m, p in procs:
        code = p.wait()
        print(f"[{m}] exited {code}")
        rc = rc or code
    return rc


def run_fleet_mode(method: str, materials: List[str], args) -> int:
    """All garments in one process, garment-parallel over the mesh."""
    import jax

    from .config import TrainOptions
    from .data import create_dataset
    from .models import create_model
    from .parallel.fleet import FleetTrainer, stack_batches, unstack_state
    from .parallel.mesh import build_mesh
    from .models.base import lr_factor, save_net

    preset = METHOD_PRESETS[method]
    base_argv = ["--model", preset["model"], "--dataset_mode", preset["dataset_mode"],
                 "--dataroot", args.dataroot_template.format(material=materials[0]),
                 "--checkpoints_dir", args.checkpoints_dir,
                 "--results_dir", args.results_dir] + args.extra
    opt = TrainOptions().parse(base_argv, quiet=True)
    from .platform import apply_platform
    apply_platform(opt)

    n_dev = len(jax.devices())
    g_ax = min(len(materials), n_dev)
    mesh = build_mesh(f"garment:{g_ax}")
    print(f"[fleet] {len(materials)} garments over {g_ax} devices")

    loaders = []
    for m in materials:
        sub = copy.copy(opt)
        sub.dataroot = args.dataroot_template.format(material=m)
        sub.name = f"{m}_{preset['name_suffix']}"
        loaders.append(create_dataset(sub))

    model = create_model(opt)
    first_batches = [next(iter(ld)) for ld in loaders]
    trainer = FleetTrainer(model, mesh, num_garments=len(materials))
    states = trainer.init_states(first_batches[0],
                                 seeds=list(range(len(materials))))

    total_epochs = opt.n_epochs + opt.n_epochs_decay
    rngs = jax.random.split(jax.random.key(opt.seed), len(materials))
    t0 = time.time()
    for epoch in range(opt.epoch_count, total_epochs + 1):
        for ld in loaders:
            ld.set_epoch(epoch)
        iters = zip(*[iter(ld) for ld in loaders])
        lr = opt.lr * lr_factor(opt.lr_policy, epoch - 1, opt)
        lr2 = getattr(opt, "lr_G2", opt.lr) * lr_factor(opt.lr_policy, epoch - 1, opt)
        for step, batch_tuple in enumerate(iters):
            per_g = []
            for b in batch_tuple:
                model.set_input(b)
                per_g.append(dict(model._input))
            batch = stack_batches(per_g)
            rngs = jax.vmap(lambda k: jax.random.split(k, 2)[0])(rngs)
            gS, dS, d2S, losses, _ = trainer.step(
                states["G"], states["D"], states["D2"], batch, rngs, lr, lr2, epoch)
            states = {"G": gS, "D": dS, "D2": d2S}
        if epoch % max(1, opt.print_freq // 100) == 0:
            mean_losses = {k: float(jax.numpy.mean(v)) for k, v in losses.items()}
            print(f"[fleet] epoch {epoch}/{total_epochs} "
                  f"({time.time() - t0:.0f}s) " +
                  " ".join(f"{k}:{v:.3f}" for k, v in sorted(mean_losses.items())[:6]))
        if epoch % opt.save_epoch_freq == 0 or epoch == total_epochs:
            for gi, m in enumerate(materials):
                ckpt = f"{args.checkpoints_dir}/{m}_{preset['name_suffix']}"
                for net in ("G", "D", "D2"):
                    save_net(ckpt, "latest", net, unstack_state(states[net], gi))
    print(f"[fleet] trained {len(materials)} garments in {time.time() - t0:.0f}s")
    return 0


def run_compare(methods: List[str], materials: List[str], args) -> int:
    """Side-by-side galleries across methods per garment (reference
    tmux_launcher.py:197-226 create_comparison_html, which shelled out to an
    external ``~/tools/html.py``; here it is utils/compare.py in-tree)."""
    import os
    from .utils.compare import create_comparison_html
    for mat in materials:
        dirs, labels = [], []
        for meth in methods:
            name = f"{mat}_{METHOD_PRESETS[meth]['name_suffix']}"
            dirs.append(os.path.join(args.results_dir, name,
                                     f"test_{args.epoch}", "images"))
            labels.append(meth)
        out = create_comparison_html(
            os.path.join(args.results_dir, f"comparison_{mat}"),
            dirs, labels, title=f"{mat} ({args.epoch})",
            name_filter=args.filter or None)
        print(out)
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("method", choices=sorted(METHOD_PRESETS))
    ap.add_argument("phase", choices=["launch", "test", "commands", "compare"])
    ap.add_argument("--materials", type=str, default=",".join(DEFAULT_MATERIALS))
    ap.add_argument("--dataroot-template", type=str,
                    default="./datasets/singleskit_{material}_padded_1800_x1/")
    ap.add_argument("--checkpoints_dir", type=str, default="./checkpoints")
    ap.add_argument("--results_dir", type=str, default="./results")
    ap.add_argument("--epoch", type=str, default="best")
    ap.add_argument("--mode", choices=["fleet", "process"], default="fleet")
    ap.add_argument("--against", type=str, default="",
                    help="comma-separated other methods for phase=compare "
                         "(columns after the positional method)")
    ap.add_argument("--filter", type=str, default="",
                    help="phase=compare: only basenames containing this "
                         "substring (e.g. fake_I)")
    ap.add_argument("--dry_run", action="store_true")
    ap.add_argument("extra", nargs="*", default=[])
    args = ap.parse_args(argv)
    materials = [m for m in args.materials.split(",") if m]

    if args.phase == "compare":
        methods = [args.method] + [m for m in args.against.split(",") if m]
        unknown = [m for m in methods if m not in METHOD_PRESETS]
        if unknown:
            ap.error(f"--against: unknown method(s) {unknown}; "
                     f"choose from {sorted(METHOD_PRESETS)}")
        return run_compare(methods, materials, args)
    if args.phase == "commands":
        for m in materials:
            args.phase = "launch"
            print(" ".join(shlex.quote(c) for c in garment_command(args.method, m, args)))
        return 0
    if args.phase == "test" or args.mode == "process":
        args.phase = "test" if args.phase == "test" else "launch"
        return run_process_mode(args.method, materials, args)
    return run_fleet_mode(args.method, materials, args)


if __name__ == "__main__":
    sys.exit(main())
