"""Inference / evaluation driver (reference test.py:31-116).

Deterministic single-sample evaluation: loads the tagged checkpoint, runs the
forward pass per sample, computes + pickles metrics
(``results/<name>/<phase>_<epoch>/eval_metrics[_i].pkl``), and writes the
HTML gallery with raw tactile npz dumps.

Run:  python -m vts_tpu.test --model sinskit --epoch best --dataroot ...
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from .config import TestOptions
from .data import create_dataset
from .models import create_model
from .utils.html import HTML
from .utils.visualizer import Visualizer, save_images


def test(opt=None, argv=None):
    if opt is None:
        opt = TestOptions().parse(argv)
    from .platform import apply_platform
    apply_platform(opt)
    opt.num_threads = 0
    opt.batch_size = 1
    opt.serial_batches = True
    opt.no_flip = True
    opt.display_id = 0

    dataset = create_dataset(opt)
    model = create_model(opt)
    visualizer = Visualizer(opt)

    web_dir = os.path.join(opt.results_dir, opt.name,
                           f"{opt.phase}_{opt.epoch}")
    webpage = HTML(web_dir, f"Experiment = {opt.name}, Phase = {opt.phase}, "
                            f"Epoch = {opt.epoch}")

    all_metrics: List[Dict[str, float]] = []
    sample_material: List[int] = []
    first = True
    for i, data in enumerate(dataset):
        if i >= opt.num_test:
            break
        if first:
            model.setup(data)
            model.load_networks(opt.epoch)
            first = False
        model.set_input(data, phase="test")
        model.test()
        metrics = model.compute_metrics(phase="test")
        visualizer.save_current_metrics(opt.epoch, metrics, index=i)
        all_metrics.append(metrics)
        mat = data.get("material_index")
        sample_material.append(int(np.asarray(mat).reshape(-1)[0]) if mat is not None else -1)
        visuals = model.get_current_visuals()
        name = getattr(dataset.dataset, "name", f"sample_{i}")
        save_images(webpage, visuals, f"{name}_{i}.png",
                    width=getattr(opt, "display_winsize", 256),
                    patch_coords=np.asarray(data.get("full_T_coords", np.zeros((1, 0, 4))))[0],
                    image_height=visuals["real_S"].shape[1],
                    save_raw_arr_vis=bool(getattr(opt, "save_raw_arr_vis", False)))
        print(f"processed sample {i}: " +
              " ".join(f"{k}={v:.4f}" for k, v in metrics.items()))

    # mean across samples/materials → eval_metrics.pkl (reference test.py:95-112)
    if all_metrics:
        keys = set().union(*all_metrics)
        mean_metrics = {k: float(np.mean([m[k] for m in all_metrics if k in m]))
                        for k in keys}
        visualizer.save_current_metrics(opt.epoch, mean_metrics)
        print("mean metrics: " + " ".join(f"{k}={v:.4f}" for k, v in sorted(mean_metrics.items())))

    # per-material means for multi-material (skit) runs — the reference's
    # pandas mean-per-material roll-up (test.py:95-112), extended to also
    # group WITHIN materials so cross-material spread is visible
    if any(m >= 0 for m in sample_material):
        import pickle
        names = getattr(dataset.dataset, "materials", None) or {}
        per_mat: Dict[str, Dict[str, float]] = {}
        for mat in sorted({m for m in sample_material if m >= 0}):
            rows = [met for met, mi in zip(all_metrics, sample_material) if mi == mat]
            keys = set().union(*rows)
            label = names[mat] if mat < len(names) else str(mat)
            per_mat[label] = {k: float(np.mean([r[k] for r in rows if k in r]))
                              for k in keys}
            print(f"material [{label}] ({len(rows)} samples): " +
                  " ".join(f"{k}={v:.4f}" for k, v in sorted(per_mat[label].items())))
        with open(os.path.join(web_dir, "eval_metrics_per_material.pkl"), "wb") as f:
            pickle.dump(per_mat, f)
    webpage.save()
    return all_metrics


if __name__ == "__main__":
    test()
