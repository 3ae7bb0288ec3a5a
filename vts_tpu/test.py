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
    webpage.save()
    return all_metrics


if __name__ == "__main__":
    test()
