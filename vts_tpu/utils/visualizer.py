"""Logging / visualization sinks (reference util/visualizer.py:30-483).

Three sinks, dependency-light:
  * console + ``loss_log.txt`` under ``checkpoints/<name>/``;
  * HTML image galleries (``checkpoints/<name>/web/`` and
    ``results/<name>/<phase>_<epoch>/``) via :mod:`vts_tpu.utils.html`;
  * optional wandb (project "SKIT", ``l_*``/``m_*`` prefixes) when installed
    and ``--use_wandb`` — gated import, never required.

``save_images`` writes each visual as PNG plus the raw tactile field as
``*_gxgy_raw.npz`` (+ optional .npy), and the patch-coordinate JSON with the
y-flip the reference's website pipeline expects (visualizer.py:69-131).
"""

from __future__ import annotations

import json
import os
import pickle
import time
from typing import Dict, Optional

import numpy as np

from .html import HTML
from .image import save_image, tensor2im


class Visualizer:
    def __init__(self, opt):
        self.opt = opt
        self.name = opt.name
        self.use_wandb = bool(getattr(opt, "use_wandb", False))
        self.wandb = None
        if self.use_wandb:
            try:
                import wandb
                self.wandb = wandb.init(project="SKIT", name=opt.name, config=vars(opt)) \
                    if not wandb.run else wandb.run
            except ImportError:
                print("[visualizer] wandb requested but not installed — skipping")
                self.use_wandb = False
        self.web_dir = os.path.join(opt.checkpoints_dir, opt.name, "web")
        self.img_dir = os.path.join(self.web_dir, "images")
        os.makedirs(self.img_dir, exist_ok=True)
        self.log_name = os.path.join(opt.checkpoints_dir, opt.name, "loss_log.txt")
        with open(self.log_name, "a") as f:
            f.write(f"================ Training Loss ({time.strftime('%c')}) ================\n")
        self._epoch_times = []
        # live dashboard (visdom-role sink): on iff --display_id > 0
        from .live import maybe_start
        self.dashboard = maybe_start(opt, self.img_dir)

    # ------------------------------------------------------------------
    def display_current_results(self, visuals: Dict[str, np.ndarray], epoch: int,
                                save_result: bool = True) -> None:
        if not save_result or getattr(self.opt, "no_html", False):
            return
        for label, image in visuals.items():
            arr = tensor2im(image)
            save_image(arr, os.path.join(self.img_dir, f"epoch{epoch:03d}_{label}.png"))
        if self.dashboard:
            self.dashboard.push_images(
                [f"epoch{epoch:03d}_{label}.png" for label in visuals])
        page = HTML(self.web_dir, f"Experiment name = {self.name}", refresh=0)
        for e in range(epoch, max(0, epoch - 8), -1):
            page.add_header(f"epoch [{e}]")
            ims, txts, links = [], [], []
            for label in visuals:
                ims.append(f"images/epoch{e:03d}_{label}.png")
                txts.append(label)
                links.append(f"images/epoch{e:03d}_{label}.png")
            page.add_images(ims, txts, links,
                            width=getattr(self.opt, "display_winsize", 256))
        page.save()

    def print_current_losses(self, epoch: int, iters: int, losses: Dict[str, float],
                             t_comp: float, t_data: float) -> str:
        msg = f"(epoch: {epoch}, iters: {iters}, time: {t_comp:.3f}, data: {t_data:.3f}) "
        msg += " ".join(f"{k}: {v:.3f}" for k, v in losses.items())
        print(msg)
        with open(self.log_name, "a") as f:
            f.write(msg + "\n")
        if self.wandb:
            self.wandb.log({f"l_{k}": v for k, v in losses.items()})
        if self.dashboard:
            self.dashboard.push_losses(epoch, iters, losses)
        return msg

    def print_current_metrics(self, epoch: int, metrics: Dict[str, float]) -> str:
        msg = f"(epoch: {epoch}) " + " ".join(f"{k}: {v:.4f}" for k, v in metrics.items())
        print(msg)
        with open(self.log_name, "a") as f:
            f.write(msg + "\n")
        if self.wandb:
            self.wandb.log({k.replace("metric_", "m_"): v for k, v in metrics.items()})
        if self.dashboard:
            self.dashboard.push_metrics(epoch, metrics)
        return msg

    def save_current_metrics(self, epoch, metrics: Dict[str, float],
                             index: Optional[int] = None) -> str:
        """results/<name>/<phase>_<epoch>/eval_metrics[_i].pkl
        (reference visualizer.py:443-471)."""
        d = os.path.join(self.opt.results_dir, self.name,
                         f"{self.opt.phase}_{epoch}")
        os.makedirs(d, exist_ok=True)
        fname = "eval_metrics.pkl" if index is None else f"eval_metrics_{index}.pkl"
        path = os.path.join(d, fname)
        with open(path, "wb") as f:
            pickle.dump(metrics, f)
        return path

    def plot_epoch_time(self, epoch: int, seconds: float) -> None:
        self._epoch_times.append((epoch, seconds))
        if self.wandb:
            self.wandb.log({"epoch_time_s": seconds, "epoch": epoch})
        if self.dashboard:
            self.dashboard.push_epoch_time(epoch, seconds)


def save_images(webpage: HTML, visuals: Dict[str, np.ndarray], image_path: str,
                aspect_ratio: float = 1.0, width: int = 256,
                patch_coords: Optional[np.ndarray] = None,
                image_height: Optional[int] = None,
                save_raw_arr_vis: bool = False) -> None:
    """Write one sample's visuals + raw tactile arrays + coord JSON into the
    webpage's image dir (reference visualizer.py:30-148)."""
    image_dir = webpage.get_image_dir()
    short_path = os.path.basename(image_path)
    name = os.path.splitext(short_path)[0]
    webpage.add_header(name)

    ims, txts, links = [], [], []
    gx = gy = None
    for label, im_data in visuals.items():
        arr = np.asarray(im_data)
        if label == "fake_gx":
            gx = arr
        if label == "fake_gy":
            gy = arr
        image_name = f"{name}_{label}.png"
        save_image(tensor2im(arr), os.path.join(image_dir, image_name),
                   aspect_ratio=aspect_ratio)
        ims.append(image_name)
        txts.append(label)
        links.append(image_name)
    if gx is not None and gy is not None:
        raw = {"gx": np.squeeze(gx), "gy": np.squeeze(gy)}
        np.savez(os.path.join(image_dir, f"{name}_fake_gxgy_raw.npz"), **raw)
        if save_raw_arr_vis:
            np.save(os.path.join(image_dir, f"{name}_fake_gxgy_raw.npy"),
                    np.stack([raw["gx"], raw["gy"]]))
            try:  # .exr for rendering tools (reference visualizer.py:112-130)
                import cv2
                os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
                exr = np.stack([raw["gx"], raw["gy"],
                                np.zeros_like(raw["gx"])], axis=-1).astype(np.float32)
                cv2.imwrite(os.path.join(image_dir, f"{name}_fake_gxgy_raw.exr"), exr)
            except Exception as e:
                print(f"[save_images] exr export unavailable: {e}")
    if patch_coords is not None and image_height is not None:
        coords = np.asarray(patch_coords).tolist()
        flipped = [[c[0], image_height - c[1] - c[3], *c[2:]] for c in coords] \
            if coords and len(coords[0]) >= 4 else coords
        with open(os.path.join(image_dir, f"{name}_patch_coords.json"), "w") as f:
            json.dump({"coords": coords, "coords_y_flipped": flipped}, f)
    webpage.add_images(ims, txts, links, width=width)
