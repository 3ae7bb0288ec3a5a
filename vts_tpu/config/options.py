"""Three-stage option system.

Mirrors the reference's CLI UX (reference options/base_options.py:221-258):
base flags are parsed first with ``parse_known_args``, then the selected
model's ``modify_commandline_options`` is applied, then the selected
dataset's — each stage may add flags *and* override defaults via
``parser.set_defaults`` — and the final parse errors on unknown flags.
Every run dumps ``{phase}_opt.txt`` with non-default values annotated
(reference options/base_options.py:260-287).

TPU-specific flags replace the CUDA ones: ``--mesh`` (device mesh spec,
e.g. ``garment:4,data:2``) replaces ``--gpu_ids``; ``--dtype`` selects the
compute dtype policy (params stay fp32).
"""

from __future__ import annotations

import argparse
import os
from typing import Optional


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError(f"boolean value expected, got {v!r}")


class Options(argparse.Namespace):
    """Parsed options namespace. ``in`` works like dict-membership so model
    code can probe optional flags (``'use_diffaug' in opt``)."""

    def __contains__(self, key: str) -> bool:
        return hasattr(self, key)

    def get(self, key: str, default=None):
        return getattr(self, key, default)


class BaseOptions:
    """Base flags shared by train and test. Reference: options/base_options.py."""

    isTrain: bool = False

    def initialize(self, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        # experiment identity / io
        parser.add_argument("--dataroot", type=str, default="synthetic://default",
                            help="path to the garment dataset root, or synthetic://<name> for generated data")
        parser.add_argument("--name", type=str, default="experiment_name",
                            help="experiment name; decides where checkpoints/results go")
        parser.add_argument("--easy_label", type=str, default="experiment_name")
        parser.add_argument("--checkpoints_dir", type=str, default="./checkpoints")
        parser.add_argument("--results_dir", type=str, default="./results/")
        parser.add_argument("--phase", type=str, default="train")
        parser.add_argument("--seed", type=int, default=0, help="global PRNG seed")

        # device / precision (TPU replaces gpu_ids)
        parser.add_argument("--mesh", type=str, default="",
                            help="device mesh spec 'axis:size,axis:size' (e.g. 'data:4'); empty = single device")
        parser.add_argument("--dtype", type=str, default="float32",
                            choices=["float32", "bfloat16"],
                            help="compute dtype policy for network conv math (params stay fp32)")
        parser.add_argument("--platform", type=str, default="",
                            help="force jax platform (cpu/tpu); empty = default")
        parser.add_argument("--multihost", action="store_true",
                            help="jax.distributed.initialize before backend "
                                 "init (multi-host TPU pods; SURVEY §5 comm "
                                 "backend). On TPU pods all three settings "
                                 "below auto-detect; on other fabrics set "
                                 "them explicitly.")
        parser.add_argument("--coordinator_address", type=str, default="",
                            help="host:port of process 0 (empty = auto)")
        parser.add_argument("--num_processes", type=int, default=-1,
                            help="total host processes (-1 = auto)")
        parser.add_argument("--process_id", type=int, default=-1,
                            help="this host's rank (-1 = auto)")

        # model selection
        parser.add_argument("--model", type=str, default="sinskit")
        parser.add_argument("--ngf", type=int, default=64)
        parser.add_argument("--ndf", type=int, default=64)
        parser.add_argument("--netD", type=str, default="basic",
                            choices=["basic", "n_layers", "pixel", "patch", "multiscale", "stylegan2", "tilestylegan2"])
        parser.add_argument("--netG", type=str, default="resnet_9blocks",
                            choices=["resnet_9blocks", "resnet_6blocks", "resnet_4blocks", "unet_256", "unet_128",
                                     "stylegan2", "smallstylegan2", "resnet_cat", "unet256_custom",
                                     "global", "local", "encoder", "spade", "conv_encoder", "visgel"])
        parser.add_argument("--n_layers_D", type=int, default=3)
        # norms also accept SPADE config strings like 'spectralspadesyncbatch3x3'
        parser.add_argument("--normG", type=str, default="instance")
        parser.add_argument("--normD", type=str, default="batch")
        parser.add_argument("--init_type", type=str, default="xavier",
                            choices=["normal", "xavier", "xavier_uniform", "kaiming", "orthogonal", "none"])
        parser.add_argument("--init_gain", type=float, default=0.02)
        parser.add_argument("--no_dropout", type=str2bool, nargs="?", const=True, default=True)
        parser.add_argument("--no_antialias", action="store_true")
        parser.add_argument("--no_antialias_up", action="store_true")
        parser.add_argument("--gan_mode", type=str, default="lsgan",
                            choices=["vanilla", "lsgan", "wgan", "wgangp", "nonsaturating", "hinge"])

        # dataset
        parser.add_argument("--dataset_mode", type=str, default="singleskit")
        parser.add_argument("--direction", type=str, default="AtoB")
        parser.add_argument("--serial_batches", action="store_true")
        parser.add_argument("--num_threads", type=int, default=4,
                            help="host-side preprocessing worker threads")
        parser.add_argument("--cache_data_device", action="store_true",
                            help="keep the epoch's samples resident on device "
                                 "across epochs (skips the per-iteration "
                                 "host->device transfer; needs data_len x "
                                 "sample-size of spare HBM — ~38 MB/sample "
                                 "at the 1536^2 flagship)")
        parser.add_argument("--batch_size", type=int, default=1)
        parser.add_argument("--load_size", type=int, default=286)
        parser.add_argument("--crop_size", type=int, default=256)
        parser.add_argument("--max_dataset_size", type=int, default=None)
        parser.add_argument("--preprocess", type=str, default="resize_and_crop",
                            help="resize_and_crop | crop | zoom_and_crop | scale_width | none")
        parser.add_argument("--no_flip", type=str2bool, nargs="?", const=True, default=True)
        parser.add_argument("--cache_dir", type=str, default="",
                            help="on-disk cache for the preprocessed epoch (empty = <dataroot>/.vts_cache)")

        # logging / display
        parser.add_argument("--display_winsize", type=int, default=256)
        parser.add_argument("--display_id", type=int, default=0,
                            help="> 0 starts the live HTTP dashboard "
                                 "(the visdom-role sink; utils/live.py)")
        parser.add_argument("--display_port", type=int, default=8097,
                            help="live-dashboard port (visdom's default)")
        parser.add_argument("--display_freq", type=int, default=400)
        parser.add_argument("--print_freq", type=int, default=100)
        parser.add_argument("--no_html", action="store_true")
        parser.add_argument("--use_wandb", action="store_true")
        parser.add_argument("--verbose", action="store_true")
        parser.add_argument("--suffix", type=str, default="")

        # checkpoint load
        parser.add_argument("--epoch", type=str, default="latest",
                            help="which checkpoint tag to load: epoch number | latest | best")
        parser.add_argument("--load_iter", type=int, default=0)
        parser.add_argument("--pretrained_name", type=str, default=None)
        self.initialized = True
        return parser

    # -- 3-stage gather ----------------------------------------------------
    def gather_options(self, args=None) -> Options:
        parser = argparse.ArgumentParser(
            formatter_class=argparse.ArgumentDefaultsHelpFormatter)
        parser = self.initialize(parser)

        opt, _ = parser.parse_known_args(args)

        # stage 2: model-specific flags + defaults
        from ..utils.registry import MODELS, DATASETS
        # populate the registries: parse() must work standalone (the CLIs
        # import these anyway; direct TrainOptions users may not have)
        from .. import models as _models  # noqa: F401
        from .. import data as _data      # noqa: F401

        model_cls = MODELS.get(opt.model)
        parser = model_cls.modify_commandline_options(parser, is_train=self.isTrain)
        opt, _ = parser.parse_known_args(args)

        # stage 3: dataset-specific flags + defaults
        dataset_cls = DATASETS.get(opt.dataset_mode)
        if hasattr(dataset_cls, "modify_commandline_options"):
            parser = dataset_cls.modify_commandline_options(parser, is_train=self.isTrain)

        self.parser = parser
        ns = parser.parse_args(args, namespace=Options())
        return ns

    def print_options(self, opt: Options) -> str:
        lines = ["----------------- Options ---------------"]
        for k, v in sorted(vars(opt).items()):
            comment = ""
            default = self.parser.get_default(k)
            if v != default:
                comment = f"\t[default: {default}]"
            lines.append(f"{k:>25}: {v!s:<30}{comment}")
        lines.append("----------------- End -------------------")
        text = "\n".join(lines)
        expr_dir = os.path.join(opt.checkpoints_dir, opt.name)
        os.makedirs(expr_dir, exist_ok=True)
        with open(os.path.join(expr_dir, f"{opt.phase}_opt.txt"), "w") as f:
            f.write(text + "\n")
        return text

    def parse(self, args=None, quiet: bool = False) -> Options:
        opt = self.gather_options(args)
        opt.isTrain = self.isTrain
        if opt.suffix:
            opt.name = opt.name + ("_" + opt.suffix.format(**vars(opt)) if opt.suffix else "")
        text = self.print_options(opt)
        if not quiet:
            print(text)
        self.opt = opt
        return opt


class TrainOptions(BaseOptions):
    """Reference: options/train_options.py."""

    isTrain = True

    def initialize(self, parser):
        parser = BaseOptions.initialize(self, parser)
        parser.add_argument("--save_latest_freq", type=int, default=5000)
        parser.add_argument("--save_epoch_freq", type=int, default=5)
        parser.add_argument("--evaluation_freq", type=int, default=5000)
        parser.add_argument("--validation_freq", type=int, default=100)
        parser.add_argument("--save_by_iter", action="store_true")
        parser.add_argument("--continue_train", action="store_true")
        parser.add_argument("--epoch_count", type=int, default=1)
        parser.add_argument("--n_epochs", type=int, default=200,
                            help="epochs at the initial learning rate")
        parser.add_argument("--n_epochs_decay", type=int, default=200,
                            help="epochs over which lr linearly decays to zero")
        parser.add_argument("--beta1", type=float, default=0.5)
        parser.add_argument("--beta2", type=float, default=0.999)
        parser.add_argument("--lr", type=float, default=0.0002)
        parser.add_argument("--gan_mode_override", type=str, default="")
        # reference default is 50 (train_options.py:50) but every shipped
        # model either overrides it to 0 or silently ignores it; we default 0
        # and hard-error on >0 for models that don't query the pool
        # (models/__init__.py create_model).
        parser.add_argument("--pool_size", type=int, default=0)
        parser.add_argument("--lr_policy", type=str, default="linear",
                            choices=["linear", "step", "plateau", "cosine"])
        parser.add_argument("--lr_decay_iters", type=int, default=50)
        parser.add_argument("--val_for_each_epoch", type=str2bool, default=False)
        parser.add_argument("--steps_per_dispatch", type=int, default=1,
                            help="lax.scan this many optimization steps per device "
                                 "dispatch (amortizes host round-trips; >1 reduces "
                                 "logging granularity to chunk boundaries)")
        parser.add_argument("--train_for_each_epoch", type=str2bool, default=True)
        parser.add_argument("--update_fixed_epoch", type=int, default=0,
                            help="pix2pixHD two-stage schedule: epoch after which the global G unfreezes")
        parser.add_argument("--anneal_epoch", type=int, default=0,
                            help="epoch at which --anneal_set is applied once "
                                 "(0 = off): a mid-schedule config switch, "
                                 "e.g. cropped-LPIPS fast phase → full-canvas "
                                 "quality tail (fused step only)")
        parser.add_argument("--anneal_set", type=str, default="",
                            help="comma list k=v applied to opt at "
                                 "--anneal_epoch; keys: lpips_crop, "
                                 "batch_size, remat_g, lpips_remat, "
                                 "lpips_fold_axis, lpips_head")
        return parser


class TestOptions(BaseOptions):
    """Reference: options/test_options.py. Forces deterministic single-sample
    evaluation: batch 1, serial order, no flip."""

    isTrain = False

    def initialize(self, parser):
        parser = BaseOptions.initialize(self, parser)
        parser.add_argument("--use_eval_mode", type=str2bool, default=True,
                            help="use eval-mode statistics (BN running stats) at test time")
        parser.add_argument("--num_test", type=int, default=50)
        parser.set_defaults(phase="test", batch_size=1, serial_batches=True,
                            no_flip=True, num_threads=0)
        return parser
