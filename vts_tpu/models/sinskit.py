"""SinSKIT — the flagship single-garment sketch→(image, touch) model.

TPU-native re-design of ``SinSKITGModel`` (reference models/sinskitG_model.py:35-1842).
Per optimization step (all fused into ONE jitted function):

  1. G forward on the full sketch+PE canvas, captured with ``jax.vjp`` so the
     later G update reuses the same linearization — exactly one G forward and
     one G backward per step, matching torch's retain-graph pattern;
  2. D1 (full-image multiscale cGAN on (S, I)) Adam update;
  3. D2 (patch multiscale cGAN on [T, S, I, mask] stacks, plus the random
     "more fake T" stack sampled ∝ dilated object mask) Adam update;
  4. G update against the *updated* discriminators: G1 = GAN + L1·100 +
     LPIPS·1 (+ vision-aided D3 after warmup when enabled), G2 = per-patch
     L1·10 + per-channel LPIPS·10; gradients flow through the vjp.

Reference quirks preserved on purpose (behavior parity):
  * the G2 GAN / GAN-feat terms are computed on *detached* tactile patches in
    the G loss (reference sinskitG_model.py:1694-1706: ``fake_T_concat_org =
    fake_T_concat.clone().detach()``), so they are logged but contribute no
    generator gradient — tactile learning is driven by L1 + LPIPS.  Set
    ``--g2_gan_backprop true`` to un-detach them.
  * DiffAugment ("bs") feeds only D2's visual conditioning channels and the
    visual logs — D1 sees the raw images (sinskitG_model.py:1346-1407).
  * D2's conditioning channels are detached — G receives no gradient through
    the gathered S/I patches.
  * the reference's GAN-feature terms never fire at all (it compares the
    module ``self.netD2 == "multiscale"`` against a string —
    sinskitG_model.py:1745); here G2_GAN_feat is computed and logged for
    multiscale D2 but, like G2_GAN, it is gradient-free unless
    ``--g2_gan_backprop`` — the optimization trajectory matches upstream.

Static-shape discipline: patch budgets K/K_val are fixed by the dataset;
validity masks weight every patch reduction.  Random draws come from a
stepped PRNG key; the learning rates are traced scalars (per-epoch linear
decay never re-jits).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.options import str2bool
from ..losses.gan import gan_loss, gradient_penalty
from ..losses.gan_masked import (masked_mean, masked_patch_sum,
                                 per_sample_gan_loss)
from ..losses.lpips import (init_lpips_params, load_lpips_weights, lpips,
                            lpips_y_taps)
from ..metrics.evaluate import DEFAULT_EVAL_METRICS, compute_evaluation_metrics
from ..metrics.inception import init_inception_params, load_inception_weights
from ..networks import define_D, define_G
from ..networks.positional import positional_encoding
from ..ops.diffaug import diff_augment
from ..ops.normal import compute_normal
from ..ops.patch import (gather_patches, gather_patches_from_coords,
                         sample_offsets_in_mask)
from ..ops.resize import resize_nearest
from ..utils.registry import register_model
from .base import (NetState, adam_step, count_params, init_net_state, load_net,
                   lr_factor, make_adam, save_net)


@register_model("sinskit")
@register_model("sinskitG")
class SinSKITModel:
    """Lifecycle mirrors the reference BaseModel contract:
    setup → set_input → optimize_parameters / test → get_current_* → save/load."""

    # ------------------------------------------------------------------
    @staticmethod
    def modify_commandline_options(parser, is_train=True):
        """Reference sinskitG_model.py:43-374 — same flags, same defaults."""
        parser.add_argument("--use_cGAN", type=str2bool, default=True)
        parser.add_argument("--lambda_G1_GAN", type=float, default=1.0)
        parser.add_argument("--lambda_G1_L1", type=float, default=100.0)
        parser.add_argument("--lambda_G1_lpips", type=float, default=1.0)
        parser.add_argument("--use_cGAN_G2", type=str2bool, default=True)
        parser.add_argument("--use_cGAN_G2_S", type=str2bool, default=True)
        parser.add_argument("--use_cGAN_G2_I", type=str2bool, default=True)
        parser.add_argument("--lambda_G2_GAN", type=float, default=5.0)
        parser.add_argument("--lambda_G2_L1", type=float, default=10.0)
        parser.add_argument("--lambda_G2_lpips", type=float, default=10.0)
        parser.add_argument("--lambda_G2_GAN_feat", type=float, default=1.0)
        parser.add_argument("--smooth_GAN_label", type=str2bool, default=True)
        parser.add_argument("--use_vision_aided_loss", type=str2bool, default=True,
                            help="CLIP vision-aided D3 after the warmup epoch "
                                 "(reference default, sinskitG_model.py:126-128; "
                                 "pass --clip_weights for the pretrained tower)")
        parser.add_argument("--vision_aided_warmup_epoch", type=int, default=100)
        parser.add_argument("--lr_G2", type=float, default=0.0005)
        parser.add_argument("--netD2", type=str, default="multiscale")
        parser.add_argument("--n_layers_D2", type=int, default=3)
        parser.add_argument("--num_layer_separate", type=int, default=4)
        parser.add_argument("--num_D_D2", type=int, default=3)
        parser.add_argument("--num_D_D1", type=int, default=3)
        parser.add_argument("--model_phase", type=str, default="train")
        parser.add_argument("--sketch_nc", type=int, default=1)
        parser.add_argument("--image_nc", type=int, default=3)
        parser.add_argument("--touch_nc", type=int, default=2)
        parser.add_argument("--use_positional_encoding", type=str2bool, default=True)
        parser.add_argument("--positional_encoding_mode", type=str, default="spe",
                            choices=["spe", "csg"])
        parser.add_argument("--positional_encoding_dim", type=int, default=4)
        parser.add_argument("--data_len", type=int, default=200)
        parser.add_argument("--batch_size_G2", type=int, default=64)
        parser.add_argument("--batch_size_G2_val", type=int, default=128)
        parser.add_argument("--center_w", type=int, default=1280)
        parser.add_argument("--center_h", type=int, default=960)
        parser.add_argument("--T_resolution_multiplier", type=int, default=1)
        parser.add_argument("--padded_size", type=int, default=1800)
        parser.add_argument("--num_touch_patch_for_logging", type=int, default=10)
        parser.add_argument("--use_bg_mask", type=str2bool, default=True)
        parser.add_argument("--use_more_fakeT", type=str2bool, default=True)
        parser.add_argument("--add_fake_T_sample_size", type=int, default=32)
        parser.add_argument("--sample_bbox_per_patch", type=int, default=2)
        parser.add_argument("--use_diffaug", type=str2bool, default=True)
        parser.add_argument("--diffaugment", type=str, default="bs")
        parser.add_argument("--w_resampling", type=str2bool, default=True)
        parser.add_argument("--resampling_w_min", type=int, default=1)
        parser.add_argument("--resampling_w_max", type=int, default=10)
        parser.add_argument("--save_S_patch", type=str2bool, default=False)
        parser.add_argument("--save_T_concat_tensor", type=str2bool, default=False)
        parser.add_argument("--save_raw_arr_vis", type=str2bool, default=False)
        parser.add_argument("--scale_nz", type=float, default=0.25)
        parser.add_argument("--canvas_fold", type=int, default=8,
                            help="space-to-depth fold factor for the G "
                                 "forward (networks/folded.py): the top "
                                 "U-Net levels run on (H/b,W/b,b²C) tensors "
                                 "so canvas layouts fill the TPU's 128 "
                                 "lanes; 1 disables (exact either way — "
                                 "auto-falls back for style codes / t_mult>1 "
                                 "/ non-instance norm / dropout)")
        parser.add_argument("--lpips_fold", type=int, default=2,
                            help="space-to-depth fold for the first VGG "
                                 "blocks of the canvas LPIPS (losses/"
                                 "lpips.py vgg16_taps): the 3/64-lane 1536² "
                                 "block-1 tensors are the worst layouts of "
                                 "the step; exact (each 2x2 maxpool consumes "
                                 "one fold factor in-block); 1 disables; "
                                 "patch-sized LPIPS calls always run "
                                 "standard")
        parser.add_argument("--lpips_fold_axis", type=str, default="w",
                            choices=["hw", "w"],
                            help="fold geometry for --lpips_fold: 'hw' = "
                                 "symmetric space-to-depth (b² channel "
                                 "groups, x b² conv1_2 FLOPs), 'w' = "
                                 "width-only (b groups; b·64 = 128 lanes at "
                                 "b=2 — one full register — at x b FLOPs). "
                                 "Exact either way (tests/test_losses.py). "
                                 "Default 'w': same-session on-chip A/B "
                                 "measured 6.671 vs 6.511 steps/s sched-"
                                 "weighted (132.0 vs 136.5 ms warmup step) — "
                                 "RESULTS.md round 4")
        parser.add_argument("--device_sample_cache", type=str2bool,
                            default=False,
                            help="keep each training sample's device arrays "
                                 "resident after its first visit (exact: the "
                                 "dataset's samples are bit-identical every "
                                 "epoch — fixed-crop contract). Removes the "
                                 "per-epoch host→device re-transfer, ~46 MB "
                                 "HBM per sample; size it as data_len × 46 MB")
        parser.add_argument("--lpips_head", type=str, default="composed",
                            choices=["composed", "factored"],
                            help="LPIPS tap-head form: 'composed' = the "
                                 "literal normalize→diff→lin composition; "
                                 "'factored' = the algebraically identical "
                                 "3-reduction form that never materializes "
                                 "the normalized taps (losses/lpips.py) — "
                                 "A/B perf knob targeting the ~14 ms/step "
                                 "tap-head tail of the round-3c trace")
        parser.add_argument("--lpips_conv", type=str, default="xla",
                            choices=["xla", "pallas"],
                            help="conv lowering for the G1 canvas LPIPS "
                                 "backbone: 'pallas' routes the sub-roofline "
                                 "shapes (folded block-1 convs, block-2 "
                                 "convs — 12.9-24.1% MFU under XLA, round-5 "
                                 "probe) through the fused Pallas kernel "
                                 "(ops/pallas_conv.py). Exact to round-off "
                                 "(tests/test_losses.py). The patch-sized G2 "
                                 "LPIPS stays on XLA either way (32² tensors "
                                 "— grid overhead would dominate)")
        parser.add_argument("--lpips_crop", type=int, default=0,
                            help="NON-PARITY speed knob: compute the G1 "
                                 "canvas LPIPS on ONE random crop² window "
                                 "per step (shared across the batch) "
                                 "instead of the full canvas — a stochastic "
                                 "estimate of the full-canvas spatial mean "
                                 "(the reference pays LPIPS at full "
                                 "resolution every step, "
                                 "sinskitG_model.py:497-506). 0 = full "
                                 "canvas (reference behavior, default); "
                                 "must be a multiple of 16 (VGG tap "
                                 "geometry; keeps --lpips_fold active)")
        parser.add_argument("--eval_mode", type=str, default="batched",
                            choices=["batched", "legacy"],
                            help="epoch-end metric evaluation: 'batched' = "
                                 "one jitted device pass + one host fetch "
                                 "per coord-set (metrics/evaluate_batch.py); "
                                 "'legacy' = the per-sample per-metric eager "
                                 "loop (the torch-oracle-pinned surface)")
        parser.add_argument("--step_mode", type=str, default="fused",
                            choices=["fused", "split"],
                            help="'fused': one jitted train step; 'split': "
                                 "one jit per pipeline stage (each stage gets "
                                 "its own XLA layout assignment — escapes the "
                                 "fused graph's lane-padded canvas layouts; "
                                 "see models/sinskit_split.py)")
        parser.add_argument("--remat_g", type=str, default="auto",
                            choices=["auto", "on", "off"],
                            help="rematerialize the G forward in the fused "
                                 "step (auto: on when batch_size > 1)")
        parser.add_argument("--g2_gan_backprop", type=str2bool, default=False,
                            help="un-detach G2's GAN terms (the reference detaches them)")
        parser.add_argument("--lpips_weights", type=str, default="",
                            help="path to a torch LPIPS/VGG checkpoint for exact LPIPS")
        parser.add_argument("--inception_weights", type=str, default="",
                            help="path to a torchvision inception_v3 checkpoint for exact SIFID")
        parser.add_argument("--clip_weights", type=str, default="",
                            help="path to an OpenAI CLIP checkpoint (style encoder / D3)")
        parser.add_argument("--train_d3_heads", type=str2bool, default=False,
                            help="update the vision-aided D3 heads (the reference "
                                 "never adds them to an optimizer — frozen by default)")
        parser.add_argument("--d3_logit_cache", type=str2bool, default=False,
                            help="ship per-sample cached CLIP(real_I) D3 logits "
                                 "into the step instead of recomputing them "
                                 "in-graph. Measured SLOWER on the v5e chip "
                                 "(D3 phase 21.0 → 32.1 ms/step: the injected "
                                 "constants perturb the fused graph's layout "
                                 "more than the tiny CLIP(real) forward costs "
                                 "— RESULTS.md round 3); default off, kept as "
                                 "a measured ablation")
        parser.add_argument("--lpips_tap_cache", type=str2bool, default=False,
                            help="keep the CONSTANT real canvas's VGG taps "
                                 "device-resident and feed them into the "
                                 "fused step as loop-invariant args instead "
                                 "of recomputing the LPIPS y-branch forward "
                                 "every step (the reference recomputes it, "
                                 "sinskitG_model.py:497-506). Exact (same "
                                 "jitted tap function on the same input); "
                                 "applies to the G1 canvas LPIPS when "
                                 "--lpips_crop is 0 and every step of a "
                                 "chunk shares one sample")
        parser.add_argument("--lpips_remat", type=str, default="auto",
                            choices=["auto", "on", "off", "True", "False",
                                     "1", "0"],
                            help="jax.checkpoint the canvas LPIPS: trades the "
                                 "backward's saved-residual HBM traffic for a "
                                 "recomputed forward — bit-identical loss "
                                 "values. 'auto' remats at batch>1 only; "
                                 "'on' forces it at batch 1 too; 'off' keeps "
                                 "the taps resident even at batch>1 (the "
                                 "selective-remat arm: G rematted via "
                                 "--remat_g, LPIPS saved). True/False accepted "
                                 "as legacy aliases of on/auto")

        parser.set_defaults(
            model="sinskit", dataset_mode="singleskit", netG="unet256_custom",
            netD="multiscale", netD2="multiscale", gan_mode="nonsaturating",
            ngf=10, ndf=8, lr=0.001, beta1=0.0, beta2=0.99, crop_size=1536,
            no_flip=True, dataroot="synthetic://default",
        )
        if is_train:
            parser.set_defaults(
                preprocess="crop", batch_size=1, display_freq=100, print_freq=100,
                save_latest_freq=100, validation_freq=100, save_epoch_freq=50,
                n_epochs=5, n_epochs_decay=400, num_threads=0, batch_size_G2=64,
                val_for_each_epoch=True, model_phase="train", display_id=0,
            )
        else:
            parser.set_defaults(
                preprocess="none", batch_size=1, num_test=1, data_len=1,
                epoch="latest", num_touch_patch_for_logging=100, batch_size_G2=100,
                model_phase="eval", display_id=0, save_S_patch=True,
                sample_bbox_per_patch=1,
            )
        return parser

    # ------------------------------------------------------------------
    def __init__(self, opt):
        self.opt = opt
        self.isTrain = bool(getattr(opt, "isTrain", True))
        self.mult = int(getattr(opt, "T_resolution_multiplier", 1))
        self.dtype = jnp.bfloat16 if getattr(opt, "dtype", "float32") == "bfloat16" else None
        self.rng = jax.random.key(getattr(opt, "seed", 0))
        self.epoch = int(getattr(opt, "epoch_count", 1))

        # networks
        in_nc = opt.sketch_nc + (2 * opt.positional_encoding_dim
                                 if opt.use_positional_encoding and
                                 opt.positional_encoding_mode == "spe"
                                 else (2 if opt.use_positional_encoding else 0))
        self.input_nc = in_nc
        out_nc = opt.image_nc + opt.touch_nc
        self.netG = define_G(opt, in_nc, out_nc, train=True, dtype=self.dtype)
        self.netG_eval = define_G(opt, in_nc, out_nc, train=False, dtype=None)
        self.model_names = ["G"]
        if self.isTrain:
            d1_in = opt.image_nc + (opt.sketch_nc if opt.use_cGAN else 0)
            self.netD = define_D(opt, d1_in, netD=opt.netD, num_D=opt.num_D_D1,
                                 train=True, dtype=self.dtype)
            d2_in = opt.touch_nc
            if opt.use_cGAN_G2:
                if opt.use_cGAN_G2_S:
                    d2_in += opt.sketch_nc
                if opt.use_cGAN_G2_I:
                    d2_in += opt.image_nc + 1
            self.d2_in = d2_in
            self.netD2 = define_D(opt, d2_in, netD=opt.netD2,
                                  n_layers=opt.n_layers_D2, num_D=opt.num_D_D2,
                                  train=True, dtype=self.dtype)
            if opt.lambda_G1_GAN > 0:
                self.model_names.append("D")
            if opt.lambda_G2_GAN > 0:
                self.model_names.append("D2")

        lpc = int(getattr(opt, "lpips_crop", 0) or 0)
        if lpc < 0 or (lpc and (lpc % 16 or lpc < 64)):
            raise ValueError(
                f"--lpips_crop must be 0 (full canvas) or a multiple of 16 "
                f">= 64, got {lpc}")
        if lpc and getattr(opt, "step_mode", "fused") == "split":
            raise ValueError(
                "--lpips_crop is implemented for the fused step only; "
                "--step_mode split would silently ignore it")

        # perceptual weights (converted checkpoints when provided)
        lw = getattr(opt, "lpips_weights", "")
        self.lpips_params = load_lpips_weights(lw) if lw else init_lpips_params(0)
        iw = getattr(opt, "inception_weights", "")
        self.inception_params = load_inception_weights(iw) if iw else init_inception_params(0)

        # vision-aided D3 (frozen CLIP backbone + heads)
        self.use_d3 = bool(getattr(opt, "use_vision_aided_loss", False)) and self.isTrain
        self.clip_params = None
        self.d3_heads = None
        if self.use_d3 or bool(getattr(opt, "use_style_code", False)):
            from ..networks.clip_vit import init_clip_params, load_clip_weights
            cw = getattr(opt, "clip_weights", "")
            self.clip_params = load_clip_weights(cw) if cw else init_clip_params(0)
        if self.use_d3:
            from ..losses.vision_aided import init_d3_head_params
            self.d3_heads = init_d3_head_params(0)
        self._d3_active = False

        # folded-canvas G forward: exact space-to-depth re-expression of the
        # flagship CustomUNet (networks/folded.py) — only for configs where
        # the folded math is implemented; everything else uses netG.apply
        self.canvas_fold = int(getattr(opt, "canvas_fold", 8))
        style_foldable = (
            not bool(getattr(opt, "use_style_code", False))
            or (getattr(opt, "style_code_mode", "concat") == "concat"
                and getattr(opt, "style_code_mapping_mode", "tile") == "tile"))
        self._folded_ok = (
            self.canvas_fold > 1
            and opt.netG == "unet256_custom"
            and style_foldable   # skitG default tile+concat folds exactly;
                                 # project/adain fall back to netG.apply
            and int(getattr(opt, "num_layer_separate", 4)) >= 1
            and self.mult in (1, 2, 4)
            and getattr(opt, "normG", "instance") == "instance"
            and bool(getattr(opt, "no_dropout", True)))
        # folded D1 (networks/folded_d.py): same layout escape for the canvas
        # discriminator pyramid; checked against the canvas size in setup()
        self._folded_d_ok = False
        # set ONLY by this __init__ (baseline subclasses skip super().__init__
        # and inherit optimize_parameters_chunk, which keys off this flag)
        self.supports_chunk = True

        self.tx_g = make_adam(opt.beta1, opt.beta2) if self.isTrain else None
        self.tx_d = make_adam(opt.beta1, opt.beta2) if self.isTrain else None
        self.tx_d2 = make_adam(opt.beta1, opt.beta2) if self.isTrain else None

        self.states: Dict[str, NetState] = {}
        self._jit_step = None
        self._jit_forward = None
        self.losses: Dict[str, float] = {}
        self.metrics: Dict[str, float] = {}
        self.visuals: Dict[str, np.ndarray] = {}
        self.eval_metrics = list(DEFAULT_EVAL_METRICS)
        self._input: Dict[str, jnp.ndarray] = {}

    # ------------------------------------------------------------------
    def setup(self, example_batch: Dict[str, np.ndarray]) -> None:
        """Initialize states from the first batch's shapes and jit the step."""
        opt = self.opt
        s = jnp.asarray(example_batch["S"])
        n, h, w, _ = s.shape
        pe = self._pe(n, h, w)
        x = jnp.concatenate([s, pe], axis=-1) if pe is not None else s
        k0, k1, k2 = jax.random.split(self.rng, 3)
        if getattr(opt, "use_style_code", False):
            style0 = jnp.zeros((n, int(getattr(opt, "style_code_dim", 512))))
            self.states["G"] = init_net_state(self.netG, k0, self.tx_g, x, style0)
        else:
            self.states["G"] = init_net_state(self.netG, k0, self.tx_g, x)
        print(f"[sinskit] netG params: {count_params(self.states['G'].params)/1e6:.3f} M")
        if self.isTrain:
            d1_in = jnp.zeros((n, h, w, opt.image_nc + (opt.sketch_nc if opt.use_cGAN else 0)))
            self.states["D"] = init_net_state(self.netD, k1, self.tx_d, d1_in)
            pc = 32 * self.mult
            d2_in = jnp.zeros((1, pc, pc, self.d2_in))
            self.states["D2"] = init_net_state(self.netD2, k2, self.tx_d2, d2_in)
            print(f"[sinskit] netD params: {count_params(self.states['D'].params)/1e6:.3f} M, "
                  f"netD2: {count_params(self.states['D2'].params)/1e6:.3f} M")
            from ..networks.folded_d import folded_d_eligible
            self._folded_d_size = h
            self._folded_d_ok = (self.canvas_fold > 1 and h == w
                                 and folded_d_eligible(opt, self.canvas_fold, h))
            # donate the three states: params/opt-state buffers update in place
            self._jit_step = jax.jit(self._train_step, donate_argnums=(0, 1, 2))
            self._setup_dp_mesh()
        self._jit_forward = jax.jit(self._forward_eval)

    def _setup_dp_mesh(self) -> None:
        """``--mesh data:N``: single-garment data parallelism — the batch axis
        shards over N chips, parameters/opt-state replicate, and GSPMD
        all-reduces the gradients.  Semantically IDENTICAL to the same-batch
        single-chip step (tests/test_parallel.py::test_batch_dp2_step_
        equivalence pins losses + updates), so a batch-4 run split 2×2 keeps
        the validated batch-4 training math while halving wall-clock — the
        wave-3 fleet layout (20 garments on 8 chips = 8+8+4: the last wave's
        4 idle chips pair up instead of idling; the reference pins one
        garment per GPU, experiments/tmux_launcher.py:87-125)."""
        self._dp_mesh = None
        spec = getattr(self.opt, "mesh", "") or ""
        if not spec:
            return
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import build_mesh
        mesh = build_mesh(spec)
        ndp = dict(zip(mesh.axis_names, mesh.devices.shape)).get("data", 1)
        if ndp <= 1:
            return
        n = int(getattr(self.opt, "batch_size", 1))
        if n % ndp:
            raise ValueError(
                f"--mesh data:{ndp} needs batch_size divisible by {ndp} "
                f"(got {n}); the batch axis is what shards")
        if int(getattr(self.opt, "steps_per_dispatch", 1)) > 1:
            raise ValueError("--mesh data parallelism and "
                             "--steps_per_dispatch > 1 are mutually "
                             "exclusive (chunk stacking would gather the "
                             "sharded batch)")
        self._dp_mesh = mesh
        self._dp_ndp = ndp
        self._dp_shard = NamedSharding(mesh, P("data"))
        self._dp_rep = NamedSharding(mesh, P())
        self.states = {k: jax.device_put(v, self._dp_rep)
                       for k, v in self.states.items()}
        print(f"[sinskit] data-parallel mesh active: batch {n} → "
              f"{n // ndp} per device × {ndp} devices")

    def _dp_place(self, dev: Dict[str, jnp.ndarray], phase: str):
        """Place one input batch for the dp mesh: train tensors whose leading
        axis divides by the data axis shard over it (sample axis, and the
        N·K-folded patch stacks); everything else replicates so the eval
        forward/metrics run against the replicated params without a device
        mismatch."""
        if getattr(self, "_dp_mesh", None) is None:
            return dev
        ndp = self._dp_ndp
        return {
            k: jax.device_put(
                v, self._dp_shard
                if phase == "train" and getattr(v, "ndim", 0) >= 1
                and v.shape[0] and v.shape[0] % ndp == 0
                else self._dp_rep)
            for k, v in dev.items()
        }

    def _pe(self, n: int, h: int, w: int):
        opt = self.opt
        if not opt.use_positional_encoding:
            return None
        return positional_encoding(h, w, mode=opt.positional_encoding_mode,
                                   dim=opt.positional_encoding_dim, batch=n)

    # ------------------------------------------------------------------
    def set_input(self, batch: Dict[str, np.ndarray], phase: str = "train") -> None:
        # per-sample identity (dataset crops are fixed across epochs) keys the
        # device-side caches of constant per-sample quantities (D3 real logits)
        idx = batch.get("sample_idx")
        self._sample_key = tuple(np.asarray(idx).ravel().tolist()) \
            if idx is not None else None
        if getattr(self.opt, "device_sample_cache", False) \
                and self._sample_key is not None and phase == "train":
            # device-resident epoch cache: the dataset's samples are bit-
            # identical every epoch (fixed-crop contract, data/singleskit.py),
            # so each sample's device arrays are placed ONCE instead of
            # re-crossing the host→device boundary every epoch.  On the
            # tunneled backend one 1536² sample costs ~13 s of H2D per visit
            # (~38 MB over the tunnel); a real local TPU host gets this for
            # free via its input pipeline, which is what the cache emulates.
            # ~46 MB/sample on device (data_len=20 learncheck ≈ 0.9 GB).
            cache = getattr(self, "_sample_dev_cache", None)
            if cache is None:
                cache = self._sample_dev_cache = {}
            hit = cache.get((self._sample_key, phase))
            if hit is not None:
                self._input = dict(hit)
                self.data_phase = phase
                return
        dev = {k: jnp.asarray(v) for k, v in batch.items()
               if k not in ("name", "sample_idx")}
        if "M" in dev:
            dev["S"] = dev["S"] * dev["M"]
            if "I" in dev:
                dev["I"] = dev["I"] * dev["M"]
        # fold the sample axis into the patch stacks: (N, K, h, w, c) → (N·K, …)
        # fold the sample axis into the patch stacks: (N, K, …) → (N·K, …);
        # coords keep their (N, K, 8) shape so gathers can vmap per sample
        for key in ("T_images", "I_masks", "T_valid",
                    "val_T_images", "val_I_masks", "val_T_valid"):
            if key in dev and dev[key].ndim >= 2:
                dev[key] = dev[key].reshape((-1,) + dev[key].shape[2:])
        if "T_images" in dev:
            dev["T_images"] = dev["T_images"] * dev["I_masks"]
        if "val_T_images" in dev:
            dev["val_T_images"] = dev["val_T_images"] * dev["val_I_masks"]
        dev = self._dp_place(dev, phase)
        self._input = dev
        self.data_phase = phase
        if getattr(self.opt, "device_sample_cache", False) \
                and self._sample_key is not None and phase == "train":
            # Bound the cache: keys are sample-index TUPLES, so with
            # batch_size > 1 AND shuffle the tuples differ every epoch and
            # an unbounded cache would pin ~46 MB × batch per novel tuple.
            # Cap at the dataset's own size (the designed batch-1 use keys
            # exactly data_len distinct tuples); beyond it, stop caching and
            # warn once — the loader-level --cache_data_device keys PER
            # SAMPLE and is the right tool for shuffled batches.
            cap = max(int(getattr(self.opt, "data_len", 0) or 0), 32)
            cache = self._sample_dev_cache
            if len(cache) < cap:
                cache[(self._sample_key, phase)] = dict(dev)
            elif not getattr(self, "_sample_cache_capped", False):
                import warnings
                warnings.warn(
                    f"--device_sample_cache hit its {cap}-entry cap (batched "
                    "+ shuffled sample tuples?); further samples are not "
                    "cached. Use the loader's --cache_data_device for "
                    "shuffled batch_size > 1 runs.")
                self._sample_cache_capped = True

    # ------------------------------------------------------------------
    def _g_raw_apply(self, params, x_in, style=None, train=True):
        """One stateless G forward — folded-canvas fast path when eligible
        (networks/folded.py; exact, pinned by tests/test_folded.py)."""
        if self._folded_ok:
            from ..networks.folded import folded_unet_apply
            return folded_unet_apply(
                params, x_in, style, ngf=self.opt.ngf, num_downs=8,
                num_layer_separate=self.opt.num_layer_separate,
                image_nc=self.opt.image_nc, touch_nc=self.opt.touch_nc,
                canvas_fold=self.canvas_fold, t_mult=self.mult,
                num_layer_style_code=int(
                    getattr(self.opt, "num_layer_style_code", -1)),
                dtype=self.dtype if train else None)
        net = self.netG if train else self.netG_eval
        g_args = (x_in, style) if style is not None else (x_in,)
        return net.apply({"params": params}, *g_args)

    # ------------------------------------------------------------------
    def _apply_d(self, state_params, state_stats, net, x, interm: bool = False):
        if net is getattr(self, "netD", None) \
                and getattr(self, "_folded_d_ok", False) \
                and not interm and x.shape[1] == self._folded_d_size:
            from ..networks.folded_d import folded_multiscale_d_apply
            out, new_stats = folded_multiscale_d_apply(
                state_params, state_stats, x, fold=self.canvas_fold,
                n_layers=self.opt.n_layers_D, num_D=self.opt.num_D_D1,
                use_sigmoid=self.opt.gan_mode == "vanilla", dtype=self.dtype)
            return out, new_stats
        variables = {"params": state_params}
        if state_stats:
            variables["batch_stats"] = state_stats
            out, mut = net.apply(variables, x, mutable=["batch_stats"])
            return out, mut["batch_stats"]
        return net.apply(variables, x), state_stats

    def _train_step(self, gS, dS, d2S, batch, rng, lr, lr_d2, epoch,
                    frozen=None, use_d3=False):
        opt = self.opt
        # frozen perceptual weights (LPIPS VGG16, CLIP tower, D3 heads) ride
        # as ARGUMENTS: closure constants get embedded in the HLO as literals,
        # which blows remote-compile upload limits (the CLIP tower alone is
        # ~350 MB) and keys the compile cache on weight VALUES.  None falls
        # back to the attrs for direct callers (fleet vmap, unit tests).
        if frozen is None:
            frozen = {"lpips": self.lpips_params}
            if use_d3:
                frozen["clip"] = self.clip_params
                frozen["d3"] = self.d3_heads
        mode = opt.gan_mode
        real_lbl = 0.8 if opt.smooth_GAN_label else 1.0
        S = batch["S"]
        I = batch["I"]
        M = batch.get("M", jnp.ones_like(S))
        n, h, w, _ = S.shape
        M_T = M if self.mult == 1 else resize_nearest(M, (h * self.mult, w * self.mult))
        losses: Dict[str, jnp.ndarray] = {}

        rng_next, k_aug_r, k_aug_f, k_more, k_gp1, k_gp2 = jax.random.split(rng, 6)

        # pre-cast the canvas constants to the compute dtype: mixed f32/bf16
        # concats otherwise insert canvas-sized convert fusions in every D pass
        cd = self.dtype or jnp.float32
        S_d = S.astype(cd)
        I_d = I.astype(cd)

        # ---- 1. G forward under vjp ----
        pe = self._pe(n, h, w)
        x_in = jnp.concatenate([S, pe], axis=-1) if pe is not None else S

        style = batch.get("style_code") if getattr(self.opt, "use_style_code", False) else None

        def g_fn(params):
            variables = {"params": params}
            g_args = (x_in, style) if style is not None else (x_in,)
            if gS.stats:
                variables["batch_stats"] = gS.stats
                out, mut = self.netG.apply(variables, *g_args, mutable=["batch_stats"])
                new_stats = mut["batch_stats"]
            else:
                out = self._g_raw_apply(params, x_in, style, train=True)
                new_stats = gS.stats
            # under the bf16 policy the full-res outputs STAY bf16 (losses
            # accumulate in fp32) — halves HBM traffic on the G-loss path
            fake_I, fake_T = self._split_g_out(out, M, M_T)
            return (fake_I, fake_T), new_stats

        # batch>1 at 1536² sits at the HBM edge: rematerialize the G forward
        # (backward recomputes activations instead of storing the full
        # encoder/decoder stack per sample).  --remat_g on|off|auto.
        remat_g = getattr(opt, "remat_g", "auto")
        if remat_g == "on" or (remat_g == "auto" and n > 1):
            g_fn = jax.checkpoint(g_fn)

        (fake_I, fake_T), g_vjp, new_g_stats = jax.vjp(g_fn, gS.params, has_aux=True)
        fake_I_d = jax.lax.stop_gradient(fake_I)
        fake_T_d = jax.lax.stop_gradient(fake_T)

        # diffaug (feeds D2 conditioning + logs only — reference behavior)
        if opt.use_diffaug:
            aug_real_I = diff_augment(k_aug_r, I_d, opt.diffaugment) * M.astype(cd)
            aug_fake_I = diff_augment(k_aug_f, fake_I_d, opt.diffaugment) * M.astype(cd)
        else:
            aug_real_I = I_d
            aug_fake_I = fake_I_d

        # ---- 2. D1 update ----
        if "D" in self.model_names:
            def d1_loss_fn(d_params):
                stats = dS.stats
                fake_in = jnp.concatenate([S_d, fake_I_d], -1) if opt.use_cGAN else fake_I_d
                pred_fake, stats = self._apply_d(d_params, stats, self.netD, fake_in)
                l_fake = jnp.mean(gan_loss(pred_fake, False, mode, real_lbl)) * opt.lambda_G1_GAN
                real_in = jnp.concatenate([S_d, I_d], -1) if opt.use_cGAN else I_d
                pred_real, stats = self._apply_d(d_params, stats, self.netD, real_in)
                l_real = jnp.mean(gan_loss(pred_real, True, mode, real_lbl)) * opt.lambda_G1_GAN
                gp = 0.0
                if mode == "wgangp":
                    gp = gradient_penalty(
                        lambda z: self._apply_d(d_params, dS.stats, self.netD, z)[0],
                        real_in, fake_in, k_gp1)
                total = (l_fake + l_real + gp) * 0.5
                logit_map = pred_fake[-1][-1] if isinstance(pred_fake, (list, tuple)) \
                    else pred_fake
                return total, (l_fake, l_real, gp, stats, logit_map)

            (loss_d1, (lf, lr_, gp1, d_stats, pred_fake_I)), d_grads = \
                jax.value_and_grad(d1_loss_fn, has_aux=True)(dS.params)
            dS = adam_step(self.tx_d, dS, d_grads, lr, d_stats)
            losses.update(D_fake_I=lf, D_real_I=lr_, D_I_grad_penalty=gp1)

        # ---- 3. patch stacks ----
        real_T = batch["T_images"]          # (K, pc, pc, 2), pre-masked
        coords = batch["T_coords"]
        i_masks = batch["I_masks"]
        valid = batch["T_valid"]
        k = real_T.shape[0]
        pc = real_T.shape[1]

        fake_T_patch = gather_patches_from_coords(fake_T, coords, 32, self.mult)
        S_patch = gather_patches_from_coords(S_d, coords, 32, 1)
        realI_patch = gather_patches_from_coords(aug_real_I, coords, 32, 1)
        fakeI_patch = gather_patches_from_coords(aug_fake_I, coords, 32, 1)
        if self.mult != 1:
            from ..ops.resize import resize_bicubic
            S_patch = resize_bicubic(S_patch, (pc, pc))
            realI_patch = resize_bicubic(realI_patch, (pc, pc))
            fakeI_patch = resize_bicubic(fakeI_patch, (pc, pc))
        realI_cond = jnp.concatenate([realI_patch, i_masks], -1)
        fakeI_cond = jnp.concatenate([fakeI_patch, i_masks], -1)

        def d2_cond(t_patch, s_p, i_p):
            parts = [t_patch]
            if opt.use_cGAN_G2:
                if opt.use_cGAN_G2_S:
                    parts.append(s_p)
                if opt.use_cGAN_G2_I:
                    parts.append(i_p)
            return jnp.concatenate(parts, -1)

        fake_T_patch_d = jax.lax.stop_gradient(fake_T_patch)

        # more fake T samples ∝ dilated mask (vmapped across the batch)
        if opt.use_more_fakeT:
            mk = opt.add_fake_T_sample_size

            def sample_one(key, m_t, f_t, s_img, f_i):
                ox, oy = sample_offsets_in_mask(key, m_t[..., 0], mk, pc)
                return (gather_patches(f_t, ox, oy, pc),
                        gather_patches(s_img, ox // self.mult, oy // self.mult, 32),
                        gather_patches(f_i, ox // self.mult, oy // self.mult, 32))

            if n > 1:
                keys = jax.random.split(k_more, n)
                more_T, more_S, more_I = jax.vmap(sample_one)(
                    keys, M_T, fake_T_d, S_d, fake_I_d)
                more_T = more_T.reshape((-1,) + more_T.shape[2:])
                more_S = more_S.reshape((-1,) + more_S.shape[2:])
                more_I = more_I.reshape((-1,) + more_I.shape[2:])
            else:
                off_x, off_y = sample_offsets_in_mask(k_more, M_T[0, ..., 0], mk, pc)
                more_T = gather_patches(fake_T_d, off_x, off_y, pc)
                more_S = gather_patches(S_d, off_x // self.mult, off_y // self.mult, 32)
                more_I = gather_patches(fake_I_d, off_x // self.mult, off_y // self.mult, 32)
            if self.mult != 1:
                from ..ops.resize import resize_bicubic
                more_S = resize_bicubic(more_S, (pc, pc))
                more_I = resize_bicubic(more_I, (pc, pc))
            more_I = jnp.concatenate([more_I, jnp.ones_like(more_I[..., :1])], -1)
            more_cond = d2_cond(more_T, more_S, more_I)

        # ---- 4. D2 update ----
        if "D2" in self.model_names:
            def d2_loss_fn(d2_params):
                stats = d2S.stats
                pf, stats = self._apply_d(d2_params, stats, self.netD2,
                                          d2_cond(fake_T_patch_d, S_patch, fakeI_cond))
                l_fake = masked_mean(per_sample_gan_loss(pf, False, mode, real_lbl),
                                     valid) * opt.lambda_G2_GAN
                l_more = 0.0
                if opt.use_more_fakeT:
                    pm, stats = self._apply_d(d2_params, stats, self.netD2, more_cond)
                    l_more = jnp.mean(per_sample_gan_loss(pm, False, mode, real_lbl)) \
                        * opt.lambda_G2_GAN
                pr, stats = self._apply_d(d2_params, stats, self.netD2,
                                          d2_cond(real_T, S_patch, realI_cond))
                l_real = masked_mean(per_sample_gan_loss(pr, True, mode, real_lbl),
                                     valid) * opt.lambda_G2_GAN
                gp = 0.0
                if mode == "wgangp":
                    gp = gradient_penalty(
                        lambda z: self._apply_d(d2_params, d2S.stats, self.netD2, z)[0],
                        d2_cond(real_T, S_patch, realI_cond),
                        d2_cond(fake_T_patch_d, S_patch, fakeI_cond), k_gp2)
                total = (l_fake + l_more + l_real + gp) * 0.5
                return total, (l_fake, l_more, l_real, gp, stats, pr)

            (loss_d2, (lf2, lm2, lr2, gp2, d2_stats, pred_real_T)), d2_grads = \
                jax.value_and_grad(d2_loss_fn, has_aux=True)(d2S.params)
            d2S = adam_step(self.tx_d2, d2S, d2_grads, lr_d2, d2_stats)
            losses.update(D_fake_T_concat=lf2, D_more_fake_T=lm2,
                          D_real_T_concat=lr2, D_T_grad_penalty=gp2)
        else:
            pred_real_T = None

        # ---- 4b. vision-aided D3 real logits (heads frozen by default — the
        # reference never adds netD3 to an optimizer; sinskitG_model.py:601-700).
        # CLIP(real) runs once here; CLIP(fake) runs ONCE inside the G loss
        # and its detached logits are reused for the D3 D-loss log term —
        # one full ViT pass fewer than the naive d3_d_loss + d3_g_loss pair,
        # identical values.
        d3_real_logits = None
        if use_d3:
            d3_real_logits = batch.get("d3_real_logits")
            if d3_real_logits is None:
                from ..losses.vision_aided import d3_logits
                d3_real_logits = d3_logits(frozen["clip"], frozen["d3"], I)

        # ---- 5. G update against updated discriminators ----
        def g_loss_from_fake(fake_pair):
            f_I, f_T = fake_pair
            aux: Dict[str, jnp.ndarray] = {}
            total = 0.0
            # G1
            if opt.lambda_G1_GAN > 0:
                g_in = jnp.concatenate([S_d.astype(f_I.dtype), f_I], -1) \
                    if opt.use_cGAN else f_I
                pred, _ = self._apply_d(dS.params, dS.stats, self.netD, g_in)
                aux["G_GAN"] = jnp.mean(gan_loss(pred, True, mode, real_lbl)) * opt.lambda_G1_GAN
                total += aux["G_GAN"]
            if opt.lambda_G1_L1 > 0:
                aux["G_L1"] = jnp.mean(jnp.abs(f_I - I.astype(f_I.dtype)),
                                       dtype=jnp.float32) * opt.lambda_G1_L1
                total += aux["G_L1"]
            if opt.lambda_G1_lpips > 0:
                # y_no_grad: the real image's VGG branch is forward-only —
                # the joint 2N-batch pass paid the backward for it too.
                # lpips_fold runs the first VGG blocks space-to-depth folded
                # at the canvas (exact; losses/lpips.py) — the 3/64-lane
                # 1536² block-1 tensors are the step's worst layouts.
                # lpips_tap_cache: the real canvas's taps ride in via
                # ``frozen`` as loop-invariant args (NOT per-step scan
                # inputs — the refuted d3_logit_cache pattern), so the
                # y-branch forward vanishes from the step graph entirely.
                y_taps = frozen.get("lpips_I_taps") \
                    if not getattr(opt, "lpips_crop", 0) else None
                lp_fn = lambda a, b: lpips(
                    frozen["lpips"], a, b, dtype=self.dtype, y_no_grad=True,
                    fold=int(getattr(opt, "lpips_fold", 2)), y_taps=y_taps,
                    fold_axis=getattr(opt, "lpips_fold_axis", "w"),
                    head_mode=getattr(opt, "lpips_head", "composed"),
                    conv_backend=getattr(opt, "lpips_conv", "xla"))
                lr_mode = getattr(opt, "lpips_remat", "auto")
                lr_mode = {True: "on", False: "auto", "True": "on",
                           "False": "auto", "1": "on", "0": "auto"}.get(
                               lr_mode, lr_mode)
                if lr_mode not in ("auto", "on", "off"):
                    # raise at trace time instead of silently landing in the
                    # 'off' arm (which would corrupt an A/B unnoticed)
                    raise ValueError(
                        f"--lpips_remat: unrecognized value {lr_mode!r} "
                        "(use auto|on|off, or 1/True ≡ on, 0/False ≡ auto)")
                if lr_mode == "on" or (lr_mode == "auto" and n > 1):
                    # remat the VGG backbone: at batch>1 the stored tap
                    # activations (~GBs at 1536²) can exceed HBM; recompute
                    # in the backward instead.  'on' forces it at batch 1
                    # (A/B knob: residual write+read HBM traffic vs a second
                    # forward's FLOPs); 'off' keeps the taps resident even
                    # at batch>1 — the selective-remat arm pairing with
                    # --remat_g on (VERDICT r3 item 5)
                    lp_fn = jax.checkpoint(lp_fn)
                lp_x, lp_y = f_I, I.astype(f_I.dtype)
                lpc = int(getattr(opt, "lpips_crop", 0))
                if 0 < lpc < max(f_I.shape[1], f_I.shape[2]):
                    # --lpips_crop: stochastic canvas LPIPS on one random
                    # lpc² window per step (non-parity speed knob, see the
                    # flag help).  Offsets ride a fold_in of k_more so the
                    # default RNG stream is untouched when the knob is off;
                    # the backward is a dynamic_update_slice scatter of the
                    # window's cotangent into a zero canvas.
                    kcy, kcx = jax.random.split(jax.random.fold_in(k_more, 113))
                    oy = jax.random.randint(
                        kcy, (), 0, max(f_I.shape[1] - lpc, 0) + 1)
                    ox = jax.random.randint(
                        kcx, (), 0, max(f_I.shape[2] - lpc, 0) + 1)

                    def _crop(t):
                        return jax.lax.dynamic_slice(
                            t, (0, oy, ox, 0),
                            (t.shape[0], min(lpc, t.shape[1]),
                             min(lpc, t.shape[2]), t.shape[3]))

                    lp_x, lp_y = _crop(lp_x), _crop(lp_y)
                aux["G_lpips"] = jnp.mean(lp_fn(lp_x, lp_y)) \
                    * opt.lambda_G1_lpips
                total += aux["G_lpips"]
            # G2 — L1 + LPIPS drive the gradient; GAN terms detached unless overridden
            f_T_patch = gather_patches_from_coords(f_T, coords, 32, self.mult)
            if opt.lambda_G2_L1 > 0:
                l1map = jnp.abs(f_T_patch.astype(jnp.float32) - real_T) \
                    * valid[:, None, None, None]
                # per-image patch SUM, batch MEAN (reference .sum(1).mean())
                aux["G2_L1"] = jnp.sum(jnp.mean(l1map, axis=(1, 2, 3))) \
                    * opt.lambda_G2_L1 / n
                total += aux["G2_L1"]
            if opt.lambda_G2_lpips > 0:
                # gx and gy share the LPIPS backbone: one (2K,)-batch pass
                lp_both = lpips(
                    frozen["lpips"],
                    jnp.concatenate([f_T_patch[..., 0:1], f_T_patch[..., 1:2]], 0),
                    jnp.concatenate([real_T[..., 0:1], real_T[..., 1:2]], 0),
                    dtype=self.dtype, y_no_grad=True,
                    head_mode=getattr(opt, "lpips_head", "composed"))
                lp_gx, lp_gy = lp_both[:k], lp_both[k:]
                aux["G2_lpips"] = (masked_patch_sum(lp_gx, valid) / jnp.maximum(n, 1)
                                   + masked_patch_sum(lp_gy, valid) / jnp.maximum(n, 1)) \
                    * opt.lambda_G2_lpips
                total += aux["G2_lpips"]
            if opt.lambda_G2_GAN > 0 and "D2" in self.model_names:
                t_for_gan = f_T_patch if opt.g2_gan_backprop else jax.lax.stop_gradient(f_T_patch)
                pf, _ = self._apply_d(d2S.params, d2S.stats, self.netD2,
                                      d2_cond(t_for_gan, S_patch, fakeI_cond))
                vec = per_sample_gan_loss(pf, True, mode, real_lbl) * opt.lambda_G2_GAN
                # reference view(-1, K).mean(0).sum(): per-image patch sum,
                # batch mean — with the validity mask that is Σ(vec·valid)/N
                aux["G2_GAN"] = masked_patch_sum(vec, valid) / n
                total += aux["G2_GAN"]
                if opt.lambda_G2_GAN_feat > 0 and opt.netD2 == "multiscale" \
                        and pred_real_T is not None and isinstance(pf, (list, tuple)) \
                        and len(pf[0]) > 1:
                    from ..losses.gan import feature_matching_loss
                    aux["G2_GAN_feat"] = feature_matching_loss(
                        pf, pred_real_T, opt.n_layers_D, opt.num_D_D2) * opt.lambda_G2_GAN_feat
                    total += aux["G2_GAN_feat"]
            if use_d3:
                from ..losses.vision_aided import d3_logits
                lf = d3_logits(frozen["clip"], frozen["d3"], f_I)
                aux["G_D3"] = sum(jnp.mean(jax.nn.softplus(-l)) for l in lf) \
                    * opt.lambda_G1_GAN
                total += aux["G_D3"]
                # D3 D-objective, log-only (heads frozen): real logits from
                # 4b + the SAME fake pass, detached — no extra CLIP forward
                d3_d = 0.0
                for a, b in zip(d3_real_logits, lf):
                    d3_d = d3_d + jnp.mean(jax.nn.softplus(-a)) \
                        + jnp.mean(jax.nn.softplus(jax.lax.stop_gradient(b)))
                aux["D3_loss"] = d3_d * 0.5 * opt.lambda_G1_GAN
            return total, aux

        (loss_g, g_aux), fake_cotangent = jax.value_and_grad(
            g_loss_from_fake, has_aux=True)((fake_I, fake_T))
        g_grads = g_vjp(fake_cotangent)[0]
        gS = adam_step(self.tx_g, gS, g_grads, lr, new_g_stats)
        losses.update(g_aux)
        losses["G_total"] = loss_g

        outputs = {"fake_I": fake_I_d, "fake_T": fake_T_d,
                   "aug_real_I": aug_real_I, "aug_fake_I": aug_fake_I,
                   "next_rng": rng_next}
        if "D" in self.model_names:
            # D1's response to the fake (reference's pred_fake_I visual)
            outputs["pred_fake_I"] = jax.lax.stop_gradient(pred_fake_I)
        return gS, dS, d2S, losses, outputs

    # ------------------------------------------------------------------
    def _multi_step(self, gS, dS, d2S, batches, rng, lr, lr_d2, epoch,
                    frozen=None, use_d3=False):
        """lax.scan of the fused step over a stacked chunk of batches — ONE
        dispatch per chunk.  On tunneled/remote backends each jitted call
        costs a network round-trip (~4× the 60 ms device step time at 1536²);
        scanning k steps amortizes it.  Semantics are exactly k sequential
        steps (the per-step rng chain threads through the carry)."""

        def body(carry, batch):
            gS_, dS_, d2S_, rng_ = carry
            gS_, dS_, d2S_, losses, outputs = self._train_step(
                gS_, dS_, d2S_, batch, rng_, lr, lr_d2, epoch,
                frozen=frozen, use_d3=use_d3)
            return (gS_, dS_, d2S_, outputs["next_rng"]), losses

        (gS, dS, d2S, rng), losses_seq = jax.lax.scan(
            body, (gS, dS, d2S, rng), batches)
        # report the last step's losses (stacked sequences stay on device)
        last = jax.tree_util.tree_map(lambda x: x[-1], losses_seq)
        return gS, dS, d2S, last, rng

    def optimize_parameters_chunk(self, stacked_batches, epoch: int = 0,
                                  sample_keys=None) -> int:
        """Run k = leading-axis steps in one dispatch. ``stacked_batches``:
        the per-step input dict with an extra leading step axis.
        ``sample_keys``: the per-step ``_sample_key`` values captured at
        set_input time — the per-slice dispatch branches below replace
        ``self._input`` wholesale, and the D3 real-logit device cache keys
        off the matching sample identity (None disables caching for the
        slice rather than poisoning the cache with a stale key)."""
        def _set_slice(i):
            self._input = jax.tree_util.tree_map(
                lambda x: x[i], stacked_batches)
            self._sample_key = sample_keys[i] if sample_keys else None
        if not getattr(self, "supports_chunk", False):
            # baseline subclasses (pix2pix family) define their own
            # optimize_parameters but inherit this method and never build
            # the scan/chunk machinery — degrade to per-step dispatch
            k = jax.tree_util.tree_leaves(stacked_batches)[0].shape[0]
            for i in range(int(k)):
                _set_slice(i)
                self.optimize_parameters(epoch)
            return int(k)
        if getattr(self.opt, "step_mode", "fused") == "split":
            # split mode has no scan fusion — slice the chunk and dispatch
            # per step (all stage calls stay async; the device never idles)
            k = jax.tree_util.tree_leaves(stacked_batches)[0].shape[0]
            for i in range(int(k)):
                _set_slice(i)
                self._optimize_split(epoch)
            return int(k)
        active = self.use_d3 and epoch >= self.opt.vision_aided_warmup_epoch
        if (active and getattr(self.opt, "d3_logit_cache", False)
                and sample_keys and all(k is not None for k in sample_keys)
                and "d3_real_logits" not in stacked_batches):
            # ship the constant CLIP(real_I) logits per slice instead of
            # recomputing them inside every scanned step (same per-sample
            # device cache the plain-step path uses)
            frozen = self._frozen_args(active)
            saved_in, saved_key = self._input, getattr(self, "_sample_key", None)
            logit_tuples = []
            for i, sk in enumerate(sample_keys):
                self._sample_key = sk
                self._input = jax.tree_util.tree_map(
                    lambda x: x[i], stacked_batches)
                rl = self._d3_real_logits_cached(frozen)
                if rl is None:  # heads training: logits not constant
                    logit_tuples = None
                    break
                logit_tuples.append(rl)
            self._input, self._sample_key = saved_in, saved_key
            if logit_tuples is not None:
                stacked_batches = dict(
                    stacked_batches,
                    d3_real_logits=jax.tree_util.tree_map(
                        lambda *xs: jnp.stack(xs), *logit_tuples))
        self._last_chunk = stacked_batches  # what _jit_multi actually saw
                                            # (bench cost-analysis re-lowers it)
        key = ("multi", active, "d3_real_logits" in stacked_batches)
        if getattr(self, "_jit_multi_key", None) != key:
            self._jit_multi = jax.jit(
                functools.partial(self._multi_step, use_d3=active),
                donate_argnums=(0, 1, 2))
            self._jit_multi_key = key
        if getattr(self, "_scalar_epoch", None) != (epoch, getattr(self, "lr_override", 1.0)):
            scale = float(getattr(self, "lr_override", 1.0))
            f = lr_factor(self.opt.lr_policy, epoch - 1, self.opt)
            self._lr_dev = jnp.float32(self.opt.lr * scale * f)
            self._lr2_dev = jnp.float32(self.opt.lr_G2 * scale * f)
            self._epoch_dev = jnp.int32(epoch)
            self._scalar_epoch = (epoch, scale)
        if getattr(self, "_rng_dev", None) is None:
            self._rng_dev = self.rng
        frozen_call = self._frozen_args(active)
        if (getattr(self.opt, "lpips_tap_cache", False) and sample_keys
                and sample_keys[0] is not None
                and all(k == sample_keys[0] for k in sample_keys)):
            # every step of the chunk shares one sample: its constant real
            # canvas taps ride as ONE loop-invariant arg into the scan
            saved_in = self._input
            saved_key = getattr(self, "_sample_key", None)
            _set_slice(0)
            frozen_call = self._frozen_with_taps(frozen_call)
            self._input, self._sample_key = saved_in, saved_key
        gS, dS, d2S, losses, rng = self._jit_multi(
            self.states["G"], self.states.get("D"), self.states.get("D2"),
            stacked_batches, self._rng_dev, self._lr_dev, self._lr2_dev,
            self._epoch_dev, frozen_call)
        self._rng_dev = rng
        self.states["G"] = gS
        if dS is not None:
            self.states["D"] = dS
        if d2S is not None:
            self.states["D2"] = d2S
        self._losses_dev = losses
        k = jax.tree_util.tree_leaves(stacked_batches)[0].shape[0]
        return int(k)

    # ------------------------------------------------------------------
    def _split_g_out(self, out, M, M_T, force_f32: bool = False):
        """Split the generator output into masked (fake_I, fake_T).

        At T_resolution_multiplier > 1 the net returns a (visual, tactile)
        tuple with the tactile head at mult× the canvas; at 1 a single
        5-channel map (reference sinskitG_model.py:1309-1319)."""
        if isinstance(out, tuple):
            vis, tac = out
        else:
            if self.dtype is None or force_f32:
                out = out.astype(jnp.float32)
            vis = out[..., : self.opt.image_nc]
            tac = out[..., self.opt.image_nc :]
        if self.dtype is None or force_f32:
            vis = vis.astype(jnp.float32)
            tac = tac.astype(jnp.float32)
        return vis * M.astype(vis.dtype), tac * M_T.astype(tac.dtype)

    # ------------------------------------------------------------------
    def _forward_eval(self, g_vars, S, M, M_T, style_code=None):
        n, h, w, _ = S.shape
        pe = self._pe(n, h, w)
        x = jnp.concatenate([S, pe], axis=-1) if pe is not None else S
        if len(g_vars) == 1 and "params" in g_vars:
            out = self._g_raw_apply(g_vars["params"], x, style_code, train=False)
        else:  # batch-stats nets go through the module
            g_args = (x, style_code) if style_code is not None else (x,)
            out = self.netG_eval.apply(g_vars, *g_args)
        return self._split_g_out(out, M, M_T, force_f32=True)

    # ------------------------------------------------------------------
    def _frozen_args(self, use_d3: bool = None):
        """Device-resident frozen perceptual weights, passed to the jitted
        step as an argument (NOT captured — see _train_step).  Only the
        weights the phase actually uses ship: the ~350 MB CLIP tower rides
        only when D3 is active (on a replicated multi-device mesh an unused
        tower still costs memory × devices)."""
        if use_d3 is None:
            use_d3 = bool(getattr(self, "_d3_active", False))
        cache = getattr(self, "_frozen_dev", None)
        if cache is None:
            cache = self._frozen_dev = {}
        if use_d3 not in cache:
            fz = {"lpips": self.lpips_params}
            if use_d3:
                fz["clip"] = self.clip_params
                fz["d3"] = self.d3_heads
            rep = getattr(self, "_dp_rep", None) \
                if getattr(self, "_dp_mesh", None) is not None else None
            cache[use_d3] = jax.device_put(fz, rep) if rep is not None \
                else jax.device_put(fz)
        return cache[use_d3]

    # ------------------------------------------------------------------
    def _d3_real_logits_cached(self, frozen):
        """Device-cached CLIP logits of the CONSTANT real image: the dataset's
        crops are fixed across all epochs, and the D3 heads are frozen by
        default (the reference never optimizes netD3), so CLIP(real_I) per
        sample is computed once in ~400 epochs instead of every step.
        Returns None when the heads train (logits then depend on them)."""
        if getattr(self.opt, "train_d3_heads", False):
            return None
        if getattr(self, "_d3_logit_jit", None) is None:
            from ..losses.vision_aided import d3_logits
            self._d3_logit_jit = jax.jit(
                lambda c, d, i: tuple(d3_logits(c, d, i)))
            self._d3_real_cache = {}
        key = getattr(self, "_sample_key", None)
        if key is None:
            return self._d3_logit_jit(frozen["clip"], frozen["d3"],
                                      self._input["I"])
        if key not in self._d3_real_cache:
            self._d3_real_cache[key] = self._d3_logit_jit(
                frozen["clip"], frozen["d3"], self._input["I"])
        return self._d3_real_cache[key]

    def _lpips_taps_cached(self, frozen):
        """Device-cached VGG taps of the CONSTANT real canvas (lpips_y_taps):
        computed once per sample in ~400 epochs instead of every step.  A
        1-entry cache — the chunked path requires every step of a chunk to
        share one sample anyway, and the taps are ~0.6 GB at the flagship
        canvas (tap0 is 1536²×64), so caching more than the active sample
        would cost HBM for nothing.  Returns None when caching can't apply
        (crop knob active, G1 LPIPS off, or no sample identity)."""
        opt = self.opt
        if (not getattr(opt, "lpips_tap_cache", False)
                or getattr(opt, "lpips_crop", 0)
                or opt.lambda_G1_lpips <= 0
                or getattr(self, "_tap_cache_disabled", False)):
            return None
        # Up-front cycling check, BEFORE anything is jitted: a dataset with
        # data_len > 1 visits every sample once per epoch, so consecutive
        # steps never share a sample and the 1-entry cache can only thrash.
        # Declining here means the jitted step's argument structure (y_taps
        # present/absent) never changes mid-run — the late auto-disable below
        # would force a full retrace (5-9 min on the tunneled backend).
        if not getattr(self, "_tap_cache_checked", False):
            self._tap_cache_checked = True
            dl = int(getattr(opt, "data_len", 1) or 1)
            if dl > 1:
                msg = (f"--lpips_tap_cache: data_len={dl} cycles samples every "
                       "step — the 1-entry tap cache cannot hit; leaving it "
                       "OFF from step 0 (the step recomputes the real "
                       "canvas's VGG taps in-graph, values unchanged)")
                print(f"[sinskit] {msg}")
                import warnings
                warnings.warn(msg)
                self._tap_cache_disabled = True
                return None
        key = getattr(self, "_sample_key", None)
        if key is None:
            return None
        if getattr(self, "_lpips_tap_jit", None) is None:
            fold = int(getattr(opt, "lpips_fold", 2))
            axis = getattr(opt, "lpips_fold_axis", "w")
            cb = getattr(opt, "lpips_conv", "xla")
            self._lpips_tap_jit = jax.jit(
                lambda p, y: lpips_y_taps(p, y, dtype=self.dtype, fold=fold,
                                          fold_axis=axis, conv_backend=cb))
            self._lpips_tap_cache_kv = (None, None)
        ck, cv = self._lpips_tap_cache_kv
        hits, misses = getattr(self, "_tap_cache_stats", (0, 0))
        if ck != key:
            misses += 1
            # Thrash guard: the 1-entry cache only pays off when consecutive
            # steps reuse one sample (data_len small / latency fine-tunes).
            # With a cycling dataset every lookup misses — each miss costs an
            # extra off-step jitted VGG forward plus ~0.6 GB of tap allocation
            # churn at flagship sizes, i.e. SLOWER than not caching.  Detect
            # and auto-disable (exact either way: the step then recomputes
            # the y branch in-graph, same values).
            if misses >= 8 and misses > hits:
                import warnings
                msg = (
                    f"--lpips_tap_cache: {misses} misses vs {hits} hits — the "
                    "dataset cycles samples faster than the 1-entry tap cache "
                    "can help; disabling it (the step recomputes the real "
                    "canvas's VGG taps in-graph, values unchanged). NOTE: this "
                    "changes the jitted step's argument structure and forces a "
                    "retrace (minutes on a tunneled backend). Use the cache "
                    "only with data_len small enough that consecutive steps "
                    "share a sample.")
                print(f"[sinskit] {msg}")  # warnings may not surface in logs
                warnings.warn(msg)
                self._tap_cache_disabled = True
                self._tap_cache_stats = (hits, misses)
                self._lpips_tap_cache_kv = (None, None)
                return None
            cv = self._lpips_tap_jit(frozen["lpips"],
                                     self._input["I"])
            self._lpips_tap_cache_kv = (key, cv)
        else:
            hits += 1
        self._tap_cache_stats = (hits, misses)
        return cv

    def _frozen_with_taps(self, frozen):
        taps = self._lpips_taps_cached(frozen)
        return dict(frozen, lpips_I_taps=taps) if taps is not None else frozen

    def _batch_with_d3_cache(self, active, frozen):
        if not active or not getattr(self.opt, "d3_logit_cache", False):
            return self._input
        rl = self._d3_real_logits_cached(frozen)
        if rl is None:
            return self._input
        return dict(self._input, d3_real_logits=rl)

    # ------------------------------------------------------------------
    def invalidate_step_cache(self) -> None:
        """Drop every cached jitted-train-step wrapper so the next step
        re-traces.  The fused step bakes ``opt.lpips_crop`` / the remat
        policies in at trace time (jax.jit alone only re-traces on SHAPE
        changes), so a mid-run config switch (train.py ``--anneal_epoch``)
        must force it.  ``_d3_active=None`` makes optimize_parameters rebuild
        ``_jit_step`` on its next call; ``_jit_multi_key=None`` does the same
        for the chunked scan step."""
        self._jit_multi_key = None
        self._d3_active = None

    def optimize_parameters(self, epoch: int = 0) -> None:
        assert self._jit_step is not None, "call setup(batch) first"
        if getattr(self.opt, "step_mode", "fused") == "split":
            return self._optimize_split(epoch)
        active = self.use_d3 and epoch >= self.opt.vision_aided_warmup_epoch
        if active != self._d3_active:
            self._d3_active = active
            self._jit_step = jax.jit(
                functools.partial(self._train_step, use_d3=active),
                donate_argnums=(0, 1, 2))
        # one host→device round-trip per step: the rng key lives on device
        # (the step splits it and returns the successor) and the lr/epoch
        # scalars are cached per epoch — on tunneled backends every little
        # device op is a network RPC costing more than the step itself
        if getattr(self, "_scalar_epoch", None) != (epoch, getattr(self, "lr_override", 1.0)):
            scale = float(getattr(self, "lr_override", 1.0))  # plateau hook
            f = lr_factor(self.opt.lr_policy, epoch - 1, self.opt)
            self._lr_dev = jnp.float32(self.opt.lr * scale * f)
            self._lr2_dev = jnp.float32(self.opt.lr_G2 * scale * f)
            self._epoch_dev = jnp.int32(epoch)
            self._scalar_epoch = (epoch, scale)
        if getattr(self, "_rng_dev", None) is None:
            self._rng_dev = self.rng
        frozen = self._frozen_args(active)
        gS, dS, d2S, losses, outputs = self._jit_step(
            self.states["G"], self.states.get("D"), self.states.get("D2"),
            self._batch_with_d3_cache(active, frozen), self._rng_dev,
            self._lr_dev, self._lr2_dev, self._epoch_dev,
            self._frozen_with_taps(frozen))
        self._rng_dev = outputs.pop("next_rng", None)
        self.states["G"] = gS
        if dS is not None:
            self.states["D"] = dS
        if d2S is not None:
            self.states["D2"] = d2S
        # keep device arrays — converting here would sync every step and
        # stall the async dispatch pipeline; get_current_losses converts lazily
        self._losses_dev = losses
        self._outputs = outputs

    def _optimize_split(self, epoch: int) -> None:
        """Split-stage stepping (--step_mode split): one jit per pipeline
        stage (models/sinskit_split.py) — same update math as the fused step,
        but every stage gets its own XLA layout assignment, escaping the
        fused graph's 10-14× lane-padded canvas layouts (RESULTS.md round 3).
        Host bookkeeping mirrors optimize_parameters exactly."""
        active = self.use_d3 and epoch >= self.opt.vision_aided_warmup_epoch
        if getattr(self, "_split_fns", None) is None:
            from .sinskit_split import make_stage_fns, split_step
            self._split_fns = make_stage_fns(self)
            self._split_step_fn = split_step
        if getattr(self, "_scalar_epoch", None) != (epoch, getattr(self, "lr_override", 1.0)):
            scale = float(getattr(self, "lr_override", 1.0))
            f = lr_factor(self.opt.lr_policy, epoch - 1, self.opt)
            self._lr_dev = jnp.float32(self.opt.lr * scale * f)
            self._lr2_dev = jnp.float32(self.opt.lr_G2 * scale * f)
            self._epoch_dev = jnp.int32(epoch)
            self._scalar_epoch = (epoch, scale)
        if getattr(self, "_rng_dev", None) is None:
            self._rng_dev = self.rng
        frozen = self._frozen_args(active)
        gS, dS, d2S, losses, outputs = self._split_step_fn(
            self, self._split_fns, self.states["G"], self.states.get("D"),
            self.states.get("D2"), self._batch_with_d3_cache(active, frozen),
            self._rng_dev, self._lr_dev, self._lr2_dev, frozen, active)
        self._rng_dev = outputs.pop("next_rng", None)
        self.states["G"] = gS
        if dS is not None:
            self.states["D"] = dS
        if d2S is not None:
            self.states["D2"] = d2S
        self._losses_dev = losses
        self._outputs = outputs

    def test(self) -> None:
        S = self._input["S"]
        M = self._input.get("M", jnp.ones_like(S))
        h, w = S.shape[1:3]
        M_T = M if self.mult == 1 else resize_nearest(M, (h * self.mult, w * self.mult))
        if getattr(self.opt, "use_style_code", False) and "style_code" in self._input:
            fake_I, fake_T = self._jit_forward(
                self.states["G"].variables(), S, M, M_T, self._input["style_code"])
        else:
            fake_I, fake_T = self._jit_forward(self.states["G"].variables(), S, M, M_T)
        self._outputs = {"fake_I": fake_I, "fake_T": fake_T}

    # ------------------------------------------------------------------
    def get_current_losses(self) -> Dict[str, float]:
        dev = getattr(self, "_losses_dev", None)
        if dev is not None:
            # stack on device → ONE transfer (per-scalar fetches are one
            # round-trip each on remote backends)
            names = list(dev)
            vals = np.asarray(jnp.stack([jnp.asarray(dev[k], jnp.float32)
                                         for k in names]))
            self.losses = {k: float(v) for k, v in zip(names, vals)}
            self._losses_dev = None
        return dict(self.losses)

    def compute_metrics(self, phase: str = "val") -> Dict[str, float]:
        """Epoch-end metric evaluation (reference sinskitG_model.py:809-928)."""
        out = self._outputs
        fake_I = out["fake_I"]
        fake_T = out["fake_T"]
        real_I = self._input.get("I")
        res: Dict[str, float] = {}
        if phase == "test" or getattr(self, "data_phase", "train") == "test":
            # test sets carry one coord set, reported unprefixed (reference test.py:88-112)
            sources = (("", "T_coords", "T_images", "T_valid"),)
        else:
            sources = (("train_", "T_coords", "T_images", "T_valid"),
                       ("", "val_T_coords", "val_T_images", "val_T_valid"))
        n = int(np.asarray(fake_I).shape[0])
        for prefix, ckey, tkey, vkey in sources:
            if ckey not in self._input:
                continue
            coords = np.asarray(self._input[ckey]).reshape(n, -1, 8)
            valid = np.asarray(self._input[vkey]).reshape(n, -1) > 0
            real_T = np.asarray(self._input[tkey]).reshape(
                (n, -1) + np.asarray(self._input[tkey]).shape[-3:])
            if valid.sum() == 0 or real_I is None:
                continue
            # per-sample evaluation, averaged over the batch (the reference
            # only ever evaluates batch 1)
            if getattr(self.opt, "eval_mode", "batched") == "batched":
                # one jitted device pass + one host fetch PER SAMPLE (the
                # legacy loop's per-metric syncs cost ~30 min/epoch on a
                # tunneled backend — RESULTS.md round 2/3).  At batch_size>1
                # the samples are evaluated one at a time: the N-sample eval
                # graph (Inception + LPIPS over N full-res canvases at once)
                # OOMs at the flagship resolution (measured: 16.93 G needed
                # vs 15.75 G HBM at N=2), and eval is ~5 s/epoch anyway.
                from ..metrics.evaluate_batch import \
                    compute_evaluation_metrics_batched
                per_sample = []
                for i in range(n):
                    per_sample.extend(
                        d for d in compute_evaluation_metrics_batched(
                            real_I[i : i + 1], fake_I[i : i + 1],
                            fake_T[i : i + 1], coords[i : i + 1],
                            real_T[i : i + 1], valid[i : i + 1],
                            eval_metrics=self.eval_metrics,
                            lpips_params=self.lpips_params,
                            inception_params=self.inception_params,
                            mult=self.mult, prefix=prefix) if d)
            else:
                per_sample = []
                for i in range(n):
                    v = valid[i]
                    if v.sum() == 0:
                        continue
                    fake_T_patch = gather_patches_from_coords(
                        fake_T[i : i + 1], jnp.asarray(coords[i]), 32, self.mult)
                    per_sample.append(compute_evaluation_metrics(
                        real_I[i : i + 1], fake_I[i : i + 1],
                        jnp.asarray(real_T[i][v]),
                        jnp.asarray(np.asarray(fake_T_patch)[v]),
                        eval_metrics=self.eval_metrics,
                        lpips_params=self.lpips_params,
                        inception_params=self.inception_params,
                        prefix=prefix))
            if per_sample:
                keys = set().union(*per_sample)
                res.update({k: float(np.mean([m[k] for m in per_sample if k in m]))
                            for k in keys})
        self.metrics = res
        return res

    def get_current_metrics(self) -> Dict[str, float]:
        return dict(self.metrics)

    # ------------------------------------------------------------------
    def _pred_fake_T_full(self):
        """Full-canvas D2 response heatmap — the reference's
        ``pred_fake_T_full`` visual (sinskitG_model.py:1463-1501: D2 applied
        to [fake_T, resized S, resized (aug_fake_I, M)], finest scale's last
        logit map, detached).  The reference pays this extra full-canvas D2
        pass INSIDE every training step; here it runs as a separate jitted
        pass only when visuals are actually requested (display/HTML cadence).
        BN batch stats are peeked, not updated (the in-step stats are the
        ones that train)."""
        if getattr(self, "_jit_d2_full", None) is None:
            opt = self.opt

            def f(params, stats, fake_T, S, aug_I, M):
                th, tw = fake_T.shape[1:3]
                parts = [fake_T]
                if opt.use_cGAN_G2:
                    from ..ops.resize import resize_bicubic
                    if opt.use_cGAN_G2_S:
                        s = S if self.mult == 1 else resize_bicubic(S, (th, tw))
                        parts.append(s.astype(fake_T.dtype))
                    if opt.use_cGAN_G2_I:
                        i4 = jnp.concatenate([aug_I, M.astype(aug_I.dtype)], -1)
                        if self.mult != 1:
                            i4 = resize_bicubic(i4, (th, tw))
                        parts.append(i4.astype(fake_T.dtype))
                pred, _ = self._apply_d(params, stats, self.netD2,
                                        jnp.concatenate(parts, -1))
                return pred[-1][-1] if isinstance(pred, (list, tuple)) else pred

            self._jit_d2_full = jax.jit(f)
        d2S = self.states["D2"]
        out = self._outputs
        inp = self._input
        S = inp["S"]
        return self._jit_d2_full(
            d2S.params, d2S.stats, out["fake_T"], S,
            out.get("aug_fake_I", out["fake_I"]),
            inp.get("M", jnp.ones_like(S)))

    def get_current_visuals(self) -> Dict[str, np.ndarray]:
        """NHWC float arrays for the visualizer."""
        vis: Dict[str, np.ndarray] = {}
        inp = self._input
        vis["real_S"] = np.asarray(inp["S"])
        if "I" in inp:
            vis["real_I"] = np.asarray(inp["I"])
        if "M" in inp:
            vis["M"] = np.asarray(inp["M"])
        out = getattr(self, "_outputs", None)
        if out:
            vis["fake_I"] = np.asarray(out["fake_I"])
            fake_T = np.asarray(out["fake_T"])
            vis["fake_gx"] = fake_T[..., 0:1]
            vis["fake_gy"] = fake_T[..., 1:2]
            vis["fake_N"] = np.asarray(compute_normal(jnp.asarray(fake_T),
                                                      scale_nz=self.opt.scale_nz))
            for k in ("aug_real_I", "aug_fake_I", "pred_fake_I"):
                if k in out:
                    vis[k] = np.asarray(out[k], dtype=np.float32)
            if (self.isTrain and "D2" in self.states and "fake_T" in out
                    and self.opt.lambda_G2_GAN > 0):
                vis["pred_fake_T_full"] = np.asarray(self._pred_fake_T_full(),
                                                     dtype=np.float32)
            # patch panels + bounding-box overlays (reference's additional
            # visuals, sinskitG_model.py:809-1266)
            from ..data.coords import patch_offsets
            from ..utils.collage import bbox_overlay, patch_collage
            n_log = int(getattr(self.opt, "num_touch_patch_for_logging", 10))
            for prefix, ckey, tkey, vkey, color in (
                    ("train", "T_coords", "T_images", "T_valid", (255, 0, 0)),
                    ("val", "val_T_coords", "val_T_images", "val_T_valid",
                     (0, 255, 0))):
                if ckey not in inp:
                    continue
                # visualize sample 0 (matching tensor2im's first-sample view)
                n_b = int(np.asarray(fake_T).shape[0])
                coords = np.asarray(inp[ckey]).reshape(n_b, -1, 8)[0]
                valid = np.asarray(inp[vkey]).reshape(n_b, -1)[0] > 0
                if valid.sum() == 0:
                    continue
                ox, oy, cut = patch_offsets(coords[valid][:n_log], self.mult)
                vis[f"{prefix}_I_bb"] = bbox_overlay(
                    vis["fake_I"], ox // self.mult, oy // self.mult,
                    cut // self.mult, color)[None]
                vis[f"{prefix}_gx_bb"] = bbox_overlay(
                    vis["fake_gx"], ox, oy, cut, color)[None]
                real_T = np.asarray(inp[tkey]).reshape(
                    (n_b, -1) + np.asarray(inp[tkey]).shape[-3:])[0][valid][:n_log]
                fake_T_patch = np.asarray(gather_patches_from_coords(
                    jnp.asarray(fake_T)[0:1], jnp.asarray(coords[valid][:n_log]),
                    32, self.mult))
                vis[f"{prefix}_real_gx_patches"] = patch_collage(real_T[..., 0:1])[None]
                vis[f"{prefix}_fake_gx_patches"] = patch_collage(fake_T_patch[..., 0:1])[None]
                del fake_T_patch
        return vis

    # ------------------------------------------------------------------
    def save_networks(self, tag: str) -> None:
        ckpt = f"{self.opt.checkpoints_dir}/{self.opt.name}"
        for name in self.model_names:
            if name in self.states:
                save_net(ckpt, tag, name, self.states[name])

    def load_networks(self, tag: str) -> None:
        pretrained = getattr(self.opt, "pretrained_name", None)
        exp = pretrained if pretrained else self.opt.name
        ckpt = f"{self.opt.checkpoints_dir}/{exp}"
        for name in self.model_names:
            if name in self.states:
                self.states[name] = load_net(ckpt, tag, name, self.states[name])
        if getattr(self, "_dp_mesh", None) is not None:
            # restored leaves land on the default device; re-replicate them
            # across the dp mesh so the next step sees compatible placements
            self.states = {k: jax.device_put(v, self._dp_rep)
                           for k, v in self.states.items()}

    def update_learning_rate(self, epoch: int) -> float:
        f = lr_factor(self.opt.lr_policy, epoch, self.opt)
        print(f"learning rate = {self.opt.lr * f:.7f}")
        return f
