"""Benchmark: sinskitG fused-train-step throughput at the flagship config.

Measures steady-state optimization steps/second on the real TPU for the
reference's headline workload — sketch→(image,touch) training at 1536² with
ngf=10, 64 tactile patches + 32 extra fake patches per step, multiscale D1/D2,
full-resolution LPIPS in the G loss (reference models/sinskitG_model.py:321-374,
BASELINE.md).

Baseline: the reference trains one garment in ~16 h on an A5000 —
405 epochs × 200 samples = 81 000 steps → 1.406 steps/s (BASELINE.md).
``vs_baseline`` is ours / 1.406 measured on ONE chip; the garment-fleet axis
(vts_tpu.parallel.fleet) multiplies this by the chip count with zero
communication.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Env knobs: VTS_BENCH_DTYPE=bfloat16|float32 (default bfloat16),
VTS_BENCH_STEPS, VTS_BENCH_SIZE (default 1536).
"""

from __future__ import annotations

import json
import os
import sys
import time
import types

import numpy as np

BASELINE_STEPS_PER_SEC = 81000.0 / (16 * 3600)  # 1.406 — A5000, README.md:129


def build_opt(size: int, dtype: str, mult: int = 1):
    return types.SimpleNamespace(
        dataroot=f"synthetic://bench{size}x{mult}?size={size + 264 if size >= 1536 else size + 64}"
                 f"&center_w={int(size * 5 / 6)}&center_h={int(size * 5 / 8)}"
                 f"&patches=12&val_patches=4&mult={mult}",
        subdir_S="trainS", subdir_I="trainI", subdir_T="trainT", subdir_M="trainM",
        subdir_valT="valT", isTrain=True, data_len=2, preprocess="crop",
        crop_size=size, center_w=int(size * 5 / 6), center_h=int(size * 5 / 8),
        batch_size_G2=64, batch_size_G2_val=64, T_resolution_multiplier=mult,
        sample_bbox_per_patch=2, w_resampling=True, resampling_w_min=1,
        resampling_w_max=10, use_bg_mask=True, sketch_nc=1, image_nc=3, touch_nc=2,
        seed=0, cache_dir="", random_scale_max=3.0, batch_size=1,
        serial_batches=False, num_threads=0, max_dataset_size=None,
        dataset_mode="singleskit", model="sinskit", netG="unet256_custom",
        netD="multiscale", netD2="multiscale", gan_mode="nonsaturating",
        ngf=10, ndf=8, lr=1e-3, lr_G2=5e-4, beta1=0.0, beta2=0.99,
        normG="instance", normD="batch", init_type="xavier", init_gain=0.02,
        no_dropout=True, no_antialias=False, no_antialias_up=False,
        use_cGAN=True, lambda_G1_GAN=1.0, lambda_G1_L1=100.0, lambda_G1_lpips=1.0,
        use_cGAN_G2=True, use_cGAN_G2_S=True, use_cGAN_G2_I=True,
        lambda_G2_GAN=5.0, lambda_G2_L1=10.0, lambda_G2_lpips=10.0,
        lambda_G2_GAN_feat=1.0, smooth_GAN_label=True,
        use_vision_aided_loss=True, vision_aided_warmup_epoch=100,
        n_layers_D=3, n_layers_D2=3, num_layer_separate=4, num_D_D1=3, num_D_D2=3,
        use_positional_encoding=True, positional_encoding_mode="spe",
        positional_encoding_dim=4, use_more_fakeT=True, add_fake_T_sample_size=32,
        use_diffaug=True, diffaugment="bs", g2_gan_backprop=False,
        lpips_fold=2,
        lpips_weights="", inception_weights="", scale_nz=0.25, dtype=dtype,
        epoch_count=1, n_epochs=5, n_epochs_decay=400, lr_policy="linear",
        checkpoints_dir="/tmp/vts_bench_ckpt", name="bench",
        getIntermFeat_D=False,
    )


def apply_ablation(opt, name: str):
    """Perf-triage knobs (VTS_BENCH_ABLATE=comma,separated)."""
    for a in [a for a in name.split(",") if a]:
        if a == "no_lpips":
            opt.lambda_G1_lpips = 0.0
            opt.lambda_G2_lpips = 0.0
        elif a == "no_morefake":
            opt.use_more_fakeT = False
        elif a == "no_d2":
            opt.lambda_G2_GAN = 0.0
        elif a == "no_d1":
            opt.lambda_G1_GAN = 0.0
        elif a == "no_diffaug":
            opt.use_diffaug = False
        elif a == "no_g2gan_log":
            opt.lambda_G2_GAN_feat = 0.0
        elif a == "no_d3":
            opt.use_vision_aided_loss = False
        else:
            raise ValueError(f"unknown ablation {a}")
    return opt


def bench_fleet(model, batches, fleet_n: int, n_steps: int):
    """Production configuration: several garments trained simultaneously on
    one chip via the vmapped fleet step (20 garments / 4-8 chips ⇒ 3-5
    garments per chip).  Reports AGGREGATE garment-steps/second — the number
    that determines wall-clock for the 20-garment fleet."""
    import sys
    import time as _time

    import jax
    import jax.numpy as jnp

    from vts_tpu.parallel.fleet import FleetTrainer, stack_batches
    from vts_tpu.parallel.mesh import build_mesh

    mesh = build_mesh("garment:1")  # single chip; garments share it via vmap
    trainer = FleetTrainer(model, mesh, num_garments=fleet_n)
    states = trainer.init_states(batches[0], seeds=list(range(fleet_n)))
    per_g = []
    for g in range(fleet_n):
        model.set_input(batches[g % len(batches)])
        per_g.append(dict(model._input))
    batch = stack_batches(per_g)
    rngs = jax.random.split(jax.random.key(0), fleet_n)
    jax.block_until_ready(batch)

    t0 = _time.time()
    out = trainer.step(states["G"], states["D"], states["D2"], batch, rngs,
                       1e-3, 5e-4, 1)
    jax.block_until_ready(out[3])
    print(f"[bench] fleet({fleet_n}) compile: {_time.time() - t0:.1f}s", file=sys.stderr)
    states = {"G": out[0], "D": out[1], "D2": out[2]}

    t0 = _time.time()
    for _ in range(n_steps):
        out = trainer.step(states["G"], states["D"], states["D2"], batch, rngs,
                           1e-3, 5e-4, 1)
        states = {"G": out[0], "D": out[1], "D2": out[2]}
    jax.block_until_ready(out[3])
    dt = _time.time() - t0
    agg = fleet_n * n_steps / dt
    print(f"[bench] fleet({fleet_n}): {n_steps} steps in {dt:.2f}s → "
          f"{agg:.3f} garment-steps/s aggregate", file=sys.stderr)
    print(json.dumps({
        "metric": "sinskitG_train_steps_per_sec",
        "value": round(agg, 4),
        "unit": "garment-steps/s",
        "vs_baseline": round(agg / BASELINE_STEPS_PER_SEC, 3),
    }))
    return agg


def _report_step_cost(model, chunk, k: int, rate: float):
    """Analytic utilization of the fused step: XLA cost_analysis flops/bytes
    vs TPU v5e peaks (197 TFLOP/s bf16, 819 GB/s HBM).  The compile here is a
    persistent-cache hit (same HLO as the chunk that just ran)."""
    try:
        chunk = getattr(model, "_last_chunk", chunk)  # incl. injected
                                                      # d3_real_logits, if any
        lowered = model._jit_multi.lower(
            model.states["G"], model.states.get("D"), model.states.get("D2"),
            chunk, model._rng_dev, model._lr_dev, model._lr2_dev,
            model._epoch_dev, model._frozen_args(model._jit_multi_key[1]))
        ca = lowered.compile().cost_analysis()
        # XLA cost analysis counts a while/scan BODY once (trip count is
        # dynamic), so for the k-step chunk the reported flops already
        # approximate ONE step's cost.  'bytes accessed' counts fusion-
        # internal operands too — an upper bound on HBM traffic, so the HBM%
        # column is a lower bound on headroom, not a utilization.
        flops = float(ca.get("flops", float("nan")))
        byts = float(ca.get("bytes accessed", float("nan")))
        peak, bw = 197e12, 819e9
        t = 1.0 / rate
        print(f"[bench] step cost: {flops / 1e9:.1f} GFLOP, {byts / 1e9:.2f} GB "
              f"accessed (≤) → MFU {flops / peak / t * 100:.1f}% at "
              f"{t * 1000:.1f} ms/step", file=sys.stderr)
    except Exception as e:  # cost analysis is best-effort on remote plugins
        print(f"[bench] cost analysis unavailable: {type(e).__name__}: "
              f"{str(e)[:120]}", file=sys.stderr)


def main():
    size = int(os.environ.get("VTS_BENCH_SIZE", "1536"))
    dtype = os.environ.get("VTS_BENCH_DTYPE", "bfloat16")
    n_steps = int(os.environ.get("VTS_BENCH_STEPS", "20"))
    tmult = int(os.environ.get("VTS_BENCH_TMULT", "1"))
    remat = os.environ.get("VTS_BENCH_REMAT", "")

    import jax
    # persistent compilation cache — repeat bench runs skip the 5-minute
    # flagship compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/vts_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    from vts_tpu.data import create_dataset
    from vts_tpu.models import create_model

    opt = build_opt(size, dtype, tmult)
    if os.environ.get("VTS_BENCH_MODEL", "") == "skit":
        # skitG at the flagship canvas: the multi-garment model with the CLIP
        # style code (tile+concat default) — the style code is encoded from
        # the garment's own visual image (reference skitG_model.py:484-486)
        opt.model = "skit"
        opt.use_style_code = True
        opt.style_code_dim = 512
        opt.style_code_mode = "concat"
        opt.style_code_mapping_mode = "tile"
        # reference parity default: ONE injection level (skitG_model.py:274);
        # VTS_BENCH_STYLELAYERS=-1 benches the every-level variant
        opt.num_layer_style_code = int(
            os.environ.get("VTS_BENCH_STYLELAYERS", "1"))
        opt.precomputed_style_codes = False
    if remat:
        opt.remat_g = remat
    step_mode = os.environ.get("VTS_BENCH_STEPMODE", "")
    if step_mode:
        opt.step_mode = step_mode
    fold_env = os.environ.get("VTS_BENCH_FOLD", "")
    if fold_env:
        opt.canvas_fold = int(fold_env)  # 1 disables the folded G forward
    lpips_fold = os.environ.get("VTS_BENCH_LPIPSFOLD", "")
    if lpips_fold:
        opt.lpips_fold = int(lpips_fold)  # fold the first VGG blocks
    lpips_axis = os.environ.get("VTS_BENCH_LPIPSAXIS", "")
    if lpips_axis:
        opt.lpips_fold_axis = lpips_axis  # 'w' = width-only block-1 fold
    lpips_head = os.environ.get("VTS_BENCH_LPIPSHEAD", "")
    if lpips_head:
        opt.lpips_head = lpips_head  # composed | factored tap head
    lpips_conv = os.environ.get("VTS_BENCH_LPIPSCONV", "")
    if lpips_conv:
        if lpips_conv not in ("xla", "pallas"):
            raise SystemExit(
                f"[bench] VTS_BENCH_LPIPSCONV={lpips_conv!r} invalid — "
                "use xla|pallas")
        opt.lpips_conv = lpips_conv  # Pallas fused conv for blocks 1-2
    lpips_crop = os.environ.get("VTS_BENCH_LPIPSCROP", "")
    if lpips_crop:
        # NON-PARITY ablation row: stochastic-crop canvas LPIPS (never the
        # headline config — the headline stays reference-exact full canvas)
        opt.lpips_crop = int(lpips_crop)
    tap_cache = os.environ.get("VTS_BENCH_TAPCACHE", "")
    if tap_cache:
        # device-resident real-canvas VGG taps fed into the step as
        # loop-invariant args: the LPIPS y-branch forward vanishes
        opt.lpips_tap_cache = tap_cache == "1"
    # default 'off' pairs with the batch-2 default above: the measured
    # optimum keeps the VGG taps resident and remats only the G forward
    # (the lpips_remat=auto arm at batch 2 measured slower, RESULTS round 4)
    lpr = os.environ.get("VTS_BENCH_LPIPSREMAT", "off")
    if lpr:
        # auto (default): remat at batch>1 only; on: force at batch 1;
        # off: keep taps resident even at batch>1 (selective-remat arm)
        if lpr not in ("1", "0", "auto", "on", "off"):
            raise SystemExit(
                f"[bench] VTS_BENCH_LPIPSREMAT={lpr!r} invalid — use "
                "1/on, 0/auto, or off (a typo here would silently fall into "
                "the 'off' arm and corrupt the A/B)")
        opt.lpips_remat = {"1": "on", "0": "auto"}.get(lpr, lpr)
    if os.environ.get("VTS_BENCH_D3CACHE", "") == "1":
        # measured ablation: injected CLIP(real) logit cache — SLOWER on chip
        # (D3 phase 21.0 → 32.1 ms/step, RESULTS.md round 3); default off
        opt.d3_logit_cache = True
    ablate = os.environ.get("VTS_BENCH_ABLATE", "")
    if ablate:
        opt = apply_ablation(opt, ablate)
    # the tunneled TPU backend occasionally flaps (UNAVAILABLE on init);
    # retry with backoff so a transient outage doesn't void the bench run
    retries = int(os.environ.get("VTS_BENCH_INIT_RETRIES", "3"))
    for attempt in range(retries):
        try:
            devices = jax.devices()
            break
        except RuntimeError as e:
            if attempt + 1 >= retries:  # no pointless sleep after the last try
                raise SystemExit(
                    f"[bench] TPU backend unavailable after {retries} tries: {e}")
            wait = 120 * (attempt + 1)
            print(f"[bench] backend init failed ({e}); retry {attempt + 1} "
                  f"in {wait}s", file=sys.stderr)
            time.sleep(wait)
    print(f"[bench] devices={devices} size={size} dtype={dtype} "
          f"ablate={ablate!r}", file=sys.stderr)

    t0 = time.time()
    loader = create_dataset(opt)
    batches = list(loader)  # builds + caches the augmented samples
    print(f"[bench] host data prep: {time.time() - t0:.1f}s "
          f"({len(batches)} samples)", file=sys.stderr)

    model = create_model(opt)
    fleet_n = int(os.environ.get("VTS_BENCH_FLEET", "0"))
    if fleet_n > 1:
        return bench_fleet(model, batches, fleet_n, n_steps)
    # Default = the measured parity-exact per-chip optimum (round 4, on chip):
    # batch 2 with the G forward rematerialized (remat_g auto → on at n>1)
    # and the LPIPS taps RESIDENT (lpips_remat off) = 7.23 samples/s vs
    # batch-1's 6.67-6.75 steps/s.  Same training math as the reference's
    # batch-1 step per sample — the static patch budget is what makes
    # batching legal at all (the reference's ragged patches force batch 1).
    # VTS_BENCH_BATCH=1 reproduces the round-≤4 headline configuration.
    batch_n = int(os.environ.get("VTS_BENCH_BATCH", "2"))
    if batch_n > 1:
        # batch augmented views per step — possible here because the patch
        # budgets are static (the reference's ragged patches force batch 1)
        import itertools
        singles = list(itertools.islice(itertools.cycle(batches), batch_n))
        batches = [{k: np.concatenate([b[k] for b in singles], axis=0)
                    for k in singles[0]}]
    model.setup(batches[0])

    # pre-place the epoch's samples on device (the training loop's prefetch
    # pipeline keeps batches resident; benchmark the compute, not the tunnel)
    device_inputs = []
    sample_keys = []
    for b in batches:
        model.set_input(b)
        device_inputs.append(dict(model._input))
        sample_keys.append(getattr(model, "_sample_key", None))
    jax.block_until_ready(device_inputs)

    # scan-chunked stepping: one dispatch per k steps (production config —
    # on tunneled backends the per-call RPC costs ~4× the device step time)
    scan_k = int(os.environ.get("VTS_BENCH_SCAN", "10"))
    import jax.numpy as jnp

    def stack_steps(k):
        picks = [device_inputs[i % len(device_inputs)] for i in range(k)]
        keys = [sample_keys[i % len(sample_keys)] for i in range(k)]
        return ({key: jnp.stack([p[key] for p in picks]) for key in picks[0]},
                keys)

    def measure(epoch):
        t0 = time.time()
        if scan_k > 1:
            chunk, keys = stack_steps(scan_k)
            step_kw = dict(epoch=epoch, sample_keys=keys)
            model.optimize_parameters_chunk(chunk, **step_kw)
            _ = model.get_current_losses()
            print(f"[bench] epoch-{epoch} first chunk (compile): "
                  f"{time.time() - t0:.1f}s", file=sys.stderr)
            model.optimize_parameters_chunk(chunk, **step_kw)
            _ = model.get_current_losses()
            n_chunks = max(1, n_steps // scan_k)
            t1 = time.time()
            for _ in range(n_chunks):
                model.optimize_parameters_chunk(chunk, **step_kw)
            _ = model.get_current_losses()
            rate = n_chunks * scan_k / (time.time() - t1)
            if os.environ.get("VTS_BENCH_MFU", "1") == "1":
                _report_step_cost(model, chunk, scan_k, rate)
            return rate
        model._input = device_inputs[0]
        model.optimize_parameters(epoch=epoch)
        _ = model.get_current_losses()
        print(f"[bench] epoch-{epoch} first step (compile): "
              f"{time.time() - t0:.1f}s", file=sys.stderr)
        model._input = device_inputs[1 % len(device_inputs)]
        model.optimize_parameters(epoch=epoch)
        _ = model.get_current_losses()
        t1 = time.time()
        for i in range(n_steps):
            model._input = device_inputs[i % len(device_inputs)]
            model.optimize_parameters(epoch=epoch)
        # block on the last step's results
        _ = model.get_current_losses()
        return n_steps / (time.time() - t1)

    # the reference's shipped loss config enables the CLIP vision-aided D3
    # for epochs >= vision_aided_warmup_epoch (sinskitG_model.py:126-128), so
    # the honest headline is the 405-epoch schedule-weighted rate over the
    # warmup (no-D3) and post-warmup (D3) phases.
    steps_per_sec = measure(1)
    if getattr(opt, "use_vision_aided_loss", False):
        warm_rate = steps_per_sec
        d3_rate = measure(opt.vision_aided_warmup_epoch + 1)
        total = opt.n_epochs + opt.n_epochs_decay          # 405 epochs
        warm_steps = (opt.vision_aided_warmup_epoch - 1) * opt.data_len
        d3_steps = total * opt.data_len - warm_steps
        steps_per_sec = (warm_steps + d3_steps) / (
            warm_steps / warm_rate + d3_steps / d3_rate)
        print(f"[bench] warmup rate {warm_rate:.3f} steps/s, D3 rate "
              f"{d3_rate:.3f} steps/s (D3 costs "
              f"{(1 / d3_rate - 1 / warm_rate) * 1000:.1f} ms/step) → "
              f"schedule-weighted {steps_per_sec:.3f} steps/s", file=sys.stderr)

    # per-garment synthesis latency (BASELINE.json's secondary metric):
    # one full-canvas sketch → (image, touch) forward
    model._input = device_inputs[0]
    model.test()  # compile
    import jax as _jax
    _jax.block_until_ready(model._outputs["fake_I"])
    t0 = time.time()
    for _ in range(5):
        model.test()
    _jax.block_until_ready(model._outputs["fake_I"])
    print(f"[bench] synth latency (1536² sketch→I+T forward): "
          f"{(time.time() - t0) / 5 * 1000:.1f} ms", file=sys.stderr)
    print(f"[bench] {steps_per_sec:.3f} steps/s "
          f"(losses: { {k: round(v, 3) for k, v in model.get_current_losses().items()} })",
          file=sys.stderr)

    samples_per_sec = steps_per_sec * batch_n
    print(json.dumps({
        "metric": "sinskitG_train_steps_per_sec",
        "value": round(samples_per_sec, 4),
        "unit": "samples/s" if batch_n > 1 else "steps/s",
        "vs_baseline": round(samples_per_sec / BASELINE_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
