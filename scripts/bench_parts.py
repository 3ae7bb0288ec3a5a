"""Per-stage micro-benchmarks of the flagship fused step (VERDICT r1 item 2).

Each hot stage of the sinskit train step is jitted in isolation at the real
1536² flagship shapes, timed on hardware, and reported with its XLA
cost-analysis FLOPs → an MFU per stage.  Together with bench.py's whole-step
MFU line this is the profile that locates where the ~300 ms step goes
(the G conv stack itself runs near peak — scripts/bench_pack.py).

Stages:
  g_grad   — generator fwd+bwd (L1 target), canvas 1536²
  d1_pass  — multiscale D1: real+fake D-grad + G-GAN grad through D (3 passes)
  lpips    — LPIPS(VGG16) fwd+bwd at full canvas (the G1 perceptual term)
  d2_patch — D2 multiscale over the 96-patch stack + grads
  gathers  — coord patch gathers + bicubic patch resizes (data plumbing)

Env: VTS_PARTS_SIZE (1536), VTS_PARTS_STEPS (20), VTS_PARTS_DTYPE (bfloat16),
VTS_PARTS_STAGES (comma list; default all).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

PEAK = 197e12  # TPU v5e bf16
HBM_BW = 819e9


def run(label, fn, args, steps):
    import jax
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        flops = float(ca.get("flops", float("nan")))
        byts = float(ca.get("bytes accessed", float("nan")))
    except Exception:
        flops = byts = float("nan")
    out = compiled(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(steps):
        out = compiled(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / steps
    print(f"[parts] {label:9s}: {dt * 1000:7.2f} ms  {flops / 1e9:8.1f} GFLOP "
          f"{byts / 1e9:6.2f} GB  MFU {flops / PEAK / dt * 100:5.1f}%  "
          f"HBM {byts / HBM_BW / dt * 100:5.1f}%")
    return dt


def main():
    size = int(os.environ.get("VTS_PARTS_SIZE", "1536"))
    steps = int(os.environ.get("VTS_PARTS_STEPS", "20"))
    dt_name = os.environ.get("VTS_PARTS_DTYPE", "bfloat16")
    stages = os.environ.get("VTS_PARTS_STAGES",
                            "g_grad,d1_pass,lpips,d2_patch,gathers").split(",")

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/vts_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from vts_tpu.losses.gan import gan_loss, reduce_d
    from vts_tpu.losses.lpips import init_lpips_params, lpips
    from vts_tpu.networks.discriminators import MultiscaleDiscriminator
    from vts_tpu.networks.unet_custom import CustomUNet
    from vts_tpu.ops.patch import gather_patches_from_coords
    from vts_tpu.ops.resize import resize_bicubic

    dev = jax.devices()[0]
    dtype = jnp.bfloat16 if dt_name == "bfloat16" else None
    print(f"[parts] device={dev.device_kind} size={size} dtype={dt_name}",
          file=sys.stderr)
    rng = np.random.default_rng(0)
    k = 96  # 64 coord patches + 32 more-fake

    if "g_grad" in stages:
        net = CustomUNet(ngf=10, num_downs=8, num_layer_separate=4,
                         norm_type="instance", train=True, dtype=dtype)
        x0 = jnp.zeros((1, size, size, 9))
        params = net.init(jax.random.key(0), x0)["params"]
        x = jnp.asarray(rng.uniform(-1, 1, (1, size, size, 9)).astype(np.float32))
        tgt = jnp.asarray(rng.uniform(-1, 1, (1, size, size, 5)).astype(np.float32))

        def g_loss(p, x, t):
            out = net.apply({"params": p}, x).astype(jnp.float32)
            return jnp.mean(jnp.abs(out - t))

        run("g_grad", jax.grad(g_loss), (params, x, tgt), steps)

    if "d1_pass" in stages:
        d1 = MultiscaleDiscriminator(ndf=8, n_layers=3, num_D=3,
                                     norm_type="batch", train=True, dtype=dtype)
        xr = jnp.asarray(rng.uniform(-1, 1, (1, size, size, 4)).astype(np.float32))
        xf = jnp.asarray(rng.uniform(-1, 1, (1, size, size, 4)).astype(np.float32))
        dvars = d1.init(jax.random.key(1), xr)
        dp, ds = dvars["params"], dvars.get("batch_stats", {})

        def d_loss(p, xr, xf):
            vr = {"params": p, "batch_stats": ds}
            pr, _ = d1.apply(vr, xr, mutable=["batch_stats"])
            pf, _ = d1.apply(vr, xf, mutable=["batch_stats"])
            return reduce_d(gan_loss(pr, True, "nonsaturating")) + \
                reduce_d(gan_loss(pf, False, "nonsaturating"))

        def g_gan(xf, p):
            vr = {"params": p, "batch_stats": ds}
            pf, _ = d1.apply(vr, xf, mutable=["batch_stats"])
            return reduce_d(gan_loss(pf, True, "nonsaturating"))

        def both(p, xr, xf):
            gd = jax.grad(d_loss)(p, xr, xf)
            gx = jax.grad(g_gan)(xf, p)
            return gd, gx

        run("d1_pass", both, (dp, xr, xf), steps)

    if "lpips" in stages:
        lp = init_lpips_params(0)
        a = jnp.asarray(rng.uniform(-1, 1, (1, size, size, 3)).astype(np.float32))
        b = jnp.asarray(rng.uniform(-1, 1, (1, size, size, 3)).astype(np.float32))

        def lp_loss(a, b):
            return jnp.sum(lpips(lp, a, b, dtype=dtype))

        run("lpips", jax.grad(lp_loss), (a, b), steps)

    if "d2_patch" in stages:
        d2 = MultiscaleDiscriminator(ndf=8, n_layers=3, num_D=3,
                                     norm_type="batch", train=True, dtype=dtype)
        pr = jnp.asarray(rng.uniform(-1, 1, (k, 32, 32, 7)).astype(np.float32))
        pf = jnp.asarray(rng.uniform(-1, 1, (k, 32, 32, 7)).astype(np.float32))
        dvars = d2.init(jax.random.key(2), pr)
        dp, ds = dvars["params"], dvars.get("batch_stats", {})

        def d2_loss(p, pr, pf):
            vr = {"params": p, "batch_stats": ds}
            a, _ = d2.apply(vr, pr, mutable=["batch_stats"])
            c, _ = d2.apply(vr, pf, mutable=["batch_stats"])
            return reduce_d(gan_loss(a, True, "nonsaturating")) + \
                reduce_d(gan_loss(c, False, "nonsaturating"))

        run("d2_patch", jax.grad(d2_loss), (dp, pr, pf), steps)

    if "gathers" in stages:
        img = jnp.asarray(rng.uniform(-1, 1, (1, size, size, 3)).astype(np.float32))
        coords = jnp.tile(jnp.asarray(
            [[40.0, 60, 64, 64, 32, 1.0, 8, 8]], jnp.float32), (64, 1))[None]

        def gather_resize(img, coords):
            p = gather_patches_from_coords(img, coords, 32, 1)
            return resize_bicubic(p, (32, 32)).sum()

        run("gathers", gather_resize, (img, coords), steps)


if __name__ == "__main__":
    main()
