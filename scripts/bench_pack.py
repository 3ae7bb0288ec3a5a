"""Micro-benchmark: G-garment generator fwd+bwd at the flagship shape.

Compares the three single-chip multi-garment layouts on real hardware:
  serial — one pack=1 jit step called G times (round-1 reality)
  vmap   — params vmapped over a leading garment axis (round-1 fleet path)
  packed — pack=G grouped convs over channel-stacked canvases (round 2)

Also reports an analytic-FLOPs MFU figure per layout so RESULTS.md can carry
utilization numbers (VERDICT.md round-1 item 2).

Env: VTS_PACK_G (default 8), VTS_PACK_SIZE (1536), VTS_PACK_MODES
(serial,packed[,vmap]), VTS_PACK_STEPS (10), VTS_PACK_DTYPE (bfloat16).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

PEAK_FLOPS = {"TPU v5 lite": 197e12, "TPU v4": 275e12, "cpu": 1e11}


def main():
    g = int(os.environ.get("VTS_PACK_G", "8"))
    size = int(os.environ.get("VTS_PACK_SIZE", "1536"))
    steps = int(os.environ.get("VTS_PACK_STEPS", "10"))
    modes = os.environ.get("VTS_PACK_MODES", "serial,packed").split(",")
    dt_name = os.environ.get("VTS_PACK_DTYPE", "bfloat16")

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/vts_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    from vts_tpu.networks.unet_custom import CustomUNet
    from vts_tpu.parallel.packing import pack_images, pack_tree

    dev = jax.devices()[0]
    dtype = jnp.bfloat16 if dt_name == "bfloat16" else None
    print(f"[pack] device={dev.device_kind} G={g} size={size} dtype={dt_name}",
          file=sys.stderr)
    peak = next((v for k, v in PEAK_FLOPS.items()
                 if k.lower() in dev.device_kind.lower()), 197e12)

    in_nc, ngf = 9, 10
    rng = np.random.default_rng(0)
    x0 = jnp.zeros((1, size, size, in_nc))
    net1 = CustomUNet(ngf=ngf, num_downs=8, num_layer_separate=4,
                      norm_type="instance", train=True, dtype=dtype)
    params_list = [net1.init(jax.random.key(s), x0)["params"] for s in range(g)]
    xs = [jnp.asarray(rng.uniform(-1, 1, (1, size, size, in_nc)).astype(np.float32))
          for _ in range(g)]
    tgt = jnp.asarray(rng.uniform(-1, 1, (1, size, size, 5)).astype(np.float32))

    def run(label, fn, args, per_call_garments, calls_per_step):
        lowered = jax.jit(fn).lower(*args)
        compiled = lowered.compile()
        try:
            flops = compiled.cost_analysis()["flops"]
        except Exception:
            flops = float("nan")
        t0 = time.time()
        out = compiled(*args)
        jax.block_until_ready(out)
        print(f"[pack] {label}: compile+first {time.time() - t0:.1f}s",
              file=sys.stderr)
        t0 = time.time()
        for _ in range(steps):
            for _ in range(calls_per_step):
                out = compiled(*args)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / steps
        gsps = per_call_garments * calls_per_step / dt
        mfu = flops * calls_per_step / dt / peak * 100
        print(f"[pack] {label}: {dt * 1000:.1f} ms/fleet-step → {gsps:.2f} "
              f"garment-G-steps/s, MFU {mfu:.2f}% "
              f"({flops * calls_per_step / 1e9:.1f} GFLOP/step)")
        return gsps

    # targets ride as ARGUMENTS — closure constants get embedded in the HLO
    # and blow the remote-compile upload limit at canvas sizes
    def loss1(params, x, t):
        out = net1.apply({"params": params}, x).astype(jnp.float32)
        return jnp.mean(jnp.abs(out - t))

    grad1 = jax.grad(loss1)

    results = {}
    if "serial" in modes:
        try:
            results["serial"] = run("serial", grad1, (params_list[0], xs[0], tgt), 1, g)
        except Exception as e:
            print(f"[pack] serial FAILED: {type(e).__name__}: {str(e)[:200]}")

    if "vmap" in modes:
        stacked = jax.tree_util.tree_map(lambda *l: jnp.stack(l), *params_list)
        xstack = jnp.stack(xs)

        def vloss(ps, xb, t):
            return jnp.mean(jax.vmap(loss1, in_axes=(0, 0, None))(ps, xb, t))

        try:
            results["vmap"] = run("vmap", jax.grad(vloss), (stacked, xstack, tgt), g, 1)
        except Exception as e:
            print(f"[pack] vmap FAILED: {type(e).__name__}: {str(e)[:200]}")

    if "packed" in modes:
        netp = CustomUNet(ngf=ngf, num_downs=8, num_layer_separate=4,
                          norm_type="instance", train=True, dtype=dtype, pack=g)
        packed = pack_tree(jax.tree_util.tree_map(lambda *l: jnp.stack(l),
                                                  *params_list))
        xp = pack_images(xs)
        tgt_p = jnp.tile(tgt, (1, 1, 1, g))

        def lossp(params, x, t):
            out = netp.apply({"params": params}, x).astype(jnp.float32)
            return jnp.mean(jnp.abs(out - t))

        try:
            results["packed"] = run("packed", jax.grad(lossp), (packed, xp, tgt_p), g, 1)
        except Exception as e:
            print(f"[pack] packed FAILED: {type(e).__name__}: {str(e)[:200]}")

    if "serial" in results:
        for k, v in results.items():
            if k != "serial":
                print(f"[pack] {k} vs serial: {v / results['serial']:.2f}x")


if __name__ == "__main__":
    main()
