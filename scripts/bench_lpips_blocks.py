"""Isolated per-block probes of the LPIPS VGG16 stage (VERDICT r4 item 4).

The parity-exact step's bulk is LPIPS-at-canvas; its blocks 2-5 run ~42% MFU
inside the fused step (round-3c trace).  This probe times each VGG block in
ISOLATION at the exact flagship shapes — fwd and fwd+input-bwd (weights are
frozen in training, so AD never builds weight grads) — to separate two
hypotheses:

  * isolated ≈ in-step MFU  → the conv lowering itself is the ceiling on this
    toolchain: write the bytes/FLOP-accounted ceiling statement;
  * isolated ≫ in-step MFU  → the fused step's schedule/layout interaction is
    the problem → a structural restructure (separate dispatch, custom vjp
    schedule) has headroom.

Measurement discipline (axon): ``block_until_ready`` can report enqueue time
on the tunneled backend, so every probe runs k iterations CHAINED by data
dependency inside one jitted ``lax.fori_loop`` and the wall-clock is taken
around a VALUE FETCH of the final carry (np.asarray), which cannot complete
before every chained iteration has executed on device.

Env: VTS_LB_SIZE (1536), VTS_LB_ITERS (30), VTS_LB_DTYPE (bfloat16),
VTS_LB_STAGES (comma list of b2,b3,b4,b5,heads,full,full_fwd).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

PEAK = 197e12   # TPU v5e bf16
HBM_BW = 819e9


def conv_gflops(hw: int, cin: int, cout: int, k: int = 3) -> float:
    return hw * hw * k * k * cin * cout * 2 / 1e9


def main():
    size = int(os.environ.get("VTS_LB_SIZE", "1536"))
    iters = int(os.environ.get("VTS_LB_ITERS", "30"))
    dt_name = os.environ.get("VTS_LB_DTYPE", "bfloat16")
    stages = os.environ.get(
        "VTS_LB_STAGES", "b2,b3,b4,b5,heads,full,full_fwd").split(",")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/vts_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from vts_tpu.losses.lpips import (_folded_conv1_strided_w,
                                      _folded_conv3x3_s1_w, _lin_sq_head,
                                      _scale_folded_conv1, _sumsq_c,
                                      init_lpips_params, lpips)

    dtype = jnp.bfloat16 if dt_name == "bfloat16" else jnp.float32
    params = init_lpips_params(0)
    rng = np.random.default_rng(0)
    print(f"[lpb] size={size} iters={iters} dtype={dt_name} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)

    def timed(label, loss_fn, x0, gflops, gbytes, fwd_only=False, aux=None):
        """Chained fori probe: carry = x + 1e-30 * d(loss)/dx (or +1e-30*loss
        for fwd-only); value-fetch the final carry.  ``aux`` (e.g. the LPIPS
        reference image) rides the carry so XLA can NOT constant-fold its
        branch away at compile time — in the real step it is a batch arg."""
        import jax

        aux0 = aux if aux is not None else jnp.zeros((), jnp.float32)
        if fwd_only:
            def body(i, c):
                x, a = c
                return (x + (1e-30 * loss_fn(x, a)).astype(x.dtype), a)
        else:
            g = jax.grad(loss_fn, argnums=0)

            def body(i, c):
                x, a = c
                return (x + (1e-30 * g(x, a)).astype(x.dtype), a)

        probe = jax.jit(
            lambda c: jax.lax.fori_loop(0, iters, body, c))
        np.asarray(probe((x0, aux0))[0][(0,) * x0.ndim])
        t0 = time.time()
        out = probe((x0, aux0))
        # fetch one element — cannot resolve before the whole chain ran
        np.asarray(out[0][(0,) * x0.ndim])
        dt = (time.time() - t0) / iters
        print(f"[lpb] {label:10s}: {dt * 1e3:8.2f} ms  {gflops:8.1f} GFLOP  "
              f"~{gbytes:6.2f} GB  MFU {gflops / 1e3 / PEAK * 1e12 / dt * 100:5.1f}%  "
              f"HBM≥ {gbytes * 1e9 / HBM_BW / dt * 100:5.1f}%")
        return dt

    # ---- standard blocks at the flagship's tap shapes (fold is consumed by
    # pool1, so blocks 2-5 run these exact unfolded shapes in the real step)
    def block(conv_lo, conv_hi, pool):
        def f(x, aux):
            h = x.astype(dtype)
            for ci in range(conv_lo, conv_hi):
                p = params["conv"][ci]
                h = jax.lax.conv_general_dilated(
                    h, p["w"].astype(h.dtype), (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                h = jax.nn.relu(h + p["b"].astype(h.dtype))
            if pool:
                n, hh, ww, c = h.shape
                h = jnp.max(h.reshape(n, hh // 2, 2, ww // 2, 2, c),
                            axis=(2, 4))
            return jnp.sum(_sumsq_c(h))
        return f

    s = size
    specs = {
        # label: (conv index range, input (hw, cin), pool, fwd gflops)
        "b2": ((2, 4), (s // 2, 64), True,
               conv_gflops(s // 2, 64, 128) + conv_gflops(s // 2, 128, 128)),
        "b3": ((4, 7), (s // 4, 128), True,
               conv_gflops(s // 4, 128, 256) + 2 * conv_gflops(s // 4, 256, 256)),
        "b4": ((7, 10), (s // 8, 256), True,
               conv_gflops(s // 8, 256, 512) + 2 * conv_gflops(s // 8, 512, 512)),
        "b5": ((10, 13), (s // 16, 512), False,
               3 * conv_gflops(s // 16, 512, 512)),
    }
    for label, ((lo, hi), (hw, cin), pool, gf) in specs.items():
        if label not in stages:
            continue
        x = jnp.asarray(rng.normal(size=(1, hw, hw, cin)).astype(np.float32),
                        dtype)
        byts = (hw * hw * cin + 2 * gf * 1e9 / (hw * hw) / 4
                ) * 2 * 2 / 1e9  # rough: in + conv outs, bf16, fwd+bwd
        # fwd+bwd(input): each conv appears twice (fwd + transposed)
        timed(label, block(lo, hi, pool), x, 2 * gf, byts)
        timed(label + "_fwd", block(lo, hi, pool), x, gf, byts / 2,
              fwd_only=True)

    # ---- block 1 as lpips actually runs it (W-fold 2: scale-folded entry
    # conv straight off the raw canvas, folded conv1_2, folded pool) — pins
    # the block-1 share of `full` directly instead of by subtraction.
    if "b1" in stages or "b1_fwd" in stages:
        w1f, b1f = _scale_folded_conv1(params)
        w12, b12 = params["conv"][1]["w"], params["conv"][1]["b"]

        def b1_loss(x, aux):
            h = jax.nn.relu(_folded_conv1_strided_w(
                x.astype(dtype), w1f, b1f, 2))           # (N, H, W/2, 128)
            h = jax.nn.relu(_folded_conv3x3_s1_w(h, w12, b12, 2))
            tap = jnp.sum(_sumsq_c(h))                   # tap0 stays folded
            n, hh, ww, c = h.shape
            h = jnp.max(h.reshape(n, hh // 2, 2, ww, 1, 2, c // 2),
                        axis=(2, 5)).reshape(n, hh // 2, ww, c // 2)
            return tap + jnp.sum(_sumsq_c(h))

        xb1 = jnp.asarray(rng.normal(size=(1, s, s, 3)).astype(np.float32))
        gf_b1 = (s * (s // 2) * 3 * 4 * 3 * 128 * 2 / 1e9       # folded entry
                 + s * (s // 2) * 9 * 128 * 128 * 2 / 1e9)      # folded c1_2
        byts_b1 = (s * s * 3 * 4 + 2 * s * (s // 2) * 128 * 2) * 2 / 1e9
        if "b1" in stages:
            timed("b1", b1_loss, xb1, 2 * gf_b1, byts_b1)
        if "b1_fwd" in stages:
            timed("b1_fwd", b1_loss, xb1, gf_b1, byts_b1 / 2, fwd_only=True)

    # ---- the fold-embedded ENTRY conv alone (W-fold 2, scale-folded
    # weights): b1 minus c12x attributes ~15 ms of the block-1 fwd+bwd to
    # this stage's BACKWARD (a transposed-strided conv emitting the
    # 3-channel 1536² canvas gradient).  Isolate it to confirm before any
    # engineering (the resize mirage showed subtractive attributions lie).
    if any(st in stages for st in ("e1", "e1_fwd", "e1c", "e1c_fwd")):
        from vts_tpu.losses.lpips import _folded_conv1_strided_w_fg
        w1e, b1e = _scale_folded_conv1(params)

        def mk_e1(conv):
            def e1_loss(x, aux):
                h = jax.nn.relu(conv(x.astype(dtype), w1e, b1e, 2))
                return jnp.sum(_sumsq_c(h))
            return e1_loss

        xe = jnp.asarray(rng.normal(size=(1, s, s, 3)).astype(np.float32))
        gf_e1 = s * (s // 2) * 3 * 4 * 3 * 128 * 2 / 1e9
        byts_e1 = (s * s * 3 * 4 + s * (s // 2) * 128 * 2) * 2 / 1e9
        # e1c: the folded-cotangent backward (_folded_conv1_strided_w_fg) —
        # its input grad is ONE well-shaped s1/p1 conv + free reshape instead
        # of the transposed-strided conv into the 3-lane canvas layout
        for label, conv in (("e1", _folded_conv1_strided_w),
                            ("e1c", _folded_conv1_strided_w_fg)):
            if label in stages:
                timed(label, mk_e1(conv), xe, 2 * gf_e1, byts_e1)
            if label + "_fwd" in stages:
                timed(label + "_fwd", mk_e1(conv), xe, gf_e1, byts_e1 / 2,
                      fwd_only=True)

    # ---- block 2 W-REFOLDED by 2 (the one isolated block below ~50% MFU):
    # the refold is a contiguous channel regroup ((W, C) → (W/2, 2C) matches
    # the px·C+c fold convention of _folded_conv1_strided_w exactly), the
    # convs run via the generic lifted-kernel transform at ×2 FLOPs with
    # b3-like channel shapes (128→256, 256→256), the pool consumes the fold.
    # Break-even needs ≥ 2 × 24.1% = 48% MFU — this measures which side.
    if "b2f" in stages or "b2f_fwd" in stages:
        w21, b21 = params["conv"][2]["w"], params["conv"][2]["b"]
        w22, b22 = params["conv"][3]["w"], params["conv"][3]["b"]

        def b2f_loss(x, aux):
            h = x.astype(dtype)
            n, hh, ww, c = h.shape
            h = h.reshape(n, hh, ww // 2, 2 * c)         # W-fold: free regroup
            h = jax.nn.relu(_folded_conv3x3_s1_w(h, w21, b21, 2))
            h = jax.nn.relu(_folded_conv3x3_s1_w(h, w22, b22, 2))
            n, hh, ww, c = h.shape
            h = jnp.max(h.reshape(n, hh // 2, 2, ww, 1, 2, c // 2),
                        axis=(2, 5)).reshape(n, hh // 2, ww, c // 2)
            return jnp.sum(_sumsq_c(h))

        xb2 = jnp.asarray(rng.normal(
            size=(1, s // 2, s // 2, 64)).astype(np.float32), dtype)
        gf_b2f = 2 * specs["b2"][3]                      # ×2 the unfolded FLOPs
        byts_b2f = ((s // 2) ** 2 * 64 + 2 * (s // 2) * (s // 4)
                    * 256 * 2) * 2 * 2 / 1e9
        if "b2f" in stages:
            timed("b2f", b2f_loss, xb2, 2 * gf_b2f, byts_b2f)
        if "b2f_fwd" in stages:
            timed("b2f_fwd", b2f_loss, xb2, gf_b2f, byts_b2f / 2,
                  fwd_only=True)

    # ---- the Pallas 3×3 conv kernel vs XLA at the two sub-roofline shapes:
    # c12x/c12p = the W-folded conv1_2 (128→128 at 1536×768, block 1's bulk);
    # b2p = block 2 with both convs through the kernel (vs the "b2" XLA row).
    if any(st in stages for st in ("c12x", "c12p", "c12x_fwd", "c12p_fwd",
                                   "b2p", "b2p_fwd")):
        from vts_tpu.ops.pallas_conv import conv3x3_relu
        th = int(os.environ.get("VTS_LB_TH", "8"))

    if any(st in stages for st in ("c12x", "c12p", "c12x_fwd", "c12p_fwd")):
        wl = jnp.asarray(rng.normal(size=(3, 3, 128, 128)).astype(np.float32)
                         * 0.05)
        bl = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
        xc = jnp.asarray(rng.normal(
            size=(1, s, s // 2, 128)).astype(np.float32), dtype)
        gf_c12 = s * (s // 2) * 9 * 128 * 128 * 2 / 1e9
        byts = (2 * s * (s // 2) * 128 * 2) * 2 / 1e9

        def c12_xla(x, aux):
            y = jax.lax.conv_general_dilated(
                x, wl.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(_sumsq_c(jax.nn.relu(y + bl.astype(y.dtype))))

        def c12_pal(x, aux):
            return jnp.sum(_sumsq_c(conv3x3_relu(x, wl, bl, th=th)))

        for label, fn in (("c12x", c12_xla), ("c12p", c12_pal)):
            if label in stages:
                timed(label, fn, xc, 2 * gf_c12, byts)
            if label + "_fwd" in stages:
                timed(label + "_fwd", fn, xc, gf_c12, byts / 2, fwd_only=True)

    if "b2p" in stages or "b2p_fwd" in stages:
        w21, b21 = params["conv"][2]["w"], params["conv"][2]["b"]
        w22, b22 = params["conv"][3]["w"], params["conv"][3]["b"]

        def b2p_loss(x, aux):
            h = conv3x3_relu(x.astype(dtype), w21, b21, th=th)
            h = conv3x3_relu(h, w22, b22, th=th)
            n, hh, ww, cc = h.shape
            h = jnp.max(h.reshape(n, hh // 2, 2, ww // 2, 2, cc), axis=(2, 4))
            return jnp.sum(_sumsq_c(h))

        xb2p = jnp.asarray(rng.normal(
            size=(1, s // 2, s // 2, 64)).astype(np.float32), dtype)
        if "b2p" in stages:
            timed("b2p", b2p_loss, xb2p, 2 * specs["b2"][3], 0.5)
        if "b2p_fwd" in stages:
            timed("b2p_fwd", b2p_loss, xb2p, specs["b2"][3], 0.25,
                  fwd_only=True)

    # ---- tap heads at the flagship tap shapes (composed path: the exact
    # nrm/diff/lin composition from lpips())
    if "heads" in stages:
        tap_shapes = [(s // 2, 128, 2), (s // 2, 128, 1), (s // 4, 256, 1),
                      (s // 8, 512, 1), (s // 16, 512, 1)]
        # tap0 rides W-folded (fold 2): (768, 768, 2*64) with 2 groups ==
        # same bytes as (768,768,128) with 2 groups — model it as g=2
        txs = [jnp.asarray(rng.normal(size=(1, hw, hw, c)).astype(np.float32),
                           dtype) for hw, c, _ in tap_shapes]
        tys = [jnp.asarray(rng.normal(size=(1, hw, hw, c)).astype(np.float32),
                           dtype) for hw, c, _ in tap_shapes]
        lins = [jnp.full((c // g,), 1.0 / (c // g), jnp.float32)
                for _, c, g in tap_shapes]

        def heads_loss(txs_in, tys_in):
            total = 0.0
            for tx, ty, lin, (hw, c, g) in zip(txs_in, tys_in, lins, tap_shapes):
                if g > 1:
                    tx = tx.reshape(1, hw, hw, g, c // g)
                    ty = ty.reshape(1, hw, hw, g, c // g)

                def nrm(t):
                    ss = _sumsq_c(t)
                    inv = 1.0 / (jnp.sqrt(ss) + 1e-10)
                    return t * inv.astype(t.dtype)

                val = _lin_sq_head(nrm(tx) - nrm(ty), lin)
                total = total + jnp.sum(val)
            return total

        tap_bytes = sum(hw * hw * c for hw, c, _ in tap_shapes) * 2 / 1e9
        # fwd reads tx,ty ~2x each + writes; bwd re-reads — call it ~8 passes
        g = jax.grad(heads_loss, argnums=0)

        def body(i, c):
            txs_in, tys_in = c
            gs = g(txs_in, tys_in)
            return ([t + (1e-30 * gg).astype(t.dtype)
                     for t, gg in zip(txs_in, gs)], tys_in)

        probe = jax.jit(lambda c: jax.lax.fori_loop(0, iters, body, c))
        np.asarray(probe((txs, tys))[0][0][0, 0, 0, 0])
        t0 = time.time()
        out = probe((txs, tys))
        np.asarray(out[0][0][0, 0, 0, 0])
        dt = (time.time() - t0) / iters
        print(f"[lpb] heads     : {dt * 1e3:8.2f} ms  tap bytes/branch "
              f"{tap_bytes:.2f} GB  HBM≥(8 passes) "
              f"{8 * tap_bytes * 1e9 / HBM_BW / dt * 100:5.1f}%")

    # ---- the full LPIPS fwd+bwd, exactly as the training step calls it
    if "full" in stages or "full_fwd" in stages:
        a = jnp.asarray(rng.uniform(-1, 1, (1, size, size, 3)).astype(np.float32))
        b = jnp.asarray(rng.uniform(-1, 1, (1, size, size, 3)).astype(np.float32))

        def lp_loss(a_in, b_in):
            return jnp.sum(lpips(params, a_in, b_in, dtype=dtype,
                                 y_no_grad=True, fold=2, fold_axis="w"))

        # x fwd+bwd + y fwd ≈ 3 × 1.53 TF/branch at 1536² (+ fold lift)
        gf_branch = (conv_gflops(s, 3, 64, 3) + conv_gflops(s, 64, 64) +
                     specs["b2"][3] + specs["b3"][3] + specs["b4"][3] +
                     specs["b5"][3])
        if "full" in stages:
            timed("full", lp_loss, a, 3 * gf_branch, 12.0, aux=b)
        if "full_fwd" in stages:
            timed("full_fwd", lp_loss, a, 2 * gf_branch, 6.0, fwd_only=True,
                  aux=b)


if __name__ == "__main__":
    main()
