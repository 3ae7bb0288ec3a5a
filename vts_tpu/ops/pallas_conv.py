"""Pallas TPU kernel: fused 3×3/s1/p1 conv + bias + ReLU for the LPIPS
narrow-channel/huge-spatial shapes.

Motivation (round-5 isolated block probe, RESULTS): the parity step's LPIPS
stage is dominated by VGG blocks 1–2, whose conv shapes (64–128 channels at
1536×768 / 768² spatial) XLA lowers at 12.9–24.1% MFU while blocks 3–5 run
at 50–64%; three measured formulation A/Bs (unfolded, fold-hw, fold-w,
refold-b2) bracketed XLA's conv lowering as the binding constraint.  This
kernel is the remaining structural lever: one grid step per (batch, row
tile), the full W row resident in VMEM, and the 3×3 conv computed as nine
shifted ``dot_general``s contracting the channel axis — each an
(TH·W, C) × (C, Co) matmul, MXU's native shape — accumulated in f32 with
bias + ReLU fused into the epilogue.

The input ships pre-padded (H+2, W+2) so every halo DMA is in-bounds — no
edge masking in the kernel (the pad is one cheap XLA pass; revisit with
clamped DMAs if it ever shows in a trace).

Backward: LPIPS weights are FROZEN in training, so the only gradient that
matters is d/d(input) — itself a 3×3 conv with the spatially-flipped,
io-transposed kernel, so the SAME Pallas kernel serves fwd and bwd
(``custom_vjp``; the ReLU mask is recovered from the saved output).  dw/db
are provided as plain XLA einsums for completeness — in the training graph
nothing requests them and XLA dead-code-eliminates them.

Reference behavior being accelerated: the pip ``lpips`` package's frozen
VGG16 forward (reference models/networks.py LPIPS usage,
sinskitG_model.py:497-506); values match ``lax.conv_general_dilated`` to
accumulation-order round-off (pinned in tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pallas_conv3x3(x, w, b, relu: bool, th: int, interpret: bool):
    """x (N, H, W, C), w (3, 3, C, Co), b (Co,) → (N, H, W, Co)."""
    n, h, wd, c = x.shape
    co = w.shape[-1]
    assert h % th == 0, (h, th)
    if c % 128:
        # the remote-Mosaic DMA path wants full 128-lane tiles; zero input
        # channels contribute zero, and K=128 with half-empty lanes costs the
        # MXU the same as K=64 would — identical results, compiles.
        pc = 128 * ((c + 127) // 128) - c
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pc)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, pc), (0, 0)))
        c = c + pc
    # W is padded by (1, 7): the halo needs (1, 1), and the DMA into the VMEM
    # scratch requires the tile's sublane (second-minor) dim to be a multiple
    # of 8 — measured on the remote-Mosaic toolchain (a (10, 770, 128) tile
    # fails to compile, (10, 776, 128) compiles).
    assert wd % 8 == 0, wd
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 7), (0, 0)))
    out_dt = x.dtype
    b2d = b.reshape(1, co).astype(jnp.float32)

    def kernel(xp_ref, w_ref, b_ref, out_ref):
        ni = pl.program_id(0)
        hi = pl.program_id(1)

        def body(x_tile, sem):
            cp = pltpu.make_async_copy(
                xp_ref.at[ni, pl.ds(hi * th, th + 2), :, :], x_tile, sem)
            cp.start()
            cp.wait()
            xt = x_tile[...]
            acc = jnp.zeros((th, wd, co), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    acc = acc + jax.lax.dot_general(
                        xt[dy:dy + th, dx:dx + wd, :], w_ref[dy, dx],
                        (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            acc = acc + b_ref[0]
            if relu:
                acc = jnp.maximum(acc, 0.0)
            out_ref[0] = acc.astype(out_dt)

        pl.run_scoped(body,
                      x_tile=pltpu.VMEM((th + 2, wd + 8, c), x.dtype),
                      sem=pltpu.SemaphoreType.DMA)

    return pl.pallas_call(
        kernel,
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # xp: DMA'd manually
            pl.BlockSpec(memory_space=pltpu.VMEM),         # w (3,3,C,Co)
            pl.BlockSpec(memory_space=pltpu.VMEM),         # b (1,Co)
        ],
        out_specs=pl.BlockSpec((1, th, wd, co), lambda ni, hi: (ni, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, co), out_dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n * h * wd * c * co,
            bytes_accessed=(xp.size + 2 * n * h * wd * co) * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xp, w.astype(x.dtype), b2d)


@functools.lru_cache(maxsize=None)
def _conv_op(relu: bool, th: int, interpret: bool):
    @jax.custom_vjp
    def op(x, w, b):
        return _pallas_conv3x3(x, w, b, relu, th, interpret)

    def fwd(x, w, b):
        y = op(x, w, b)
        return y, (x, w, b, y)

    def bwd(res, gy):
        x, w, b, y = res
        g = jnp.where(y > 0, gy, 0).astype(gy.dtype) if relu else gy
        # input grad: 3×3 conv of g with the spatially-flipped io-transposed
        # kernel — the same Pallas kernel, no bias / no relu
        wt = jnp.flip(jnp.flip(w, 0), 1).transpose(0, 1, 3, 2)
        dx = _pallas_conv3x3(g, wt.astype(g.dtype),
                             jnp.zeros((w.shape[2],), jnp.float32),
                             False, th, interpret)
        # dw/db: plain XLA — LPIPS weights are frozen in training, so these
        # are dead code the compiler removes; they exist so the op is a
        # correct general conv under AD (pinned in tests)
        gp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        h, wd = x.shape[1], x.shape[2]
        dw = jnp.stack([
            jnp.stack([
                jnp.einsum("nhwc,nhwd->cd",
                           gp[:, dy:dy + h, dx:dx + wd, :].astype(jnp.float32),
                           g.astype(jnp.float32))
                for dx in range(3)], axis=0)
            for dy in range(3)], axis=0)
        db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
        return dx.astype(x.dtype), dw.astype(w.dtype), db.astype(b.dtype)

    op.defvjp(fwd, bwd)
    return op


def conv3x3_relu(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                 relu: bool = True, th: int = 8,
                 interpret: bool = False) -> jnp.ndarray:
    """Fused 3×3/stride-1/pad-1 conv + bias (+ ReLU) via the Pallas kernel.

    Matches ``relu(conv_general_dilated(x, w, (1,1), pad=1) + b)`` to
    accumulation-order round-off.  ``th`` = rows per grid step (H % th == 0).
    Gradients: dx via the same kernel (flipped/transposed weights); dw/db via
    XLA einsums (dead-code-eliminated when the weights are frozen).
    """
    return _conv_op(bool(relu), int(th), bool(interpret))(x, w, b)
