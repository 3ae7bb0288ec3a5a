"""Space-to-depth folded CustomUNet forward — the canvas layout escape.

Round-2/3 device traces show the flagship step is dominated by canvas-sized
memory ops in lane-padded layouts: NHWC tensors with C ∈ {9..20} occupy
9-20 of the TPU's 128 lanes, so every materialized 1536²/768² intermediate
pays ~10-14× its logical bytes (RESULTS.md "the ~160 ms floor"; round-3
split-stage trace: ~48 ms/step of pure layout copies + ~95 ms of padded
fusions, conv MACs negligible).  The escape: run the top U-Net levels on
space-to-depth FOLDED tensors — (N, H/b, W/b, b²C) — so the lane dimension
carries 80-576 channels and layouts are dense.

The folded ops are EXACT equivalents consuming the unchanged CustomUNet
parameter tree (checkpoints, converters, init untouched):

  * a 4×4/s2/p1 conv from fold b to fold b/2 becomes a 3×3/s1/p1 conv over
    blocks whose kernel is a fixed sparse scatter of the original (4,4,Ci,Co)
    weights into (3, 3, b²Ci, (b/2)²Co) — built in-graph by gathers from the
    zero-padded weight table (tiny; XLA fuses it);
  * a 4×4/s2 ConvTranspose from fold b to fold 2b likewise becomes a
    3×3/s1/p1 block conv (kernel entries k = 2(δ·b+β) − γ + 2);
  * instance norm reduces over (H/b, W/b, b²) per original channel — the
    identical reduction set, no unfold;
  * relu/leaky-relu/tanh/skip-concats are elementwise/reshape-exact.

The FLOP blow-up of the dense folded kernels (2.25·b_out² for convs,
2.25·b_in² for conv-transposes) lands only on the cheap top layers
(≤ ~100 GFLOP total at ngf=10) and buys dense-lane layouts for every big
intermediate.  Deep levels (fold 1) use the standard lax forms pinned
equivalent to flax's nn.Conv / nn.ConvTranspose (see blocks.py).

`folded_unet_apply(params, x, ...)` ≡ `CustomUNet.apply` — pinned by
tests/test_folded.py.  Reference architecture: models/networks.py:1430-1645.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# fold / unfold
# ---------------------------------------------------------------------------

def fold(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """(N, H, W, C) → (N, H/b, W/b, b²C); folded channel = (βy·b + βx)·C + c."""
    if b == 1:
        return x
    n, h, w, c = x.shape
    x = x.reshape(n, h // b, b, w // b, b, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // b, w // b, b * b * c)


def unfold(x: jnp.ndarray, b: int, c: int) -> jnp.ndarray:
    if b == 1:
        return x
    n, hb, wb, _ = x.shape
    x = x.reshape(n, hb, wb, b, b, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, hb * b, wb * b, c)


def unfold2(x_f: jnp.ndarray, b_out: int, c: int) -> jnp.ndarray:
    """Peel ONE 2× level off the fold: (N, h, w, (2b)²c) → (N, 2h, 2w, b²c).

    Exact block permute: the fold-2b within-block offset βy ∈ [0, 2b) splits
    as βy = t·b + r with t = βy div b the OUTER (physical) offset — fold()'s
    β-major channel order makes this a pure reshape/transpose.  Used by the
    tactile t_mult extra stages to keep the fold constant while physical
    resolution doubles (the fold-increasing convT would otherwise compound
    the 2.25·b² FLOP blow-up per extra stage)."""
    if b_out == 0:
        raise ValueError("b_out must be >= 1")
    n, h, w, _ = x_f.shape
    x = x_f.reshape(n, h, w, 2, b_out, 2, b_out, c)   # (ty, ry, tx, rx, c)
    x = x.transpose(0, 1, 3, 2, 5, 4, 6, 7)           # (n, h,ty, w,tx, ry,rx,c)
    return x.reshape(n, 2 * h, 2 * w, b_out * b_out * c)


# ---------------------------------------------------------------------------
# folded kernels (index maps cached per fold factor)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _down_map(b_in: int) -> np.ndarray:
    """K[δ+1, β, γ] = kernel tap k with 2γ − 1 + k = δ·b_in + β, else 4."""
    b_out = max(1, b_in // 2)
    m = np.full((3, b_in, b_out), 4, np.int32)
    for d in (-1, 0, 1):
        for beta in range(b_in):
            for g in range(b_out):
                k = d * b_in + beta - 2 * g + 1
                if 0 <= k < 4:
                    m[d + 1, beta, g] = k
    return m


@functools.lru_cache(maxsize=None)
def _up_map(b_in: int) -> np.ndarray:
    """K[δ+1, β, γ] = tap k with k = 2(δ·b_in + β) − γ + 2, else 4."""
    b_out = 2 * b_in
    m = np.full((3, b_in, b_out), 4, np.int32)
    for d in (-1, 0, 1):
        for beta in range(b_in):
            for g in range(b_out):
                k = 2 * (d * b_in + beta) - g + 2
                if 0 <= k < 4:
                    m[d + 1, beta, g] = k
    return m


def _folded_kernel(w: jnp.ndarray, idx: np.ndarray) -> jnp.ndarray:
    """(4,4,Ci,Co) weights + (3,b_in,b_out) tap map → (3,3,b_in²Ci,b_out²Co)."""
    b_in, b_out = idx.shape[1], idx.shape[2]
    ci, co = w.shape[2], w.shape[3]
    wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))       # tap 4 ≡ zero
    m = jnp.asarray(idx)
    a = jnp.take(wp, m.reshape(-1), axis=0).reshape(3, b_in, b_out, 5, ci, co)
    fk = jnp.take(a, m.reshape(-1), axis=3).reshape(
        3, b_in, b_out, 3, b_in, b_out, ci, co)
    # (dy,βy,γy,dx,βx,γx,ci,co) → (dy,dx, βy,βx,ci, γy,γx,co)
    fk = fk.transpose(0, 3, 1, 4, 6, 2, 5, 7)
    return fk.reshape(3, 3, b_in * b_in * ci, b_out * b_out * co)


def _block_conv(x_f, fk, bias, b_out, co, dt):
    y = jax.lax.conv_general_dilated(
        x_f.astype(dt), fk.astype(dt), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + jnp.tile(bias, b_out * b_out).astype(dt)
    return y


def folded_conv4x4_s2(x_f, w, bias, b_in: int, dt) -> jnp.ndarray:
    """Fold-b_in input → fold-b_in/2 output of the 4×4/s2/p1 conv."""
    if b_in == 1:
        y = jax.lax.conv_general_dilated(
            x_f.astype(dt), w.astype(dt), (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(dt) if bias is not None else y
    b_out = b_in // 2
    return _block_conv(x_f, _folded_kernel(w, _down_map(b_in)), bias,
                       b_out, w.shape[3], dt)


def folded_convT4x4_s2(x_f, w, bias, b_in: int, dt) -> jnp.ndarray:
    """Fold-b_in input → fold-2·b_in output of the 4×4/s2 ConvTranspose.

    `w` is the flax ConvTranspose kernel (UNFLIPPED (4,4,Ci,Co) — the pinned
    lhs-dilated equivalence in blocks.py)."""
    return _block_conv(x_f, _folded_kernel(w, _up_map(b_in)), bias,
                       2 * b_in, w.shape[3], dt)


def convT4x4_s2(x, w, bias, dt) -> jnp.ndarray:
    """Standard (unfolded) ConvTranspose equivalent (blocks.py pin)."""
    y = jax.lax.conv_general_dilated(
        x.astype(dt), w.astype(dt), (1, 1), ((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias.astype(dt) if bias is not None else y


def folded_instance_norm(x_f, b: int, eps: float = 1e-5) -> jnp.ndarray:
    """Instance norm over (H, W) per ORIGINAL channel on the folded tensor —
    the identical reduction set (and the identical one-pass fp32-stats
    numerics) as blocks.InstanceNorm, without unfolding."""
    n, hb, wb, bc = x_f.shape
    c = bc // (b * b)
    xr = x_f.reshape(n, hb, wb, b * b, c)
    mean = jnp.mean(xr, axis=(1, 2, 3), keepdims=True, dtype=jnp.float32)
    var = jnp.mean(jnp.square(xr.astype(jnp.float32)), axis=(1, 2, 3),
                   keepdims=True) - jnp.square(mean)
    scale = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    out = (xr - mean.astype(xr.dtype)) * scale.astype(xr.dtype)
    return out.reshape(n, hb, wb, bc)


def folded_concat(a, b_, groups: int) -> jnp.ndarray:
    """Channel-concat of two fold-b tensors (groups = b²): per-block-position
    channels stay contiguous, matching fold()'s (β-major, c-minor) order."""
    if groups == 1:
        return jnp.concatenate([a, b_], axis=-1)
    sa = a.shape[:-1] + (groups, a.shape[-1] // groups)
    sb = b_.shape[:-1] + (groups, b_.shape[-1] // groups)
    out = jnp.concatenate([a.reshape(sa), b_.reshape(sb)], axis=-1)
    return out.reshape(a.shape[:-1] + (a.shape[-1] + b_.shape[-1],))


# ---------------------------------------------------------------------------
# the folded CustomUNet forward
# ---------------------------------------------------------------------------

def folded_unet_apply(params, x, style_code=None, *, ngf: int,
                      num_downs: int = 8,
                      num_layer_separate: int = 4, image_nc: int = 3,
                      touch_nc: int = 2, canvas_fold: int = 8,
                      t_mult: int = 1, num_layer_style_code: int = -1,
                      dtype: Optional[jnp.dtype] = None) -> jnp.ndarray:
    """Exact CustomUNet forward on space-to-depth folded canvases.

    ``params``: the standard CustomUNet parameter tree (unet_custom.py).
    Supports the flagship configuration (instance norm, no dropout, no style
    codes, pack=1) — callers fall back to ``netG.apply`` otherwise.
    Output: (N, H, W, image_nc + touch_nc), identical to CustomUNet; at
    ``t_mult`` > 1 a (visual (N,H,W,3), tactile (N, mult·H, mult·W, 2)) tuple,
    identical to CustomUNet's tuple contract.

    ``style_code`` (skitG, (N, style_dim)): supports the shipped default
    injection — 'tile' mapping + 'concat' mode (reference
    networks.py:1600-1633) — at every decoder level ≥ num_downs −
    num_layer_style_code.  The spatial tile of a constant code folds to a
    per-block channel tile (broadcast, no materialized canvas-sized style
    map); 'project'/'adain' configs fall back to the unfolded net.

    ``t_mult`` (tactile super-resolution, power of 2): the tactile branch's
    log2(t_mult) extra innermost Up stages (``up0_T_extra{j}``) run FOLD-
    PRESERVING — each is the fold-increasing block convT (fold b → 2b at
    constant physical dims) followed by the exact ``unfold2`` block permute
    back to fold b at 2× physical dims.  Compounding the fold instead
    (b → 2b → 4b …) would square the dense-kernel FLOP blow-up per stage
    (2.25·b_in²: ×144 at b=8, ×576 at b=16 — measured-prohibitive); the
    constant-fold schedule pays ×36 at b=4 on layers that are ≤ ~30 GFLOP
    unfolded while keeping every ×2/×4 tactile canvas intermediate at
    ≥ 128 dense lanes (b²·ngf = 160).  Reference analogue of the extra
    stages: models/networks.py:1099-1105 (G2-resnet n_upsampling).
    """
    nd = num_downs
    g = ngf
    dt = dtype or x.dtype
    b = [max(1, canvas_fold >> i) for i in range(nd + 1)]    # fold at level i

    def conv_p(name):
        p = params[name]["Conv4x4_0"]["Conv_0"]
        return p["kernel"], p.get("bias")

    def convt_p(name):
        p = params[name]["ConvT4x4_0"]["ConvTranspose_0"]
        return p["kernel"], p.get("bias")

    # ---- encoder ----
    h = fold(x, b[0])
    skips = []
    for i in range(nd):
        if i > 0:
            h = jax.nn.leaky_relu(h, 0.2)
        w, bias = conv_p(f"down{i}")
        h = folded_conv4x4_s2(h, w, bias, b[i], dt)
        if 0 < i < nd - 1:
            h = folded_instance_norm(h, b[i + 1])
        skips.append(h)

    # ---- decoder (shared trunk → forked visual/tactile heads) ----
    def up_layer(name, h_in, skip, i):
        outermost = i == 0
        innermost = i == nd - 1
        b_in, b_out = b[i + 1], b[i]
        if not (outermost or innermost) and skip is not None:
            h_in = folded_concat(h_in, skip, b_in * b_in)
        h_in = jax.nn.relu(h_in)
        w, bias = convt_p(name)
        if b_out == 1:
            y = convT4x4_s2(h_in, w, bias, dt)
        else:
            y = folded_convT4x4_s2(h_in, w, bias, b_in, dt)
        if outermost:
            return jnp.tanh(y)
        return folded_instance_norm(y, b_out)

    n_style = nd if num_layer_style_code == -1 else num_layer_style_code

    def style_folded(bf, hh, ww):
        """Fold-bf tile of the constant style code: every block position
        carries the same (style_dim,) vector — a broadcast, zero FLOPs."""
        n_, sd = style_code.shape[0], style_code.shape[-1]
        st = jnp.broadcast_to(
            style_code.astype(dt)[:, None, None, None, :],
            (n_, hh, ww, bf * bf, sd))
        return st.reshape(n_, hh, ww, bf * bf * sd)

    h_vis = None
    h_tac = None
    for i in range(nd - 1, -1, -1):
        skip = skips[i]
        if i == nd - 1:
            h_vis = skips[i]
        if style_code is not None and i >= nd - n_style:
            # injection precedes the fork (unet_custom.py:171-182): at the
            # fork level the tactile branch inherits the style-concat
            bf = b[i + 1]
            st = style_folded(bf, h_vis.shape[1], h_vis.shape[2])
            h_vis = folded_concat(h_vis, st, bf * bf)
            if h_tac is not None:
                h_tac = folded_concat(h_tac, st, bf * bf)
        if i <= num_layer_separate - 1 and h_tac is None:
            h_tac = h_vis  # fork point
        if i == 0 and t_mult > 1 and h_tac is not None:
            # tactile super-resolution: extra innermost Up stages (relu →
            # ConvT4×4/s2 → instance norm) before the outermost up0_T, each
            # fold-preserving (see docstring)
            bt = b[1]
            for j in range(int(t_mult).bit_length() - 1):
                w, bias = convt_p(f"up0_T_extra{j}")
                y = folded_convT4x4_s2(jax.nn.relu(h_tac), w, bias, bt, dt)
                y = unfold2(y, bt, ngf)           # fold bt, physical ×2
                h_tac = folded_instance_norm(y, bt)
        h_vis = up_layer(f"up{i}", h_vis, skip, i)
        if h_tac is not None:
            h_tac = up_layer(f"up{i}_T", h_tac, skip, i)

    vis = unfold(h_vis, b[0], image_nc)
    tac = unfold(h_tac, b[0], touch_nc)
    if t_mult > 1:
        return vis, tac   # resolutions diverge — CustomUNet's tuple contract
    return jnp.concatenate([vis, tac], axis=-1)
