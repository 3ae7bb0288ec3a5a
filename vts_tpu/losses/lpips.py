"""LPIPS perceptual distance in JAX (VGG16 backbone).

Functional re-implementation of the ``lpips`` package's LPIPS(net='vgg')
used throughout the reference (reference models/sinskitG_model.py:497-506,
models/model_utils.py:476-525):

  input (N, H, W, 1|3) in [-1, 1]
    → scaling layer (x - shift)/scale per RGB channel (1-channel inputs
      broadcast against the 3-channel shift exactly like torch broadcasting,
      which is what the reference relies on for gx/gy patches)
    → VGG16 features at relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3
    → per-layer: channel-unit-normalize, squared diff, 1x1 non-negative
      linear head, spatial mean, summed over layers → (N, 1, 1, 1).

Weights: ``load_lpips_weights(path)`` converts a torch checkpoint — either a
full ``lpips.LPIPS`` state_dict or a torchvision ``vgg16`` state_dict plus
the 5 ``lin*`` heads — into the params pytree (torch is CPU-importable in
this environment).  Without a checkpoint, ``init_lpips_params`` builds a
deterministic randomly-initialized backbone with uniform averaging heads:
a "random VGG" perceptual distance.  That keeps training/metrics functional
(random conv features are a known-usable perceptual basis) but numbers are
not comparable to the official LPIPS until real weights are supplied — the
converter is the parity path.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, followed_by_pool)
_VGG16_PLAN: List[Tuple[int, bool]] = [
    (64, False), (64, True),
    (128, False), (128, True),
    (256, False), (256, False), (256, True),
    (512, False), (512, False), (512, True),
    (512, False), (512, False), (512, True),
]
# feature taps after the relu of conv index (0-based)
_TAPS = (1, 3, 6, 9, 12)
_TAP_CHANNELS = (64, 128, 256, 512, 512)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_lpips_params(seed: int = 0) -> Dict:
    """Deterministic fallback parameters (random VGG, averaging heads)."""
    rng = np.random.default_rng(seed)
    params = {"conv": [], "lin": []}
    in_c = 3
    for out_c, _ in _VGG16_PLAN:
        fan_in = in_c * 9
        w = rng.normal(0.0, np.sqrt(2.0 / fan_in), size=(3, 3, in_c, out_c)).astype(np.float32)
        b = np.zeros((out_c,), np.float32)
        params["conv"].append({"w": jnp.asarray(w), "b": jnp.asarray(b)})
        in_c = out_c
    for c in _TAP_CHANNELS:
        params["lin"].append(jnp.full((c,), 1.0 / c, jnp.float32))
    return params


def load_lpips_weights(path: str) -> Dict:
    """Convert a torch checkpoint to the params pytree.

    Accepts a ``lpips.LPIPS`` full state_dict (keys ``net.slice*.*.weight`` +
    ``lin*.model.1.weight``), or a dict with a torchvision vgg16 state_dict
    under 'vgg' (keys ``features.N.weight``) and lin heads under 'lins'.
    """
    import torch  # CPU torch is available in this environment

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if isinstance(sd, dict) and "vgg" in sd:
        vgg_sd, lins = sd["vgg"], sd["lins"]
    else:
        vgg_sd, lins = sd, sd

    def grab(key_candidates):
        for k in key_candidates:
            if k in vgg_sd:
                return np.asarray(vgg_sd[k].detach().cpu().numpy() if hasattr(vgg_sd[k], "detach") else vgg_sd[k])
        raise KeyError(key_candidates)

    # torchvision layer indices of the 13 convs in vgg16.features
    tv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    # lpips slices: slice1:(0..3) slice2:(4..8) slice3:(9..15) slice4:(16..22) slice5:(23..29)
    slice_of = lambda i: 1 + sum(i >= b for b in (4, 9, 16, 23))
    params = {"conv": [], "lin": []}
    for ci, li in enumerate(tv_idx):
        s = slice_of(li)
        w = grab([f"features.{li}.weight", f"net.slice{s}.{li}.weight"])
        b = grab([f"features.{li}.bias", f"net.slice{s}.{li}.bias"])
        # torch conv weight (out, in, kh, kw) → flax HWIO
        params["conv"].append({"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
                               "b": jnp.asarray(b)})
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight", f"lin{i}.weight"):
            if key in lins:
                w = lins[key]
                w = np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach") else w)
                params["lin"].append(jnp.asarray(w.reshape(-1)))
                break
        else:
            raise KeyError(f"lin head {i} not found in checkpoint")
    return params


def _normalize_tensor(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


@jax.custom_vjp
def _sumsq_c(t):
    """Channel sum-of-squares with fp32 accumulation, (N,H,W,C) → (N,H,W,1).

    Equivalent to ``jnp.sum(jnp.square(t.astype(f32)), -1, keepdims=True)``,
    but with a custom vjp so AD does NOT save the fp32 upcast of ``t`` as a
    residual: under the bf16 tap policy the automatic rule materializes an
    fp32 copy of every tap (tap0 alone is 600 MB at the 1536² flagship) and
    drags reduce-preferred layouts through the VGG graph — the round-3
    device trace shows ~8 ms/step of pure f32 layout copies plus relu-output
    relayouts attributable to it.  Here the upcast fuses into the reduce and
    only the bf16 tap (already live) is saved."""
    return jnp.sum(jnp.square(t.astype(jnp.float32)), axis=-1, keepdims=True)


def _sumsq_c_fwd(t):
    return _sumsq_c(t), t


def _sumsq_c_bwd(t, g):
    # d/dt Σt² = 2·t·g, computed in fp32 in-register (same numerics as the
    # automatic rule: f32 product, then the convert transpose's downcast)
    return ((2.0 * g * t.astype(jnp.float32)).astype(t.dtype),)


_sumsq_c.defvjp(_sumsq_c_fwd, _sumsq_c_bwd)


@jax.custom_vjp
def _lin_sq_head(delta, lin):
    """LPIPS linear head Σ_c lin_c·δ_c² with fp32 accumulation,
    (N, ..., C) → (N, ...).

    Equivalent to ``jnp.sum(square(δ)·lin, -1, dtype=f32)`` but with a
    custom vjp: the automatic transpose of the fp32-accumulating reduce
    broadcasts the fp32 cotangent to tap size BEFORE the downcast — the
    round-3 device trace shows tap-0-sized fp32 layout copies (604 MB each)
    riding that path.  Here the backward emits the bf16 cotangent directly
    (fp32 in-register, one fused op) and the forward saves only the bf16 δ."""
    return jnp.sum(jnp.square(delta.astype(jnp.float32))
                   * lin.astype(jnp.float32), axis=-1)


def _lin_sq_head_fwd(delta, lin):
    return _lin_sq_head(delta, lin), (delta, lin)


def _lin_sq_head_bwd(res, g):
    delta, lin = res
    gd = (2.0 * g[..., None]) * lin.astype(jnp.float32) \
        * delta.astype(jnp.float32)
    # lin is frozen (never differentiated); the zeros are DCE'd
    return gd.astype(delta.dtype), jnp.zeros_like(lin)


_lin_sq_head.defvjp(_lin_sq_head_fwd, _lin_sq_head_bwd)


@jax.custom_vjp
def _wsumsq_c(t, lin):
    """Weighted channel sum-of-squares Σ_c lin_c·t_c², fp32 accumulation,
    (N, ..., C) → (N, ..., 1).  Custom vjp for the same reason as _sumsq_c:
    the automatic rule saves an fp32 upcast of the tap as a residual."""
    tf = t.astype(jnp.float32)
    return jnp.sum(tf * tf * lin.astype(jnp.float32), axis=-1, keepdims=True)


def _wsumsq_c_fwd(t, lin):
    return _wsumsq_c(t, lin), (t, lin)


def _wsumsq_c_bwd(res, g):
    t, lin = res
    gt = (2.0 * g) * lin.astype(jnp.float32) * t.astype(jnp.float32)
    return gt.astype(t.dtype), jnp.zeros_like(lin)


_wsumsq_c.defvjp(_wsumsq_c_fwd, _wsumsq_c_bwd)


@jax.custom_vjp
def _wdot_c(x, y, lin):
    """Weighted channel dot Σ_c lin_c·x_c·y_c, fp32 accumulation,
    (N, ..., C) × (N, ..., C) → (N, ..., 1)."""
    return jnp.sum(x.astype(jnp.float32) * y.astype(jnp.float32)
                   * lin.astype(jnp.float32), axis=-1, keepdims=True)


def _wdot_c_fwd(x, y, lin):
    return _wdot_c(x, y, lin), (x, y, lin)


def _wdot_c_bwd(res, g):
    x, y, lin = res
    gl = g * lin.astype(jnp.float32)
    return ((gl * y.astype(jnp.float32)).astype(x.dtype),
            (gl * x.astype(jnp.float32)).astype(y.dtype),
            jnp.zeros_like(lin))


_wdot_c.defvjp(_wdot_c_fwd, _wdot_c_bwd)


def tap_folds(fold: int) -> List[int]:
    """Fold factor of each of the 5 taps for a given input fold: each pool
    before a tap consumes one factor of 2 (tap i sits after i pools)."""
    return [max(1, fold >> i) for i in range(5)]


def tap_groups(fold: int, axis: str = "hw") -> List[int]:
    """Channel-group count of each tap: b² fold positions for the symmetric
    fold, b for the width-only fold."""
    return [f * f if axis == "hw" else f for f in tap_folds(fold)]


def _scale_folded_conv1(params: Dict):
    """Fold LPIPS's scaling layer into conv1_1's weights — exactly.

    conv(w, (x - shift)/scale) + b  ==  conv(w/scale, x) + (b - Σ w·shift/scale):
    the per-RGB-channel affine is linear, so it commutes into the first conv.
    This removes two full-canvas materialized passes per VGG branch (the fp32
    upcast + scale pass cost ~12 ms/step in the round-3 device trace — the
    1536²·3 fp32 tensors get 3-of-128-lane padded layouts).

    Gray/tactile 1-channel inputs (the reference broadcasts them against the
    3-channel shift/scale) collapse by linearity in vgg16_taps:
    Σ_c w'_c·x = conv(Σ_c w'_c, x)."""
    w = params["conv"][0]["w"].astype(jnp.float32)     # (3, 3, 3, 64)
    b = params["conv"][0]["b"].astype(jnp.float32)
    inv = jnp.asarray(1.0 / _SCALE)
    w1 = w * inv[None, None, :, None]
    b1 = b - jnp.einsum("hwio,i->o", w, jnp.asarray(_SHIFT / _SCALE))
    return w1, b1


@functools.lru_cache(maxsize=None)
def _s2d_conv1_map(b: int):
    """Index maps (my, mx) building the stride-b fold-embedded conv1 kernel:
    K[jy, jx, ci, (py·b+px)·Co + co] = w[jy-py, jx-px, ci, co] (0 ≤ j-p < 3,
    else the zero-pad slot 3).  A 3×3/s1/p1 conv followed by space-to-depth
    fold b equals ONE (b+2)²/stride-b/pad-1 conv on the RAW input: output
    phase p at folded position G reads input rows G·b+p-1 … G·b+p+1."""
    jy, jx, p = np.meshgrid(np.arange(b + 2), np.arange(b + 2),
                            np.arange(b * b), indexing="ij")
    py, px = p // b, p % b
    my = np.where((jy - py >= 0) & (jy - py < 3), jy - py, 3)
    mx = np.where((jx - px >= 0) & (jx - px < 3), jx - px, 3)
    return my, mx


def _folded_conv1_strided(x, w1, b1, b):
    """Block-1 entry conv on the RAW (N, H, W, C) canvas: emits the fold-b
    space-to-depth tensor (N, H/b, W/b, b²·64) directly — no folded-input
    reshape ever materializes (the fp32 fold reshapes of the 3-lane canvas
    were ~10 ms/step of pure data formatting in the round-3 trace)."""
    co = w1.shape[-1]
    wp = jnp.pad(w1, ((0, 1), (0, 1), (0, 0), (0, 0)))  # slot 3 = zeros
    my, mx = _s2d_conv1_map(b)
    K = wp[my, mx]                          # (b+2, b+2, b², ci, co)
    K = jnp.transpose(K, (0, 1, 3, 2, 4)).reshape(
        b + 2, b + 2, w1.shape[2], b * b * co)
    y = jax.lax.conv_general_dilated(
        x, K.astype(x.dtype), (b, b), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + jnp.tile(b1, b * b).astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _s2d_conv1_map_w(b: int):
    """W-only fold-embedded entry-conv tap map: mx[jx, px] = jx − px when
    that is a valid 3-tap index, else the zero slot 3.  Output fold position
    px at folded column G reads raw columns G·b + px − 1 … G·b + px + 1;
    with stride-b windows anchored at G·b − 1, tap jx = px + k."""
    jx, px = np.meshgrid(np.arange(b + 2), np.arange(b), indexing="ij")
    return np.where((jx - px >= 0) & (jx - px < 3), jx - px, 3)


def _folded_conv1_strided_w(x, w1, b1, b):
    """Entry conv emitting the WIDTH-only fold-b tensor (N, H, W/b, b·64)
    straight from the raw canvas: one (3, b+2)/stride-(1,b)/pad-1 conv.
    Same derivation as _folded_conv1_strided restricted to W — the fold
    keeps the lane dimension at b·64 = 128 for b = 2 (exactly one register)
    at ×b instead of ×b² the conv1_2 FLOPs."""
    ci, co = w1.shape[2], w1.shape[3]
    wp = jnp.pad(w1, ((0, 0), (0, 1), (0, 0), (0, 0)))   # W slot 3 ≡ zero
    mx = jnp.asarray(_s2d_conv1_map_w(b))                # (b+2, b)
    K = jnp.take(wp, mx.reshape(-1), axis=1).reshape(3, b + 2, b, ci, co)
    K = K.transpose(0, 1, 3, 2, 4).reshape(3, b + 2, ci, b * co)
    y = jax.lax.conv_general_dilated(
        x, K.astype(x.dtype), (1, b), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + jnp.tile(b1, b).astype(x.dtype)


def _entry_bwd_kernel_w(w0, b):
    """Kernel of the W-folded entry conv's INPUT gradient, as one s1/p1 conv.

    The fold-embedded entry conv (``_folded_conv1_strided_w``) maps the raw
    (N, H, W, Ci) canvas to the folded (N, H, W/b, b·Co) tensor; its AD
    backward is a transposed-strided conv EMITTING Ci = 3 channels — a
    3-of-128-lane output shape.  But the cotangent can be produced in the
    FOLDED channel-regrouped layout instead: with raw column j = b·Gj + pj,
      dx_folded[n, a, Gj, pj·Ci + c]
        = Σ_{ky,kx,px}  w0[ky, kx, c, :] · dy[n, a−ky+1, Gj+δ, px·Co + :]
      for (px, kx) with  (pj − px − kx + 1) ≡ 0 (mod b),
      δ = (pj − px − kx + 1)/b ∈ {−1, 0, 1},
    which is ONE 3×3/s1/p1 conv of dy with this kernel
    K2[2−ky, δ+1, px·Co+o, pj·Ci+c] = w0[ky, kx, c, o] (each slot written at
    most once — (px,kx) pairs of one parity class have distinct δ), and the
    unfold (Gj, pj·Ci+c) → (j, c) is a CONTIGUOUS reshape: flat index
    Gj·b·Ci + pj·Ci + c = j·Ci + c.  The 3-lane canvas gradient is never
    materialized by a conv."""
    ci, co = w0.shape[2], w0.shape[3]
    K2 = jnp.zeros((3, 3, b * co, b * ci), w0.dtype)
    for ky in range(3):
        for kx in range(3):
            for px in range(b):
                for pj in range(b):
                    num = pj - px - kx + 1
                    if num % b or not -1 <= num // b <= 1:
                        continue
                    K2 = K2.at[2 - ky, num // b + 1,
                               px * co:(px + 1) * co,
                               pj * ci:(pj + 1) * ci].set(w0[ky, kx].T)
    return K2


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _folded_conv1_strided_w_fg(x, w1, b1, b):
    """``_folded_conv1_strided_w`` with the folded-cotangent backward: the
    input gradient is computed by ``_entry_bwd_kernel_w``'s single well-
    shaped conv (output channels padded to a full 128-lane tile) + a free
    reshape, instead of XLA's transposed-strided conv into the 3-lane
    canvas layout.  Exact (tests/test_losses.py::test_entry_conv_folded_
    cotangent_grad); weight/bias grads fall back to AD of the reference
    form and are dead-code-eliminated when the LPIPS weights are frozen."""
    return _folded_conv1_strided_w(x, w1, b1, b)


def _fg_fwd(x, w1, b1, b):
    return _folded_conv1_strided_w(x, w1, b1, b), (x, w1, b1)


def _fg_bwd(b, res, g):
    x, w1, b1 = res
    n, h, wf, _ = g.shape
    ci = x.shape[-1]
    K2 = _entry_bwd_kernel_w(w1, b)
    pad_co = (-K2.shape[-1]) % 128
    K2p = jnp.pad(K2, ((0, 0), (0, 0), (0, 0), (0, pad_co)))
    dxf = jax.lax.conv_general_dilated(
        g, K2p.astype(g.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    dx = dxf[..., :b * ci].reshape(n, h, wf * b, ci).astype(x.dtype)
    # dw/db: AD of the reference implementation — dead code when frozen
    _, ref_vjp = jax.vjp(
        lambda w, bb: _folded_conv1_strided_w(x, w, bb, b), w1, b1)
    dw1, db1 = ref_vjp(g)
    return dx, dw1, db1


_folded_conv1_strided_w_fg.defvjp(_fg_fwd, _fg_bwd)


def _lifted_w_kernel(w, bias, b):
    """Lifted (3, 3, b·Ci, b·Co) kernel + tiled bias of the WIDTH-fold-b
    form of a 3×3/s1/p1 conv — ×b the unfolded FLOPs (the symmetric fold
    pays ×b²).  Reuses _s1_map (the tap relation is 1-D per axis)."""
    ci, co = w.shape[2], w.shape[3]
    m = jnp.asarray(_s1_map(b))                          # (3, β, γ), slot 4
    wp = jnp.pad(w, ((0, 0), (0, 2), (0, 0), (0, 0)))    # W slots 3,4 ≡ zero
    a = jnp.take(wp, m.reshape(-1), axis=1).reshape(3, 3, b, b, ci, co)
    fk = a.transpose(0, 1, 2, 4, 3, 5).reshape(3, 3, b * ci, b * co)
    return fk, jnp.tile(bias, b)


def _folded_conv3x3_s1_w(h, w, bias, b):
    """Exact 3×3/s1/p1 conv on a WIDTH-only fold-b tensor."""
    fk, fb = _lifted_w_kernel(w, bias, b)
    y = jax.lax.conv_general_dilated(
        h, fk.astype(h.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + fb.astype(h.dtype)


def vgg16_taps(params: Dict, x: jnp.ndarray, dtype=None,
               fold: int = 1, conv1=None,
               fold_axis: str = "hw",
               conv_backend: str = "xla") -> List[jnp.ndarray]:
    """Run VGG16 and return the 5 tap activations (post-relu); tap i is
    space-to-depth folded by ``tap_folds(fold)[i]`` with
    ``tap_groups(fold, fold_axis)[i]`` channel groups.

    ``fold_axis='w'`` folds the WIDTH axis only: block-1 tensors carry
    b·64 = 128 channels for b = 2 (exactly one lane register) and the
    folded conv1_2 costs ×b instead of ×b² the unfolded FLOPs — same
    layout escape at half the FLOP overhead of the symmetric fold.

    ``dtype`` sets the conv compute dtype (bf16 keeps the backbone on the MXU
    fast path; taps are normalized in fp32 by the caller).

    ``fold`` > 1 runs the first VGG blocks space-to-depth folded — the same
    layout escape as networks/folded.py: the 3-lane input and 64-lane block-1
    tensors at 1536² are the most lane-padded intermediates of the whole
    step.  A 3×3/s1/p1 conv at fold b is an exact 3×3 block conv over
    (N, H/b, W/b, b²C) (tap k = δ·b + β − γ + 1, kernel scatter-built from
    the unchanged (3,3,Ci,Co) weights), and each 2×2/s2 maxpool consumes one
    factor of 2 of the fold for free: with the (βy·b+βx)·C+c channel order
    both pool inputs live in the SAME block, so the pool is a reshape-max
    over fold positions and the tensor comes out at fold b/2 with no
    spatial traffic.  Taps emitted while folded stay folded — the LPIPS tap
    math (channel normalize / diff / lin head / spatial mean) is computed
    group-wise on the folded layout, which is the identical reduction set.
    FLOP cost: ×b² on the folded convs (fold 2 on block 1 adds ~270 GFLOP
    fwd at 1536² — noise against the ~9 TFLOP LPIPS stage).

    ``conv1`` optionally replaces conv1_1's (w, b) — lpips() passes the
    scale-folded weights (_scale_folded_conv1) so the scaling layer costs
    zero passes.  The entry conv consumes the RAW (N, H, W, C) input even
    when fold > 1 (_folded_conv1_strided): folding the 3-lane canvas first
    materializes fp32 tensors in 42×-padded layouts (~10 ms/step measured).
    1-channel inputs collapse the 3 weight planes by linearity — exactly
    torch's broadcast of gray x to 3 identical channels."""
    taps = []
    h = x.astype(dtype) if dtype is not None else x
    b = fold
    # conv_backend='pallas': route the sub-roofline conv shapes (the folded
    # block-1 convs and block 2's unfolded convs — XLA lowers them at
    # 12.9-24.1% MFU vs 50-64% for blocks 3-5, round-5 isolated probe)
    # through the fused Pallas kernel (ops/pallas_conv.py), relu included in
    # its epilogue.  'pallas_interpret' = same path in interpreter mode
    # (CPU-safe, used by the equivalence tests).  Blocks 3-5 stay on XLA,
    # which already runs them near its conv ceiling.
    use_pallas = conv_backend in ("pallas", "pallas_interpret")
    if use_pallas:
        from ..ops.pallas_conv import conv3x3_relu
        interp = conv_backend == "pallas_interpret"
    w0, b0 = conv1 if conv1 is not None else (
        params["conv"][0]["w"], params["conv"][0]["b"])
    if h.shape[-1] == 1 and w0.shape[2] != 1:
        w0 = jnp.sum(w0, axis=2, keepdims=True)
    for i, ((out_c, pool), p) in enumerate(zip(_VGG16_PLAN, params["conv"])):
        fused_relu = False
        if i == 0:
            if b > 1:
                # fold-w entry uses the folded-cotangent backward: its input
                # grad is ONE well-shaped conv + free reshape instead of a
                # transposed-strided conv into the 3-lane canvas layout
                # (exact — test_entry_conv_folded_cotangent_grad)
                h = (_folded_conv1_strided_w_fg if fold_axis == "w"
                     else _folded_conv1_strided)(h, w0, b0, b)
            else:
                h = jax.lax.conv_general_dilated(
                    h, w0.astype(h.dtype), (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                h = h + b0.astype(h.dtype)
        elif b > 1:
            if use_pallas and fold_axis == "w" and h.shape[1] % 8 == 0 \
                    and h.shape[2] % 8 == 0:
                fk, fb = _lifted_w_kernel(p["w"], p["b"], b)
                h = conv3x3_relu(h, fk, fb, relu=True, interpret=interp)
                fused_relu = True
            else:
                h = (_folded_conv3x3_s1_w if fold_axis == "w"
                     else _folded_conv3x3_s1)(h, p["w"], p["b"], b)
        elif use_pallas and i in (2, 3) and h.shape[1] % 8 == 0 \
                and h.shape[2] % 8 == 0:
            h = conv3x3_relu(h, p["w"], p["b"], relu=True, interpret=interp)
            fused_relu = True
        else:
            h = jax.lax.conv_general_dilated(
                h, p["w"].astype(h.dtype), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            h = h + p["b"].astype(h.dtype)
        if not fused_relu:
            h = jax.nn.relu(h)
        if i in _TAPS:
            taps.append(h)
        if pool and i != len(_VGG16_PLAN) - 1:  # last pool never feeds a tap
            # 2×2/s2 maxpool over NON-overlapping windows == reshape + max.
            # reduce_window's backward lowers to select_and_scatter (~13 ms/
            # step at flagship shapes); reshape-max backward is a cheap
            # compare-select fusion.  Forward exact; backward differs from
            # torch only on tied window maxima — after a relu, ties are
            # all-zero windows whose gradient the relu backward zeroes anyway.
            n, hh, ww, c = h.shape
            if b > 1 and fold_axis == "w":
                # W-folded pool: the W window pair sits in the fold
                # positions; the H pair is spatial
                c0 = c // b
                h = jnp.max(h.reshape(n, hh // 2, 2, ww, b // 2, 2, c0),
                            axis=(2, 5))
                b //= 2
                h = h.reshape(n, hh // 2, ww, b * c0)
            elif b > 1:
                # folded pool: both window elements of every output pixel sit
                # in the same block → max over the 2×2 fold positions
                c0 = c // (b * b)
                h = jnp.max(h.reshape(n, hh, ww, b // 2, 2, b // 2, 2, c0),
                            axis=(4, 6))
                b //= 2
                h = h.reshape(n, hh, ww, b * b * c0)
            else:
                if hh % 2 or ww % 2:
                    # odd spatial size: a VALID 2×2/s2 window ignores the
                    # trailing row/col — slice to even first (exact match of
                    # the previous reduce_window('VALID') behavior)
                    h = h[:, : hh // 2 * 2, : ww // 2 * 2, :]
                    hh, ww = hh // 2 * 2, ww // 2 * 2
                h = jnp.max(h.reshape(n, hh // 2, 2, ww // 2, 2, c), axis=(2, 4))
    return taps


@functools.lru_cache(maxsize=None)
def _s1_map(b: int) -> "np.ndarray":
    """3×3/s1/p1 conv taps at fold b: K[δ+1, β, γ] = k with
    k = δ·b + β − γ + 1 (output o = G·b + γ reads input i = o − 1 + k)."""
    m = np.full((3, b, b), 4, np.int32)
    for d in (-1, 0, 1):
        for beta in range(b):
            for g in range(b):
                k = d * b + beta - g + 1
                if 0 <= k < 3:
                    m[d + 1, beta, g] = k
    return m


def _folded_conv3x3_s1(h, w, bias, b):
    """Exact 3×3/s1/p1 conv on a fold-b tensor (even sizes: no garbage)."""
    from ..networks.folded import _folded_kernel
    wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))  # lift to the 4×4 table
    fk = _folded_kernel(wp, _s1_map(b))
    y = jax.lax.conv_general_dilated(
        h, fk.astype(h.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + jnp.tile(bias, b * b).astype(h.dtype)


def lpips_y_taps(params: Dict, y: jnp.ndarray, dtype=None,
                 fold: int = 1, fold_axis: str = "hw",
                 conv_backend: str = "xla") -> Tuple[jnp.ndarray, ...]:
    """Precompute the reference branch's VGG taps for ``lpips(...,
    y_taps=...)``.

    The taps of a CONSTANT reference image (sinskit's real canvas never
    changes across the 405-epoch schedule; the reference recomputes its VGG
    forward every step, sinskitG_model.py:497-506) can be computed once,
    kept device-resident, and fed back into every step — the y forward
    (~1/3 of the y_no_grad LPIPS FLOPs) then vanishes from the step graph.
    Mirrors lpips()'s own preprocessing exactly (fp32 cast when dtype is
    None, scale-folded conv1, fold demotion on non-divisible sizes) so the
    cached taps are the same arrays the in-graph recompute would produce."""
    if dtype is None:
        y = y.astype(jnp.float32)
    conv1 = _scale_folded_conv1(params)
    if fold > 1 and (y.shape[1] % fold or y.shape[2] % fold):
        fold = 1
    return tuple(jax.lax.stop_gradient(t)
                 for t in vgg16_taps(params, jax.lax.stop_gradient(y), dtype,
                                     fold=fold, conv1=conv1,
                                     fold_axis=fold_axis,
                                     conv_backend=conv_backend))


def lpips(params: Dict, x: jnp.ndarray, y: jnp.ndarray, dtype=None,
          y_no_grad: bool = False, fold: int = 1,
          y_taps: Tuple[jnp.ndarray, ...] = None,
          fold_axis: str = "hw", head_mode: str = "composed",
          conv_backend: str = "xla") -> jnp.ndarray:
    """Perceptual distance per sample, shape (N,).

    x, y: (N, H, W, 1|3) in [-1, 1] (NHWC).  ``dtype=jnp.bfloat16`` runs the
    VGG backbone in bf16 (distances aggregate in fp32).

    ``y_no_grad=True`` runs the y (reference) branch as a SEPARATE
    stop-gradiented forward instead of one 2N-batch pass: when only x is
    differentiated (the training losses — y is the constant real image), AD
    then builds no backward for the y half at all.  The joint pass can't be
    saved by a mere stop_gradient because both halves live in one tensor —
    the conv-transpose backward runs on the full 2N batch and the y-half
    cotangent is only discarded at the concat.  Saves ~1/3 of the LPIPS
    fwd+bwd FLOPs; per-sample values are identical (the backbone has no
    cross-sample ops).

    ``y_taps``: precomputed reference taps from ``lpips_y_taps`` (same
    dtype/fold); skips the y forward entirely — ``y`` is then ignored.

    ``head_mode``: 'composed' (normalize → diff → lin head, the literal
    torch-lpips composition) or 'factored' (the algebraically identical
    3-reduction form — see the inline comment; exact up to fp reassociation,
    pinned by tests/test_losses.py::test_lpips_factored_head_matches)."""
    if dtype is None:
        x = x.astype(jnp.float32)
        y = y.astype(jnp.float32)
    # The scaling layer (x - shift)/scale — incl. the torch broadcast of
    # 1-channel gx/gy inputs against the 3-channel shift the reference leans
    # on — is folded into conv1_1's weights (exact: it is linear), so no
    # canvas-sized scaling pass ever materializes.
    conv1 = _scale_folded_conv1(params)
    if fold > 1 and (x.shape[1] % fold or x.shape[2] % fold):
        fold = 1  # patch-sized inputs: folding buys nothing, run standard
    if y_taps is not None:
        if not y_no_grad:
            # Precomputed taps are always stop-gradiented — a caller that
            # wants gradients through y must not pass y_taps.  Fail loudly
            # instead of silently dropping the y gradient.
            raise ValueError("y_taps implies y_no_grad=True; pass y instead "
                             "if gradients through the reference are needed")
        fx = vgg16_taps(params, x, dtype, fold=fold, conv1=conv1,
                        fold_axis=fold_axis, conv_backend=conv_backend)
        fy = [jax.lax.stop_gradient(t) for t in y_taps]
        if [tuple(t.shape) for t in fy] != [tuple(t.shape) for t in fx]:
            raise ValueError(
                "y_taps shapes don't match this call's x taps — recompute "
                "them with lpips_y_taps at the same (dtype, fold, H, W)")
    elif y_no_grad:
        fx = vgg16_taps(params, x, dtype, fold=fold, conv1=conv1,
                        fold_axis=fold_axis, conv_backend=conv_backend)
        fy = [jax.lax.stop_gradient(t)
              for t in vgg16_taps(params, jax.lax.stop_gradient(y), dtype,
                                  fold=fold, conv1=conv1,
                                  fold_axis=fold_axis, conv_backend=conv_backend)]
    else:
        # one batched VGG pass for both branches — exact (the backbone has no
        # cross-sample ops) and doubles the matmul M dimension for the MXU
        both = vgg16_taps(params, jnp.concatenate([x, y], axis=0), dtype,
                          fold=fold, conv1=conv1, fold_axis=fold_axis, conv_backend=conv_backend)
        n = x.shape[0]
        fx = [t[:n] for t in both]
        fy = [t[n:] for t in both]
    total = 0.0
    for tx, ty, lin, tg in zip(fx, fy, params["lin"],
                               tap_groups(fold, fold_axis)):
        # channel-norm factors accumulate in fp32 (N,H,W,1); the tap-sized
        # arithmetic stays in the tap dtype — upcasting tap0 (1536²×64) to
        # fp32 materializes ~600 MB tensors (×2 branches, × backward
        # residuals) in lane-padded layouts.  dtype=None (fp32 taps) is
        # numerically equivalent (within 1 ulp: reciprocal-multiply vs
        # divide) to torch's x/(||x||+eps); under the bf16 policy the
        # per-layer diff/lin products stay bf16 — the parity tests' fp32
        # tolerances cover both paths.
        def nrm(t):
            ss = _sumsq_c(t)
            inv = 1.0 / (jnp.sqrt(ss) + 1e-10)  # torch: x / (||x|| + eps)
            return t * inv.astype(t.dtype)
        if tg > 1:
            # folded tap: normalize / diff / lin / mean group-wise per fold
            # position — the identical per-pixel reduction sets.  _sumsq_c
            # reduces axis -1, so the 5-D (N,Hb,Wb,g,C) view routes each
            # fold position's channels through the same custom-vjp reduce.
            nn_, hb, wb, bc = tx.shape
            c0 = bc // tg
            tx = tx.reshape(nn_, hb, wb, tg, c0)
            ty = ty.reshape(ty.shape[0], hb, wb, tg, c0)
        if head_mode == "factored":
            # Algebraic factoring of the head — no normalized tap, no diff
            # tensor ever materializes.  With x̂ = x·rx, ŷ = y·ry
            # (rx = 1/(‖x‖+ε) per pixel):
            #   Σ_c lin_c (x̂_c − ŷ_c)²
            #     = rx²·Σ lin x² + ry²·Σ lin y² − 2·rx·ry·Σ lin x y
            # Three fused channel reductions (custom-vjp — no fp32 tap
            # upcasts saved) + per-pixel fp32 scalar math replace the
            # composed path's two tap-sized normalize writes and the diff.
            # Exact up to fp reassociation; under the bf16 policy it is
            # STRICTLY closer to torch's fp32 math (the composed path
            # rounds x̂ to bf16).  Round-3c trace: heads ≈14 ms/step —
            # this is the measured attack on that tail.
            rx = 1.0 / (jnp.sqrt(_sumsq_c(tx)) + 1e-10)
            ry = 1.0 / (jnp.sqrt(_sumsq_c(ty)) + 1e-10)
            val = (jnp.square(rx) * _wsumsq_c(tx, lin)
                   + jnp.square(ry) * _wsumsq_c(ty, lin)
                   - (2.0 * rx * ry) * _wdot_c(tx, ty, lin))
            val = val[..., 0]
        else:
            # 1x1 conv head on the squared tap diff, fp32 accumulate —
            # custom vjp keeps the tap-sized cotangent in the tap dtype
            # (see _lin_sq_head)
            val = _lin_sq_head(nrm(tx) - nrm(ty), lin)
        total = total + (jnp.mean(val, axis=(1, 2, 3)) if tg > 1
                         else jnp.mean(val, axis=(1, 2)))
    return total


def make_lpips(params: Dict):
    """Closure with params baked in (so it jits as a constant)."""
    return functools.partial(lpips, params)
