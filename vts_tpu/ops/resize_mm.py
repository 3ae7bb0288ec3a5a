"""Separable image resize as two MXU matmuls (exact ``jax.image.resize``).

``jax.image.resize`` lowers a large spatial downsample (e.g. the 1536² → 224²
CLIP/D3 input prep, reference ``vision_aided_loss`` preprocessing) to gather
chains on TPU, and its VJP to scatter-adds — the round-5 device trace of the
batch-4 production step attributed 23.4 ms/step to that one line
(``networks/clip_vit.py:146``) for what is ~0.03 GB of HBM traffic and two
small matmuls of real math.  Linear/cubic resize IS a linear operator and it
is separable per axis, so ``resize(x) == A_h @ x @ A_w^T`` exactly, where
``A_h (out_h, in_h)`` / ``A_w (out_w, in_w)`` are the 1-D interpolation
matrices.  We obtain those matrices from ``jax.image.resize`` itself — by
resizing an identity matrix along one axis on the CPU backend at trace time —
so the weights (half-pixel centers, antialias triangle/Keys kernels, edge
normalization) agree with the reference implementation BY CONSTRUCTION, not
by re-derivation.  The dense matmul does the sparse kernel's zero work for
free on the systolic array, and the VJP is just the transposed matmuls.

Numerics: accumulation order differs from the gather implementation, so
values agree to float32 round-off (~1e-6 relative; pinned by
``tests/test_ops.py::test_resize_mm_matches_jax_image_resize``), not
bit-exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _resize_matrix(in_size: int, out_size: int, method: str,
                   antialias: bool) -> np.ndarray:
    """(out_size, in_size) 1-D interpolation matrix, exact by construction:
    the columns are ``jax.image.resize`` applied to the identity basis."""
    cpu = jax.devices("cpu")[0]
    # ensure_compile_time_eval: this helper is typically first hit while
    # TRACING the fused train step — run the identity resize eagerly on the
    # CPU backend instead of baking a 1536²-gather constant into the graph.
    with jax.ensure_compile_time_eval(), jax.default_device(cpu):
        eye = jnp.eye(in_size, dtype=jnp.float32)
        mat = jax.image.resize(eye, (out_size, in_size), method=method,
                               antialias=antialias)
        return np.asarray(jax.device_get(mat))


def resize_mm(x: jnp.ndarray, size, method: str = "linear",
              antialias: bool = True) -> jnp.ndarray:
    """NHWC (or HWC) resize to ``size=(h, w)``; equals
    ``jax.image.resize(x, (..., h, w, C), method, antialias=antialias)`` to
    f32 round-off, but runs (fwd AND bwd) as two matmuls on the MXU."""
    out_h, out_w = int(size[0]), int(size[1])
    batched = x.ndim == 4
    if not batched:
        x = x[None]
    n, h, w, c = x.shape
    if (out_h, out_w) == (h, w):
        return x if batched else x[0]
    dt = x.dtype
    cdt = jnp.promote_types(dt, jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    # Formulation matters as much as the operator: the naive einsums
    # ("oh,nhwc->nowc" / "pw,nhwc->nhpc") leave C = 3 as the only free minor
    # dimension of the W-pass dot — 3-wide GEMMs that ran at ~2% MXU and
    # cost 22.0 ms/step in the round-5 batch-4 D3 trace (resize_mm.py:70),
    # i.e. exactly what the gather lowering cost.  Both passes are therefore
    # shaped as ONE large matmul each with every non-contracted axis merged
    # into the free dimension: H-pass (out_h, H) @ (H, W·C) per batch
    # element (the (W, C) flatten is a contiguous regroup), W-pass
    # (out_w, W) @ (W, N·h·C) after rotating W into the contraction slot
    # (the rotation relayouts the already-H-shrunk tensor when both axes
    # resize).
    y = x.astype(cdt)
    if out_h != h:
        a = jnp.asarray(_resize_matrix(h, out_h, method, antialias), dtype=cdt)
        y = jnp.einsum("oh,nhq->noq", a, y.reshape(n, h, w * c),
                       precision=hi).reshape(n, out_h, w, c)
    if out_w != w:
        b = jnp.asarray(_resize_matrix(w, out_w, method, antialias), dtype=cdt)
        hh = y.shape[1]
        yt = jnp.transpose(y, (2, 0, 1, 3)).reshape(w, n * hh * c)
        y = jnp.matmul(b, yt, precision=hi).reshape(
            out_w, n, hh, c).transpose(1, 2, 0, 3)
    y = y.astype(dt)
    return y if batched else y[0]
