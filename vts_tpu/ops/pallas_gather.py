"""Pallas TPU kernel for batched patch extraction.

The patch gather is the framework's hot custom op (reference
models/model_utils.py:72-405 — the meshgrid gather).  The XLA formulation in
:mod:`vts_tpu.ops.patch` materializes a (K, cut, W, C) row-gather
intermediate; this kernel instead DMA-copies each patch window straight from
the HBM-resident image into VMEM using scalar-prefetched offsets — zero
intermediate traffic, one grid step per patch.

Offsets are scalar-prefetched (``PrefetchScalarGridSpec``) so the DMA source
addresses are known before the kernel body runs.  Out-of-range offsets are
clamped on the host side of the call (window-shift semantics, matching
``mode='slice'`` of the XLA path; the data pipeline only produces in-bounds
windows, where all modes agree).

Status: experimental.  Parity with the XLA path is tested in interpret mode;
on this environment's remote-Mosaic toolchain the 5-channel (lane-unaligned)
window DMA fails to compile, and the XLA gather (µs-scale for K=64) remains
the production path — revisit with channel padding to the 128-lane tile if
the gather ever shows up in profiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=("cutout", "interpret"))
def gather_patches_pallas(image: jnp.ndarray, offset_x: jnp.ndarray,
                          offset_y: jnp.ndarray, cutout: int,
                          interpret: bool = False) -> jnp.ndarray:
    """image (H, W, C) or (1, H, W, C); offsets (K,) int32 →
    (K, cutout, cutout, C)."""
    if image.ndim == 4:
        image = image[0]
    h, w, c = image.shape
    k = offset_x.shape[0]
    ox = jnp.clip(offset_x, 0, w - cutout).astype(jnp.int32)
    oy = jnp.clip(offset_y, 0, h - cutout).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(k,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, cutout, cutout, c),
                               lambda i, *_: (i, 0, 0, 0)),
    )

    def kernel(off_y_ref, off_x_ref, img_ref, out_ref):
        i = pl.program_id(0)
        oy_i = off_y_ref[i]
        ox_i = off_x_ref[i]

        def body(scratch, sem):
            cp = pltpu.make_async_copy(
                img_ref.at[pl.ds(oy_i, cutout), pl.ds(ox_i, cutout), :],
                scratch, sem)
            cp.start()
            cp.wait()
            out_ref[0, ...] = scratch[...]

        pl.run_scoped(body,
                      scratch=pltpu.VMEM((cutout, cutout, c), image.dtype),
                      sem=pltpu.SemaphoreType.DMA)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, cutout, cutout, c), image.dtype),
        interpret=interpret,
    )(oy, ox, image)
