"""Measure the lane-padding tax on small-channel canvas tensors (future-work
sizing for the space-to-depth escape; RESULTS.md round-2 analysis).

Times a materializing elementwise op over the SAME logical elements in two
shapes: the flagship's native canvas (N, 1536, 1536, C≤10) vs an 8×8
space-to-depth fold (N, 192, 192, 64·C) whose channel count fills the
128-lane tile.  The ratio is the per-materialization speedup a folded
canvas pipeline would get on every non-conv op.

Env: VTS_FOLD_SIZE (1536), VTS_FOLD_C (9), VTS_FOLD_STEPS (30).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def main():
    size = int(os.environ.get("VTS_FOLD_SIZE", "1536"))
    c = int(os.environ.get("VTS_FOLD_C", "9"))
    steps = int(os.environ.get("VTS_FOLD_STEPS", "30"))

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/vts_jax_cache")

    rng = np.random.default_rng(0)
    fold = 8
    native = jnp.asarray(rng.uniform(-1, 1, (1, size, size, c)).astype(np.float32),
                         dtype=jnp.bfloat16)
    folded = native.reshape(1, size // fold, fold, size // fold, fold, c) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(1, size // fold, size // fold,
                                             fold * fold * c)

    def chain(x):
        # a few materializing elementwise stages (each output is consumed by
        # the next op but the final result materializes at full size)
        y = x * jnp.bfloat16(1.5) + jnp.bfloat16(0.25)
        y = jnp.tanh(y)
        y = y * x
        return y

    for label, x in (("native", native), ("folded", folded)):
        f = jax.jit(chain)
        out = f(x)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(steps):
            out = f(out)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / steps
        nbytes = x.size * 2 * 2  # read + write, bf16
        print(f"[fold] {label} {tuple(x.shape)}: {dt * 1e3:.3f} ms/chain "
              f"→ {nbytes / dt / 1e9:.0f} GB/s effective", file=sys.stderr)
        print(f"[fold] {label}\t{dt * 1e3:.4f}")


if __name__ == "__main__":
    main()
