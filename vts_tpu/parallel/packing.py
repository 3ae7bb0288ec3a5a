"""Garment packing: G independent models' weights fused into grouped convs.

Motivation (RESULTS.md round 1): the flagship nets are tiny-channel
(ngf=10, ndf=8 → ≤8 of 128 MXU lanes), so a single garment's step is
overhead/utilization-bound, not FLOP-bound.  Stacking G garments' kernels
into ONE conv with ``feature_group_count=G`` executes all G garments' layers
as one lane-filling op — the op count per step stays constant while the
useful work scales by G.  This is the single-chip multi-garment layout; the
``garment`` mesh axis (fleet.py) scales it across chips.

The packed parameter tree has EXACTLY the same structure as a single
garment's tree (module names match — blocks.py gives the grouped ConvT the
same child name), so packing is a leaf-wise reshape of the fleet's stacked
states:

  conv kernel  (G, kh, kw, cin, cout) → (kh, kw, cin, G·cout)
  bias / norm scale   (G, C)          → (G·C,)
  batch-norm running stats (G, C)     → (G·C,)

Packing is exact for every layer type in the flagship nets: grouped convs
partition channels by construction; instance/batch norm normalize per
channel; LeakyReLU/tanh are elementwise.  ``tests/test_packing.py`` pins
packed forward ≡ per-garment forwards.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def pack_leaf(leaf: jnp.ndarray) -> jnp.ndarray:
    """One per-garment-stacked leaf (leading G axis) → packed layout."""
    if leaf.ndim == 5:      # conv / conv-transpose kernel
        g, kh, kw, cin, cout = leaf.shape
        return jnp.moveaxis(leaf, 0, 3).reshape(kh, kw, cin, g * cout)
    if leaf.ndim == 2:      # bias, norm scale/bias, running stats
        return leaf.reshape(-1)
    raise ValueError(f"cannot pack leaf of shape {leaf.shape}")


def unpack_leaf(leaf: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Packed leaf → per-garment stack with a leading G axis."""
    if leaf.ndim == 4:
        kh, kw, cin, gout = leaf.shape
        return jnp.moveaxis(
            leaf.reshape(kh, kw, cin, groups, gout // groups), 3, 0)
    if leaf.ndim == 1:
        return leaf.reshape(groups, -1)
    raise ValueError(f"cannot unpack leaf of shape {leaf.shape}")


def pack_tree(stacked_tree: Any) -> Any:
    """Per-garment-stacked pytree (every leaf has a leading G axis, e.g. from
    ``fleet.stack_states``) → packed pytree for a ``pack=G`` network."""
    return jax.tree_util.tree_map(pack_leaf, stacked_tree)


def unpack_tree(packed_tree: Any, groups: int) -> Any:
    return jax.tree_util.tree_map(
        lambda leaf: unpack_leaf(leaf, groups), packed_tree)


def pack_images(per_garment: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """G tensors (N, H, W, C) → (N, H, W, G·C), garment-contiguous channels."""
    return jnp.concatenate(list(per_garment), axis=-1)


def unpack_images(packed: jnp.ndarray, groups: int) -> jnp.ndarray:
    """(N, H, W, G·C) → (G, N, H, W, C)."""
    n, h, w, gc = packed.shape
    return jnp.moveaxis(packed.reshape(n, h, w, groups, gc // groups), 3, 0)
