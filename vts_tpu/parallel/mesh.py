"""Device-mesh construction and sharding helpers.

The reference's "cluster" is tmux + CUDA_VISIBLE_DEVICES pinning, one process
per garment (reference experiments/tmux_launcher.py:87-125).  Here the whole
fleet lives in ONE process as SPMD over a ``jax.sharding.Mesh``:

  * axis ``garment`` — independent per-garment model replicas (the EP-like
    axis: zero collectives, embarrassingly parallel — this is where the
    20×16 h → <1 h scaling comes from);
  * axis ``data``    — data parallelism within a garment (batch-stat psums
    ride ICI via BatchNorm's ``axis_name``);
  * axis ``spatial`` — optional H-dimension sharding of the 1536²–3072²
    activations (XLA SPMD inserts conv halo exchanges automatically) for
    memory headroom at T_resolution_multiplier 2/4.

``parse_mesh('garment:4,data:2')`` builds the mesh from a CLI spec.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("garment", "data", "spatial")


def parse_mesh_spec(spec: str) -> Dict[str, int]:
    """'garment:4,data:2' → {'garment': 4, 'data': 2}."""
    out: Dict[str, int] = {}
    if not spec:
        return out
    for part in spec.split(","):
        name, _, size = part.partition(":")
        name = name.strip()
        if name not in AXES:
            raise ValueError(f"unknown mesh axis {name!r}; valid: {AXES}")
        out[name] = int(size)
    return out


def build_mesh(spec: str = "", devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    sizes = parse_mesh_spec(spec)
    if not sizes:
        sizes = {"garment": len(devices)}
    total = int(np.prod(list(sizes.values())))
    assert total <= len(devices), f"mesh needs {total} devices, have {len(devices)}"
    names = tuple(sizes)
    shape = tuple(sizes[n] for n in names)
    arr = np.asarray(devices[:total]).reshape(shape)
    return Mesh(arr, names)


def garment_sharding(mesh: Mesh) -> NamedSharding:
    """Leaf sharding for garment-stacked pytrees: axis 0 over 'garment'."""
    return NamedSharding(mesh, P("garment"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def factor_devices(n: int) -> Tuple[int, int]:
    """Split n devices into (garment, data).  Prefers a non-trivial data axis
    (n ≥ 4 → data=2) so multi-axis shardings are exercised; odd/small n fall
    back to garment-only."""
    if n >= 4 and n % 2 == 0:
        return n // 2, 2
    return n, 1
