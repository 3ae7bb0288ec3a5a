"""Garment-fleet parallelism: train G independent garments in one jit.

The reference trains 20 garments as 20 separate processes × 16 h each
(reference experiments/SingleG_AllMaterials_baseline_ours_launcher.py).  Here
per-garment parameters are STACKED on a leading axis, the fused train step is
``vmap``-ed over that axis, and the stack is sharded over the mesh's
``garment`` axis — XLA then executes every garment's step concurrently with
zero inter-garment communication (each chip runs its own garments' matmuls).

Works with any model exposing the ``_train_step(gS, dS, d2S, batch, rng, lr,
lr2, epoch)`` contract (sinskit does).
"""

from __future__ import annotations

import functools

from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.base import NetState
from .mesh import garment_sharding, replicated


def stack_states(states: List[NetState]) -> NetState:
    """Stack per-garment NetStates leaf-wise on a new axis 0."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *states)


def unstack_state(stacked: NetState, index: int) -> NetState:
    return jax.tree_util.tree_map(lambda x: x[index], stacked)


def stack_batches(batches: List[Dict[str, np.ndarray]]) -> Dict[str, jnp.ndarray]:
    keys = set(batches[0])
    for b in batches[1:]:
        keys &= set(b)
    return {k: jnp.stack([jnp.asarray(b[k]) for b in batches], axis=0) for k in keys}


class FleetTrainer:
    """vmap + shard a model's fused step over the garment axis."""

    def __init__(self, model, mesh: Mesh, num_garments: int,
                 batch_prologue: Optional[Callable] = None):
        """``batch_prologue``: optional traced fn applied to the garment-
        stacked batch INSIDE the jitted step, before the vmap — the hook for
        explicit ``with_sharding_constraint`` resharding (e.g. gather a
        spatially-sharded canvas into the per-garment layout the step's convs
        want, so SPMD never falls back to involuntary rematerialization)."""
        self.model = model
        self.mesh = mesh
        self.num_garments = num_garments
        gshard = garment_sharding(mesh)
        rep = replicated(mesh)

        def make_vstep(use_d3):
            step = functools.partial(model._train_step, use_d3=use_d3)

            def vstep(gS, dS, d2S, batch, rngs, lr, lr2, epoch, frozen):
                if batch_prologue is not None:
                    batch = batch_prologue(batch)
                # frozen perceptual weights broadcast across garments
                # (in_axes None) — one copy per chip, not per garment
                return jax.vmap(
                    step, in_axes=(0, 0, 0, 0, 0, None, None, None, None))(
                    gS, dS, d2S, batch, rngs, lr, lr2, epoch, frozen)
            return vstep

        self._make_vstep = make_vstep
        self._jit = {}
        self._gshard = gshard
        self._rep = rep

    def place(self, tree):
        """Device-put a garment-stacked pytree with axis-0 garment sharding."""
        return jax.device_put(tree, self._gshard)

    def step(self, gS, dS, d2S, batch, rngs, lr, lr2, epoch):
        # D3 activates after the warmup epoch exactly like the single-model
        # path (two cached jits, one per phase — the reference's per-process
        # runs pay the same schedule)
        use_d3 = bool(getattr(self.model, "use_d3", False)) and \
            epoch >= getattr(self.model.opt, "vision_aided_warmup_epoch", 10 ** 9)
        if use_d3 not in self._jit:
            self._jit[use_d3] = jax.jit(self._make_vstep(use_d3))
        frozen_cache = getattr(self, "_frozen_rep", None)
        if frozen_cache is None:
            frozen_cache = self._frozen_rep = {}
        if use_d3 not in frozen_cache:
            # phase-scoped (the CLIP tower only ships when D3 is active) and
            # replicated ONCE across the mesh — a single-device placement
            # would make every step's first use an implicit broadcast
            fz = {"lpips": self.model.lpips_params}
            if use_d3:
                fz["clip"] = self.model.clip_params
                fz["d3"] = self.model.d3_heads
            frozen_cache[use_d3] = jax.device_put(fz, self._rep)
        frozen = frozen_cache[use_d3]
        with self.mesh:
            return self._jit[use_d3](gS, dS, d2S, batch, rngs,
                                     jnp.float32(lr), jnp.float32(lr2),
                                     jnp.int32(epoch), frozen)

    def init_states(self, example_batch_one: Dict[str, np.ndarray],
                    seeds: Optional[List[int]] = None):
        """Initialize num_garments independent state stacks (different seeds)."""
        seeds = seeds or list(range(self.num_garments))
        stacks = {"G": [], "D": [], "D2": []}
        for s in seeds:
            self.model.rng = jax.random.key(s)
            self.model.states = {}
            self.model.setup(example_batch_one)
            for k in stacks:
                stacks[k].append(self.model.states[k])
        out = {k: stack_states(v) for k, v in stacks.items()}
        return ({k: self.place(v) for k, v in out.items()}
                if self.mesh.devices.size > 1 else out)
