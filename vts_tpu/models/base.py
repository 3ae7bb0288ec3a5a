"""Model-layer foundations: per-network train state, optimizers, checkpoints.

Replaces the reference's BaseModel lifecycle (reference models/base_model.py:8-338)
with explicit pytrees:

  * :class:`NetState` — one network's (params, batch_stats, adam state);
  * manual lr injection — Adam moments are kept in the state and the learning
    rate is a traced scalar multiplied into the update, so the per-epoch
    linear decay (reference networks.py:148-174) is a host-side float,
    no re-jit;
  * checkpoints are one ``.msgpack`` per network per tag
    (``<tag>_net_<Name>.msgpack``), mirroring the reference's
    ``<epoch>_net_<name>.pth`` naming, best/latest tagging and
    skip-missing-on-load semantics (base_model.py:205-304) — unlike the
    reference, optimizer state IS checkpointed (``<tag>_opt_<Name>.msgpack``)
    so resume restores Adam moments.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.serialization import from_bytes, msgpack_restore, msgpack_serialize, to_bytes


class NetState(struct.PyTreeNode):
    params: Any
    stats: Any           # batch_stats collection ({} when the net has none)
    opt_state: Any = None

    def variables(self) -> Dict[str, Any]:
        v = {"params": self.params}
        if self.stats:
            v["batch_stats"] = self.stats
        return v


def make_adam(beta1: float, beta2: float) -> optax.GradientTransformation:
    """Adam moments without a baked-in lr (lr is applied by the caller)."""
    return optax.scale_by_adam(b1=beta1, b2=beta2, eps=1e-8)


def adam_step(tx: optax.GradientTransformation, state: NetState, grads: Any,
              lr: jnp.ndarray, new_stats: Optional[Any] = None) -> NetState:
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
    new_params = optax.apply_updates(state.params, updates)
    return state.replace(params=new_params, opt_state=new_opt,
                         stats=new_stats if new_stats is not None else state.stats)


def init_net_state(module, rng, tx: Optional[optax.GradientTransformation],
                   *example_args, **example_kwargs) -> NetState:
    variables = module.init(rng, *example_args, **example_kwargs)
    params = variables.get("params", {})
    stats = variables.get("batch_stats", {})
    opt_state = tx.init(params) if tx is not None else None
    return NetState(params=params, stats=stats, opt_state=opt_state)


# ---------------------------------------------------------------------------
# LR schedules (reference networks.py:148-174)
# ---------------------------------------------------------------------------

def lr_factor(policy: str, epoch: int, opt) -> float:
    """Per-epoch multiplier on the base lr."""
    if policy == "linear":
        return 1.0 - max(0, epoch + opt.epoch_count - opt.n_epochs) / float(opt.n_epochs_decay + 1)
    if policy == "step":
        return 0.1 ** (epoch // opt.lr_decay_iters)
    if policy == "cosine":
        import math
        return 0.5 * (1 + math.cos(math.pi * min(epoch, opt.n_epochs) / opt.n_epochs))
    if policy == "plateau":
        return 1.0  # multiplied in by the driver's PlateauTracker
    raise NotImplementedError(f"learning rate policy {policy!r} is not implemented")


class PlateauTracker:
    """ReduceLROnPlateau semantics (mode=min, factor=0.2, rel threshold 0.01,
    patience 5 — the reference's torch scheduler config, networks.py:168-169)."""

    def __init__(self, factor: float = 0.2, patience: int = 5,
                 threshold: float = 0.01):
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.best = float("inf")
        self.bad_epochs = 0
        self.scale = 1.0

    def update(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale *= self.factor
                self.bad_epochs = 0
        return self.scale


# ---------------------------------------------------------------------------
# checkpoint io
# ---------------------------------------------------------------------------

def save_net(ckpt_dir: str, tag: str, name: str, state: NetState) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {"params": jax.device_get(state.params),
               "stats": jax.device_get(state.stats)}
    with open(os.path.join(ckpt_dir, f"{tag}_net_{name}.msgpack"), "wb") as f:
        f.write(msgpack_serialize(payload))
    if state.opt_state is not None:
        with open(os.path.join(ckpt_dir, f"{tag}_opt_{name}.msgpack"), "wb") as f:
            f.write(to_bytes(jax.device_get(state.opt_state)))


def load_net(ckpt_dir: str, tag: str, name: str, state: NetState,
             load_opt: bool = True) -> NetState:
    """Missing files are skipped with a warning — partial pipelines resume
    (reference base_model.py:264-267)."""
    path = os.path.join(ckpt_dir, f"{tag}_net_{name}.msgpack")
    if not os.path.exists(path):
        print(f"[load_networks] {path} not found — keeping initialized weights")
        return state
    with open(path, "rb") as f:
        payload = msgpack_restore(f.read())
    params = flax.serialization.from_state_dict(state.params, payload["params"])
    stats = flax.serialization.from_state_dict(state.stats, payload.get("stats", {}))
    out = state.replace(params=params, stats=stats)
    opt_path = os.path.join(ckpt_dir, f"{tag}_opt_{name}.msgpack")
    if load_opt and state.opt_state is not None and os.path.exists(opt_path):
        with open(opt_path, "rb") as f:
            out = out.replace(opt_state=from_bytes(state.opt_state, f.read()))
    return out


def count_params(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
