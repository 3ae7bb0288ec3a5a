"""Platform selection.

Some environments force-select a remote-TPU PJRT plugin via
``jax.config.update('jax_platforms', ...)`` at interpreter start, which wins
over the ``JAX_PLATFORMS`` env var.  ``apply_platform(opt)`` re-applies the
user's ``--platform`` choice before any backend initializes."""

from __future__ import annotations

import os

import jax


def init_multihost(opt) -> bool:
    """Multi-host bring-up: ``jax.distributed.initialize`` (SURVEY §5's comm
    backend; the NCCL/MPI-rendezvous analogue).  Must run before the backend
    initializes.  After it, ``jax.devices()`` spans every host's chips and
    the fleet/data/spatial meshes in :mod:`vts_tpu.parallel.mesh` lay out
    over the whole pod; collectives ride ICI via XLA.

    On TPU pods all coordination settings auto-detect from the metadata
    server; elsewhere pass ``--coordinator_address/--num_processes/
    --process_id``.  Returns True when initialization was performed.  No-op
    (False) unless ``--multihost`` is set, so single-process runs never pay
    a rendezvous timeout.
    """
    if not getattr(opt, "multihost", False):
        return False
    kw = {}
    if getattr(opt, "coordinator_address", ""):
        kw["coordinator_address"] = opt.coordinator_address
    if getattr(opt, "num_processes", -1) >= 0:
        kw["num_processes"] = opt.num_processes
    if getattr(opt, "process_id", -1) >= 0:
        kw["process_id"] = opt.process_id
    jax.distributed.initialize(**kw)
    return True


def apply_platform(opt) -> None:
    platform = getattr(opt, "platform", "") or ""
    if platform:
        jax.config.update("jax_platforms", platform)
    init_multihost(opt)
    # persistent compilation cache: the fused train step takes minutes to
    # compile on remote-compile TPU toolchains; identical graphs reuse it
    cache_dir = os.environ.get("VTS_JAX_CACHE", "/tmp/vts_jax_cache")
    if cache_dir:
        # scope by platform: CPU AOT artifacts are machine-feature-pinned and
        # must not be shared with entries written by the remote TPU toolchain
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(cache_dir, platform or "default"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
