"""Platform selection.

Some environments force-select a remote-TPU PJRT plugin via
``jax.config.update('jax_platforms', ...)`` at interpreter start, which wins
over the ``JAX_PLATFORMS`` env var.  ``apply_platform(opt)`` re-applies the
user's ``--platform`` choice before any backend initializes."""

from __future__ import annotations

import os

import jax


def apply_platform(opt) -> None:
    platform = getattr(opt, "platform", "") or ""
    if platform:
        jax.config.update("jax_platforms", platform)
    # persistent compilation cache: the fused train step takes minutes to
    # compile on remote-compile TPU toolchains; identical graphs reuse it
    cache_dir = os.environ.get("VTS_JAX_CACHE", "/tmp/vts_jax_cache")
    if cache_dir:
        # scope by platform: CPU AOT artifacts are machine-feature-pinned and
        # must not be shared with entries written by the remote TPU toolchain
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(cache_dir, platform or "default"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
