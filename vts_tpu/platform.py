"""Platform selection.

Some environments force-select a remote-TPU PJRT plugin via
``jax.config.update('jax_platforms', ...)`` at interpreter start, which wins
over the ``JAX_PLATFORMS`` env var.  ``apply_platform(opt)`` re-applies the
user's ``--platform`` choice before any backend initializes."""

from __future__ import annotations

import jax


def apply_platform(opt) -> None:
    platform = getattr(opt, "platform", "") or ""
    if platform:
        jax.config.update("jax_platforms", platform)
