"""Test config: run everything on a virtual 8-device local CPU mesh.

This is the TPU analogue of a fake distributed backend — sharding/pjit code
paths compile and execute exactly as on an 8-chip slice (see SURVEY.md §4).

The environment boots an 'axon' remote-TPU PJRT plugin from sitecustomize and
force-selects it via jax.config *before* conftest runs, so overriding the env
var is not enough — re-update the config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", "tests must run on local CPU"
assert len(jax.devices()) == 8, "tests expect the virtual 8-device CPU mesh"
