"""Test session setup: force the CPU backend with 8 virtual devices.

Multi-device sharding tests run on a virtual 8-device CPU mesh
(``--xla_force_host_platform_device_count=8`` — the standard JAX fake-backend
trick, SURVEY.md §4.3).  The image's sitecustomize force-registers the remote
'axon' TPU backend via ``jax.config``, so plain ``JAX_PLATFORMS=cpu`` is NOT
enough — we override the config after import, before any backend is used.
"""

import os

# CRITICAL on this machine: even a CPU-only process registers a session with
# the remote axon TPU at interpreter start (sitecustomize), contending with
# any real TPU job and wedging its compile.  Clearing PALLAS_AXON_POOL_IPS
# has no effect here (sitecustomize already ran), so when a TPU job is
# running, launch pytest with `PALLAS_AXON_POOL_IPS= python -m pytest ...`.

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
