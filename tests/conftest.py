"""Test session setup: force the CPU backend with 8 virtual devices.

Multi-device sharding tests run on a virtual 8-device CPU mesh
(``--xla_force_host_platform_device_count=8`` — the standard JAX fake-backend
trick, SURVEY.md §4.3).  The image's sitecustomize force-registers the remote
'axon' TPU backend via ``jax.config``, so plain ``JAX_PLATFORMS=cpu`` is NOT
enough — we override the config after import, before any backend is used.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
