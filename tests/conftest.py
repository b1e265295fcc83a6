"""Test configuration: force CPU with 8 virtual devices and enable x64.

Mirrors the reference's verification needs (SURVEY.md §4): numerical parity
tests run in float64 on CPU; sharding tests exercise pjit/psum code paths on a
virtual 8-device mesh without TPU hardware.

Note: this environment force-registers a TPU PJRT plugin in every Python
process (sitecustomize) and overrides JAX_PLATFORMS, so we must switch the
platform via jax.config *after* import and clear any initialized backends.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from jax.extend.backend import clear_backends

clear_backends()
