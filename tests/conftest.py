"""Test configuration: run on a virtual 8-device CPU mesh with float64.

The standard JAX idiom for testing multi-device sharding without hardware
(SURVEY.md §4).  Note: in this image jax may already be imported at
interpreter startup (site customization), so env vars are too late — we use
jax.config.update instead, plus XLA_FLAGS which is read at backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
