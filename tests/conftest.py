"""Test env: force the CPU backend with 8 virtual devices so mesh/sharding
code paths run without TPU hardware (SURVEY.md §4 'fake mesh' strategy).

Note: the TPU harness here registers its backend via sitecustomize and sets
jax_platforms at import time, so we must override through jax.config (env
vars alone are ignored)."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
