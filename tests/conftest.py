"""Test env: force the CPU backend with 8 virtual devices so mesh/sharding
code paths run without TPU hardware (SURVEY.md §4 'fake mesh' strategy).

Note: the TPU harness here registers its backend via sitecustomize and sets
jax_platforms at import time, so we must override through jax.config (env
vars alone are ignored).

One-process stability (VERDICT r1 #4): the full suite compiles hundreds of
distinct XLA CPU programs on a 1-core host and intermittently segfaulted
inside an LLVM parallel-codegen worker thread (~1 run in 3).  Two
mitigations: serialize parallel codegen (--xla_cpu_parallel_codegen_
split_count=1) and drop accumulated executables between modules once the
process grows past a few GB (jax.clear_caches is cheap next to the
recompiles the suite does anyway).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
for flag in ("--xla_force_host_platform_device_count=8",
             "--xla_cpu_parallel_codegen_split_count=1"):
    if flag.split("=")[0] not in _flags:
        _flags = (_flags + " " + flag).strip()
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

_RSS_LIMIT_MB = int(os.environ.get("SIMPLE_TAD_TEST_RSS_MB", "6000"))


@pytest.fixture(autouse=True, scope="module")
def _bound_compiled_program_memory():
    """Clear jax's executable caches between modules once RSS grows."""
    yield
    try:
        import psutil
        rss_mb = psutil.Process().memory_info().rss / 2 ** 20
    except Exception:
        return
    if rss_mb > _RSS_LIMIT_MB:
        import gc
        jax.clear_caches()
        gc.collect()
