import os

# Virtual 8-device CPU mesh for all tests (SURVEY §4 implication): must be set
# before jax initializes its backends.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A site config pre-sets jax_platforms to "axon,cpu" (tunneled TPU), which
# overrides the env var — force CPU explicitly for the test suite.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# NO persistent compile cache: a crashed run leaves truncated entries whose
# zstd decompress SEGFAULTS every later run that reads them (observed twice,
# in compilation_cache.get_executable_and_time). Within-run reuse is already
# covered by the in-process jit cache; the persistent cache only ever helped
# across runs and is not worth the poisoning risk.


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_live_executables():
    """XLA CPU compile intermittently SEGFAULTs/aborts late in a long suite
    run once hundreds of executables are live in one process (seen in
    backend_compile and in persistent-cache reads). Dropping compiled
    executables at every module boundary keeps the count bounded; module
    fixtures are already scoped to recompile after this."""
    yield
    jax.clear_caches()
