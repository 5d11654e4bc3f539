"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (SURVEY.md §4: "Multi-host without a
cluster").  The container force-registers the TPU backend via sitecustomize,
so we must both set the env and override jax's platform config before any
device is touched.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# persistent compile cache: repeated suite runs skip recompiles (the ME
# window programs alone cost ~1 min of CPU XLA compile per shape set)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import gc  # noqa: E402

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True, scope="module")
def _jax_cache_teardown():
    """Per-module XLA program teardown.

    The whole-suite run used to segfault near the end (~230 tests in)
    inside pjit dispatch — compiled-executable/buffer accumulation across
    modules (VERDICT r3 weak #2; same resource-blowup family as the TPU
    worker crash worked around by VVC_RDO_SHAPE_GROUPS).  Dropping every
    compiled program between modules bounds live XLA state at the cost of
    re-compiles for shapes shared across modules (rare — modules compile
    their own shapes).
    """
    yield
    jax.clear_caches()
    gc.collect()
