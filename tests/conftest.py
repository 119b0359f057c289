"""Test config: force an 8-fake-device CPU platform BEFORE jax is imported.

This exercises the multi-chip shard_map paths deterministically on one process
(SURVEY.md section 4, item 4). Bench runs (bench.py) use the real TPU instead.
"""

import os

# The host image preloads jax with JAX_PLATFORMS=axon (real TPU over a tunnel)
# via sitecustomize; backend init is lazy, so forcing CPU here still works as
# long as no test touched a device first. Tests MUST run on the 8-fake-device
# CPU platform: dozens of tiny kernel compiles over the TPU tunnel take
# 20-40s each and the suite would appear to hang.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# DISABLE the persistent compile cache for tests: cache writes (executable
# serialize + zstd compress) have segfaulted flaky late in long CPU suite
# runs (round 3: crash inside put_executable_and_time at ~97%), and a run
# killed mid-write once corrupted an entry that a later process SEGFAULTED
# deserializing. CPU compiles are cheap and jit caches in-process; the
# persistent cache's value is the minutes-long remote TPU compiles, whose
# entries (~/.cache/zotpu_jax) stay untouched by the suite.
os.environ.setdefault("ZOTPU_JAX_CACHE", "off")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def random_seq(rng, n, alphabet="ACGT"):
    return "".join(rng.choice(list(alphabet), size=n))


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables after each test module.

    jaxlib 0.9.0's CPU backend_compile_and_load crashes (SIGSEGV/SIGABRT)
    on a LATE compile once a single long-lived process has accumulated
    hundreds of loaded executables (reproduced 3x at tests/test_setops_merge
    ~96% through the full suite; any prefix subset passes). Dropping the
    jit caches per module keeps the live-executable count bounded; CPU
    recompiles are cheap.
    """
    yield
    import jax
    jax.clear_caches()
