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
# Isolate the persistent compile cache from the production one
# (~/.cache/zotpu_jax): CLI-driving tests call runtime.setup(), and a test
# run killed mid-cache-write once corrupted an entry that a later process
# SEGFAULTED deserializing. Tests get their own nukable directory; the
# TPU entries (minutes per compile through the tunnel) stay untouched.
os.environ.setdefault("ZOTPU_JAX_CACHE",
                      os.path.expanduser("~/.cache/zotpu_jax_cpu_tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def random_seq(rng, n, alphabet="ACGT"):
    return "".join(rng.choice(list(alphabet), size=n))
