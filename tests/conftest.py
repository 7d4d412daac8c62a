"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the JAX fake-backend pattern the reference lacks (SURVEY.md §4): the
reference only ever exercises its distributed path on a real slurm cluster.
Here every test — including multi-chip sharding tests — runs on CPU with
8 virtual devices, so the full pjit/shard_map path is validated in CI.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env may point at a (slow, tunneled) TPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The image's sitecustomize pre-imports jax with JAX_PLATFORMS=axon baked in,
# so the env vars above may be read too late — force via config as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# Persistent compilation cache: model compiles dominate CPU test time.
jax.config.update("jax_compilation_cache_dir", "/tmp/conductor_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(autouse=True)
def _np_seed():
    np.random.seed(0)
