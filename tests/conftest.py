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


# ---------------------------------------------------------------- markers
# Two-tier suite: `pytest -m "not slow"` is the sub-minute smoke tier for
# iteration; the full suite (default) is what CI/the driver runs.
_SLOW_MODULES = {
    "test_train_e2e",        # jitted train loops + shard-vs-single parity
    "test_fused_train_path", # whole-layer custom_vjp kernels (interpret mode)
    "test_fused_denoiser",
    "test_pallas_layer_bwd",
    "test_pallas_attention",
    "test_pallas_conv",
    "test_conv_train",       # custom-vjp conv/pool kernels (interpret mode)
    "test_pallas_stgcn",
    "test_pallas_pool",
    "test_cli",              # full CLI train/eval/visualize round trips
    "test_stage1_eval",
    "test_stage1",
    "test_seq_parallel",
    "test_torch_import",     # full-size M2SNet forward on CPU
}


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: heavy integration/kernel tests")


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__ if item.module else ""
        if mod in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
