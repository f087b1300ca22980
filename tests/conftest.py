"""Test harness: force an 8-device CPU mesh so sharding logic is testable
without TPUs (mirrors the strategy SURVEY.md §4 prescribes).

Must run before jax is imported anywhere.
"""

import os

# overwrite, not setdefault: the harness presets JAX_PLATFORMS=axon (TPU)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The image's sitecustomize (PYTHONPATH=/root/.axon_site) pre-imports jax
# with the axon TPU platform, so env vars alone are too late; the backend
# is still uninitialized at conftest time, so the config switch works.
jax.config.update("jax_platforms", "cpu")

# Parity tests compare fp32 math against torch oracles; JAX's default
# matmul precision is bf16-class on TPU *and* on this CPU build, which
# would drown real bugs in rounding noise. Production perf paths opt into
# bf16 explicitly via the dtype Policy instead.
jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compile cache for the CPU suite: most of the wall time is
# XLA compilation of the same tiny-config programs run after run.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache_cpu",
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
