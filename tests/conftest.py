"""Test harness: force an 8-device CPU mesh so sharding logic is testable
without TPUs (mirrors the strategy SURVEY.md §4 prescribes).

Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Parity tests compare fp32 math against torch oracles; JAX's default
# matmul precision is bf16-class on TPU *and* on this CPU build, which
# would drown real bugs in rounding noise. Production perf paths opt into
# bf16 explicitly via the dtype Policy instead.
jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
