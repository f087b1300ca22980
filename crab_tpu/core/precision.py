"""Dtype policy: bf16 compute on the MXU, fp32 where numerics demand it.

The reference trains/infers in fp32 (``finetune_hyperlora.sh:37-39``); the
TPU build defaults to bf16 params+compute with fp32 norms, router softmax
and logits, and supports an fp32 parity mode for bit-comparison tests.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

_DTYPES = {
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "float16": jnp.float16,
}


@dataclass(frozen=True)
class Policy:
    param_dtype: str = "bfloat16"
    compute_dtype: str = "bfloat16"

    @property
    def param(self):
        return _DTYPES[self.param_dtype]

    @property
    def compute(self):
        return _DTYPES[self.compute_dtype]

    def cast_compute(self, x):
        return jnp.asarray(x, self.compute)

    @classmethod
    def from_config(cls, cfg) -> "Policy":
        return cls(param_dtype=cfg.param_dtype, compute_dtype=cfg.compute_dtype)


PARITY = Policy("float32", "float32")
FAST = Policy("bfloat16", "bfloat16")
