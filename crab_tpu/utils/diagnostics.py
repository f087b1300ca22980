"""Observability: profiler traces, stage timers, NaN guards, router
telemetry.

The reference has no tracing/profiling at all and needed a forked
modeling_llama.py for MoE-router observability (SURVEY.md §5). Here they
are first-class:

  - ``trace(dir)``: context manager around jax.profiler (XPlane traces
    viewable in TensorBoard/xprof);
  - ``StageTimer``: wall-clock per pipeline stage with block_until_ready;
  - ``nan_guard``: debug-mode pytree NaN/Inf scan (jax.debug_nans covers
    jit bodies; this covers host boundaries);
  - ``dump_route_telemetry``: save per-layer mean expert weights like the
    reference's .npy route dumps (``inference_hyper_lora.py:164-205``).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict

import numpy as np


def param_path_name(path) -> str:
    """'a/b/c' rendering of a tree_util key path (single definition —
    trainable masks, CLI dumps and NaN guards all use the same form)."""
    return "/".join(str(getattr(p, "key", p)) for p in path)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates per-stage wall-clock (device-synchronized)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        import jax

        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {
            k: self.totals[k] / max(self.counts[k], 1) for k in sorted(self.totals)
        }

    def report(self) -> str:
        return " | ".join(f"{k}: {v*1e3:.1f}ms" for k, v in self.summary().items())


def nan_guard(tree, name: str = "tree", raise_on_nan: bool = True):
    """Scan a pytree for non-finite leaves (host-side debug check)."""
    import jax

    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad.append(param_path_name(path))
    if bad and raise_on_nan:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:8]}")
    return bad


def enable_debug_nans(on: bool = True):
    """Flip jax's compiled-code NaN detector (SURVEY §5 'race detection'
    analogue — numeric guards behind a flag)."""
    import jax

    jax.config.update("jax_debug_nans", on)


def dump_route_telemetry(telemetry: Dict, out_dir: str, step: int):
    """Save MoE-LoRA router statistics (per-layer mean expert weights)."""
    os.makedirs(out_dir, exist_ok=True)
    rec = {}
    for k, v in telemetry.items():
        arr = np.asarray(v)
        np.save(os.path.join(out_dir, f"{k}_{step}.npy"), arr)
        rec[k] = arr.mean(axis=0).tolist()
    with open(os.path.join(out_dir, f"route_summary_{step}.json"), "w") as f:
        json.dump(rec, f, indent=1)
    return rec


def dump_token_routes(routes: Dict, out_dir: str, step: int, sample: int = 0):
    """Reference-format per-token route dumps: one directory per step
    containing ``{q,k,v,o}_token_weight.npy`` of shape
    (seq_len, num_layers, 1, num_experts) — byte-layout parity with
    ``inference_hyper_lora.py:190-199`` (which concatenates per-token
    (1, 32, 1, 3) tensors). Input: engine.route_telemetry(per_token=True)
    output, i.e. {'q'|'k'|'v'|'o': (L, B, T, E)}."""
    d = os.path.join(out_dir, str(step))
    os.makedirs(d, exist_ok=True)
    for k in ("q", "k", "v", "o"):
        arr = np.asarray(routes[k])  # (L, B, T, E)
        arr = arr[:, sample].transpose(1, 0, 2)[:, :, None, :]  # (T, L, 1, E)
        np.save(os.path.join(d, f"{k}_token_weight.npy"), arr)
    return d
