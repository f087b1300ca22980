"""Interaction-aware MoE-LoRA — the paper's "explicit cooperation" adapter.

Re-designs ``peft_hyper/tuners/lora.py:260-369``: every decoder projection
W gets a shared down-projection A (in -> r), ``num_experts`` expert
up-projections B_i (r -> out) and a token-wise softmax router (in -> E):

    y = x W + (alpha/r) * sum_i softmax(route(x))_i * (x A) B_i

TPU-first: experts are stored stacked (E, r, out) so the expert mix is one
einsum; the router softmax runs in fp32 (parity with lora.py:347). Router
weights are an optional output — the reference needed a forked LLaMA to log
them (``models/modeling_llama.py:1140-1252``); here telemetry is a flag.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from crab_tpu.core.config import MoELoRAConfig
from crab_tpu.core.layers import kaiming_uniform


def init_moe_lora(key, in_dim: int, out_dim: int, cfg: MoELoRAConfig, dtype=jnp.float32):
    k_route, k_a = jax.random.split(key)
    return {
        # torch init: kaiming_uniform for route and A, zeros for B
        # (lora.py:299-307) -> adapters start as identity.
        "route": kaiming_uniform(k_route, (in_dim, cfg.num_experts), dtype),
        "A": kaiming_uniform(k_a, (in_dim, cfg.rank), dtype),
        "B": jnp.zeros((cfg.num_experts, cfg.rank, out_dim), dtype),
    }


def moe_lora_delta(
    p,
    x,
    cfg: MoELoRAConfig,
    return_route: bool = False,
    dropout_rng=None,
):
    """LoRA delta for input x (..., in_dim); add to the base projection.

    Contraction order matters: weighting the tiny (..., E, r) tensor by
    the router FIRST and contracting (e, r) jointly avoids materializing
    a (..., E, out_dim) intermediate — at 7B prefill that intermediate is
    ~750 MB per projection per layer of pure HBM traffic.

    ``dropout_rng`` enables train-mode LoRA dropout (inverted, rate
    cfg.dropout) on the A-path input ONLY — the router sees raw x, exactly
    like the reference's ``lora_B(lora_A(lora_dropout(x)))`` with the
    route outside the dropout (peft_hyper/tuners/lora.py:349-350).
    """
    if "RA" in p:
        # fused serving layout (lm/pack.py): route and A share one matmul
        # over x, experts are a flattened (E*r, out) matrix. Inference
        # only — LoRA dropout needs the separate-A canonical layout.
        if dropout_rng is not None:
            # not an assert: under `python -O` an assert vanishes and a
            # packed tree in a train step would silently skip LoRA dropout
            raise ValueError("fused RA layout is inference-only")
        E = cfg.num_experts
        lead = x.shape[:-1]
        ra = x @ p["RA"].astype(x.dtype)  # (..., E + r), one matmul
        route = jax.nn.softmax(
            ra[..., :E].astype(jnp.float32), axis=-1
        ).astype(x.dtype)
        a = ra[..., E:]
        weighted = (route[..., :, None] * a[..., None, :]).reshape(
            *lead, E * cfg.rank
        )
        delta = (weighted @ p["Bd"].astype(x.dtype)) * cfg.scaling
        if return_route:
            return delta, route
        return delta
    route = jax.nn.softmax(
        (x @ p["route"].astype(x.dtype)).astype(jnp.float32), axis=-1
    ).astype(x.dtype)  # (..., E)
    xa = x
    if dropout_rng is not None and cfg.dropout > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - cfg.dropout, x.shape)
        xa = jnp.where(keep, x / (1.0 - cfg.dropout), 0.0).astype(x.dtype)
    a = xa @ p["A"].astype(x.dtype)  # (..., r)
    weighted = route[..., :, None] * a[..., None, :]  # (..., E, r) — tiny
    delta = jnp.einsum("...er,erd->...d", weighted, p["B"].astype(x.dtype))
    delta = delta * cfg.scaling
    if return_route:
        return delta, route
    return delta


def convert_moe_lora(sd, base: str, num_experts: int):
    """torch peft_hyper names -> param tree.

    base is e.g. 'model.layers.0.self_attn.q_proj' with children
    ``lora_route``, ``lora_A``, ``lora_B{i}`` (lora.py:287-290).
    """
    import numpy as np

    def t(name):
        v = sd[name]
        if hasattr(v, "detach"):
            v = v.detach().cpu().float().numpy()
        return np.asarray(v, np.float32)

    B = np.stack([t(f"{base}.lora_B{i}.weight").T for i in range(num_experts)])
    return {
        "route": jnp.asarray(t(f"{base}.lora_route.weight").T),
        "A": jnp.asarray(t(f"{base}.lora_A.weight").T),
        "B": jnp.asarray(B),
    }
