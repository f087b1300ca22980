"""Packed serving layout for the decoder: fuse QKV and gate/up.

A decode step at 7B is bandwidth/op-count bound, not FLOP bound: the
canonical layout issues 7 projection matmuls plus 7x3 small MoE-LoRA
matmuls per layer (measured 22 ms/step at batch 8 vs a ~10 ms HBM floor,
see tools/README.md). q/k/v share the same input, as do gate/up, so the
serving path concatenates their weights once at load time:

  - base:  w_qkv (D, qd+2*kvd), w_gu (D, 2*I) — 7 big matmuls -> 4
  - LoRA:  route_cat (D, n*E), A_cat (D, n*r)  — 3n small matmuls -> 2+n
           tiny (E,r,out) expert contractions

The math is identical (every output channel's reduction is unchanged —
column concatenation only groups independent dot products), verified
token-exact by tests/test_pack.py. Training and checkpoints stay on the
canonical layout; ``pack_decoder`` is a pure load-time transform the
InferenceEngine applies by default.

Reference surface covered: this replaces nothing in the reference (HF
torch issues separate q/k/v Linears — ``peft_hyper/tuners/lora.py:338``);
it is TPU-serving engineering on top of the same semantics.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from crab_tpu.core.config import DecoderConfig

_ATTN = ("q", "k", "v")
_MLP = ("gate", "up")


def _delete_buffers(tree) -> None:
    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array):
            try:
                leaf.delete()
            except Exception:
                pass  # committed to multiple shardings / already deleted


def blockdiag_experts(stacked: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Member expert tensors [(L, E, r, out_i)] -> ONE block-diagonal
    (L, n*E*r, sum out_i) matrix: rows = (member, expert, rank) flattened,
    cols = concatenated member outputs, zeros off-block. The packed LoRA
    delta becomes a single matmul whose output lands directly in packed
    column order — no per-member einsum, no (.., n, out) -> (.., n*out)
    reshape copy. vs the stacked einsum: inserted zeros contribute
    nothing, so under the MXU's sequential fp32 accumulation the sums
    are identical (CPU BLAS may tree-reduce the longer K differently —
    rounding-level only; tests/test_pack.py pins token identity end to
    end). Handles GQA (different out_i)."""
    n = len(stacked)
    L, E, r = stacked[0].shape[:3]
    outs = [b.shape[-1] for b in stacked]
    blocks = []
    for i, b in enumerate(stacked):
        row = [
            jnp.zeros((L, E * r, outs[j]), b.dtype) if j != i
            else b.reshape(L, E * r, outs[i])
            for j in range(n)
        ]
        blocks.append(jnp.concatenate(row, axis=-1))
    return jnp.concatenate(blocks, axis=1)


def _pack_group(members: Sequence[Dict], donate: bool = False) -> Dict:
    """Concatenate a group of projection params along the output axis.

    Members are stacked per-layer dicts: w (L, in, out) or w_q/w_s
    (int8 + (L, 1, out) scales), optional b (L, out), optional lora
    {route (L, in, E), A (L, in, r), B (L, E, r, out)}.
    """
    out: Dict = {}
    if "w_q" in members[0]:
        out["w_q"] = jnp.concatenate([m["w_q"] for m in members], axis=-1)
        out["w_s"] = jnp.concatenate([m["w_s"] for m in members], axis=-1)
    else:
        out["w"] = jnp.concatenate([m["w"] for m in members], axis=-1)
    if "b" in members[0]:
        out["b"] = jnp.concatenate([m["b"] for m in members], axis=-1)
    if "lora" in members[0]:
        loras = [m["lora"] for m in members]
        # route and A share the input x too — one (L, D, n*E + n*r)
        # matmul instead of two (layout: all members' routers, then all
        # members' A blocks). Math unchanged: column concatenation only
        # groups independent dot products.
        packed = {
            "RA": jnp.concatenate(
                [l["route"] for l in loras] + [l["A"] for l in loras],
                axis=-1,
            ),
        }
        packed["Bd"] = blockdiag_experts([l["B"] for l in loras])
        out["lora"] = packed
    if donate:
        # free the source buffers group-by-group so packing a 7B on a
        # 16 GB chip peaks at (full set + one group), not 2x. A scalar
        # fetch (not block_until_ready) forces materialization — some
        # remote backends (axon relay) execute lazily on data demand.
        import numpy as _np

        for leaf in jax.tree_util.tree_leaves(out):
            if isinstance(leaf, jax.Array):
                _np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))
        _delete_buffers(list(members))
    return out


def pack_decoder(
    decoder_params: Dict, cfg: DecoderConfig, donate: bool = False
) -> Dict:
    """Canonical decoder tree -> packed serving tree (load-time).

    Idempotent: returns the input unchanged if already packed.
    ``donate``: delete the q/k/v/gate/up source device buffers as each
    packed group materializes — the caller's param tree becomes unusable,
    but peak HBM stays near the single-copy footprint (required to pack a
    7B in int8 on one 16 GB chip).
    """
    layers = decoder_params["layers"]
    if "qkv" in layers:
        return decoder_params
    new_layers = {
        k: v for k, v in layers.items() if k not in _ATTN + _MLP
    }
    new_layers["qkv"] = _pack_group([layers[n] for n in _ATTN], donate)
    new_layers["gu"] = _pack_group([layers[n] for n in _MLP], donate)
    # o/down keep their canonical weights but get the same LoRA fusion:
    # route+A in one matmul, experts as one flattened matrix (the
    # separate skinny route/A convs were 2 extra passes over x per
    # projection per layer; lm/lora.moe_lora_delta handles both layouts)
    for name in ("o", "down"):
        lp = new_layers.get(name, {}).get("lora")
        if lp is not None and "route" in lp:
            L, E, r = lp["B"].shape[0], lp["B"].shape[1], lp["B"].shape[2]
            fused = {
                "RA": jnp.concatenate([lp["route"], lp["A"]], axis=-1),
                "Bd": lp["B"].reshape(L, E * r, -1),
            }
            new_layers[name] = dict(new_layers[name])
            new_layers[name]["lora"] = fused
            if donate:
                # force materialization before deleting the sources —
                # lazy backends (axon relay) execute on data demand, so
                # deleting inputs of an unexecuted concat/reshape would
                # poison the fused arrays (same discipline as _pack_group)
                import numpy as _np

                for leaf in fused.values():
                    _np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))
                _delete_buffers(lp)
    out = dict(decoder_params)
    out["layers"] = new_layers
    return out


def packed_proj(p: Dict, x: jnp.ndarray, lora_cfg, n: int, a8: bool = False):
    """Apply a packed projection. Returns (y (..., sum_out), routes or None).

    routes: (..., n, E) fp32-softmaxed router weights per member, for
    telemetry slicing (same values the canonical path produces).
    """
    from crab_tpu.lm.llama import _base_proj

    y = _base_proj(p, x, a8)
    if "b" in p:
        y = y + p["b"]
    routes = None
    if lora_cfg is not None and "lora" in p:
        lp = p["lora"]
        E, r = lora_cfg.num_experts, lora_cfg.rank
        lead = x.shape[:-1]
        ra = x @ lp["RA"].astype(x.dtype)  # (..., n*E + n*r), one matmul
        routes = jax.nn.softmax(
            ra[..., : n * E].reshape(*lead, n, E).astype(jnp.float32),
            axis=-1,
        ).astype(x.dtype)
        a = ra[..., n * E :].reshape(*lead, n, r)
        weighted = routes[..., None] * a[..., None, :]  # (..., n, E, r) tiny
        # one matmul against the block-diagonal expert matrix: output is
        # already in packed column order (see _pack_group)
        delta = weighted.reshape(*lead, n * E * r) @ lp["Bd"].astype(x.dtype)
        y = y + delta * lora_cfg.scaling
    return y, routes
