"""Weight-only int8/int4 quantization for the decoder.

Serving a 7B decoder on a single 16 GB v5e chip doesn't fit in bf16
(13.5 GB weights + KV cache + encoders > ~15 GiB usable). Per-output-
channel symmetric int8 halves the weight footprint (6.7 GB) and doubles
decode arithmetic intensity — the standard single-chip serving recipe.
int4 (bits=4) halves it again in principle: the XLA *compiler* packs s4
(E(4) layout) and fuses the weight straight into the convolution
(tools/micro_int4.py), but the current jax client crashes
(RecursionError) whenever a real s4 array is a jit argument — on both
backends — and the nibble-packed-uint8 + in-program bitcast workaround
materializes the unpacked copy (tools/micro_int4b.py: 45 MB temp, 11 ms
vs 0.6 ms for int8). bits=4 is therefore kept as tested math with no
user-facing flag until the client supports s4 buffers (or a Pallas
W4A16 kernel lands).

Quantized projections store ``w_q`` (int8/int4, same layout as ``w``)
and ``w_s`` (fp32 per-out-channel scale); ``llama._proj`` computes
``(x @ w_q) * w_s`` so the scale fuses into the matmul epilogue and no
dequantized copy is materialized in HBM.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

QUANT_KEYS = ("q", "k", "v", "o", "gate", "up", "down")


def _qmax(bits: int) -> int:
    assert bits in (8, 4), bits
    return 127 if bits == 8 else 7


def _qdtype(bits: int):
    return jnp.int8 if bits == 8 else jnp.int4


def quantize_weight(w: jnp.ndarray, bits: int = 8):
    """(..., in, out) -> int8/int4 weights + (..., 1, out) fp32 scales."""
    qm = _qmax(bits)
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.where(amax > 0, amax / qm, 1.0)
    q = jnp.clip(jnp.round(wf / scale), -qm, qm).astype(_qdtype(bits))
    return q, scale


def init_llama_int8(key, cfg, dtype=jnp.bfloat16, bits: int = 8) -> Dict:
    """Random-init a decoder directly in int8/int4 weights.

    Quantizing a fully materialized bf16 7B on-device needs ~2x transient
    HBM and OOMs a 16 GB chip; benchmarks and smoke tests that don't load
    real checkpoints should start quantized from the outset. Real
    checkpoints quantize on host (numpy) layer by layer instead.
    """
    from crab_tpu.core.layers import normal_init, rms_norm_init
    from crab_tpu.lm.lora import init_moe_lora

    D = cfg.hidden_size
    qd = cfg.num_heads * cfg.head_dim
    kvd = cfg.num_kv_heads * cfg.head_dim
    L = cfg.num_layers
    dims = {
        "q": (D, qd), "k": (D, kvd), "v": (D, kvd), "o": (qd, D),
        "gate": (D, cfg.intermediate_size), "up": (D, cfg.intermediate_size),
        "down": (cfg.intermediate_size, D),
    }
    ks = jax.random.split(key, 12)
    layers: Dict = {
        "attn_norm": {"scale": jnp.ones((L, D), dtype)},
        "mlp_norm": {"scale": jnp.ones((L, D), dtype)},
    }
    qm = _qmax(bits)
    for i, (name, (din, dout)) in enumerate(dims.items()):
        kk = jax.random.fold_in(key, 1000 + i)
        p = {
            "w_q": jax.random.randint(
                kk, (L, din, dout), -qm, qm + 1, dtype=jnp.int8
            ).astype(_qdtype(bits)),
            "w_s": jnp.full((L, 1, dout), 0.02 / qm, jnp.float32),
        }
        if cfg.attention_bias and name in ("q", "k", "v"):
            p["b"] = jnp.zeros((L, dout), dtype)
        if cfg.lora is not None:
            loras = [
                init_moe_lora(jax.random.fold_in(kk, 7 + l), din, dout, cfg.lora, dtype)
                for l in range(L)
            ]
            p["lora"] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *loras)
        layers[name] = p
    return {
        "embed": normal_init(ks[0], (cfg.vocab_size, D), 0.02, dtype),
        "layers": layers,
        "final_norm": rms_norm_init(D, dtype),
        # int8 output head: per-vocab-channel scale (matches
        # quantize_decoder_host(lm_head=True))
        "lm_head_q": jax.random.randint(
            ks[8], (D, cfg.vocab_size), -qm, qm + 1, dtype=jnp.int8
        ),
        "lm_head_s": jnp.full((1, cfg.vocab_size), 0.02 / qm, jnp.float32),
    }


def quantize_decoder_host(
    decoder_params: Dict, keys=QUANT_KEYS, bits: int = 8,
    lm_head: bool = True,
) -> Dict:
    """Host (numpy) per-projection quantization for real checkpoints.

    Runs one stacked weight at a time on the CPU, so the device never
    holds the bf16 and quantized copies simultaneously (quantizing a
    fully materialized 7B on-device needs ~2x transient HBM).

    ``lm_head`` also quantizes the output head (per-vocab-channel int8):
    saves 131 MB + one 262 MB bf16 read per decode step — the margin
    that lets batch 16 x 500-token fit on one chip.
    """
    import numpy as np

    qm = _qmax(bits)
    out = dict(decoder_params)
    layers = dict(out["layers"])
    for k in keys:
        p = dict(layers[k])
        w = np.asarray(jax.device_get(p.pop("w")), np.float32)
        amax = np.abs(w).max(axis=-2, keepdims=True)
        scale = np.where(amax > 0, amax / qm, 1.0).astype(np.float32)
        q = np.clip(np.round(w / scale), -qm, qm).astype(np.int8)
        p["w_q"] = jnp.asarray(q).astype(_qdtype(bits))
        p["w_s"] = jnp.asarray(scale)
        layers[k] = p
    out["layers"] = layers
    if lm_head and "lm_head" in out:
        w = np.asarray(jax.device_get(out.pop("lm_head")), np.float32)
        amax = np.abs(w).max(axis=0, keepdims=True)
        scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        out["lm_head_q"] = jnp.asarray(
            np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        )
        out["lm_head_s"] = jnp.asarray(scale)  # (1, V)
    return out


def quantize_decoder_host_w4(
    decoder_params: Dict, keys=None, group: int = 128
) -> Dict:
    """Group-int4 (W4A16) host quantization -> 'w_p'/'w_g' params consumed
    by the Pallas kernel (ops/w4a16_matmul.py). Works on the canonical or
    the packed (lm/pack.py) layout; pack FIRST so decode keeps the fused
    matmul count. Pure numpy — never holds two device copies."""
    import numpy as np

    from crab_tpu.ops.w4a16_matmul import quantize_w4

    layers = decoder_params["layers"]
    if keys is None:
        keys = (
            ("qkv", "gu", "o", "down")
            if "qkv" in layers
            else QUANT_KEYS
        )
    out = dict(decoder_params)
    new_layers = dict(layers)
    for k in keys:
        p = dict(new_layers[k])
        w = np.asarray(jax.device_get(p.pop("w")), np.float32)  # (L, D, O)
        wp_l, wg_l = zip(*(quantize_w4(w[i], group) for i in range(w.shape[0])))
        p["w_p"] = jnp.asarray(np.stack(wp_l))
        p["w_g"] = jnp.asarray(np.stack(wg_l))
        new_layers[k] = p
    out["layers"] = new_layers
    return out


def init_llama_w4(key, cfg, dtype=jnp.bfloat16, group: int = 128) -> Dict:
    """Random-init a decoder in the PACKED + group-int4 serving layout
    (benchmarks/smoke tests; real checkpoints go through
    pack_decoder -> quantize_decoder_host_w4)."""
    from crab_tpu.lm.lora import init_moe_lora
    from crab_tpu.core.layers import normal_init, rms_norm_init

    D = cfg.hidden_size
    qd = cfg.num_heads * cfg.head_dim
    kvd = cfg.num_kv_heads * cfg.head_dim
    I = cfg.intermediate_size
    L = cfg.num_layers
    dims = {
        "qkv": (D, qd + 2 * kvd, ("q", "k", "v")),
        "gu": (D, 2 * I, ("gate", "up")),
        "o": (qd, D, ("o",)),
        "down": (I, D, ("down",)),
    }
    layers: Dict = {
        "attn_norm": {"scale": jnp.ones((L, D), dtype)},
        "mlp_norm": {"scale": jnp.ones((L, D), dtype)},
    }
    from crab_tpu.ops.w4a16_matmul import effective_group

    for i, (name, (din, dout, members)) in enumerate(dims.items()):
        g = effective_group(din, group)
        kk = jax.random.fold_in(key, 2000 + i)
        p = {
            "w_p": jax.random.randint(
                kk, (L, din, dout // 2), 0, 256, dtype=jnp.int32
            ).astype(jnp.uint8),
            "w_g": jnp.full(
                (L, din // g, 2, dout // 2), 0.02 / 7.0, jnp.float32
            ),
        }
        if cfg.attention_bias and name == "qkv":
            p["b"] = jnp.zeros((L, dout), dtype)
        if cfg.lora is not None:
            if len(members) > 1:
                per = [
                    [
                        init_moe_lora(
                            jax.random.fold_in(kk, 7 + 100 * m + l),
                            din,
                            {"q": qd, "k": kvd, "v": kvd, "gate": I, "up": I}[mem],
                            cfg.lora,
                            dtype,
                        )
                        for l in range(L)
                    ]
                    for m, mem in enumerate(members)
                ]
                stacked = [
                    jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *lo)
                    for lo in per
                ]
                lora = {
                    "RA": jnp.concatenate(
                        [s["route"] for s in stacked]
                        + [s["A"] for s in stacked],
                        -1,
                    ),
                }
                from crab_tpu.lm.pack import blockdiag_experts

                lora["Bd"] = blockdiag_experts([s["B"] for s in stacked])
                p["lora"] = lora
            else:
                loras = [
                    init_moe_lora(jax.random.fold_in(kk, 7 + l), din, dout, cfg.lora, dtype)
                    for l in range(L)
                ]
                st = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *loras
                )
                # same fused serving layout pack_decoder emits for o/down
                p["lora"] = {
                    "RA": jnp.concatenate([st["route"], st["A"]], axis=-1),
                    "Bd": st["B"].reshape(L, -1, dout),
                }
        layers[name] = p
    ks = jax.random.split(key, 2)
    return {
        "embed": normal_init(ks[0], (cfg.vocab_size, D), 0.02, dtype),
        "layers": layers,
        "final_norm": rms_norm_init(D, dtype),
        "lm_head": normal_init(ks[1], (D, cfg.vocab_size), 0.02, dtype),
    }


def quantize_decoder(decoder_params: Dict, keys=QUANT_KEYS, bits: int = 8) -> Dict:
    """Replace 'w' with ('w_q', 'w_s') for the chosen projections.

    Embeddings, lm_head, norms and LoRA stay in their original dtype
    (LoRA deltas are tiny and precision-critical).
    """
    out = dict(decoder_params)
    layers = dict(out["layers"])
    for k in keys:
        p = dict(layers[k])
        q, s = jax.jit(quantize_weight, static_argnames="bits")(p.pop("w"), bits)
        p["w_q"], p["w_s"] = q, s
        layers[k] = p
    out["layers"] = layers
    return out
