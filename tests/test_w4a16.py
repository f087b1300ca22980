import pytest
"""Pallas W4A16 group-quantized matmul (ops/w4a16_matmul.py).

Runs in interpret mode on the CPU test mesh; the numpy oracle reproduces
the kernel's exact math (bf16-rounded inputs, per-group f32 partial sums
scaled before accumulation), so comparisons are tight.
"""

import numpy as np

import jax
import jax.numpy as jnp

from crab_tpu.ops.w4a16_matmul import (
    dequantize_w4,
    effective_group,
    quantize_w4,
    w4a16_matmul,
)


def _oracle(x, wp, wg, group):
    """Exact kernel math in numpy: per-group bf16 dot, f32 scale+accum."""
    D, O2 = wp.shape
    lo = (wp & 0xF).astype(np.int8)
    lo = np.where(lo > 7, lo - 16, lo)
    hi = (wp >> 4).astype(np.int8)
    hi = np.where(hi > 7, hi - 16, hi)
    xb = np.asarray(jnp.asarray(x).astype(jnp.bfloat16), np.float32)
    acc_lo = np.zeros((x.shape[0], O2), np.float32)
    acc_hi = np.zeros((x.shape[0], O2), np.float32)
    for g in range(D // group):
        sl = slice(g * group, (g + 1) * group)
        acc_lo += (xb[:, sl] @ lo[sl].astype(np.float32)) * wg[g, 0]
        acc_hi += (xb[:, sl] @ hi[sl].astype(np.float32)) * wg[g, 1]
    return np.concatenate([acc_lo, acc_hi], axis=1)


def test_quantize_roundtrip_bound():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((256, 128)).astype(np.float32) * 0.1
    wp, wg = quantize_w4(w, group=128)
    wd = dequantize_w4(wp, wg)
    # RTN error bound: half a quantization step per group/channel
    scale = np.concatenate([wg[:, 0], wg[:, 1]], axis=1)
    step = np.repeat(scale, 128, axis=0)
    assert (np.abs(wd - w) <= step / 2 + 1e-7).all()


def test_kernel_matches_exact_oracle():
    rng = np.random.default_rng(1)
    D, O, R, G = 256, 512, 8, 128
    w = rng.standard_normal((D, O)).astype(np.float32) * 0.05
    x = rng.standard_normal((R, D)).astype(np.float32) * 0.1
    wp, wg = quantize_w4(w, group=G)
    y = np.asarray(
        w4a16_matmul(
            jnp.asarray(x, jnp.bfloat16), jnp.asarray(wp), jnp.asarray(wg),
            interpret=True, group=G,
        )
    )
    ref = _oracle(x, wp, wg, G)
    np.testing.assert_allclose(y, ref, rtol=1e-6, atol=1e-6)


def test_row_tiling_and_single_group():
    rng = np.random.default_rng(2)
    D, O, R = 128, 256, 16
    w = rng.standard_normal((D, O)).astype(np.float32) * 0.05
    x = rng.standard_normal((R, D)).astype(np.float32) * 0.1
    assert effective_group(D, 128) == 128
    assert effective_group(96, 128) == 96  # non-divisible -> whole dim
    wp, wg = quantize_w4(w, group=D)  # one group
    a = w4a16_matmul(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(wp), jnp.asarray(wg),
        interpret=True, group=D,
    )
    b = w4a16_matmul(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(wp), jnp.asarray(wg),
        interpret=True, group=D, row_block=8,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)


@pytest.mark.slow
def test_w4_decoder_generate_close_to_dequant_model():
    """A W4-quantized packed decoder generates from logits close to the
    bf16 model carrying the dequantized weights."""
    from crab_tpu.core.config import DecoderConfig, MoELoRAConfig
    from crab_tpu.lm.llama import init_llama, llama_apply
    from crab_tpu.lm.pack import pack_decoder
    from crab_tpu.lm.quant import init_llama_w4, quantize_decoder_host_w4

    cfg = DecoderConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=4, head_dim=16, max_position_embeddings=128,
        lora=MoELoRAConfig(rank=2, num_experts=2, alpha=4.0),
    )
    packed = pack_decoder(init_llama(jax.random.PRNGKey(0), cfg), cfg)
    w4 = quantize_decoder_host_w4(packed, group=64)

    # rebuild a float model with the dequantized weights
    deq = jax.tree_util.tree_map(lambda x: x, packed)
    for name in ("qkv", "gu", "o", "down"):
        p = dict(w4["layers"][name])
        L = p["w_p"].shape[0]
        w = np.stack(
            [
                dequantize_w4(
                    np.asarray(p["w_p"][i]), np.asarray(p["w_g"][i])
                )
                for i in range(L)
            ]
        )
        dp = dict(deq["layers"][name])
        dp["w"] = jnp.asarray(w)
        deq["layers"][name] = dp
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 64), jnp.float32) * 0.1
    mask = jnp.ones((2, 6), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(6)[None], (2, 6))
    lo_w4, _, _, _ = llama_apply(w4, cfg, emb, attention_mask=mask, position_ids=pos)
    lo_dq, _, _, _ = llama_apply(deq, cfg, emb, attention_mask=mask, position_ids=pos)
    np.testing.assert_allclose(
        np.asarray(lo_w4), np.asarray(lo_dq), rtol=0.05, atol=0.05
    )

    # packed random init is kernel-consumable
    pw = init_llama_w4(jax.random.PRNGKey(2), cfg, jnp.float32, group=64)
    lo, _, _, _ = llama_apply(pw, cfg, emb, attention_mask=mask, position_ids=pos)
    assert np.isfinite(np.asarray(lo)).all()
