"""Qwen2 decoder parity (the reference's secondary LLM family,
``models/unified_qwen.py``): same crab_tpu decoder code, Qwen dims —
GQA + qkv bias + large rope theta."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from crab_tpu.core.config import DecoderConfig
from crab_tpu.lm.convert import convert_llama
from crab_tpu.lm.generate import generate
from crab_tpu.lm.llama import llama_apply

CFG = DecoderConfig(
    vocab_size=160,
    hidden_size=64,
    intermediate_size=128,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    rope_theta=1000000.0,
    rms_norm_eps=1e-6,
    max_position_embeddings=512,
    attention_bias=True,
    lora=None,
)


@pytest.fixture(scope="module")
def qwen():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(1)
    cfg = Qwen2Config(
        vocab_size=160,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        rope_theta=1000000.0,
        rms_norm_eps=1e-6,
        max_position_embeddings=512,
        attn_implementation="eager",
        tie_word_embeddings=False,
    )
    return Qwen2ForCausalLM(cfg).eval()


def test_qwen_forward_parity(qwen):
    params = convert_llama(qwen.state_dict(), CFG)
    assert "b" in params["layers"]["q"]  # qkv bias present
    rng = np.random.default_rng(0)
    B, T = 2, 11
    embeds = rng.standard_normal((B, T, 64)).astype(np.float32) * 0.1
    mask = np.ones((B, T), np.int32)
    mask[0, :4] = 0
    pos = np.maximum(np.cumsum(mask, -1) - 1, 0)
    with torch.no_grad():
        ref = qwen(
            inputs_embeds=torch.from_numpy(embeds),
            attention_mask=torch.from_numpy(mask),
            position_ids=torch.from_numpy(pos),
        ).logits.numpy()
    ours, _, _, _ = llama_apply(
        params, CFG, jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(pos)
    )
    np.testing.assert_allclose(np.asarray(ours)[0, 4:], ref[0, 4:], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours)[1], ref[1], rtol=1e-4, atol=1e-4)


def test_qwen_generate_matches_hf(qwen):
    params = convert_llama(qwen.state_dict(), CFG)
    rng = np.random.default_rng(1)
    embeds = rng.standard_normal((1, 6, 64)).astype(np.float32) * 0.1
    mask = np.ones((1, 6), np.int32)
    pos = np.cumsum(mask, -1) - 1
    with torch.no_grad():
        ref = qwen.generate(
            inputs_embeds=torch.from_numpy(embeds),
            attention_mask=torch.from_numpy(mask),
            max_new_tokens=6,
            do_sample=False,
            pad_token_id=0,
            eos_token_id=-1,
        ).numpy()
    res = generate(
        params, CFG, jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(pos),
        max_new_tokens=6, eos_id=10**6,
    )
    np.testing.assert_array_equal(np.asarray(res.tokens), ref)
