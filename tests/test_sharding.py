"""Sharded inference tests on the virtual 8-CPU mesh: generation under
DP+TP must be bit-identical to single-device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crab_tpu.core.config import crab_tiny
from crab_tpu.core.mesh import MeshSpec, make_mesh
from crab_tpu.lm.llama import init_llama
from crab_tpu.lm.generate import generate
from crab_tpu.runtime.sharding import crab_param_specs, shard_crab_params

CFG = crab_tiny(vocab_size=417)


def test_param_specs_structure():
    from crab_tpu.runtime.model import init_crab

    params = init_crab(jax.random.PRNGKey(0), CFG)
    specs = crab_param_specs(params)
    # decoder projections are 2D-sharded; encoders replicated
    assert specs["decoder"]["layers"]["q"]["w"] == jax.sharding.PartitionSpec(
        None, "data", "model"
    )
    assert specs["decoder"]["layers"]["down"]["w"] == jax.sharding.PartitionSpec(
        None, "model", "data"
    )
    assert specs["vision"]["pre_ln"]["scale"] == jax.sharding.PartitionSpec()
    assert specs["decoder"]["layers"]["q"]["lora"]["B"] == jax.sharding.PartitionSpec(
        None, None, None, "model"
    )


@pytest.mark.slow
def test_sharded_int8_generate_matches_single_device():
    """Quantized decoders must TP/FSDP-shard too: w_q/w_s carry their own
    PartitionSpecs (an earlier gap silently replicated int8 weights on
    every device). Token parity pins both spec correctness and that the
    mixed-dot dequant path commutes with the sharding."""
    from crab_tpu.lm.quant import quantize_decoder

    assert jax.device_count() >= 8
    mesh = make_mesh(MeshSpec(data=2, model=4))
    params = quantize_decoder(init_llama(jax.random.PRNGKey(3), CFG.decoder))

    specs = crab_param_specs({"decoder": params})["decoder"]
    assert specs["layers"]["q"]["w_q"] == jax.sharding.PartitionSpec(
        None, "data", "model"
    )
    assert specs["layers"]["q"]["w_s"] == jax.sharding.PartitionSpec(
        None, None, "model"
    )
    assert specs["layers"]["down"]["w_s"] == jax.sharding.PartitionSpec(
        None, None, "data"
    )

    rng = np.random.default_rng(1)
    B, T = 2, 8
    embeds = rng.standard_normal((B, T, CFG.decoder.hidden_size)).astype(np.float32) * 0.1
    mask = np.ones((B, T), np.int32)
    pos = np.cumsum(mask, -1) - 1
    ref = generate(
        params, CFG.decoder, jnp.asarray(embeds), jnp.asarray(mask),
        jnp.asarray(pos), max_new_tokens=6, eos_id=10**6,
    )
    sharded = shard_crab_params({"decoder": params}, mesh)["decoder"]
    out = generate(
        sharded, CFG.decoder, jnp.asarray(embeds), jnp.asarray(mask),
        jnp.asarray(pos), max_new_tokens=6, eos_id=10**6,
    )
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))


def test_sharded_generate_matches_single_device():
    assert jax.device_count() >= 8
    mesh = make_mesh(MeshSpec(data=2, model=4))
    params = init_llama(jax.random.PRNGKey(3), CFG.decoder)

    rng = np.random.default_rng(0)
    B, T = 2, 8
    embeds = rng.standard_normal((B, T, CFG.decoder.hidden_size)).astype(np.float32) * 0.1
    mask = np.ones((B, T), np.int32)
    pos = np.cumsum(mask, -1) - 1

    ref = generate(
        params, CFG.decoder, jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(pos),
        max_new_tokens=6, eos_id=10**6,
    )

    sharded = shard_crab_params({"decoder": params}, mesh)["decoder"]
    out = generate(
        sharded, CFG.decoder, jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(pos),
        max_new_tokens=6, eos_id=10**6,
    )
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))
    np.testing.assert_allclose(
        np.asarray(out.hidden), np.asarray(ref.hidden), rtol=2e-3, atol=2e-3
    )


def test_sharded_generate_qwen_gqa_matches_single_device():
    """GQA under TP: the flagship bench backbone is Qwen2-7B (GQA
    Hkv=4), so the sharded decode path must stay token-identical when
    the KV projection's flat output dim (Hkv*head_dim) is split across
    MORE shards than there are KV heads — here Hkv=2 over model=4, so
    each KV head's head_dim is itself split in half and GSPMD must
    reshard around the (B,T,Hkv,dh) reshape + repeat-to-Hq broadcast.
    Also covers the qkv attention biases (P(None,'model') specs) that
    LLaMA never exercises."""
    from crab_tpu.core.config import crab_qwen_tiny

    assert jax.device_count() >= 8
    qcfg = crab_qwen_tiny(vocab_size=417)
    assert qcfg.decoder.num_kv_heads < 4  # the stress condition above
    mesh = make_mesh(MeshSpec(data=2, model=4))
    params = init_llama(jax.random.PRNGKey(5), qcfg.decoder)

    rng = np.random.default_rng(2)
    B, T = 2, 8
    embeds = (
        rng.standard_normal((B, T, qcfg.decoder.hidden_size)).astype(np.float32)
        * 0.1
    )
    mask = np.ones((B, T), np.int32)
    pos = np.cumsum(mask, -1) - 1

    ref = generate(
        params, qcfg.decoder, jnp.asarray(embeds), jnp.asarray(mask),
        jnp.asarray(pos), max_new_tokens=6, eos_id=10**6,
    )
    sharded = shard_crab_params({"decoder": params}, mesh)["decoder"]
    out = generate(
        sharded, qcfg.decoder, jnp.asarray(embeds), jnp.asarray(mask),
        jnp.asarray(pos), max_new_tokens=6, eos_id=10**6,
    )
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))
    np.testing.assert_allclose(
        np.asarray(out.hidden), np.asarray(ref.hidden), rtol=2e-3, atol=2e-3
    )
