"""Packed serving layout (lm/pack.py): token/route parity vs canonical.

The pack transform concatenates q/k/v and gate/up weights (and the MoE-
LoRA route/A matmuls) column-wise; every output channel's reduction is
unchanged, so generate must be token-identical and telemetry must match.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crab_tpu.core.config import DecoderConfig, MoELoRAConfig
from crab_tpu.lm.generate import generate
from crab_tpu.lm.llama import init_llama, llama_apply
from crab_tpu.lm.pack import pack_decoder
from crab_tpu.lm.quant import init_llama_int8

LORA = MoELoRAConfig(rank=4, num_experts=3, alpha=8.0, dropout=0.05)

CFG = DecoderConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_layers=3,
    num_heads=4,
    num_kv_heads=2,  # GQA: non-uniform member widths in the Bd blocks
    head_dim=16,
    max_position_embeddings=256,
    lora=LORA,
)

CFG_MHA = dataclasses.replace(CFG, num_kv_heads=4)  # uniform stacked B


def _params_with_lora(cfg, key=0):
    params = init_llama(jax.random.PRNGKey(key), cfg)
    # B init is zeros (identity adapter) — randomize so the LoRA path
    # actually contributes to the parity check
    leaves, treedef = jax.tree_util.tree_flatten(params)
    k = jax.random.PRNGKey(key + 1)
    out = []
    for leaf in leaves:
        k, sub = jax.random.split(k)
        out.append(
            leaf + 0.02 * jax.random.normal(sub, leaf.shape, leaf.dtype)
            if leaf.ndim >= 3
            else leaf
        )
    return jax.tree_util.tree_unflatten(treedef, out)


def _inputs(cfg, B=2, T=12, key=7):
    emb = jax.random.normal(
        jax.random.PRNGKey(key), (B, T, cfg.hidden_size), jnp.float32
    ) * 0.1
    mask = jnp.ones((B, T), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    return emb, mask, pos


@pytest.mark.slow
@pytest.mark.parametrize("cfg", [CFG, CFG_MHA], ids=["gqa", "mha"])
def test_packed_generate_token_identical(cfg):
    params = _params_with_lora(cfg)
    packed = dict(params, **{})
    packed = pack_decoder(params, cfg)
    assert "qkv" in packed["layers"] and "q" not in packed["layers"]
    emb, mask, pos = _inputs(cfg)

    r_ref = generate(params, cfg, emb, mask, pos, max_new_tokens=8, eos_id=-1)
    r_pkd = generate(packed, cfg, emb, mask, pos, max_new_tokens=8, eos_id=-1)
    np.testing.assert_array_equal(np.asarray(r_ref.tokens), np.asarray(r_pkd.tokens))
    np.testing.assert_allclose(
        np.asarray(r_ref.hidden), np.asarray(r_pkd.hidden), rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow
def test_packed_forward_and_routes_match():
    cfg = CFG
    params = _params_with_lora(cfg, key=3)
    packed = pack_decoder(params, cfg)
    emb, mask, pos = _inputs(cfg, T=9)

    lo_ref, hid_ref, _, tel_ref = llama_apply(
        params, cfg, emb, attention_mask=mask, position_ids=pos,
        collect_routes=True,
    )
    lo_pkd, hid_pkd, _, tel_pkd = llama_apply(
        packed, cfg, emb, attention_mask=mask, position_ids=pos,
        collect_routes=True,
    )
    np.testing.assert_allclose(
        np.asarray(lo_ref), np.asarray(lo_pkd), rtol=1e-5, atol=1e-5
    )
    for key in ("q", "k", "v", "o", "q_route_mean"):
        np.testing.assert_allclose(
            np.asarray(tel_ref[key]), np.asarray(tel_pkd[key]),
            rtol=1e-5, atol=1e-6, err_msg=key,
        )


@pytest.mark.slow
def test_packed_int8_token_identical():
    cfg = CFG
    params = init_llama_int8(jax.random.PRNGKey(5), cfg, jnp.float32)
    packed = pack_decoder(params, cfg)
    assert "w_q" in packed["layers"]["qkv"]
    emb, mask, pos = _inputs(cfg, T=10, key=11)
    r_ref = generate(params, cfg, emb, mask, pos, max_new_tokens=6, eos_id=-1)
    r_pkd = generate(packed, cfg, emb, mask, pos, max_new_tokens=6, eos_id=-1)
    np.testing.assert_array_equal(np.asarray(r_ref.tokens), np.asarray(r_pkd.tokens))


def test_pack_idempotent_and_train_guard():
    cfg = CFG
    params = _params_with_lora(cfg)
    packed = pack_decoder(params, cfg)
    again = pack_decoder(packed, cfg)
    assert again is packed
    emb, mask, pos = _inputs(cfg, T=6)
    with pytest.raises(ValueError, match="inference-only"):
        llama_apply(
            packed, cfg, emb, attention_mask=mask, position_ids=pos,
            dropout_rng=jax.random.PRNGKey(0),
        )


def test_packed_qwen_like_bias_gqa():
    """Qwen2 shape: GQA + qkv bias — packed bias concat and per-member
    non-uniform block-diagonal Bd must be token-identical too."""
    cfg = dataclasses.replace(CFG, attention_bias=True, rope_theta=1e6)
    params = _params_with_lora(cfg, key=21)
    # give the biases nonzero values so the concat actually matters
    for name in ("q", "k", "v"):
        p = params["layers"][name]
        p["b"] = 0.05 * jax.random.normal(
            jax.random.PRNGKey(hash(name) % 1000), p["b"].shape, p["b"].dtype
        )
    packed = pack_decoder(params, cfg)
    assert packed["layers"]["qkv"]["b"].shape[-1] == (
        cfg.num_heads + 2 * cfg.num_kv_heads
    ) * cfg.head_dim
    emb, mask, pos = _inputs(cfg, T=10, key=23)
    r_ref = generate(params, cfg, emb, mask, pos, max_new_tokens=6, eos_id=-1)
    r_pkd = generate(packed, cfg, emb, mask, pos, max_new_tokens=6, eos_id=-1)
    np.testing.assert_array_equal(np.asarray(r_ref.tokens), np.asarray(r_pkd.tokens))


def test_last_logit_only_matches_full():
    cfg = CFG_MHA
    params = _params_with_lora(cfg, key=9)
    emb, mask, pos = _inputs(cfg, T=7)
    full, _, _, _ = llama_apply(params, cfg, emb, attention_mask=mask, position_ids=pos)
    last, _, _, _ = llama_apply(
        params, cfg, emb, attention_mask=mask, position_ids=pos, last_logit_only=True
    )
    assert last.shape == (emb.shape[0], 1, cfg.vocab_size)
    np.testing.assert_allclose(
        np.asarray(full[:, -1]), np.asarray(last[:, 0]), rtol=1e-6, atol=1e-6
    )


def test_packed_with_int8_kv_cache():
    """Packed layout composed with the int8-KV decode path (Pallas kernel
    in interpret mode on CPU): token-identical to unpacked + int8-KV."""
    cfg = dataclasses.replace(CFG_MHA, kv_quant=True)
    params = _params_with_lora(cfg, key=31)
    packed = pack_decoder(params, cfg)
    emb, mask, pos = _inputs(cfg, T=12, key=33)
    r_ref = generate(params, cfg, emb, mask, pos, max_new_tokens=6, eos_id=-1)
    r_pkd = generate(packed, cfg, emb, mask, pos, max_new_tokens=6, eos_id=-1)
    np.testing.assert_array_equal(np.asarray(r_ref.tokens), np.asarray(r_pkd.tokens))


def test_blockdiag_experts_exact():
    """The block-diagonal expert matmul equals the per-member stacked
    einsum — inserted zeros contribute nothing; on the MXU's sequential
    accumulation the sums are identical, while CPU BLAS may tree-reduce
    the longer K differently (rounding-level only). Includes GQA-style
    members with different out widths."""
    from crab_tpu.lm.pack import blockdiag_experts

    rng = np.random.default_rng(0)
    L, E, r, n_tok = 2, 3, 4, 5
    outs = (16, 8, 8)  # non-uniform member widths
    Bs = [
        jnp.asarray(rng.standard_normal((L, E, r, o)).astype(np.float32))
        for o in outs
    ]
    Bd = blockdiag_experts(Bs)
    assert Bd.shape == (L, len(outs) * E * r, sum(outs))
    weighted = jnp.asarray(
        rng.standard_normal((n_tok, len(outs), E, r)).astype(np.float32)
    )
    got = weighted.reshape(n_tok, -1) @ Bd[0]
    ref = jnp.concatenate(
        [
            jnp.einsum("ter,erd->td", weighted[:, i], Bs[i][0])
            for i in range(len(outs))
        ],
        axis=-1,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-6
    )
