"""Decoder parity tests vs HF LlamaForCausalLM (tiny random config)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from crab_tpu.core.config import DecoderConfig, MoELoRAConfig
from crab_tpu.lm.convert import convert_llama
from crab_tpu.lm.generate import capture_mask_hidden, generate
from crab_tpu.lm.llama import init_llama, llama_apply
from crab_tpu.lm.lora import init_moe_lora, moe_lora_delta

CFG = DecoderConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_layers=3,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    max_position_embeddings=256,
    lora=None,
)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)  # in-fixture: module-level seeds are clobbered by
    # other test modules imported in the same pytest session
    hf_cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        attn_implementation="eager",
    )
    return LlamaForCausalLM(hf_cfg).eval()


@pytest.fixture(scope="module")
def params(hf_model):
    return convert_llama(hf_model.state_dict(), CFG)


def test_forward_parity(hf_model, params):
    rng = np.random.default_rng(0)
    B, T = 2, 12
    embeds = rng.standard_normal((B, T, 64)).astype(np.float32) * 0.1
    # left padding: first sample has 3 pad positions
    mask = np.ones((B, T), np.int32)
    mask[0, :3] = 0
    pos = np.maximum(np.cumsum(mask, axis=-1) - 1, 0)
    with torch.no_grad():
        ref = hf_model(
            inputs_embeds=torch.from_numpy(embeds),
            attention_mask=torch.from_numpy(mask),
            position_ids=torch.from_numpy(pos),
        ).logits.numpy()
    logits, _, _, _ = llama_apply(
        params,
        CFG,
        jnp.asarray(embeds),
        attention_mask=jnp.asarray(mask),
        position_ids=jnp.asarray(pos),
    )
    ours = np.asarray(logits)
    # compare only non-pad positions
    np.testing.assert_allclose(ours[0, 3:], ref[0, 3:], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ours[1], ref[1], rtol=1e-4, atol=1e-4)


def test_generate_matches_hf(hf_model, params):
    rng = np.random.default_rng(1)
    B, T = 2, 10
    embeds = rng.standard_normal((B, T, 64)).astype(np.float32) * 0.1
    mask = np.ones((B, T), np.int32)
    mask[1, :2] = 0
    pos = np.maximum(np.cumsum(mask, axis=-1) - 1, 0)
    max_new = 8
    with torch.no_grad():
        out = hf_model.generate(
            inputs_embeds=torch.from_numpy(embeds),
            attention_mask=torch.from_numpy(mask),
            max_new_tokens=max_new,
            do_sample=False,
            output_hidden_states=True,
            return_dict_in_generate=True,
            pad_token_id=0,
            eos_token_id=-1,  # never stop
        )
    ref_tokens = out.sequences.numpy()

    res = generate(
        params,
        CFG,
        jnp.asarray(embeds),
        jnp.asarray(mask),
        jnp.asarray(pos),
        max_new_tokens=max_new,
        eos_id=10**6,  # never
        pad_id=0,
    )
    ours = np.asarray(res.tokens)
    assert ours.shape == ref_tokens.shape == (B, max_new)
    np.testing.assert_array_equal(ours, ref_tokens)

    # hidden alignment: hidden[j] (j>=1) = last-layer hidden of HF decode
    # step j (the forward that processed token j-1)
    for j in range(1, max_new):
        hf_hid = out.hidden_states[j][-1][:, -1].numpy()
        np.testing.assert_allclose(
            np.asarray(res.hidden[:, j]), hf_hid, rtol=1e-3, atol=1e-3
        )


@pytest.mark.slow
def test_generate_eos_early_exit(hf_model, params):
    rng = np.random.default_rng(2)
    embeds = rng.standard_normal((1, 6, 64)).astype(np.float32) * 0.1
    mask = np.ones((1, 6), np.int32)
    pos = np.cumsum(mask, axis=-1) - 1
    # First find what greedy produces, then set eos to the 3rd token
    free = generate(
        params, CFG, jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(pos),
        max_new_tokens=6, eos_id=10**6, pad_id=0,
    )
    seq = np.asarray(free.tokens)[0].tolist()
    j = next(i for i in range(1, 6) if seq[i] not in seq[:i])
    eos = seq[j]
    res = generate(
        params, CFG, jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(pos),
        max_new_tokens=6, eos_id=eos, pad_id=0,
    )
    toks = np.asarray(res.tokens)[0]
    assert toks[j] == eos
    assert np.all(toks[j + 1:] == 0)  # padded after EOS
    assert int(res.num_generated[0]) == j + 1


def test_moe_lora_reference_formula():
    """Oracle: literal torch transcription of peft_hyper Linear.forward
    (lora.py:338-369)."""
    cfg = MoELoRAConfig(rank=4, alpha=16, num_experts=3, dropout=0.0)
    key = jax.random.PRNGKey(0)
    p = init_moe_lora(key, 16, 24, cfg)
    # overwrite B with nonzero values for a meaningful test
    p = dict(p)
    p["B"] = jax.random.normal(jax.random.PRNGKey(1), p["B"].shape) * 0.1

    x = np.random.default_rng(3).standard_normal((2, 5, 16)).astype(np.float32)
    xt = torch.from_numpy(x)
    route_w = torch.from_numpy(np.asarray(p["route"]))
    A = torch.from_numpy(np.asarray(p["A"]))
    B = torch.from_numpy(np.asarray(p["B"]))
    with torch.no_grad():
        route = torch.softmax((xt @ route_w).to(torch.float32), dim=-1)
        ref = torch.zeros(2, 5, 24)
        for i in range(3):
            ref += route[:, :, i].unsqueeze(-1) * ((xt @ A) @ B[i]) * (16 / 4)
    ours = moe_lora_delta(p, jnp.asarray(x), cfg)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_lora_zero_init_is_identity(params):
    """Fresh MoE-LoRA must not change the base model's output."""
    cfg_lora = DecoderConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=3,
        num_heads=4, num_kv_heads=2, head_dim=16,
        lora=MoELoRAConfig(rank=4, alpha=16, num_experts=3),
    )
    import copy

    p2 = copy.deepcopy(params)
    key = jax.random.PRNGKey(7)
    for i, name in enumerate(["q", "k", "v", "o", "gate", "up", "down"]):
        in_dim = p2["layers"][name]["w"].shape[1]
        out_dim = p2["layers"][name]["w"].shape[2]
        loras = [
            init_moe_lora(jax.random.fold_in(key, i * 10 + l), in_dim, out_dim, cfg_lora.lora)
            for l in range(3)
        ]
        p2["layers"][name]["lora"] = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *loras
        )
    rng = np.random.default_rng(4)
    embeds = rng.standard_normal((1, 7, 64)).astype(np.float32) * 0.1
    base, _, _, _ = llama_apply(params, CFG, jnp.asarray(embeds))
    with_lora, _, _, _ = llama_apply(p2, cfg_lora, jnp.asarray(embeds))
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora), rtol=1e-5, atol=1e-5)


def test_capture_mask_hidden():
    from crab_tpu.lm.generate import GenerateResult

    tokens = jnp.asarray([[5, 100, 101, 102, 7, 0]])
    hidden = jnp.arange(6, dtype=jnp.float32)[None, :, None] * jnp.ones((1, 6, 4))
    res = GenerateResult(tokens, hidden, jnp.asarray([5]), jnp.zeros((1, 8)))
    pred, found = capture_mask_hidden(res, [100, 101, 102], 3)
    assert bool(found[0])
    # mask tokens at idx 1,2,3 -> hidden 2,3,4
    np.testing.assert_array_equal(np.asarray(pred[0, :, 0]), [2.0, 3.0, 4.0])


@pytest.mark.slow
def test_int8_weight_only_quant(hf_model, params):
    """int8 decoder output stays close to fp32 (cosine > 0.999)."""
    from crab_tpu.lm.quant import quantize_decoder

    qparams = quantize_decoder(params)
    # memory layout: int8 weights + fp32 scales present, fp32 'w' gone
    assert qparams["layers"]["q"]["w_q"].dtype == jnp.int8
    assert "w" not in qparams["layers"]["q"]

    rng = np.random.default_rng(5)
    embeds = rng.standard_normal((2, 9, 64)).astype(np.float32) * 0.1
    ref, _, _, _ = llama_apply(params, CFG, jnp.asarray(embeds))
    ours, _, _, _ = llama_apply(qparams, CFG, jnp.asarray(embeds))
    a = np.asarray(ref).reshape(-1)
    b = np.asarray(ours).reshape(-1)
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.999, cos
    # greedy tokens unchanged on this tiny model
    mask = jnp.ones((2, 9), jnp.int32)
    pos = jnp.cumsum(mask, axis=-1) - 1
    t_ref = generate(params, CFG, jnp.asarray(embeds), mask, pos, 5, 10**6)
    t_q = generate(qparams, CFG, jnp.asarray(embeds), mask, pos, 5, 10**6)
    assert (np.asarray(t_ref.tokens) == np.asarray(t_q.tokens)).mean() > 0.7


@pytest.mark.parametrize("kernel", ["xla", "pallas"])
def test_int8_kv_cache_generate(hf_model, params, kernel):
    """Quantized-KV decode (XLA mixed-dot path and the Pallas kernel in
    interpret mode on CPU) tracks the bf16-cache path."""
    import dataclasses

    cfg_q = dataclasses.replace(CFG, kv_quant=True, kv_kernel=kernel)
    rng = np.random.default_rng(6)
    B, T = 2, 10
    embeds = rng.standard_normal((B, T, 64)).astype(np.float32) * 0.1
    mask = np.ones((B, T), np.int32)
    mask[0, :3] = 0  # left padding exercises the bias path
    pos = np.maximum(np.cumsum(mask, -1) - 1, 0)
    ref = generate(
        params, CFG, jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(pos),
        max_new_tokens=6, eos_id=10**6,
    )
    out = generate(
        params, cfg_q, jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(pos),
        max_new_tokens=6, eos_id=10**6,
    )
    # int8 KV introduces small logit noise; demand strong agreement
    agree = (np.asarray(out.tokens) == np.asarray(ref.tokens)).mean()
    assert agree >= 0.75, (out.tokens, ref.tokens)
    a = np.asarray(out.hidden[:, 1:]).ravel()
    b = np.asarray(ref.hidden[:, 1:]).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert cos > 0.99, cos


@pytest.mark.slow
def test_init_llama_int8_structure_and_generate():
    from crab_tpu.lm.quant import init_llama_int8

    import dataclasses

    cfg = dataclasses.replace(CFG, lora=MoELoRAConfig(rank=4, alpha=8, num_experts=2))
    params = init_llama_int8(jax.random.PRNGKey(0), cfg, jnp.float32)
    assert params["layers"]["q"]["w_q"].dtype == jnp.int8
    assert params["layers"]["q"]["w_q"].shape == (3, 64, 64)
    assert params["layers"]["down"]["w_q"].shape == (3, 128, 64)
    assert params["layers"]["q"]["lora"]["B"].shape == (3, 2, 4, 64)
    rng = np.random.default_rng(8)
    embeds = rng.standard_normal((1, 5, 64)).astype(np.float32) * 0.1
    mask = np.ones((1, 5), np.int32)
    pos = np.cumsum(mask, -1) - 1
    res = generate(
        params, cfg, jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(pos),
        max_new_tokens=4, eos_id=10**6,
    )
    assert res.tokens.shape == (1, 4)
    assert np.isfinite(np.asarray(res.hidden)).all()


@pytest.mark.slow
def test_sampling_generate(params):
    rng = np.random.default_rng(9)
    embeds = rng.standard_normal((1, 6, 64)).astype(np.float32) * 0.1
    mask = jnp.ones((1, 6), jnp.int32)
    pos = jnp.cumsum(mask, -1) - 1
    greedy = generate(params, CFG, jnp.asarray(embeds), mask, pos, 6, 10**6)
    g2 = generate(params, CFG, jnp.asarray(embeds), mask, pos, 6, 10**6,
                  temperature=0.0)
    np.testing.assert_array_equal(np.asarray(greedy.tokens), np.asarray(g2.tokens))
    # high temperature with different keys gives different sequences
    s1 = generate(params, CFG, jnp.asarray(embeds), mask, pos, 6, 10**6,
                  temperature=5.0, rng=jax.random.PRNGKey(1))
    s2 = generate(params, CFG, jnp.asarray(embeds), mask, pos, 6, 10**6,
                  temperature=5.0, rng=jax.random.PRNGKey(2))
    assert not np.array_equal(np.asarray(s1.tokens), np.asarray(s2.tokens))
    # same key reproduces
    s3 = generate(params, CFG, jnp.asarray(embeds), mask, pos, 6, 10**6,
                  temperature=5.0, rng=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(s1.tokens), np.asarray(s3.tokens))
    # top-k=1 equals greedy regardless of temperature
    tk = generate(params, CFG, jnp.asarray(embeds), mask, pos, 6, 10**6,
                  temperature=1.0, top_k=1, rng=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(tk.tokens), np.asarray(greedy.tokens))
    # top-p -> 0 keeps only the argmax token: equals greedy too
    tp = generate(params, CFG, jnp.asarray(embeds), mask, pos, 6, 10**6,
                  temperature=1.0, top_p=1e-9, rng=jax.random.PRNGKey(4))
    np.testing.assert_array_equal(np.asarray(tp.tokens), np.asarray(greedy.tokens))


def test_sample_logits_nucleus():
    """Nucleus truncation: tokens outside the smallest mass->=top_p set are
    never drawn; top_p=1.0 leaves the distribution untouched (same key,
    same draw as plain temperature sampling)."""
    from crab_tpu.lm.generate import sample_logits

    # probs [0.5, 0.3, 0.15, 0.05] -> top_p=0.7 nucleus = {0, 1}
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]], jnp.float32))
    draws = set()
    for i in range(200):
        t = sample_logits(logits, jax.random.PRNGKey(i), temperature=1.0,
                          top_p=0.7)
        draws.add(int(t[0]))
    assert draws <= {0, 1} and len(draws) == 2
    # boundary token kept: top_p=0.45 keeps exactly {0} (mass crosses at 0;
    # 0.45 not 0.5 to stay clear of float round-off at the boundary)
    only0 = {int(sample_logits(logits, jax.random.PRNGKey(i), 1.0,
                               top_p=0.45)[0]) for i in range(50)}
    assert only0 == {0}
    # top_p=1.0 is a no-op relative to plain temperature sampling
    k = jax.random.PRNGKey(7)
    a = sample_logits(logits, k, temperature=1.0)
    b = sample_logits(logits, k, temperature=1.0, top_p=1.0)
    assert int(a[0]) == int(b[0])
    # top_p=0.0 exactly keeps the top token (NOT "mask everything and
    # sample uniformly": the first element's exclusive mass is 0.0, which
    # is not < 0.0, so without the explicit keep-argmax pin every logit
    # would be masked)
    zero = {int(sample_logits(logits, jax.random.PRNGKey(i), 1.0,
                              top_p=0.0)[0]) for i in range(50)}
    assert zero == {0}


def test_lora_dropout_train_vs_eval():
    """Dropout must perturb outputs only when an rng is supplied, must be
    reproducible given the key, and must leave the router input intact
    (peft formula: B(A(dropout(x))), route(x) on raw x)."""
    cfg = MoELoRAConfig(rank=4, alpha=16, num_experts=3, dropout=0.5)
    p = dict(init_moe_lora(jax.random.PRNGKey(0), 16, 24, cfg))
    p["B"] = jax.random.normal(jax.random.PRNGKey(1), p["B"].shape) * 0.1
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((2, 5, 16)).astype(np.float32)
    )
    eval_out = moe_lora_delta(p, x, cfg)
    eval_out2 = moe_lora_delta(p, x, cfg)
    np.testing.assert_array_equal(np.asarray(eval_out), np.asarray(eval_out2))

    k = jax.random.PRNGKey(42)
    train_out = moe_lora_delta(p, x, cfg, dropout_rng=k)
    train_out2 = moe_lora_delta(p, x, cfg, dropout_rng=k)
    np.testing.assert_array_equal(np.asarray(train_out), np.asarray(train_out2))
    assert not np.allclose(np.asarray(train_out), np.asarray(eval_out))
    # routes are dropout-invariant (router sees raw x)
    _, r_eval = moe_lora_delta(p, x, cfg, return_route=True)
    _, r_train = moe_lora_delta(p, x, cfg, return_route=True, dropout_rng=k)
    np.testing.assert_array_equal(np.asarray(r_eval), np.asarray(r_train))
    # rate 0 disables even with an rng
    cfg0 = MoELoRAConfig(rank=4, alpha=16, num_experts=3, dropout=0.0)
    np.testing.assert_array_equal(
        np.asarray(moe_lora_delta(p, x, cfg0, dropout_rng=k)),
        np.asarray(moe_lora_delta(p, x, cfg0)),
    )


def test_llama_dropout_rng_changes_output():
    import dataclasses

    cfg = dataclasses.replace(
        CFG, lora=MoELoRAConfig(rank=4, alpha=16, num_experts=2, dropout=0.5)
    )
    params = init_llama(jax.random.PRNGKey(3), cfg)
    # non-zero B so the LoRA path matters
    for name in ("q", "k", "v", "o", "gate", "up", "down"):
        lora = dict(params["layers"][name]["lora"])
        lora["B"] = (
            jax.random.normal(jax.random.PRNGKey(9), lora["B"].shape) * 0.05
        )
        params["layers"][name] = dict(params["layers"][name], lora=lora)
    emb = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 6, CFG.hidden_size)) * 0.1,
        jnp.float32,
    )
    eval_logits, _, _, _ = llama_apply(params, cfg, emb)
    eval_logits2, _, _, _ = llama_apply(params, cfg, emb)
    np.testing.assert_array_equal(np.asarray(eval_logits), np.asarray(eval_logits2))
    k = jax.random.PRNGKey(11)
    tr, _, _, _ = llama_apply(params, cfg, emb, dropout_rng=k)
    tr2, _, _, _ = llama_apply(params, cfg, emb, dropout_rng=k)
    np.testing.assert_array_equal(np.asarray(tr), np.asarray(tr2))
    assert not np.allclose(np.asarray(tr), np.asarray(eval_logits))


def test_per_token_route_telemetry():
    import dataclasses

    cfg = dataclasses.replace(
        CFG, lora=MoELoRAConfig(rank=4, alpha=16, num_experts=3, dropout=0.0)
    )
    params = init_llama(jax.random.PRNGKey(3), cfg)
    B, T = 2, 5
    emb = jnp.asarray(
        np.random.default_rng(1).standard_normal((B, T, CFG.hidden_size)) * 0.1,
        jnp.float32,
    )
    _, _, _, tel = llama_apply(params, cfg, emb, collect_routes=True)
    L, E = cfg.num_layers, cfg.lora.num_experts
    for k in ("q", "k", "v", "o"):
        assert tel[k].shape == (L, B, T, E)
        np.testing.assert_allclose(
            np.asarray(tel[k]).sum(-1), np.ones((L, B, T)), rtol=1e-4
        )
    assert tel["q_route_mean"].shape == (L, E)
    np.testing.assert_allclose(
        np.asarray(tel["q_route_mean"]),
        np.asarray(tel["q"]).mean(axis=(1, 2)),
        rtol=1e-6,
    )


def test_kvcacheq_chunked_prefill_fails_loudly(params):
    """Chunked prefill into the int8 cache would silently drop earlier
    chunks; concrete offsets raise, traced offsets poison with NaN."""
    import dataclasses

    from crab_tpu.lm.llama import KVCacheQ

    cfg_q = dataclasses.replace(CFG, kv_quant=True)
    rng = np.random.default_rng(7)
    emb = jnp.asarray(rng.standard_normal((1, 4, 64)).astype(np.float32))
    cache = KVCacheQ.zeros(cfg_q, 1, 32)
    mask = jnp.ones((1, 32), jnp.int32)
    # first prefill at offset 0 is fine
    _, _, cache, _ = llama_apply(params, cfg_q, emb, attention_mask=mask,
                                 cache=cache)
    assert int(cache.length) == 4
    # second T>1 call: concrete offset -> loud ValueError
    with pytest.raises(ValueError, match="single prefill"):
        llama_apply(params, cfg_q, emb, attention_mask=mask, cache=cache)

    # traced offset (inside jit): NaN-poisoned logits instead of garbage
    @jax.jit
    def chunked(cache):
        logits, _, cache, _ = llama_apply(
            params, cfg_q, emb, attention_mask=mask, cache=cache
        )
        return logits

    assert np.isnan(np.asarray(chunked(cache))).all()


def test_int8_xla_attention_matches_reference():
    """decode_attention_int8_xla == fp reference on the dequantized cache
    (exact same quantized operands, scales factored out of the dots)."""
    from crab_tpu.ops.decode_attention import (
        decode_attention_int8_xla,
        quantize_kv,
        reference_attention,
    )

    rng = np.random.default_rng(0)
    B, H, Hkv, S, d = 2, 4, 2, 16, 16
    q = jnp.asarray(rng.standard_normal((B, H, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, d)), jnp.float32)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    length = jnp.asarray(12, jnp.int32)
    # reference over the DEQUANTIZED cache -> differences only from the
    # factored-scale compute order, not from quantization error
    k_dq = kq.astype(jnp.float32) * ks[..., None]
    v_dq = vq.astype(jnp.float32) * vs[..., None]
    ref = reference_attention(q, k_dq, v_dq, length)
    out = decode_attention_int8_xla(q, kq, ks, vq, vs, length=length)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-3)


def test_int8_lm_head_tracks_bf16(hf_model, params):
    """quantize_decoder_host(lm_head=True) logits track the bf16 head
    closely enough that greedy tokens agree."""
    from crab_tpu.lm.quant import quantize_decoder_host

    q = quantize_decoder_host(params, keys=(), lm_head=True)
    assert "lm_head" not in q and q["lm_head_q"].dtype == jnp.int8
    rng = np.random.default_rng(3)
    emb = jnp.asarray(rng.standard_normal((2, 6, 64)).astype(np.float32) * 0.1)
    ref_logits, _, _, _ = llama_apply(params, CFG, emb)
    q_logits, _, _, _ = llama_apply(q, CFG, emb)
    np.testing.assert_array_equal(
        np.argmax(np.asarray(ref_logits), -1), np.argmax(np.asarray(q_logits), -1)
    )
    # int8 per-channel: relative error within a quantization step
    np.testing.assert_allclose(
        np.asarray(q_logits), np.asarray(ref_logits), rtol=0.05, atol=0.05
    )


def test_flash_prefill_block_picker_and_cpu_fallback(params):
    """prefill_attn='flash' only engages on TPU with 128-aligned shapes;
    on the CPU test backend the gate must fall back to the XLA path
    bit-identically (same program). _pick_block returns the largest
    128-multiple dividing T."""
    import dataclasses

    from crab_tpu.lm.llama import _pick_block

    assert _pick_block(768, 256) == 256
    assert _pick_block(768, 768) == 768
    assert _pick_block(768, 512) == 384  # 512 does not divide 768
    assert _pick_block(768, 10_000) == 768
    assert _pick_block(704, 256) == 128  # 704 itself is unaligned
    assert _pick_block(128, 256) == 128

    cfg = dataclasses.replace(CFG, prefill_attn="flash")
    rng = np.random.default_rng(11)
    emb = jnp.asarray(rng.standard_normal((2, 8, 64)).astype(np.float32) * 0.1)
    mask = jnp.asarray([[1] * 8, [0] * 3 + [1] * 5], jnp.int32)
    ref, _, _, _ = llama_apply(params, CFG, emb, attention_mask=mask)
    out, _, _, _ = llama_apply(params, cfg, emb, attention_mask=mask)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
