"""Self-speculative decoding: losslessness against the plain slot loop.

spec_decode_chunk may emit several tokens per forward, but every emitted
token must be the argmax of the true model given the true prefix — so its
token streams must be BIT-IDENTICAL to cb_decode_chunk's for any history,
acceptance pattern, EOS position, or chunk budget. The engine-level test
pins the same invariant through ContinuousEngine scheduling.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crab_tpu.core.config import crab_tiny
from crab_tpu.lm.cb import SlotState, cb_decode_chunk, cb_prefill, deposit
from crab_tpu.lm.llama import init_llama
from crab_tpu.lm.spec import draft_lookup, spec_decode_chunk

CFG = crab_tiny(vocab_size=97).decoder
EOS = 96


@pytest.fixture(scope="module")
def params():
    return init_llama(jax.random.PRNGKey(0), CFG)


def _prompt_state(params, prompts, max_len=96, hist=True):
    """Deposit each prompt (list of 1D id arrays) into its own slot."""
    state = SlotState.zeros(CFG, len(prompts), max_len, jnp.float32)
    for slot, ids in enumerate(prompts):
        ids = jnp.asarray(ids, jnp.int32)[None, :]
        emb = jnp.take(params["embed"], ids[0], axis=0)[None].astype(
            jnp.float32
        )
        mask = jnp.ones_like(ids)
        pos = jnp.cumsum(mask, -1) - 1
        k, v, first, next_pos = cb_prefill(params, CFG, emb, mask, pos)
        state = deposit(
            state, slot, k, v, mask, first, next_pos,
            ids if hist else None,
        )
    return state


PROMPTS = [
    np.array([5, 9, 11, 9, 11, 9, 11, 3]),   # cyclic — drafts should hit
    np.array([40, 41, 42, 43, 44]),           # arbitrary
    np.array([7, 7, 7, 7, 7, 7, 7]),          # degenerate unigram cycle
]


@pytest.mark.slow
@pytest.mark.parametrize("chunk", [5, 16])
@pytest.mark.parametrize("spec_k", [1, 3, 6])
def test_spec_matches_plain_chunk(params, chunk, spec_k):
    ref_state = _prompt_state(params, PROMPTS)
    ref = cb_decode_chunk(params, CFG, ref_state, chunk, EOS)
    st_ref, out_ref, em_ref = ref

    state = _prompt_state(params, PROMPTS)
    st, out, em, acc = spec_decode_chunk(
        params, CFG, state, chunk, EOS, spec_k=spec_k
    )
    np.testing.assert_array_equal(np.asarray(em), np.asarray(em_ref))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_ref))
    np.testing.assert_array_equal(
        np.asarray(st.active), np.asarray(st_ref.active)
    )
    np.testing.assert_array_equal(np.asarray(st.pos), np.asarray(st_ref.pos))
    np.testing.assert_array_equal(np.asarray(st.tok), np.asarray(st_ref.tok))


def test_spec_multi_chunk_continuation(params):
    """State carried across chunks (bitmap/hist/KV of accepted rows only)
    keeps later chunks identical too."""
    a = _prompt_state(params, PROMPTS)
    b = _prompt_state(params, PROMPTS)
    for _ in range(3):
        a, out_a, _ = cb_decode_chunk(params, CFG, a, 7, EOS)
        b, out_b, _, _ = spec_decode_chunk(params, CFG, b, 7, EOS, spec_k=3)
        np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_spec_accepts_on_cyclic_history(params):
    """Greedy decode from a tiny random model settles into a cycle; once
    the cycle enters the history the bigram draft predicts it exactly, so
    acceptance must climb above zero (the speedup exists)."""
    state = _prompt_state(params, PROMPTS)
    total = 0
    for _ in range(4):
        state, _, em, acc = spec_decode_chunk(
            params, CFG, state, 16, EOS, spec_k=4
        )
        total += int(np.asarray(acc).sum())
    assert total > 0


def test_spec_without_prompt_history_still_correct(params):
    """hist=None deposits (-1 rows) disable prompt matching but generated
    history still accumulates; outputs stay identical to plain decode."""
    a = _prompt_state(params, PROMPTS, hist=True)
    b = _prompt_state(params, PROMPTS, hist=False)
    a, out_a, _, _ = spec_decode_chunk(params, CFG, a, 12, EOS, spec_k=3)
    b, out_b, _, _ = spec_decode_chunk(params, CFG, b, 12, EOS, spec_k=3)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_draft_lookup_semantics():
    """Bigram (2, 3) occurred at rows 1-2 and 5-6; the most recent match
    (5-6) wins and the draft is the continuation after it."""
    hist = jnp.asarray(
        [[9, 2, 3, 7, 8, 2, 3, 4, 5, -1, -1, -1]], jnp.int32
    )
    widx = jnp.asarray([9])   # rows 0..8 known
    tok = jnp.asarray([3])    # current input; prev = hist[8] = 5 -> no hit
    d = draft_lookup(hist, widx, tok, 3)
    np.testing.assert_array_equal(np.asarray(d), [[-1, -1, -1]])
    # prev=2, tok=3 -> matches at j=1 and j=5; j=5 chosen; continuation 4,5
    hist2 = jnp.asarray(
        [[9, 2, 3, 7, 8, 2, 3, 4, 5, 2, -1, -1]], jnp.int32
    )
    d2 = draft_lookup(hist2, jnp.asarray([10]), jnp.asarray([3]), 3)
    np.testing.assert_array_equal(np.asarray(d2), [[4, 5, 2]])
    # feature rows (-1) never match
    hist3 = jnp.asarray([[-1, -1, -1, 6, -1, -1, -1, -1, -1, -1, -1, -1]],
                        jnp.int32)
    d3 = draft_lookup(hist3, jnp.asarray([4]), jnp.asarray([6]), 2)
    np.testing.assert_array_equal(np.asarray(d3), [[-1, -1]])
    # trigram preference: suffix is (1, 2, 3); bigram (2, 3) matches most
    # recently at j=6 (continuation 9, 9) but the full trigram matched at
    # j=1 (hist[0]=1) — the longer-context match wins despite being older
    hist4 = jnp.asarray(
        [[1, 2, 3, 4, 5, 7, 2, 3, 9, 9, 1, 2, -1, -1, -1, -1]], jnp.int32
    )
    d4 = draft_lookup(hist4, jnp.asarray([12]), jnp.asarray([3]), 3)
    np.testing.assert_array_equal(np.asarray(d4), [[4, 5, 7]])
    # and when no trigram occurrence exists, bigram still drafts
    hist5 = jnp.asarray(
        [[8, 2, 3, 4, 5, 7, 6, 3, 9, 9, 1, 2, -1, -1, -1, -1]], jnp.int32
    )
    d5 = draft_lookup(hist5, jnp.asarray([12]), jnp.asarray([3]), 3)
    np.testing.assert_array_equal(np.asarray(d5), [[4, 5, 7]])


@pytest.mark.parametrize("spec_k", [1, 4])
def test_spec_generate_matches_generate(params, spec_k):
    """Whole-batch speculative generate is bit-identical to the plain
    lax.while_loop generate: tokens, counts, and the hidden rows the AVS
    head would gather (positions < num_generated)."""
    from crab_tpu.lm.generate import generate
    from crab_tpu.lm.spec import spec_generate

    rows = [PROMPTS[0], PROMPTS[1], PROMPTS[2]]
    T = max(len(r) for r in rows)
    B = len(rows)
    ids = np.zeros((B, T), np.int32)
    mask = np.zeros((B, T), np.int32)
    for i, r in enumerate(rows):  # left pad
        ids[i, T - len(r):] = r
        mask[i, T - len(r):] = 1
    pos = np.maximum(np.cumsum(mask, -1) - 1, 0).astype(np.int32)
    emb = jnp.take(params["embed"], jnp.asarray(ids), axis=0).astype(
        jnp.float32
    ) * mask[..., None]
    hist = np.where(mask > 0, ids, -1).astype(np.int32)

    ref = generate(
        params, CFG, emb, jnp.asarray(mask), jnp.asarray(pos),
        max_new_tokens=18, eos_id=EOS,
    )
    got = spec_generate(
        params, CFG, emb, jnp.asarray(mask), jnp.asarray(pos),
        max_new_tokens=18, eos_id=EOS, spec_k=spec_k,
        prompt_hist=jnp.asarray(hist),
    )
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
    np.testing.assert_array_equal(
        np.asarray(got.num_generated), np.asarray(ref.num_generated)
    )
    np.testing.assert_allclose(
        np.asarray(got.prefill_logits), np.asarray(ref.prefill_logits),
        rtol=2e-5, atol=2e-5,
    )
    # hidden rows are defined for 1 <= j < num_generated (j = 0 is the
    # never-written zero row; rows past a sequence's finish are scratch)
    h_ref = np.asarray(ref.hidden)
    h_got = np.asarray(got.hidden)
    for b in range(B):
        n = int(np.asarray(ref.num_generated)[b])
        np.testing.assert_allclose(
            h_got[b, 1:n], h_ref[b, 1:n], rtol=2e-4, atol=2e-4
        )


def test_spec_generate_quant_matches_quant_generate(params):
    """kv_quant spec_generate (SlotStateQ + windowed int8 attention) emits
    exactly what the plain kv_quant generate emits — speculation changes
    how many tokens one forward produces, never which tokens."""
    import dataclasses

    from crab_tpu.lm.generate import generate
    from crab_tpu.lm.spec import spec_generate

    qcfg = dataclasses.replace(CFG, kv_quant=True)
    rows = PROMPTS
    T = max(len(r) for r in rows)
    B = len(rows)
    ids = np.zeros((B, T), np.int32)
    mask = np.zeros((B, T), np.int32)
    for i, r in enumerate(rows):
        ids[i, T - len(r):] = r
        mask[i, T - len(r):] = 1
    pos = np.maximum(np.cumsum(mask, -1) - 1, 0).astype(np.int32)
    emb = jnp.take(params["embed"], jnp.asarray(ids), axis=0).astype(
        jnp.float32
    ) * mask[..., None]
    hist = np.where(mask > 0, ids, -1).astype(np.int32)

    ref = generate(
        params, qcfg, emb, jnp.asarray(mask), jnp.asarray(pos),
        max_new_tokens=14, eos_id=EOS,
    )
    got = spec_generate(
        params, qcfg, emb, jnp.asarray(mask), jnp.asarray(pos),
        max_new_tokens=14, eos_id=EOS, spec_k=3,
        prompt_hist=jnp.asarray(hist),
    )
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
    np.testing.assert_array_equal(
        np.asarray(got.num_generated), np.asarray(ref.num_generated)
    )


def test_spec_chunk_quant_matches_plain_chunk_quant(params):
    """SlotStateQ spec chunks = SlotStateQ plain chunks, including across
    chunk boundaries (quantized rows of rejected drafts get overwritten)."""
    from crab_tpu.lm.cb import SlotStateQ

    def q_state():
        state = SlotStateQ.zeros(CFG, len(PROMPTS), 96)
        for slot, ids in enumerate(PROMPTS):
            ids_j = jnp.asarray(ids, jnp.int32)[None, :]
            emb = jnp.take(params["embed"], ids_j[0], axis=0)[None].astype(
                jnp.float32
            )
            mask = jnp.ones_like(ids_j)
            pos = jnp.cumsum(mask, -1) - 1
            k, v, first, next_pos = cb_prefill(params, CFG, emb, mask, pos)
            state = deposit(state, slot, k, v, mask, first, next_pos, ids_j)
        return state

    a, b = q_state(), q_state()
    for _ in range(3):
        a, out_a, _ = cb_decode_chunk(params, CFG, a, 7, EOS)
        b, out_b, _, _ = spec_decode_chunk(params, CFG, b, 7, EOS, spec_k=3)
        np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_spec_through_continuous_engine(monkeypatch):
    """Engine-level parity: ContinuousEngine(spec_k=4) returns exactly the
    plain engine's texts, and rejects sampling engines."""
    import zlib

    from crab_tpu.core.config import crab_tiny as crab_tiny_full
    from crab_tpu.fusion.tokens import SpecialTokens
    from crab_tpu.runtime.continuous import ContinuousEngine
    from crab_tpu.runtime.engine import InferenceEngine
    from crab_tpu.runtime.model import init_crab
    from crab_tpu.tasks import registry
    from crab_tpu.tasks.registry import TaskSpec

    FCFG = crab_tiny_full(vocab_size=400 + 17)
    special = SpecialTokens(base_vocab=400)

    class StubTokenizer:
        def encode(self, text):
            out = []
            for w in text.replace(">", "> ").replace("<", " <").split():
                if w in special.token_to_id:
                    out.append(special.token_to_id[w])
                else:
                    out.append(3 + (zlib.crc32(w.encode()) % 300))
            return out

        def decode(self, ids):
            return " ".join(f"t{i}" for i in ids)

    q = FCFG.al_projector.num_query_tokens
    task = TaskSpec(
        "tiny-spec",
        lambda s: (
            "This is an audio:\n<audio_start><audio><audio_end>\n"
            f"Q: {s['question']}"
        ),
        lambda s: s["_media"],
        {"<audio>": q},
        max_new_tokens=9,
        metric="text",
    )
    monkeypatch.setitem(registry.TASKS, "tiny-spec", task)
    rng = np.random.default_rng(3)
    samples = [
        {"question": "one two one two", "_media": {
            "audio": rng.standard_normal((1, 16000)).astype(np.float32) * 0.05
        }}
        for _ in range(3)
    ]
    reqs = [{"task": "tiny-spec", "sample": s} for s in samples]
    prm = init_crab(jax.random.PRNGKey(0), FCFG)
    eng = InferenceEngine(
        FCFG, prm, StubTokenizer(), special, eos_id=399, seq_bucket=32
    )
    plain = ContinuousEngine(eng, slots=2, max_len=256, chunk=4).run(reqs)
    spec = ContinuousEngine(eng, slots=2, max_len=256, chunk=4, spec_k=4)
    got = spec.run(reqs)
    assert got == plain
    assert spec.spec_accepted >= 0  # telemetry readable
    sampling_eng = InferenceEngine(
        FCFG, prm, StubTokenizer(), special, eos_id=399, seq_bucket=32,
        temperature=1.0,
    )
    with pytest.raises(ValueError):
        ContinuousEngine(sampling_eng, slots=2, spec_k=2)


def test_spec_generate_matches_generate_gqa():
    """Speculation over the GQA flagship decoder shape (Qwen2: Hkv <
    Hq, qkv attention biases): the bench/serve flagship rows run
    spec_generate over exactly this cache layout (the KV cache carries
    Hkv heads; the verify window's attention broadcasts them to Hq), so
    lossless-greedy parity must hold for it on CPU too, not just MHA."""
    from crab_tpu.core.config import crab_qwen_tiny
    from crab_tpu.lm.generate import generate
    from crab_tpu.lm.spec import spec_generate

    qcfg = crab_qwen_tiny(vocab_size=97).decoder
    assert qcfg.num_kv_heads < qcfg.num_heads and qcfg.attention_bias
    qparams = init_llama(jax.random.PRNGKey(2), qcfg)

    rows = [PROMPTS[0], PROMPTS[1], PROMPTS[2]]
    T = max(len(r) for r in rows)
    B = len(rows)
    ids = np.zeros((B, T), np.int32)
    mask = np.zeros((B, T), np.int32)
    for i, r in enumerate(rows):
        ids[i, T - len(r):] = r
        mask[i, T - len(r):] = 1
    pos = np.maximum(np.cumsum(mask, -1) - 1, 0).astype(np.int32)
    emb = jnp.take(qparams["embed"], jnp.asarray(ids), axis=0).astype(
        jnp.float32
    ) * mask[..., None]
    hist = np.where(mask > 0, ids, -1).astype(np.int32)

    ref = generate(
        qparams, qcfg, emb, jnp.asarray(mask), jnp.asarray(pos),
        max_new_tokens=14, eos_id=EOS,
    )
    got = spec_generate(
        qparams, qcfg, emb, jnp.asarray(mask), jnp.asarray(pos),
        max_new_tokens=14, eos_id=EOS, spec_k=3,
        prompt_hist=jnp.asarray(hist),
    )
    np.testing.assert_array_equal(
        np.asarray(got.tokens), np.asarray(ref.tokens)
    )
    np.testing.assert_array_equal(
        np.asarray(got.num_generated), np.asarray(ref.num_generated)
    )
