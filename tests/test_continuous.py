"""Continuous-batching engine: token parity with the batch engine.

Scheduling (slot admission, chunked decode, mid-stream retirement) must
never change greedy results — every request's text equals what
InferenceEngine.run produces for it alone.
"""

import zlib

import numpy as np
import pytest

import jax

from crab_tpu.core.config import crab_tiny
from crab_tpu.fusion.tokens import SpecialTokens
from crab_tpu.runtime.continuous import ContinuousEngine
from crab_tpu.runtime.engine import InferenceEngine
from crab_tpu.runtime.model import init_crab
from crab_tpu.tasks import prompts
from crab_tpu.tasks.registry import TaskSpec

CFG = crab_tiny(vocab_size=400 + 17)
SPECIAL = SpecialTokens(base_vocab=400)


class StubTokenizer:
    def __init__(self, special):
        self.special = special

    def encode(self, text):
        out = []
        for w in text.replace(">", "> ").replace("<", " <").split():
            if w in self.special.token_to_id:
                out.append(self.special.token_to_id[w])
            else:
                out.append(3 + (zlib.crc32(w.encode()) % 300))
        return out

    def decode(self, ids):
        return " ".join(f"t{i}" for i in ids)


@pytest.fixture(scope="module")
def engine():
    params = init_crab(jax.random.PRNGKey(0), CFG)
    return InferenceEngine(
        CFG, params, StubTokenizer(SPECIAL), SPECIAL, eos_id=399, seq_bucket=32
    )


def _instruction(s):
    return (
        "This is an image:\n<image_start><image><image_end>\n"
        "This is an audio:\n<audio_start><audio><audio_end>\n"
        f"Please answer this question: {s['question']}"
    )


def _task(name, max_new=7):
    q = CFG.al_projector.num_query_tokens
    return TaskSpec(
        name,
        _instruction,
        lambda s: s["_media"],
        {"<image>": q, "<audio>": q},
        max_new_tokens=max_new,
        metric="text",
    )


def _media(rng):
    return {
        "image": rng.integers(0, 255, (1, 56, 56, 3)).astype(np.uint8),
        "audio": rng.standard_normal((1, 16000)).astype(np.float32) * 0.05,
    }


@pytest.mark.slow
def test_continuous_matches_batch_engine(engine, monkeypatch):
    from crab_tpu.tasks import registry

    task = _task("tiny-cb")
    monkeypatch.setitem(registry.TASKS, "tiny-cb", task)
    rng = np.random.default_rng(11)
    # different question lengths -> different prompt buckets
    samples = [
        {"question": "what sounds first", "_media": _media(rng)},
        {
            "question": "which of the instruments on the left side is "
            "playing louder than the rest of the band right now",
            "_media": _media(rng),
        },
        {"question": "who", "_media": _media(rng)},
    ]
    expected = [engine.run("tiny-cb", [s]).texts[0] for s in samples]

    cb = ContinuousEngine(engine, slots=2, max_len=256, chunk=3)
    got = cb.run([{"task": "tiny-cb", "sample": s} for s in samples])
    assert got == expected
    # all slots free at the end
    assert not bool(np.asarray(cb.state.active).any())


@pytest.mark.slow
def test_continuous_sampling(monkeypatch):
    """Sampling knobs flow into the slot decode loop: high temperature with
    different seeds gives different token streams; the same seed
    reproduces; greedy (default) is unaffected by the seed."""
    from crab_tpu.tasks import registry

    task = _task("tiny-cb-sample", max_new=8)
    monkeypatch.setitem(registry.TASKS, "tiny-cb-sample", task)
    rng = np.random.default_rng(13)
    samples = [{"question": "what sounds first", "_media": _media(rng)}]
    reqs = [{"task": "tiny-cb-sample", "sample": s} for s in samples]
    params = init_crab(jax.random.PRNGKey(0), CFG)

    def run(temperature, seed):
        eng = InferenceEngine(
            CFG, params, StubTokenizer(SPECIAL), SPECIAL, eos_id=399,
            seq_bucket=32, temperature=temperature, sample_seed=seed,
        )
        return ContinuousEngine(eng, slots=2, max_len=256, chunk=3).run(reqs)

    s1, s2, s1b = run(8.0, 1), run(8.0, 2), run(8.0, 1)
    assert s1 != s2  # 8 tokens over a ~400 vocab at T=8: collision ~0
    assert s1 == s1b
    assert run(0.0, 1) == run(0.0, 2)


def test_continuous_max_new_and_slot_reuse(engine, monkeypatch):
    from crab_tpu.tasks import registry

    task = _task("tiny-cb2")
    monkeypatch.setitem(registry.TASKS, "tiny-cb2", task)
    rng = np.random.default_rng(5)
    samples = [{"question": f"q {i}", "_media": _media(rng)} for i in range(4)]
    cb = ContinuousEngine(engine, slots=1, max_len=256, chunk=4)
    got = cb.run(
        [{"task": "tiny-cb2", "sample": s, "max_new": 5} for s in samples]
    )
    assert len(got) == 4
    for s, text in zip(samples, got):
        ref = engine.run("tiny-cb2", [s])
        ref_ids = [int(t) for t in ref.tokens[0][:5]]
        assert text == engine._decode(np.asarray(ref_ids))


@pytest.mark.slow
def test_continuous_avs_matches_batch_engine(engine, monkeypatch):
    """AVS through continuous batching: tokens AND masks match the batch
    engine (hidden-capture alignment + seg-tap plumbing)."""
    from crab_tpu.tasks import registry

    q = CFG.al_projector.num_query_tokens
    task = TaskSpec(
        "tiny-cb-avs",
        lambda s: prompts.avs_instruction(),
        lambda s: s["_media"],
        {"<image>": q, "<audio>": q},
        is_avs=True,
        max_new_tokens=8,
        metric="mask",
    )
    monkeypatch.setitem(registry.TASKS, "tiny-cb-avs", task)
    rng = np.random.default_rng(17)
    samples = [{"_media": _media(rng)} for _ in range(2)]
    cb = ContinuousEngine(engine, slots=2, max_len=128, chunk=3)
    got = cb.run_requests(
        [{"task": "tiny-cb-avs", "sample": s} for s in samples]
    )
    for s, g in zip(samples, got):
        ref = engine.run("tiny-cb-avs", [s])
        assert g["text"] == ref.texts[0]
        assert g["mask_found"] == bool(ref.mask_found[0])
        np.testing.assert_allclose(
            g["masks"], np.asarray(ref.masks[0]), rtol=2e-4, atol=2e-4
        )


def test_continuous_bad_request_isolated(engine, monkeypatch):
    """An oversized/malformed request fails alone; the rest of the stream
    still serves (per-request error isolation)."""
    from crab_tpu.tasks import registry

    task = _task("tiny-cb3")
    monkeypatch.setitem(registry.TASKS, "tiny-cb3", task)
    rng = np.random.default_rng(3)
    good = {"question": "ok", "_media": _media(rng)}
    # 72 fits the short prompt's 64-bucket + 3 tokens; the long prompt's
    # 128-bucket does not
    cb = ContinuousEngine(engine, slots=1, max_len=72, chunk=2)
    bad = {"question": "x " * 40, "_media": _media(rng)}
    out = cb.run_requests([
        {"task": "tiny-cb3", "sample": bad, "max_new": 40},
        {"task": "tiny-cb3", "sample": good, "max_new": 3},
    ])
    assert "error" in out[0] and out[0]["tokens"] == []
    assert "error" not in out[1] and len(out[1]["tokens"]) == 3


def test_continuous_post_deposit_failure_retires_slot(engine, monkeypatch):
    """If _admit fails AFTER the deposit landed on device (e.g. a device
    error surfacing at the first-token sync), the slot must be retired —
    otherwise it stays active, decodes garbage every chunk, and is never
    freed on the host side."""
    from crab_tpu.runtime import continuous as cont
    from crab_tpu.tasks import registry

    task = _task("tiny-cb4")
    monkeypatch.setitem(registry.TASKS, "tiny-cb4", task)
    rng = np.random.default_rng(9)
    samples = [
        {"question": "first poisoned", "_media": _media(rng)},
        {"question": "second fine", "_media": _media(rng)},
    ]
    expected = engine.run("tiny-cb4", [samples[1]]).texts[0]

    cb = ContinuousEngine(engine, slots=1, max_len=128, chunk=3)
    orig_admit = cb._admit
    calls = {"n": 0}

    def poisoned_admit(req, slot, **kw):
        calls["n"] += 1
        orig_admit(req, slot, **kw)  # deposit lands, req.slot is set
        if calls["n"] == 1:
            raise RuntimeError("simulated device error at first-token sync")

    monkeypatch.setattr(cb, "_admit", poisoned_admit)
    out = cb.run_requests([{"task": "tiny-cb4", "sample": s} for s in samples])
    assert "error" in out[0] and out[0]["tokens"] == []
    # the good request got the slot and decoded correctly
    assert "error" not in out[1] and out[1]["text"] == expected
    # no slot leaked active
    assert not bool(np.asarray(cb.state.active).any())


@pytest.mark.slow
def test_chunked_prefill_admission_token_parity(engine, monkeypatch):
    """prefill_chunk admission (prompt fed in pieces through the slot
    cache, decode chunks interleaved) must not change any request's
    greedy tokens — scheduling changes, results don't."""
    from crab_tpu.tasks import registry

    task = _task("tiny-cb5", max_new=9)
    monkeypatch.setitem(registry.TASKS, "tiny-cb5", task)
    rng = np.random.default_rng(21)
    samples = [
        {"question": "what sounds first in this clip", "_media": _media(rng)},
        {
            "question": "which of the instruments on the left side is "
            "playing louder than the rest of the band right now and why "
            "does it keep changing its rhythm all the time", 
            "_media": _media(rng),
        },
        {"question": "who", "_media": _media(rng)},
        {"question": "how many players are there", "_media": _media(rng)},
    ]
    expected = [engine.run("tiny-cb5", [s]).texts[0] for s in samples]

    # piece size smaller than the prompt bucket so chunking really
    # happens (prompt buckets here are 64/128), 2 slots so admissions
    # interleave with active decodes
    cb = ContinuousEngine(
        engine, slots=2, max_len=256, chunk=3, prefill_chunk=32
    )
    got = cb.run([{"task": "tiny-cb5", "sample": s} for s in samples])
    assert got == expected
    assert not bool(np.asarray(cb.state.active).any())


def test_batched_admission_token_parity(engine, monkeypatch):
    """Same-shape queued requests admit through ONE batched prefill
    program (_admit_group); tokens must equal one-at-a-time admission
    (row independence under left-padding + per-row masks)."""
    from crab_tpu.tasks import registry

    task = _task("tiny-cb6", max_new=6)
    monkeypatch.setitem(registry.TASKS, "tiny-cb6", task)
    rng = np.random.default_rng(33)
    samples = [
        {"question": f"which thing sounds number {i}", "_media": _media(rng)}
        for i in range(4)
    ]
    expected = [engine.run("tiny-cb6", [s]).texts[0] for s in samples]

    cb = ContinuousEngine(engine, slots=4, max_len=128, chunk=3)
    calls = {"group": 0}
    orig_group = cb._admit_group

    def counting_group(items):
        calls["group"] += 1
        assert len(items) == 4  # all four share a shape signature
        return orig_group(items)

    monkeypatch.setattr(cb, "_admit_group", counting_group)
    got = cb.run([{"task": "tiny-cb6", "sample": s} for s in samples])
    assert calls["group"] == 1
    assert got == expected
    assert not bool(np.asarray(cb.state.active).any())


@pytest.mark.slow
def test_continuous_kv_quant_matches_batch_kv_quant(engine, monkeypatch):
    """A kv_quant decoder config selects the int8 slot cache (SlotStateQ);
    the continuous engine's texts must match the batch engine running the
    same kv_quant config, with and without speculation."""
    import dataclasses

    from crab_tpu.lm.cb import SlotStateQ
    from crab_tpu.tasks import registry

    task = _task("tiny-cb-q")
    monkeypatch.setitem(registry.TASKS, "tiny-cb-q", task)
    rng = np.random.default_rng(17)
    samples = [
        {"question": "what sounds first", "_media": _media(rng)},
        {"question": "who is playing the long instrument over there",
         "_media": _media(rng)},
    ]
    qcfg = dataclasses.replace(
        CFG, decoder=dataclasses.replace(CFG.decoder, kv_quant=True)
    )
    q_engine = InferenceEngine(
        qcfg, engine.params, StubTokenizer(SPECIAL), SPECIAL, eos_id=399,
        seq_bucket=32, pack=False,
    )
    expected = [q_engine.run("tiny-cb-q", [s]).texts[0] for s in samples]

    reqs = [{"task": "tiny-cb-q", "sample": s} for s in samples]
    cb = ContinuousEngine(q_engine, slots=2, max_len=256, chunk=3)
    assert isinstance(cb.state, SlotStateQ)
    assert cb.run(reqs) == expected
    spec = ContinuousEngine(q_engine, slots=2, max_len=256, chunk=3, spec_k=3)
    assert spec.run(reqs) == expected


@pytest.mark.slow
def test_continuous_spec_adaptive_token_parity_and_fallback(
    engine, monkeypatch
):
    """spec_adaptive must (a) return identical texts (drafts are always
    verified — switching schedules can't change tokens) and (b) actually
    fall back: random tiny-model outputs have ~zero n-gram acceptance,
    so after the optimistic opening chunks the EMA drops below the
    break-even threshold and plain chunks take over, with spec probes
    every 8th chunk."""
    from crab_tpu.tasks import registry

    task = _task("tiny-cb-ad", max_new=24)
    monkeypatch.setitem(registry.TASKS, "tiny-cb-ad", task)
    rng = np.random.default_rng(23)
    samples = [
        {"question": "what sounds first", "_media": _media(rng)},
        {"question": "who is playing the long instrument over there",
         "_media": _media(rng)},
        {"question": "who", "_media": _media(rng)},
    ]
    expected = [engine.run("tiny-cb-ad", [s]).texts[0] for s in samples]
    reqs = [{"task": "tiny-cb-ad", "sample": s} for s in samples]

    ad = ContinuousEngine(
        engine, slots=2, max_len=256, chunk=3, spec_k=3, spec_adaptive=True
    )
    assert ad.run(reqs) == expected
    assert ad.spec_chunks + ad.plain_chunks > 0
    # random outputs -> acceptance ~0 -> the engine must have fallen back
    assert ad.plain_chunks > 0, (
        f"ema={ad._spec_ema} never dropped below {ad._spec_threshold}"
    )
    # probes keep some spec chunks alive even in the low-acceptance regime
    assert ad.spec_chunks > 0
    # without the flag, every chunk speculates
    fixed = ContinuousEngine(engine, slots=2, max_len=256, chunk=3, spec_k=3)
    assert fixed.run(reqs) == expected
    assert fixed.plain_chunks == 0


@pytest.mark.slow
def test_continuous_sharded_matches_unsharded(engine, monkeypatch):
    """Multi-chip serving: the continuous engine over a TP=4/FSDP=2
    sharded InferenceEngine produces the same texts as the unsharded
    engine — GSPMD propagates through prefill, deposit, the chunk loop,
    and retirement (the slot state starts unsharded; the compiler
    inserts the collectives)."""
    from crab_tpu.core.mesh import MeshSpec, make_mesh
    from crab_tpu.tasks import registry

    assert jax.device_count() >= 8
    task = _task("tiny-cb-sh")
    monkeypatch.setitem(registry.TASKS, "tiny-cb-sh", task)
    rng = np.random.default_rng(23)
    samples = [
        {"question": "what instrument is sounding", "_media": _media(rng)},
        {"question": "who is playing over there now and why is it loud",
         "_media": _media(rng)},
        {"question": "is it a drum", "_media": _media(rng)},
    ]
    reqs = [{"task": "tiny-cb-sh", "sample": s} for s in samples]
    expected = ContinuousEngine(engine, slots=2, max_len=256, chunk=3).run(
        reqs
    )

    mesh = make_mesh(MeshSpec(data=2, model=4))
    sh_engine = InferenceEngine(
        CFG, engine.params, StubTokenizer(SPECIAL), SPECIAL, eos_id=399,
        seq_bucket=32, pack=False, mesh=mesh,
    )
    cb = ContinuousEngine(sh_engine, slots=2, max_len=256, chunk=3)
    assert cb.run(reqs) == expected


@pytest.mark.slow
def test_continuous_mixed_ntp_avs_yuv_trace(engine, monkeypatch):
    """The serving-bench trace shape: NTP requests with codec-native
    video_yuv media interleaved with AVS (seg) requests, through ONE
    ContinuousEngine run. Texts and masks match per-request batch-engine
    runs; AVS rows produce masks inside the mixed stream."""
    from crab_tpu.tasks import registry

    q = CFG.al_projector.num_query_tokens
    ntp = TaskSpec(
        "tiny-mix-ntp",
        lambda s: (
            "This is a video:\n<video_start><video><video_end>\n"
            "This is an audio:\n<audio_start><audio><audio_end>\n"
            f"Please answer this question: {s['question']}"
        ),
        lambda s: s["_media"],
        {"<video>": 2 * q, "<audio>": q},
        max_new_tokens=6,
    )
    avs = TaskSpec(
        "tiny-mix-avs",
        lambda s: prompts.avs_instruction(),
        lambda s: s["_media"],
        {"<image>": q, "<audio>": q},
        is_avs=True,
        max_new_tokens=6,
        metric="mask",
    )
    monkeypatch.setitem(registry.TASKS, "tiny-mix-ntp", ntp)
    monkeypatch.setitem(registry.TASKS, "tiny-mix-avs", avs)
    rng = np.random.default_rng(23)
    trace = []
    for i in range(4):
        if i % 2:
            trace.append({
                "task": "tiny-mix-avs",
                "sample": {"_media": _media(rng)},
            })
        else:
            trace.append({
                "task": "tiny-mix-ntp",
                "sample": {
                    "question": "what plays " + "now " * (3 * i),
                    "_media": {
                        "video_yuv": rng.integers(0, 256, (2, 84, 56)).astype(np.uint8),
                        "audio": rng.standard_normal((1, 16000)).astype(np.float32) * 0.05,
                    },
                },
            })

    cb = ContinuousEngine(engine, slots=2, max_len=256, chunk=3)
    got = cb.run_requests(trace)
    for r, o in zip(trace, got):
        ref = engine.run(r["task"], [r["sample"]])
        assert o["text"] == ref.texts[0]
        if r["task"] == "tiny-mix-avs":
            assert o["masks"] is not None
            np.testing.assert_allclose(
                o["masks"], ref.masks[0], rtol=2e-5, atol=2e-5
            )


def test_spec_threshold_tracks_gqa_ratio(engine):
    """The adaptive gate's break-even threshold is backbone-aware: the
    in-engine verify penalty scales with KV traffic (slot scatters +
    window masks), so a GQA decoder must get a LOWER acceptance
    threshold than MHA at the same k — measured on chip both ways
    (SERVE_r05.json: MHA spec at par at 0.40; SERVE_r05_qwen_builder
    .json: GQA spec winning at ~0.35, where the MHA threshold would
    have held the gate on plain)."""
    from crab_tpu.core.config import crab_qwen_tiny

    qcfg = crab_qwen_tiny(vocab_size=400 + 17)
    qparams = init_crab(jax.random.PRNGKey(0), qcfg)
    qengine = InferenceEngine(
        qcfg, qparams, StubTokenizer(SPECIAL), SPECIAL, eos_id=399,
        seq_bucket=32,
    )
    mha = ContinuousEngine(
        engine, slots=2, max_len=64, chunk=3, spec_k=4, spec_adaptive=True
    )
    gqa = ContinuousEngine(
        qengine, slots=2, max_len=64, chunk=3, spec_k=4, spec_adaptive=True
    )
    assert CFG.decoder.num_kv_heads == CFG.decoder.num_heads  # MHA tiny
    assert qcfg.decoder.num_kv_heads < qcfg.decoder.num_heads  # GQA tiny
    # MHA keeps the r03/r05-validated ~0.46 at k=4
    assert 0.44 < mha._spec_threshold < 0.48
    assert gqa._spec_threshold < mha._spec_threshold
    # the GQA floor is the batch micro model (in-engine penalty -> 1)
    micro = 1.0 + (2.3 + 1.4 * 4) / 17.3
    assert gqa._spec_threshold >= 1.0 - 1.0 / micro - 1e-9
