"""End-to-end inference-engine tests on the tiny config (CPU mesh)."""

import zlib
import numpy as np
import pytest

import jax

from crab_tpu.core.config import crab_tiny
from crab_tpu.fusion.tokens import SpecialTokens
from crab_tpu.runtime.engine import InferenceEngine
from crab_tpu.runtime.model import init_crab
from crab_tpu.tasks.registry import TaskSpec
from crab_tpu.tasks import prompts


class StubTokenizer:
    """Deterministic word-hash tokenizer for tests."""

    def __init__(self, special: SpecialTokens):
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


CFG = crab_tiny(vocab_size=400 + 17)
SPECIAL = SpecialTokens(base_vocab=400)


@pytest.fixture(scope="module")
def engine():
    params = init_crab(jax.random.PRNGKey(0), CFG)
    return InferenceEngine(
        CFG,
        params,
        StubTokenizer(SPECIAL),
        SPECIAL,
        eos_id=399,  # unlikely under random weights
        seq_bucket=32,
    )


def _tiny_av_task(name, is_avs=False, avss_head=False):
    q = CFG.al_projector.num_query_tokens
    return TaskSpec(
        name,
        lambda s: prompts.avs_instruction(),  # image+audio prompt fits the media
        lambda s: s["_media"],
        {"<image>": q, "<audio>": q},
        is_avs=is_avs,
        avss_head=avss_head,
        max_new_tokens=8,
        metric="mask" if is_avs else "text",
    )


def _media(rng, frames=1):
    return {
        "image": rng.integers(0, 255, (frames, 56, 56, 3)).astype(np.uint8),
        "audio": rng.standard_normal((1, 16000)).astype(np.float32) * 0.05,
    }


def test_ntp_batch(engine, monkeypatch):
    from crab_tpu.tasks import registry

    task = _tiny_av_task("tiny-ave")
    monkeypatch.setitem(registry.TASKS, "tiny-ave", task)
    rng = np.random.default_rng(0)
    samples = [{"media": _media(rng)} for _ in range(2)]
    out = engine.run("tiny-ave", samples)
    assert len(out.texts) == 2
    assert out.tokens.shape == (2, 8)
    assert out.masks is None
    # deterministic: same inputs -> same tokens
    out2 = engine.run("tiny-ave", samples)
    np.testing.assert_array_equal(out.tokens, out2.tokens)


def test_avs_batch(engine, monkeypatch):
    from crab_tpu.tasks import registry

    task = _tiny_av_task("tiny-s4", is_avs=True)
    monkeypatch.setitem(registry.TASKS, "tiny-s4", task)
    rng = np.random.default_rng(1)
    samples = [{"media": _media(rng)}]
    out = engine.run("tiny-s4", samples)
    assert out.masks is not None
    assert out.masks.shape == (1, 1, CFG.seg.output_mask_size, CFG.seg.output_mask_size)
    assert out.mask_found is not None
    # with random weights the model almost surely didn't emit <mask_i>
    assert out.mask_found.dtype == bool


def test_avss_head(engine, monkeypatch):
    from crab_tpu.tasks import registry

    task = _tiny_av_task("tiny-avss", is_avs=True, avss_head=True)
    monkeypatch.setitem(registry.TASKS, "tiny-avss", task)
    rng = np.random.default_rng(2)
    out = engine.run("tiny-avss", [{"media": _media(rng)}])
    assert out.masks.shape == (
        1,
        CFG.seg.avss_num_classes,
        CFG.seg.output_mask_size,
        CFG.seg.output_mask_size,
    )


def test_route_telemetry(engine, monkeypatch):
    from crab_tpu.tasks import registry

    task = _tiny_av_task("tiny-route")
    monkeypatch.setitem(registry.TASKS, "tiny-route", task)
    rng = np.random.default_rng(3)
    routes = engine.route_telemetry("tiny-route", [{"media": _media(rng)}])
    L = CFG.decoder.num_layers
    E = CFG.decoder.lora.num_experts
    assert routes.shape == (L, E)
    # rows are softmax distributions
    np.testing.assert_allclose(routes.sum(-1), np.ones(L), rtol=1e-4)


def test_run_stream_matches_run(engine, monkeypatch):
    from crab_tpu.tasks import registry

    task = _tiny_av_task("tiny-stream")
    monkeypatch.setitem(registry.TASKS, "tiny-stream", task)
    rng = np.random.default_rng(4)
    batches = [[{"media": _media(rng)}] for _ in range(3)]
    outs = engine.run_stream("tiny-stream", batches)
    assert len(outs) == 3
    for samples, out in zip(batches, outs):
        ref = engine.run("tiny-stream", samples)
        np.testing.assert_array_equal(out.tokens, ref.tokens)


def test_server_dynamic_batching(engine, monkeypatch):
    from crab_tpu.runtime.server import CrabServer
    from crab_tpu.tasks import registry

    task = _tiny_av_task("tiny-srv")
    monkeypatch.setitem(registry.TASKS, "tiny-srv", task)
    rng = np.random.default_rng(5)
    server = CrabServer(engine, max_batch=2, max_wait_ms=20)
    try:
        futs = [server.submit("tiny-srv", {"media": _media(rng)}) for _ in range(5)]
        results = [f.result(timeout=300) for f in futs]
    finally:
        server.shutdown(drain=False)
    assert len(results) == 5
    for r in results:
        assert r.tokens.shape == (8,)
        assert r.latency_s >= 0
    # determinism: same media resubmitted gives identical tokens
    m = {"media": _media(np.random.default_rng(6))}
    server2 = CrabServer(engine, max_batch=1, max_wait_ms=1)
    try:
        a = server2.submit("tiny-srv", m).result(timeout=300)
        b = server2.submit("tiny-srv", m).result(timeout=300)
    finally:
        server2.shutdown(drain=False)
    np.testing.assert_array_equal(a.tokens, b.tokens)


def test_engine_sharded_mesh(monkeypatch):
    """Engine with a DP+TP mesh produces the same tokens as single-device."""
    import jax as _jax

    from crab_tpu.core.mesh import MeshSpec, make_mesh
    from crab_tpu.runtime.model import init_crab
    from crab_tpu.tasks import registry

    task = _tiny_av_task("tiny-mesh")
    monkeypatch.setitem(registry.TASKS, "tiny-mesh", task)
    params = init_crab(_jax.random.PRNGKey(0), CFG)
    base = InferenceEngine(CFG, params, StubTokenizer(SPECIAL), SPECIAL, eos_id=399)
    mesh = make_mesh(MeshSpec(data=2, model=4))
    sharded = InferenceEngine(
        CFG, params, StubTokenizer(SPECIAL), SPECIAL, eos_id=399, mesh=mesh
    )
    rng = np.random.default_rng(7)
    samples = [{"media": _media(rng)} for _ in range(2)]
    a = base.run("tiny-mesh", samples)
    b = sharded.run("tiny-mesh", samples)
    np.testing.assert_array_equal(a.tokens, b.tokens)


def test_audio_pcm16_h2d_exact(engine):
    """The engine ships audio as PCM16 (half the H2D bytes); for
    PCM16-representable sources (all WAV data) the device-side rescale in
    encode_audio reproduces the float pipeline exactly."""
    import jax.numpy as jnp

    from crab_tpu.runtime.model import encode_audio

    rng = np.random.default_rng(3)
    pcm = rng.integers(-32768, 32767, (1, 2, 16000), np.int64)
    f32 = (pcm / 32768.0).astype(np.float32)

    mb = engine._media_batch([{"audio": f32[0]}])
    assert mb["audio"].dtype == jnp.int16
    np.testing.assert_array_equal(np.asarray(mb["audio"][0]), pcm[0].astype(np.int16))

    a = encode_audio(engine.params, engine.cfg, jnp.asarray(f32))
    b = encode_audio(engine.params, engine.cfg, mb["audio"])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)


def test_bucket_padding_invariance(monkeypatch):
    """The same sample padded into different prompt buckets (more left
    padding) must decode identically — any leak through the additive
    mask or position ids would show up here."""
    from crab_tpu.tasks import registry

    task = _tiny_av_task("tiny-bucket")
    monkeypatch.setitem(registry.TASKS, "tiny-bucket", task)
    params = init_crab(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(23)
    sample = {"_media": _media(rng)}
    outs = []
    for bucket in (32, 96):
        eng = InferenceEngine(
            CFG, params, StubTokenizer(SPECIAL), SPECIAL, eos_id=399,
            seq_bucket=bucket,
        )
        outs.append(eng.run("tiny-bucket", [sample]))
    np.testing.assert_array_equal(outs[0].tokens, outs[1].tokens)


def test_batch_composition_invariance(engine, monkeypatch):
    """A sample decodes to the same tokens alone and inside a batch with
    unrelated samples (no cross-sample leakage through the bank layout,
    padding, or attention)."""
    from crab_tpu.tasks import registry

    task = _tiny_av_task("tiny-compose")
    monkeypatch.setitem(registry.TASKS, "tiny-compose", task)
    rng = np.random.default_rng(31)
    samples = [{"_media": _media(rng)} for _ in range(3)]
    batch = engine.run("tiny-compose", samples)
    for i, s in enumerate(samples):
        solo = engine.run("tiny-compose", [s])
        np.testing.assert_array_equal(solo.tokens[0], batch.tokens[i])


def test_spec_k_engine_parity(engine, monkeypatch):
    """InferenceEngine(spec_k=4) is bit-identical to the plain engine on
    the batch path (NTP + AVS), and rejects incompatible configs."""
    import dataclasses

    from crab_tpu.tasks import registry
    from crab_tpu.runtime.model import init_crab as _init

    ntp = _tiny_av_task("tiny-spec-ntp")
    avs = _tiny_av_task("tiny-spec-avs", is_avs=True)
    monkeypatch.setitem(registry.TASKS, "tiny-spec-ntp", ntp)
    monkeypatch.setitem(registry.TASKS, "tiny-spec-avs", avs)
    rng = np.random.default_rng(41)
    samples = [{"_media": _media(rng)} for _ in range(2)]

    spec_eng = InferenceEngine(
        CFG, engine.params, StubTokenizer(SPECIAL), SPECIAL, eos_id=399,
        seq_bucket=32, pack=False, spec_k=4,
    )
    ref = engine.run("tiny-spec-ntp", samples)
    got = spec_eng.run("tiny-spec-ntp", samples)
    np.testing.assert_array_equal(got.tokens, ref.tokens)
    assert got.texts == ref.texts

    ref_avs = engine.run("tiny-spec-avs", samples[:1])
    got_avs = spec_eng.run("tiny-spec-avs", samples[:1])
    np.testing.assert_array_equal(got_avs.tokens, ref_avs.tokens)
    np.testing.assert_array_equal(got_avs.mask_found, ref_avs.mask_found)
    np.testing.assert_allclose(
        got_avs.masks, ref_avs.masks, rtol=2e-4, atol=2e-4
    )

    with pytest.raises(ValueError):
        InferenceEngine(
            CFG, engine.params, StubTokenizer(SPECIAL), SPECIAL,
            eos_id=399, temperature=0.7, spec_k=2,
        )
    # kv_quant + spec_k composes: spec_generate runs over the int8 slot
    # cache and must match the plain kv_quant engine's tokens
    qcfg = dataclasses.replace(
        CFG, decoder=dataclasses.replace(CFG.decoder, kv_quant=True)
    )
    q_ref = InferenceEngine(
        qcfg, engine.params, StubTokenizer(SPECIAL), SPECIAL,
        eos_id=399, seq_bucket=32, pack=False,
    ).run("tiny-spec-ntp", samples)
    q_spec = InferenceEngine(
        qcfg, engine.params, StubTokenizer(SPECIAL), SPECIAL,
        eos_id=399, seq_bucket=32, pack=False, spec_k=4,
    ).run("tiny-spec-ntp", samples)
    np.testing.assert_array_equal(q_spec.tokens, q_ref.tokens)


def test_video_yuv_wire_token_parity(engine, monkeypatch):
    """Shipping codec-native I420 planes + device YUV->RGB is
    token-identical to shipping the host-converted RGB of the SAME
    planes (the conversions are the same integer math)."""
    from crab_tpu.media.video import yuv420_to_rgb_host
    from crab_tpu.tasks import registry

    q = CFG.al_projector.num_query_tokens
    task = TaskSpec(
        "tiny-avqa-vid",
        lambda s: prompts.avqa_instruction("what sounds?"),
        lambda s: s["_media"],
        {"<video>": 2 * q, "<audio>": q},
        max_new_tokens=8,
    )
    monkeypatch.setitem(registry.TASKS, "tiny-avqa-vid", task)
    rng = np.random.default_rng(7)
    packed = rng.integers(0, 256, (2, 2, 84, 56)).astype(np.uint8)  # B,T,H*1.5,W
    audio = rng.standard_normal((2, 1, 16000)).astype(np.float32) * 0.05

    outs = []
    for form in ("rgb", "yuv"):
        samples = []
        for b in range(2):
            media = (
                {"video": yuv420_to_rgb_host(packed[b]), "audio": audio[b]}
                if form == "rgb"
                else {"video_yuv": packed[b], "audio": audio[b]}
            )
            samples.append({"media": media})
        outs.append(engine.run("tiny-avqa-vid", samples))
    np.testing.assert_array_equal(outs[0].tokens, outs[1].tokens)


def test_wire_video_engine_mode(monkeypatch):
    """wire_video='yuv420' converts RGB media at upload; the engine runs
    and its lens/splice layout matches the RGB engine's."""
    from crab_tpu.tasks import registry

    params = init_crab(jax.random.PRNGKey(0), CFG)
    eng = InferenceEngine(
        CFG, params, StubTokenizer(SPECIAL), SPECIAL, eos_id=399,
        seq_bucket=32, wire_video="yuv420",
    )
    q = CFG.al_projector.num_query_tokens
    task = TaskSpec(
        "tiny-avqa-vid2",
        lambda s: prompts.avqa_instruction("what sounds?"),
        lambda s: s["_media"],
        {"<video>": 2 * q, "<audio>": q},
        max_new_tokens=4,
    )
    monkeypatch.setitem(registry.TASKS, "tiny-avqa-vid2", task)
    rng = np.random.default_rng(3)
    samples = [{
        "media": {
            "video": rng.integers(0, 255, (2, 56, 56, 3)).astype(np.uint8),
            "audio": rng.standard_normal((1, 16000)).astype(np.float32) * 0.05,
        }
    }]
    out = eng.run("tiny-avqa-vid2", samples)
    assert out.tokens.shape == (1, 4)
