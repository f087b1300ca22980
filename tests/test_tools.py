"""Tests for the offline scorer CLI, diagnostics, and router analysis."""

import json

import numpy as np

import jax

from crab_tpu.cli.score import score_arig, score_avqa, score_avs, score_avvp
from crab_tpu.core.config import crab_tiny
from crab_tpu.runtime.model import init_crab
from crab_tpu.utils.diagnostics import StageTimer, nan_guard
from crab_tpu.utils.router_analysis import analyze, route_entropy


def test_score_avqa():
    recs = [
        {"predict": "It is the <answer>piano</answer>.", "answer": "piano",
         "question_type": "loc"},
        {"predict": "guitar", "answer": "piano", "question_type": "loc"},
        {"predict": "two", "answer": "two", "question_type": "count"},
    ]
    out = score_avqa(recs)
    assert out["n"] == 3
    np.testing.assert_allclose(out["accuracy"], 2 / 3)
    np.testing.assert_allclose(out["acc[loc]"], 0.5)
    np.testing.assert_allclose(out["acc[count]"], 1.0)


def test_score_arig():
    recs = [
        {
            "predict": "Its coordinate of top left corner is (10,20) and "
                       "coordinate of bottom right corner is (100,200)",
            "gt_box": [10, 20, 100, 200],
        },
        {"predict": "no box here", "gt_box": [0, 0, 10, 10]},
    ]
    out = score_arig(recs)
    assert out["iou@0.5"] == 0.5
    assert out["iou"] > 0.49


def test_score_avvp_and_avs():
    rng = np.random.default_rng(0)
    m = (rng.random((25, 10)) > 0.7).astype(float)
    rec = {k: m.tolist() for k in ("SO_a", "SO_v", "SO_av", "GT_a", "GT_v", "GT_av")}
    out = score_avvp([rec])
    # predictions == ground truth -> perfect F1 everywhere
    for k, v in out.items():
        if k != "n":
            np.testing.assert_allclose(v, 1.0)
    avs = [
        {"image_path": f"/d/v1/frames/{i}.jpg", "iou": 0.5, "fscore": 0.6}
        for i in range(5)
    ] + [
        {"image_path": f"/d/v2/frames/{i}.jpg", "iou": 1.0, "fscore": 0.8}
        for i in range(5)
    ]
    out = score_avs(avs)
    np.testing.assert_allclose(out["miou"], 0.75)
    assert out["videos"] == 2


def test_router_analysis_and_diag():
    cfg = crab_tiny()
    params = init_crab(jax.random.PRNGKey(0), cfg)
    report = analyze(params["decoder"])
    assert "q" in report and len(report["q"]["expert_cosine"]) == 3
    # uniform routing -> max entropy ln(3)
    L, E = cfg.decoder.num_layers, cfg.decoder.lora.num_experts
    h = route_entropy(np.full((L, E), 1.0 / E))
    np.testing.assert_allclose(h, np.log(E), rtol=1e-6)

    timer = StageTimer()
    with timer.stage("x"):
        pass
    assert "x" in timer.summary()
    bad = nan_guard({"a": np.ones(3), "b": np.array([np.nan])}, raise_on_nan=False)
    assert bad == ["b"]


def test_prefetch_loader_order_and_errors():
    import time

    from crab_tpu.runtime.loader import PrefetchLoader, batched

    def slow_sq(x):
        time.sleep(0.01 * (x % 3))
        return x * x

    out = list(PrefetchLoader(slow_sq, list(range(20)), depth=4, workers=3))
    assert out == [i * i for i in range(20)]

    def boom(x):
        if x == 3:
            raise ValueError("boom")
        return x

    with pytest.raises(ValueError, match="boom"):
        list(PrefetchLoader(boom, list(range(6)), depth=2, workers=2))

    assert batched([1, 2, 3, 4, 5], 2) == [[1, 2], [3, 4], [5]]


import pytest  # noqa: E402


def test_avvp_text_bridge_roundtrip():
    """Templated answer text -> matrices -> F1 must equal direct matrices."""
    from crab_tpu.tasks.parsers import AVVP_CLASSES, avvp_text_to_matrices

    text = (
        "<audio_event>Dog</audio_event> <range>0-4</range> "
        "<visual_event>Dog</visual_event> <range>2-6</range> "
        "<audio_event>Violin fiddle</audio_event> <range>5-10</range>"
    )
    a, v, av = avvp_text_to_matrices(text)
    dog = AVVP_CLASSES.index("Dog")
    violin = AVVP_CLASSES.index("Violin_fiddle")
    assert a[dog, :4].all() and not a[dog, 4:].any()
    assert v[dog, 2:6].all() and not v[dog, :2].any()
    assert a[violin, 5:].all()
    np.testing.assert_array_equal(av, a * v)
    # unknown event names are dropped silently
    a2, _, _ = avvp_text_to_matrices("<audio_event>Theremin</audio_event>")
    assert not a2.any()
    # score_avvp bridges from predict/label text and agrees with matrices
    rec_text = {"predict": text, "label": text}
    rec_mat = {
        "SO_a": a.tolist(), "SO_v": v.tolist(), "SO_av": av.tolist(),
        "GT_a": a.tolist(), "GT_v": v.tolist(), "GT_av": av.tolist(),
    }
    out_t, out_m = score_avvp([rec_text]), score_avvp([rec_mat])
    for k in out_m:
        np.testing.assert_allclose(out_t[k], out_m[k])


def test_score_ave():
    from crab_tpu.cli.score import score_ave

    recs = [
        # exact match via gt fields
        {"predict": "<event>Church bell</event> <range>2-8</range>",
         "event": "church bell", "start_time": 2, "end_time": 8},
        # wrong event entirely
        {"predict": "<event>Dog</event> <range>0-10</range>",
         "event": "church bell", "start_time": 0, "end_time": 10},
    ]
    out = score_ave(recs)
    assert out["n"] == 2
    np.testing.assert_allclose(out["event_accuracy"], 0.5)
    # rec 1: all 10 seconds correct (bg before/after matches);
    # rec 2: 0 correct
    np.testing.assert_allclose(out["second_accuracy"], 0.5)
    np.testing.assert_allclose(out["range_iou"], 0.5)  # (1.0 + 0.0) / 2
    # gt as tagged text instead of fields
    out2 = score_ave(
        [{"predict": "<event>Dog</event> <range>0-5</range>",
          "output": "<event>Dog</event> <range>0-5</range>"}]
    )
    np.testing.assert_allclose(out2["event_accuracy"], 1.0)
    np.testing.assert_allclose(out2["second_accuracy"], 1.0)


def test_dump_token_routes(tmp_path):
    from crab_tpu.utils.diagnostics import dump_token_routes

    L, B, T, E = 3, 2, 5, 4
    rng = np.random.default_rng(0)
    routes = {k: rng.random((L, B, T, E)) for k in ("q", "k", "v", "o")}
    d = dump_token_routes(routes, str(tmp_path), step=7, sample=1)
    for k in ("q", "k", "v", "o"):
        arr = np.load(f"{d}/{k}_token_weight.npy")
        assert arr.shape == (T, L, 1, E)  # reference layout (seq, layers, 1, E)
        np.testing.assert_allclose(arr[:, :, 0, :], routes[k][:, 1].transpose(1, 0, 2))


def test_tb_writer_roundtrip(tmp_path):
    """Our dependency-free event writer must be readable by TensorFlow's
    own summary reader (format oracle)."""
    tf_reader = pytest.importorskip(
        "tensorflow.python.summary.summary_iterator"
    )
    from crab_tpu.utils.tb_writer import TBWriter

    w = TBWriter(str(tmp_path))
    expected = []
    for i in range(4):
        w.add_scalar("train/loss", 1.0 / (i + 1), i)
        expected.append((i, "train/loss", 1.0 / (i + 1)))
    w.close()
    import os as _os

    f = str(tmp_path / _os.listdir(tmp_path)[0])
    events = list(tf_reader.summary_iterator(f))
    assert events[0].file_version == "brain.Event:2"
    got = [
        (e.step, v.tag, v.simple_value)
        for e in events[1:]
        for v in e.summary.value
    ]
    assert len(got) == 4
    for (s, t, v), (es, et, ev) in zip(got, expected):
        assert (s, t) == (es, et)
        np.testing.assert_allclose(v, ev, rtol=1e-6)


def test_score_avs_skips_unfound_rows():
    """evaluate.py (without --score-unfound) writes metric-less rows for
    samples whose decode lacked the <mask_i> tokens — the scorer must
    count them, not crash (reference skip semantics)."""
    from crab_tpu.cli.score import score_avs

    out = score_avs([
        {"vid": "a", "miou": 0.5, "fscore": 0.6},
        {"vid": "a", "predict": "no masks here", "mask_found": False},
    ])
    assert out["videos"] == 1
    assert out["skipped_unfound"] == 1
    assert abs(out["miou"] - 0.5) < 1e-9


def test_avvp_bridge_accepts_raw_label_tags():
    """AVVP annotation labels use raw <audio>/<visual> tags (the
    reference renames them to *_event only in the train builder); the
    GT bridge must parse both forms identically."""
    import numpy as np

    from crab_tpu.tasks.parsers import avvp_text_to_matrices

    raw = "<audio>Speech</audio> from 2 to 5 seconds"
    renamed = "<audio_event>Speech</audio_event> from 2 to 5 seconds"
    a1, v1, av1 = avvp_text_to_matrices(raw)
    a2, v2, av2 = avvp_text_to_matrices(renamed)
    assert a1.sum() == 3 and np.array_equal(a1, a2)
    assert np.array_equal(v1, v2) and np.array_equal(av1, av2)


def test_score_avqa_exact_match_not_containment():
    """Gold 'no' must NOT match a prediction of 'normal'/'not really'
    (the containment failure mode); --loose restores containment."""
    recs = [
        {"predict": "<answer>normal</answer>", "answer": "no"},
        {"predict": "<answer>not really</answer>", "answer": "no"},
        {"predict": "<answer>no</answer>", "answer": "no"},
        {"predict": "<answer>no.</answer>", "answer": "no"},  # normalized
    ]
    strict = score_avqa(recs)
    np.testing.assert_allclose(strict["accuracy"], 2 / 4)
    loose = score_avqa(recs, loose=True)
    np.testing.assert_allclose(loose["accuracy"], 1.0)


def test_score_avcap_bleu():
    """BLEU-4 sanity: perfect match = 1.0; cross-checked against nltk's
    corpus_bleu formulation on a hand-computable case."""
    from crab_tpu.cli.score import score_avcap

    recs = [{"predict": "a dog playing a piano on stage",
             "caption": "a dog playing a piano on stage"}]
    out = score_avcap(recs)
    np.testing.assert_allclose(out["bleu4"], 1.0)
    np.testing.assert_allclose(out["bleu1"], 1.0)

    # partial overlap: pred 4 tokens, 3 unigram matches, 2 bigrams,
    # 1 trigram, 0 four-grams -> bleu4 == 0, bleu2 = bp*sqrt(3/4 * 2/3)
    recs = [{"predict": "the cat sat down",
             "caption": "the cat sat on the mat"}]
    out = score_avcap(recs)
    import math
    bp = math.exp(1 - 6 / 4)
    np.testing.assert_allclose(out["bleu1"], bp * 3 / 4, rtol=1e-9)
    np.testing.assert_allclose(
        out["bleu2"], bp * math.sqrt((3 / 4) * (2 / 3)), rtol=1e-9
    )
    assert out["bleu4"] == 0.0

    # multi-reference clipping: gold list, best ref is used per n-gram
    recs = [{"predict": "a red ball",
             "caption": ["a red ball", "the red ball bounces"]}]
    out = score_avcap(recs)
    np.testing.assert_allclose(out["bleu3"], 1.0)


def test_router_analysis_fused_layout():
    """expert_embedding handles the packed serving layout (o/down LoRA
    fused to RA/Bd by pack_decoder): un-flattens Bd with num_experts and
    matches the canonical-layout embedding; without num_experts it fails
    loudly instead of KeyError-ing."""
    import pytest as _pytest

    from crab_tpu.lm.llama import init_llama
    from crab_tpu.lm.pack import pack_decoder
    from crab_tpu.utils.router_analysis import analyze, expert_embedding

    cfg = crab_tiny().decoder
    params = init_llama(jax.random.PRNGKey(5), cfg)
    canon = expert_embedding({"layers": params["layers"]}, "o")
    packed = pack_decoder(params, cfg)
    fused = expert_embedding(
        {"layers": packed["layers"]}, "o", num_experts=cfg.lora.num_experts
    )
    np.testing.assert_allclose(canon["cosine"], fused["cosine"], rtol=1e-6)
    with _pytest.raises(ValueError, match="num_experts"):
        expert_embedding({"layers": packed["layers"]}, "o")
    rep = analyze(packed, num_experts=cfg.lora.num_experts)
    assert "o" in rep
