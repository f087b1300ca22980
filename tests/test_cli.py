"""End-to-end CLI tests on the tiny config (real reference assets)."""

import json
import os

import numpy as np
import pytest

ASSETS = "/root/reference/assets/example"

pytestmark = [
    pytest.mark.skipif(
        not os.path.exists(ASSETS), reason="reference assets missing"
    ),
    pytest.mark.slow,  # e2e CLI runs: nightly lane
]


def test_quick_start_cli(tmp_path):
    from crab_tpu.cli.quick_start import main

    examples = [
        {
            "task": "s4",
            "audio_path": f"{ASSETS}/s4/audio.wav",
            "image_path": f"{ASSETS}/s4/0.jpg",
            "mask_path": f"{ASSETS}/s4/0.png",
        },
        {
            "task": "arig",
            "audio_path": f"{ASSETS}/arig/audio.wav",
            "image_path": f"{ASSETS}/arig/1.jpg",
        },
    ]
    ex = tmp_path / "examples.json"
    ex.write_text(json.dumps(examples))
    out = tmp_path / "out"
    main(["--examples", str(ex), "--random-init", "--tiny", "--out", str(out),
          "--score-unfound"])
    rows = [json.loads(l) for l in open(out / "results.jsonl")]
    assert [r["task"] for r in rows] == ["s4", "arig"]
    # random weights never decode the six <mask_i> tokens; --score-unfound
    # keeps the metric path exercised while mask_found records the truth
    assert rows[0]["mask_found"] is False
    assert "miou" in rows[0] and "fscore" in rows[0]
    assert rows[1]["predict"] != ""
    assert (out / "s4_mask.npy").exists()


def test_evaluate_cli(tmp_path):
    from crab_tpu.cli.evaluate import main

    ann = [
        {
            "audio_path": f"{ASSETS}/ms3/audio.wav",
            "image_path": f"{ASSETS}/ms3/1.jpg",
            "mask_path": f"{ASSETS}/ms3/1.png",
            "vid": "clip0",
        }
    ] * 2
    annp = tmp_path / "ms3.json"
    annp.write_text(json.dumps(ann))
    out = tmp_path / "eval"
    summary = main(
        ["--task", "ms3", "--annotations", str(annp), "--random-init", "--tiny",
         "--out", str(out), "--batch-size", "2", "--score-unfound",
         "--profile-dir", str(tmp_path / "prof")]
    )
    assert summary["n"] == 2
    # --profile-dir captured an XPlane trace of the eval loop
    assert any((tmp_path / "prof").rglob("*.xplane.pb"))
    assert "miou" in summary
    rows = [json.loads(l) for l in open(out / "infer_results.jsonl")]
    assert len(rows) == 2 and "fscore" in rows[0]
    assert rows[0]["mask_found"] is False
    assert len(os.listdir(out / "pred_masks")) == 2


def test_video_decode_seek():
    from crab_tpu.media.video import load_video_frames

    mp4 = f"{ASSETS}/avvp/6aV6c8mY0lg.mp4"
    if not os.path.exists(mp4):
        pytest.skip("mp4 missing")
    frames = load_video_frames(mp4, 10, 224)
    assert frames.shape == (10, 224, 224, 3)
    # frames differ over time (seek actually moved)
    assert float(frames.astype(np.float32).std(axis=0).mean()) > 1.0


def test_make_annotations_and_eval_split_cli(tmp_path):
    """Official layout -> make_annotations -> evaluate on the full-split
    ms3-eval task (video-of-stills prompt + taps-only seg_image)."""
    from crab_tpu.cli.evaluate import main as eval_main
    from crab_tpu.cli.make_annotations import main as ann_main
    from tests.test_splits import _fake_avsbench

    root = str(tmp_path / "AVS")
    _fake_avsbench(root)
    ann = str(tmp_path / "ms3_test.json")
    recs = ann_main(["--task", "ms3", "--root", root, "--split", "test",
                     "--out", ann])
    assert len(recs) == 5
    out = str(tmp_path / "eval_ms3")
    summary = eval_main(
        ["--task", "ms3-eval", "--annotations", ann, "--random-init",
         "--tiny", "--out", out, "--batch-size", "5", "--limit", "5",
         "--score-unfound"]
    )
    assert summary["n"] == 5
    assert "miou" in summary
    rows = [json.loads(l) for l in open(os.path.join(out, "infer_results.jsonl"))]
    assert len(rows) == 5 and "fscore" in rows[0]


def test_serve_cli(tmp_path):
    """Serve CLI end to end on real assets: a mixed NTP+AVS request
    stream through the continuous engine, JSONL + mask PNG artifacts."""
    from crab_tpu.cli.serve import main

    requests = [
        {
            "task": "arig",
            "sample": {
                "audio_path": f"{ASSETS}/arig/audio.wav",
                "image_path": f"{ASSETS}/arig/1.jpg",
            },
            "max_new": 6,
        },
        {
            "task": "s4",
            "sample": {
                "audio_path": f"{ASSETS}/s4/audio.wav",
                "image_path": f"{ASSETS}/s4/0.jpg",
            },
            "max_new": 6,
        },
    ]
    req = tmp_path / "req.jsonl"
    req.write_text("\n".join(json.dumps(r) for r in requests))
    out = tmp_path / "served"
    main(["--requests", str(req), "--out", str(out), "--random-init",
          "--tiny", "--engine", "continuous", "--slots", "2",
          "--chunk", "3", "--max-len", "256"])
    rows = [json.loads(l) for l in open(out / "results.jsonl")]
    assert [r["task"] for r in rows] == ["arig", "s4"]
    assert rows[0]["predict"] != ""
    assert rows[1]["mask_found"] is False  # random weights
    assert os.path.exists(rows[1]["mask_path"])


def test_quick_start_cli_qwen_tiny(tmp_path):
    """The qwen family end to end through the CLI at tiny scale: GQA +
    qkv-bias decoder (packed per-member expert path), qwen chat style."""
    from crab_tpu.cli.quick_start import main

    examples = [
        {
            "task": "arig",
            "audio_path": f"{ASSETS}/arig/audio.wav",
            "image_path": f"{ASSETS}/arig/1.jpg",
        },
    ]
    ex = tmp_path / "examples.json"
    ex.write_text(json.dumps(examples))
    out = tmp_path / "out_qwen"
    main(["--examples", str(ex), "--random-init", "--tiny", "--llm", "qwen",
          "--out", str(out)])
    rows = [json.loads(l) for l in open(out / "results.jsonl")]
    assert rows[0]["task"] == "arig" and rows[0]["predict"] != ""


def test_train_cli_e2e(tmp_path):
    """Train CLI end to end at tiny scale on real assets: one stage-2
    epoch over an s4 annotation — finite decreasing-capable loss, delta
    export, and the reference-parity artifacts (trainable_params.txt,
    model.txt, run_config.json, train_log.jsonl)."""
    from crab_tpu.cli.train import main

    ann = [
        {
            "audio_path": f"{ASSETS}/s4/audio.wav",
            "image_path": f"{ASSETS}/s4/0.jpg",
            "mask_path": f"{ASSETS}/s4/0.png",
            "object": "object",
        }
        for _ in range(2)
    ]
    ap = tmp_path / "s4.json"
    ap.write_text(json.dumps(ann))
    out = tmp_path / "run"
    main([
        "--stage", "finetune", "--annotations", f"s4={ap}",
        "--random-init", "--tiny", "--out", str(out),
        "--epochs", "1", "--batch-size", "2", "--lr", "1e-3",
    ])
    log = [json.loads(l) for l in open(out / "train_log.jsonl")]
    assert log and np.isfinite(log[-1]["loss"])
    assert (out / "trainable_params.txt").exists()
    assert (out / "model.txt").exists()
    cfgj = json.loads((out / "run_config.json").read_text())
    assert cfgj["model"] == "crab-tiny" and cfgj["stage"] == "finetune"
    deltas = list(out.glob("delta_*.npz"))
    assert deltas, "stage delta not exported"


def test_serve_cli_batch_engine(tmp_path):
    """--engine batch: dynamic-batching server path, including the
    per-request max_new honoring via registered task variants."""
    from crab_tpu.cli.serve import main

    requests = [
        {
            "task": "arig",
            "sample": {
                "audio_path": f"{ASSETS}/arig/audio.wav",
                "image_path": f"{ASSETS}/arig/1.jpg",
            },
            "max_new": 4,
        },
        {
            "task": "arig",
            "sample": {
                "audio_path": f"{ASSETS}/arig/audio.wav",
                "image_path": f"{ASSETS}/arig/1.jpg",
            },
            "max_new": 4,
        },
    ]
    req = tmp_path / "req.jsonl"
    req.write_text("\n".join(json.dumps(r) for r in requests))
    out = tmp_path / "served_batch"
    main(["--requests", str(req), "--out", str(out), "--random-init",
          "--tiny", "--engine", "batch", "--slots", "2"])
    rows = [json.loads(l) for l in open(out / "results.jsonl")]
    assert len(rows) == 2 and all(r["predict"] != "" for r in rows)


def test_evaluate_cli_avss_head(tmp_path):
    """AVSS (71-class head) through the evaluate CLI: per-class
    accumulation and the avss summary path."""
    from crab_tpu.cli.evaluate import main

    ann = [
        {
            "audio_path": f"{ASSETS}/avss/audio.wav",
            "image_path": f"{ASSETS}/avss/0.jpg",
            "mask_path": f"{ASSETS}/avss/0.png",
            "vid": "v0",
            "idx": 0,
        }
    ]
    annp = tmp_path / "avss.json"
    annp.write_text(json.dumps(ann))
    out = tmp_path / "eval_avss"
    summary = main(
        ["--task", "avss", "--annotations", str(annp), "--random-init",
         "--tiny", "--out", str(out), "--batch-size", "1", "--score-unfound"]
    )
    assert summary["n"] == 1
    assert "miou" in summary and "miou_noBg" in summary


def test_evaluate_cli_dump_routes(tmp_path):
    """--dump-routes writes reference-layout per-sample route dumps
    ({q,k,v,o}_token_weight.npy, (T, L, 1, E)) alongside the JSONL."""
    import numpy as np

    from crab_tpu.cli.evaluate import main
    from crab_tpu.core.config import crab_tiny

    ann = [
        {
            "audio_path": f"{ASSETS}/ave/-67UNKFmRLk.mp3",
            "video_path": f"{ASSETS}/ave/-67UNKFmRLk.mp4",
            "question": "what instrument?",
            "answer": "piano",
        }
    ] * 2
    annp = tmp_path / "avqa.json"
    annp.write_text(json.dumps(ann))
    out = tmp_path / "eval"
    summary = main(
        ["--task", "avqa", "--annotations", str(annp), "--random-init",
         "--tiny", "--out", str(out), "--batch-size", "2", "--dump-routes"]
    )
    assert summary["n"] == 2
    cfg = crab_tiny()
    for s in ("0", "1"):
        d = out / "routes" / s
        for k in ("q", "k", "v", "o"):
            arr = np.load(d / f"{k}_token_weight.npy")
            assert arr.ndim == 4
            assert arr.shape[1] == cfg.decoder.num_layers
            assert arr.shape[2] == 1
            assert arr.shape[3] == cfg.decoder.lora.num_experts
            # router weights: softmaxed, rows sum to 1
            np.testing.assert_allclose(arr.sum(-1), 1.0, rtol=1e-3)


def test_evaluate_cli_pretrain_eval_tasks(tmp_path):
    """Stage-1 pretrain eval surface (scripts/pretrain/inference*.py):
    audio_caption-eval decodes + BLEU-scores captions; lvis_seg-eval runs
    the seg head per image and scores per-image mIoU/F."""
    from crab_tpu.cli.evaluate import main

    # caption eval: {label JSONL + BLEU summary} like inference_audio.py
    ann = [
        {
            "audio_path": f"{ASSETS}/s4/audio.wav",
            "output": "a dog barks near a fence",
        }
    ] * 2
    annp = tmp_path / "ac.json"
    annp.write_text(json.dumps(ann))
    out = tmp_path / "eval_ac"
    summary = main(
        ["--task", "audio_caption-eval", "--annotations", str(annp),
         "--random-init", "--tiny", "--out", str(out), "--batch-size", "2"]
    )
    assert summary["n"] == 2
    assert "bleu4" in summary  # scorer wired (cli/score.py SCORERS)
    rows = [json.loads(l) for l in open(out / "infer_results.jsonl")]
    assert len(rows) == 2 and rows[0]["predict"] != ""
    assert rows[0]["output"] == "a dog barks near a fence"

    # seg-pretrain eval: online IoU + mask PNGs like inference.py:205-236
    ann = [
        {
            "image_path": f"{ASSETS}/s4/0.jpg",
            "mask_path": f"{ASSETS}/s4/0.png",
            "name": "dog",
            "def": "a domestic canine",
        }
    ] * 2
    annp = tmp_path / "lvis.json"
    annp.write_text(json.dumps(ann))
    out = tmp_path / "eval_lvis"
    summary = main(
        ["--task", "lvis_seg-eval", "--annotations", str(annp),
         "--random-init", "--tiny", "--out", str(out), "--batch-size", "2",
         "--score-unfound"]
    )
    assert summary["n"] == 2
    assert "miou" in summary and summary["images"] == 2
    rows = [json.loads(l) for l in open(out / "infer_results.jsonl")]
    assert len(rows) == 2 and "miou" in rows[0] and "fscore" in rows[0]
    assert len(os.listdir(out / "pred_masks")) == 2


def test_serve_cli_spec_adaptive_default_and_summary(tmp_path):
    """--spec-k now defaults to adaptive gating (VERDICT r04 #6: the
    measured-safe configuration is the default) and the serve CLI writes
    a summary.json surfacing the spec-vs-plain chunk telemetry."""
    from crab_tpu.cli.serve import main

    requests = [
        {
            "task": "avqa",
            "sample": {
                "question": "what is playing",
                "audio_path": f"{ASSETS}/avqa/00006835.mp3",
                "video_path": f"{ASSETS}/ave/-67UNKFmRLk.mp4",
            },
            "max_new": 6,
        },
    ]
    req = tmp_path / "req.jsonl"
    req.write_text("\n".join(json.dumps(r) for r in requests))
    out = tmp_path / "served"
    main(["--requests", str(req), "--out", str(out), "--random-init",
          "--tiny", "--engine", "continuous", "--slots", "2",
          "--chunk", "3", "--max-len", "384", "--spec-k", "2",
          "--enc-int8"])  # enc-int8 is a no-op at tiny dims (< 256)
    summary = json.load(open(out / "summary.json"))
    assert summary["requests"] == 1
    assert summary["spec_k"] == 2
    assert summary["spec_adaptive"] is True  # the new default
    # chunk counters are present (may be 0 if random weights hit EOS
    # during admission; the counting itself is covered in
    # tests/test_continuous.py)
    assert summary["spec_chunks"] >= 0 and summary["plain_chunks"] >= 0
    rows = [json.loads(l) for l in open(out / "results.jsonl")]
    assert rows[0]["predict"] != ""
