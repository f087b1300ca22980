"""Full-split surface tests: official-layout builders, eval-task media
recipes, seg_image (taps-only frame) through the engine, and the train
media/instruction overrides."""

import json
import os
import wave

import numpy as np
import pytest

from crab_tpu.tasks import prompts
from crab_tpu.tasks.registry import TASKS
from crab_tpu.tasks.splits import (
    arig_split,
    avss_split,
    ms3_split,
    ref_avs_split,
    s4_split,
)


def _write_wav(path, seconds=5, sr=16000):
    t = np.arange(seconds * sr) / sr
    pcm = (np.sin(2 * np.pi * 440 * t) * 2000).astype(np.int16)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def _write_img(path, size=32):
    import cv2

    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, np.random.default_rng(0).integers(
        0, 255, (size, size, 3)).astype(np.uint8))


def _fake_avsbench(root):
    """Minimal AVSBench v1m/v1s tree + sample jsons."""
    for sub, name, n in (("v1m", "ms3_samples.json", 5),
                         ("v1s", "s4_samples.json", 5),
                         ("v2", "avss_samples.json", 10)):
        uid = f"{sub}_clip0"
        _write_wav(os.path.join(root, sub, uid, "audio.wav"), seconds=n)
        labels = "labels_rgb" if sub == "v2" else "labels_semantic"
        for i in range(n):
            _write_img(os.path.join(root, sub, uid, "frames", f"{i}.jpg"))
            _write_img(os.path.join(root, sub, uid, labels, f"{i}.png"))
        recs = [
            {"vid": "clip0", "uid": uid, "s_min": 0, "s_sec": 0,
             "a_obj": "dog", "split": split, "label": "x"}
            for split in ("train", "test")
        ]
        with open(os.path.join(root, name), "w") as f:
            json.dump(recs, f)
    # arig grounding annotations
    frame = os.path.join(root, "v1s", "v1s_clip0", "frames", "0.jpg")
    audio = os.path.join(root, "v1s", "v1s_clip0", "audio.wav")
    recs = [
        {"split": "test", "audio_path": audio, "frame_path": frame,
         "mask_path": "", "top_left": [10, 20], "bottom_right": [100, 120],
         "a_obj": "dog"},
        {"split": "test", "audio_path": audio, "frame_path": frame,
         "mask_path": "", "top_left": [1000, 0], "bottom_right": [0, 0],
         "a_obj": "none"},  # sentinel: must be dropped
    ]
    with open(os.path.join(root, "v1s_grounding_samples.json"), "w") as f:
        json.dump(recs, f)


def test_avs_split_builders(tmp_path):
    root = str(tmp_path / "AVS")
    _fake_avsbench(root)
    ms3 = ms3_split(root, "test")
    assert len(ms3) == 5 and ms3[0]["idx"] == 0
    assert len(ms3[0]["image_path_list"]) == 5
    assert os.path.exists(ms3[0]["audio_path"])
    s4_test = s4_split(root, "test")
    s4_train = s4_split(root, "train")
    assert len(s4_test) == 5
    assert len(s4_train) == 1 and s4_train[0]["idx"] == 0  # frame 0 only
    avss = avss_split(root, "test")
    assert len(avss) == 10
    avss_tr = avss_split(root, "train", train_frame=3)
    assert len(avss_tr) == 1 and avss_tr[0]["idx"] == 3
    arig = arig_split(root, "test")
    assert len(arig) == 1  # x1==1000 sentinel dropped
    assert arig[0]["gt_box"] == [10, 20, 100, 120]


def test_ref_avs_split_builder(tmp_path):
    root = str(tmp_path / "REFAVS")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "metadata.csv"), "w") as f:
        f.write("vid0,vid0_dog_1,test_s,3,the barking dog\n")
        f.write("vid0,vid0_dog_1,train,3,the barking dog\n")
        f.write("vid1,vid1_cat_2,test_n,0,nothing\n")
    recs = ref_avs_split(root, "test_s")
    assert len(recs) == 10
    assert recs[0]["exp"] == "the barking dog" and recs[0]["object"] == "dog"
    assert recs[0]["mask_path"].endswith("fid_3/00000.png")
    assert not recs[0]["null"]
    null = ref_avs_split(root, "test_n")
    assert len(null) == 10 and null[0]["null"]
    train = ref_avs_split(root, "train")
    assert len(train) == 1  # one random frame per row


def test_eval_task_media_and_prompts(tmp_path):
    root = str(tmp_path / "AVS")
    _fake_avsbench(root)
    rec = ms3_split(root, "test")[2]
    task = TASKS["ms3-eval"]
    media = task.media(rec)
    assert media["video"].shape == (5, 224, 224, 3)
    assert media["audio"].shape[0] == 5
    assert media["seg_image"].shape == (1, 224, 224, 3)
    assert "mask" in media
    # ms3 test prompt hardcodes 'third' regardless of frame idx
    assert "at the third second" in task.instruction(rec)
    # s4 varies the ordinal
    s4 = TASKS["s4-eval"]
    assert "at the third second" in s4.instruction({"idx": 2})
    assert "at the first second" in s4.instruction({"idx": 0})
    # train surfaces
    ms3_t = TASKS["ms3"]
    assert "at the third second" in ms3_t.train_instruction({"idx": 2})
    tm = ms3_t.train_media(rec)
    assert tm["video"].shape == (5, 224, 224, 3) and "seg_image" in tm
    assert "referential expression: hi" in TASKS["ref-avs-eval"].instruction(
        {"exp": "hi"}
    )
    assert "recognize the category" in TASKS["avss-eval"].instruction({})


def test_engine_seg_image_taps(tmp_path):
    """seg_image must drive the seg head without entering the prompt."""
    import jax

    from crab_tpu.core.config import crab_tiny
    from crab_tpu.fusion.tokens import SpecialTokens
    from crab_tpu.runtime.engine import InferenceEngine
    from crab_tpu.runtime.model import init_crab
    from crab_tpu.tasks.registry import TaskSpec
    from crab_tpu.tasks import registry

    cfg = crab_tiny()
    special = SpecialTokens(base_vocab=400)
    params = init_crab(jax.random.PRNGKey(0), cfg)

    class Tok:
        def encode(self, t):
            import zlib

            return [7 + (zlib.crc32(w.encode()) % 300) for w in t.split()]

        def decode(self, ids):
            return " ".join(map(str, ids))

    engine = InferenceEngine(cfg, params, Tok(), special, eos_id=2)
    q = cfg.vl_projector.num_query_tokens
    task = TaskSpec(
        "tiny-segimg",
        lambda s: f"look {prompts.VIDEO_SPAN} and {prompts.AUDIO_SPAN}",
        lambda s: s["media"],
        {"<video>": 2 * q, "<audio>": q},
        is_avs=True,
        max_new_tokens=8,
    )
    registry.TASKS["tiny-segimg"] = task
    try:
        rng = np.random.default_rng(0)
        size = cfg.vision.image_size
        media = {
            "video": rng.integers(0, 255, (2, size, size, 3)).astype(np.uint8),
            "audio": (rng.standard_normal((1, 16000)) * 0.05).astype(np.float32),
            "seg_image": rng.integers(0, 255, (1, size, size, 3)).astype(np.uint8),
        }
        out = engine.run("tiny-segimg", [{"media": media}])
        assert out.masks is not None
        assert out.masks.shape[0] == 1
        # changing ONLY seg_image changes the masks (it feeds the head)
        media2 = dict(media)
        media2["seg_image"] = rng.integers(0, 255, (1, size, size, 3)).astype(
            np.uint8
        )
        out2 = engine.run("tiny-segimg", [{"media": media2}])
        assert not np.allclose(out.masks, out2.masks)
        # ...but not the decoded tokens (it never enters the prompt)
        np.testing.assert_array_equal(out.tokens, out2.tokens)
    finally:
        registry.TASKS.pop("tiny-segimg", None)


@pytest.mark.slow
def test_train_collator_uses_train_surface(tmp_path):
    """TrainCollator must pick the train media/instruction overrides and
    the train step must accept the seg_image batch."""
    import jax
    import jax.numpy as jnp

    from crab_tpu.core.config import crab_tiny
    from crab_tpu.fusion.tokens import SpecialTokens
    from crab_tpu.runtime.model import init_crab
    from crab_tpu.tasks.datasets import TrainCollator, TrainDataset
    from crab_tpu.train.state import (
        STAGE_TRAINABLE,
        init_train_state,
        make_optimizer,
        make_train_step,
        trainable_mask,
    )

    root = str(tmp_path / "AVS")
    _fake_avsbench(root)
    recs = ms3_split(root, "train")
    ann = tmp_path / "ms3.json"
    ann.write_text(json.dumps(recs[:2]))

    cfg = crab_tiny()
    special = SpecialTokens(base_vocab=400)

    class Tok:
        def encode(self, t):
            import zlib

            return [7 + (zlib.crc32(w.encode()) % 300) for w in t.split()]

        def decode(self, ids):
            return " ".join(map(str, ids))

    ds = TrainDataset({"ms3": str(ann)}, special)
    # train instruction (video span + ordinal), train output format
    assert "at the first second of the video" in ds.examples[0].instruction
    assert "The object making the sound in the video is dog" in ds.examples[0].output

    collator = TrainCollator(Tok(), special, cfg)
    batch = collator(ds.examples[:2])
    assert batch["media"]["video"].shape[:2] == (2, 5)
    assert batch["media"]["seg_image"].shape[:2] == (2, 1)
    assert "gt_mask" in batch

    # the AVS train step consumes the seg_image batch end to end
    from crab_tpu.cli.train import _fit_batch_media

    batch = _fit_batch_media(batch, cfg)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    params = init_crab(jax.random.PRNGKey(0), cfg)
    mask = trainable_mask(params, STAGE_TRAINABLE["finetune_avs"])
    opt = make_optimizer(1e-3, STAGE_TRAINABLE["finetune_avs"], params)
    step = jax.jit(make_train_step(cfg, opt, avs=True, trainable=mask))
    st = init_train_state(params, opt, trainable=mask)
    st, metrics = step(st, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["mask_loss"]))


@pytest.mark.slow
def test_run_clip_matches_per_record(tmp_path):
    """The encode-once clip path must produce the same tokens/masks as
    running each record independently."""
    import jax

    from crab_tpu.core.config import crab_tiny
    from crab_tpu.fusion.tokens import SpecialTokens
    from crab_tpu.runtime.engine import InferenceEngine
    from crab_tpu.runtime.model import init_crab

    root = str(tmp_path / "AVS")
    _fake_avsbench(root)
    recs = ms3_split(root, "test")
    # distinct frame stills so per-frame seg taps actually differ
    for i, r in enumerate(recs):
        img = np.full((32, 32, 3), 40 * i, np.uint8)
        import cv2

        cv2.imwrite(r["image_path"], img)

    cfg = crab_tiny()
    special = SpecialTokens(base_vocab=400)
    params = init_crab(jax.random.PRNGKey(0), cfg)

    class Tok:
        def encode(self, t):
            import zlib

            return [7 + (zlib.crc32(w.encode()) % 300) for w in t.split()]

        def decode(self, ids):
            return " ".join(map(str, ids))

    engine = InferenceEngine(cfg, params, Tok(), special, eos_id=2)
    clip_out = engine.run_clip("ms3-eval", recs)
    per_out = engine.run("ms3-eval", recs)
    np.testing.assert_array_equal(clip_out.tokens, per_out.tokens)
    np.testing.assert_allclose(
        clip_out.masks, per_out.masks, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(clip_out.mask_found, per_out.mask_found)


def test_run_clip_stream_matches_run_clip(tmp_path):
    """Depth-2 pipelined clip path yields the same outputs in order."""
    import jax

    from crab_tpu.core.config import crab_tiny
    from crab_tpu.fusion.tokens import SpecialTokens
    from crab_tpu.runtime.engine import InferenceEngine
    from crab_tpu.runtime.model import init_crab

    root = str(tmp_path / "AVS")
    _fake_avsbench(root)
    recs = ms3_split(root, "test")
    cfg = crab_tiny()
    special = SpecialTokens(base_vocab=400)
    params = init_crab(jax.random.PRNGKey(0), cfg)

    class Tok:
        def encode(self, t):
            import zlib

            return [7 + (zlib.crc32(w.encode()) % 300) for w in t.split()]

        def decode(self, ids):
            return " ".join(map(str, ids))

    engine = InferenceEngine(cfg, params, Tok(), special, eos_id=2)
    groups = [recs[:2], recs[2:4], recs[:3]]
    ref = [engine.run_clip("ms3-eval", g) for g in groups]
    got = list(engine.run_clip_stream("ms3-eval", groups, depth=2))
    assert len(got) == len(ref)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r.tokens, g.tokens)
        np.testing.assert_allclose(r.masks, g.masks, rtol=1e-4, atol=1e-4)
