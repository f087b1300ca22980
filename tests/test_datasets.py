"""Training data-layer tests with synthetic annotations + real assets."""

import zlib
import json
import os

import numpy as np
import pytest

from crab_tpu.core.config import crab_tiny
from crab_tpu.fusion.splice import IGNORE_LABEL
from crab_tpu.fusion.tokens import SpecialTokens
from crab_tpu.tasks.datasets import TrainCollator, TrainDataset, task_batches

ASSETS = "/root/reference/assets/example"

CFG = crab_tiny()
SPECIAL = SpecialTokens(base_vocab=400)


class StubTok:
    def encode(self, text):
        out = []
        for w in text.replace(">", "> ").replace("<", " <").split():
            out.append(SPECIAL.token_to_id.get(w, 7 + (zlib.crc32(w.encode()) % 300)))
        return out


@pytest.fixture
def annotations(tmp_path):
    if not os.path.exists(ASSETS):
        pytest.skip("reference assets missing")
    s4 = [
        {
            "audio_path": f"{ASSETS}/s4/audio.wav",
            "image_path": f"{ASSETS}/s4/0.jpg",
            "mask_path": f"{ASSETS}/s4/0.png",
            "object": "dog",
        }
    ] * 3
    arig = [
        {
            "audio_path": f"{ASSETS}/arig/audio.wav",
            "image_path": f"{ASSETS}/arig/1.jpg",
            "object": "guitar",
            "box": [10, 20, 100, 200],
        }
    ] * 2
    paths = {}
    for name, data in (("s4", s4), ("arig", arig)):
        p = tmp_path / f"{name}.json"
        p.write_text(json.dumps(data))
        paths[name] = str(p)
    return paths


def test_train_dataset_templates(annotations):
    ds = TrainDataset(annotations, SPECIAL)
    assert len(ds) == 5
    s4 = [e for e in ds.examples if e.task_name == "s4"][0]
    assert "segment out the object that makes the sound" in s4.instruction
    assert s4.instruction.startswith("<s>[INST] <<SYS>>")
    assert "<mask_start>" + SPECIAL.mask_token_str + "<mask_end>" in s4.output
    assert s4.output.endswith("</s>")
    arig = [e for e in ds.examples if e.task_name == "arig"][0]
    assert "top left corner is (10,20)" in arig.output


def test_collator_batches(annotations):
    ds = TrainDataset(annotations, SPECIAL)
    col = TrainCollator(StubTok(), SPECIAL, CFG)
    batches = list(task_batches(ds, col, batch_size=2))
    assert len(batches) == 2  # 3 s4 -> 1 batch of 2; 2 arig -> 1 batch
    for batch in batches:
        B, L = batch["text_ids"].shape
        assert B == 2
        assert batch["labels"].shape == (B, L)
        # prompt labels are ignored, some target labels are real
        assert (batch["labels"] == IGNORE_LABEL).any()
        assert (batch["labels"] != IGNORE_LABEL).any()
        assert batch["attention_mask"].sum() > 0
        if "gt_mask" in batch:
            assert batch["gt_mask"].shape == (B, 224, 224)
            assert (batch["mask_token_pos"] >= 0).all()
    # AVS batch carries mask supervision; ARIG doesn't
    kinds = {("gt_mask" in b) for b in batches}
    assert kinds == {True, False}


def test_task_batches_prefetch_identical(annotations):
    """Prefetched collation yields the exact batches of the synchronous
    path, in order (shuffle happens before dispatch, workers preserve
    order)."""
    import numpy as np

    col = TrainCollator(StubTok(), SPECIAL, CFG)
    sync = list(task_batches(TrainDataset(annotations, SPECIAL), col,
                             batch_size=2))
    pre = list(task_batches(TrainDataset(annotations, SPECIAL), col,
                            batch_size=2, prefetch=3))
    assert len(sync) == len(pre)
    for a, b in zip(sync, pre):
        assert set(a) == set(b)
        for k in a:
            if k == "media":
                for m in a[k]:
                    np.testing.assert_array_equal(a[k][m], b[k][m])
            else:
                np.testing.assert_array_equal(a[k], b[k])


@pytest.mark.slow
def test_collator_feeds_train_step(annotations):
    """The collated batch drives the real jitted train step."""
    import jax
    import jax.numpy as jnp

    from crab_tpu.runtime.model import init_crab
    from crab_tpu.train.state import (
        STAGE_TRAINABLE,
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    ds = TrainDataset(annotations, SPECIAL)
    col = TrainCollator(StubTok(), SPECIAL, CFG)
    batch = next(b for b in task_batches(ds, col, batch_size=2) if "gt_mask" in b)
    # tiny vision expects its own image size; collator media is 224 — the
    # train pipeline resizes on host like the engine does
    from crab_tpu.cli.train import _fit_batch_media

    batch = _fit_batch_media(batch, CFG)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    params = init_crab(jax.random.PRNGKey(0), CFG)
    opt = make_optimizer(1e-3, STAGE_TRAINABLE["finetune_avs"], params)
    step = jax.jit(make_train_step(CFG, opt, avs=True))
    state = init_train_state(params, opt)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["mask_loss"]))


def test_train_answer_templates_byte_parity():
    """Train-surface ANSWER templates, byte-exact vs the reference strings
    (``unified_dataset.py:316`` s4/ms3/avss th-variant, ``:662`` ref-avs).
    The instruction side has parity tests elsewhere; this pins the answer
    side, which previously relied on strings inlined in datasets._answer
    (and a shadowed duplicate template in prompts.py)."""
    from crab_tpu.tasks.datasets import _answer
    from crab_tpu.tasks import prompts

    mt = SPECIAL.mask_token_str
    rec = {"object": "dog", "idx": 2}
    expected = (
        "The object making the sound in the video is dog. The mask of the "
        f"object that makes the sound at the third second is "
        f"<mask_start>{mt}<mask_end>"
    )
    for task in ("s4", "ms3", "avss"):
        assert _answer(rec, SPECIAL, task) == expected

    ref = {"exp": "the loudest instrument", "object": "piano", "idx": 0}
    assert _answer(ref, SPECIAL, "ref-avs") == (
        "At the first second in the video, the loudest instrument is piano. "
        f"Its mask is <mask_start>{mt}<mask_end>"
    )
    # the eval/quick-start surface stays the short form (unified_dataset.py:1729)
    assert prompts.ref_avs_eval_output("the loudest instrument", mt) == (
        f"the loudest instrument is <mask_start>{mt}<mask_end>"
    )
    # both names exist and are distinct — the old duplicate silently
    # shadowed the train format
    assert prompts.ref_avs_train_output is not prompts.ref_avs_eval_output


def test_task_batches_group_by_length(annotations, tmp_path):
    """--group-by-length sorts each megabatch window by text length
    before cutting batches (reference ``get_length_grouped_indices``:
    shuffle -> per-megabatch sort desc -> batch), so batches partition
    the window's sorted order into contiguous runs."""
    from crab_tpu.tasks.datasets import example_length

    # 8 arig records with strongly varying text lengths
    objs = ["a", "b c", "d e f", "g h i j", "k l m n o",
            "p q r s t u", "v w x y z a b", "c d e f g h i j"]
    arig = [
        {
            "audio_path": f"{ASSETS}/arig/audio.wav",
            "image_path": f"{ASSETS}/arig/1.jpg",
            "object": o,
            "box": [10, 20, 100, 200],
        }
        for o in objs
    ]
    p = tmp_path / "arig_gl.json"
    p.write_text(json.dumps(arig))
    ds = TrainDataset({"arig": str(p)}, SPECIAL)

    passthrough = lambda chunk, pad_to=None: chunk  # noqa: E731
    batches = list(
        task_batches(ds, passthrough, batch_size=2, group_by_length=True,
                     group_window=4)  # one window covers all 8
    )
    assert len(batches) == 4
    # within a batch: non-increasing length
    for b in batches:
        lens = [example_length(e) for e in b]
        assert lens == sorted(lens, reverse=True)
    # the batches (re-ordered by their own max) reconstruct the full
    # descending sort — i.e. each batch is a contiguous run of it
    ordered = sorted(batches, key=lambda b: -example_length(b[0]))
    flat = [example_length(e) for b in ordered for e in b]
    assert flat == sorted(flat, reverse=True)
    # default off: plain batching unaffected
    plain = list(task_batches(ds, passthrough, batch_size=2))
    assert len(plain) == 4
