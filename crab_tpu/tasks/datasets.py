"""Training data layer — the UnifiedDataset/PretrainDataset equivalent.

Re-designs ``dataset/unified_dataset.py`` + ``dataset/pretrain_dataset.py``
without their quirks (SURVEY.md §2.6): no hardcoded cluster paths
(annotations carry explicit media paths), masks are ALWAYS loaded for AVS
tasks (the reference ships that code commented out), and batches are
grouped per task so every device program has static shapes.

Annotation schema: one JSON list per task; each record provides the
fields its task needs:

  avqa:    {audio_path, video_path, question, answer}
  ave:     {audio_path, video_path, output}        # templated answer text
  avvp:    {audio_path, video_path, output}
  avcap:   {audio_path, video_path, caption}
  arig:    {audio_path, image_path, object, box: [x1,y1,x2,y2]}
  s4/ms3:  {audio_path, image_path, mask_path, object, idx?, total_seconds?}
  avss:    {audio_path, image_path, mask_path, idx?}
  ref-avs: {audio_path, image_path, mask_path, exp, object?, second?}

Train prompts/answers are byte-compatible with the reference templates
(``dataset/unified_dataset.py:156-680``).
"""

from __future__ import annotations

import json
import random
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from crab_tpu.fusion.splice import IGNORE_LABEL, SampleSpec, build_splice_batch
from crab_tpu.fusion.tokens import SpecialTokens
from crab_tpu.tasks import prompts
from crab_tpu.tasks.registry import TASKS

_ORDINAL = {
    1: "first", 2: "second", 3: "third", 4: "fourth", 5: "fifth",
    6: "sixth", 7: "seventh", 8: "eighth", 9: "ninth", 10: "tenth",
}


def _answer(record: Dict, special: SpecialTokens, task: str) -> str:
    mt = special.mask_token_str
    if task == "avqa":
        # the reference's train output is the pre-templated converted-label
        # text (unified_dataset.py:171 read_label); accept it directly, with
        # a bare answer string as the convenience fallback
        return record.get("output") or record["answer"]
    if task == "ave":
        return record["output"]
    if task == "avvp":
        out = record.get("output") or record["label"]
        # the reference renames the raw tags to event tags
        # (unified_dataset.py:241-245)
        for a, b in (
            ("<audio>", "<audio_event>"),
            ("</audio>", "</audio_event>"),
            ("<visual>", "<visual_event>"),
            ("</visual>", "</visual_event>"),
        ):
            out = out.replace(a, b)
        return out
    if task == "avcap":
        return record["caption"]
    if task == "arig":
        x1, y1, x2, y2 = record["box"]
        obj = record["object"]
        return (
            f"The sounding object is {obj}. Its coordinate of top left corner "
            f"is ({x1},{y1}) and coordinate of bottom right corner is ({x2},{y2})"
        )
    if task in ("s4", "ms3", "avss"):
        obj = record.get("object", "the sounding objects")
        th = _ORDINAL.get(record.get("idx", 0) + 1, "first")
        return prompts.avss_train_output(obj, th, mt)
    if task == "ref-avs":
        # train format (unified_dataset.py:662); the test/quick-start
        # surface uses prompts.ref_avs_eval_output instead
        exp = record["exp"]
        obj = record.get("object", "the object")
        th = _ORDINAL.get(record.get("idx", 0) + 1, "first")
        return prompts.ref_avs_train_output(exp, obj, th, mt)
    # stage-1 pretrain tasks (dataset/pretrain_dataset.py)
    if task in ("image_caption", "video_caption", "audio_caption"):
        return record["caption"]
    if task == "lvis_seg":
        return f"It is <mask_start>{mt}<mask_end>"
    raise KeyError(task)


@dataclass
class TrainExample:
    task_name: str
    instruction: str
    output: str
    record: Dict


class TrainDataset:
    """Loads per-task annotation JSONs; yields TrainExamples."""

    def __init__(
        self,
        annotations: Dict[str, str],  # task -> annotation json path
        special: SpecialTokens,
        chat_style: str = "llama",
        seed: int = 0,
    ):
        self.special = special
        self.chat = prompts.CHAT_TEMPLATES[chat_style]
        eos = "</s>" if chat_style == "llama" else "<|im_end|>"
        self.examples: List[TrainExample] = []
        for task, path in annotations.items():
            spec = TASKS[task]
            with open(path) as f:
                records = json.load(f)
            instr_fn = spec.train_instruction or spec.instruction
            for r in records:
                self.examples.append(
                    TrainExample(
                        task_name=task,
                        instruction=self.chat(instr_fn(r)),
                        output=_answer(r, special, task) + eos,
                        record=r,
                    )
                )
        self._rng = random.Random(seed)

    def __len__(self) -> int:
        return len(self.examples)

    def shuffled(self) -> List[TrainExample]:
        idx = list(range(len(self.examples)))
        self._rng.shuffle(idx)
        return [self.examples[i] for i in idx]


class TrainCollator:
    """TrainExamples (same task) -> device batch for train.state steps.

    Tokenization mirrors the reference collator: instruction and output
    tokenized separately, labels = IGNORE on the prompt
    (``unified_dataset.py:2269-2315``).
    """

    def __init__(self, tokenizer, special: SpecialTokens, cfg):
        self.tokenizer = tokenizer
        self.special = special
        self.cfg = cfg

    def __call__(self, examples: Sequence[TrainExample], pad_to: Optional[int] = None):
        assert len({e.task_name for e in examples}) == 1, "one task per batch"
        task = TASKS[examples[0].task_name]
        specs, medias = [], []
        media_fn = task.train_media or task.media
        for e in examples:
            instr_ids = self.tokenizer.encode(e.instruction)
            out_ids = self.tokenizer.encode(e.output)
            ids = np.asarray(instr_ids + out_ids, np.int64)
            labels = np.concatenate(
                [
                    np.full(len(instr_ids), IGNORE_LABEL, np.int64),
                    np.asarray(out_ids, np.int64),
                ]
            )
            media = media_fn(e.record)
            lens = {}
            if "audio" in media:
                lens["<audio>"] = (
                    media["audio"].shape[0] * self.cfg.al_projector.num_query_tokens
                )
            # seg_image feeds only the segmentation head, never the prompt
            for key in ("video", "image"):
                if key in media:
                    lens[f"<{key}>"] = (
                        media[key].shape[0] * self.cfg.vl_projector.num_query_tokens
                    )
            specs.append(SampleSpec(ids, lens, labels, e.task_name))
            medias.append(media)

        sb = build_splice_batch(specs, self.special, pad_to=pad_to)
        batch = {
            "media": {
                k: np.stack([m[k] for m in medias])
                for k in medias[0]
                if k != "mask"
            },
            "text_ids": sb.text_ids,
            "feat_idx": sb.feat_idx,
            "attention_mask": sb.attention_mask,
            "position_ids": sb.position_ids,
            "labels": sb.labels,
        }
        if task.is_avs:
            batch["mask_token_pos"] = sb.mask_token_pos
            batch["gt_mask"] = np.stack([m["mask"][0] for m in medias])
        return batch


def example_length(e: TrainExample) -> int:
    """Length key for grouped batching: whitespace token count of the
    instruction + answer text. Within one task the media token budget is
    a constant (static shapes), so text length is the only source of
    batch-to-batch padding variance — the analogue of the reference's
    per-sample ``modality_lengths`` (text tokens + media placeholders)."""
    return len(e.instruction.split()) + len(e.output.split())


def task_batches(
    dataset: TrainDataset,
    collator: TrainCollator,
    batch_size: int,
    pad_to: Optional[int] = None,
    prefetch: int = 0,
    group_by_length: bool = False,
    group_window: int = 8,
) -> Iterator[Dict]:
    """Epoch iterator: shuffle, group by task, emit fixed-size batches.

    Grouping by task keeps shapes static per compiled program — the
    TPU-native replacement for the reference's modality-length-grouped
    sampler (``scripts/pretrain/trainer.py:129``): its sampler's first
    split key is "multimodal vs language-only"
    (``get_modality_length_grouped_indices``); per-task grouping is the
    strictly finer version of that split.

    ``group_by_length`` adds the sampler's second key — within each task,
    a shuffled megabatch window of ``group_window * batch_size`` examples
    is sorted by text length (descending, like
    ``get_length_grouped_indices``'s per-megabatch sort) before being cut
    into batches, so same-length samples share a batch and the dynamic
    pad-to-batch-max wastes fewer tokens. Batch ORDER is still shuffled
    (the reference permutes megabatches), so optimization sees randomized
    length order across steps. Default off, matching the reference's
    ``group_by_modality_length`` flag default
    (``configs/unified_config.py:80``).

    ``prefetch`` > 0 collates up to that many batches ahead on worker
    threads (media decode is cv2/C++-WAV, GIL-releasing) so host IO
    overlaps the device's train step — the reference's 4-worker
    DataLoader role. Batch contents and order are identical to the
    synchronous path (the shuffle happens before dispatch).
    """
    by_task: Dict[str, List[TrainExample]] = {}
    for e in dataset.shuffled():
        by_task.setdefault(e.task_name, []).append(e)
    chunks = []
    for task, items in by_task.items():
        if group_by_length:
            mega = max(group_window, 1) * batch_size
            ordered = []
            for i in range(0, len(items), mega):
                ordered.extend(
                    sorted(items[i: i + mega], key=example_length,
                           reverse=True)
                )
            items = ordered
        for i in range(0, len(items) - batch_size + 1, batch_size):
            chunks.append(items[i: i + batch_size])
    dataset._rng.shuffle(chunks)
    if prefetch > 0:
        from crab_tpu.runtime.loader import PrefetchLoader

        yield from PrefetchLoader(
            lambda c: collator(c, pad_to=pad_to), chunks,
            depth=prefetch, workers=2,
        )
    else:
        for chunk in chunks:
            yield collator(chunk, pad_to=pad_to)
