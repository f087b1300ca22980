"""Task registry: the nine AV-UIE tasks as data.

Each task binds a prompt builder, a media recipe (decode + chunk exactly as
``dataset/quick_start_dataset.py:276-620``), fixed token budgets, and eval
metadata. The runtime engine consumes these records; nothing task-specific
lives in the model code.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict

import numpy as np

from crab_tpu.media.audio import (
    chunk_single_second,
    chunk_windows_1s,
    chunk_windows_2s_stride6,
    load_audio,
)
from crab_tpu.media.masks import load_avss_label_mask, load_binary_mask
from crab_tpu.media.video import load_image, load_video_frames
from crab_tpu.tasks import prompts

VIDEO_FRAMES = 10
QUERY_TOKENS = 32  # per frame / per second (ModelArguments defaults)


@dataclass(frozen=True)
class TaskSpec:
    name: str
    instruction: Callable[..., str]
    media: Callable[[dict], dict]  # sample dict -> {'video','audio','image','mask'}
    # placeholder -> LLM token count contributed
    feature_lens: Dict[str, int] = field(default_factory=dict)
    is_avs: bool = False
    avss_head: bool = False
    max_new_tokens: int = 500
    metric: str = "text"  # text | f1 | box | mask | mask71 | null
    # train-time instruction when the reference words it differently from
    # the test builder (None -> same as `instruction`)
    train_instruction: Callable[..., str] = None
    # train-time media recipe override (None -> same as `media`); the
    # reference's UnifiedDataset train builders feed e.g. 5-frame videos
    # where quick_start feeds single frames
    train_media: Callable[[dict], dict] = None
    # per-frame media parts (seg_image/mask) when all other media is
    # shared across a clip's records — enables the engine's encode-once
    # clip path (the reference re-encodes the identical 5-frame video and
    # audio for every frame of an AVS clip)
    frame_media: Callable[[dict], dict] = None
    # groups records of one clip for the clip path
    clip_key: Callable[[dict], tuple] = None


def _video(sample, image_size=224):
    return load_video_frames(sample["video_path"], VIDEO_FRAMES, image_size)


def _image(sample, image_size=224):
    return load_image(sample["image_path"], image_size)[None]  # (1, H, W, 3)


def _avqa_media(sample):
    audio = load_audio(sample["audio_path"], duration=60)
    return {
        "video": _video(sample),
        "audio": chunk_windows_2s_stride6(audio, 60),  # (10, 32000)
    }


def _ave_avvp_media(sample):
    audio = load_audio(sample["audio_path"])
    return {
        "video": _video(sample),
        "audio": chunk_windows_1s(audio, 10),  # (10, 16000)
    }


def _arig_media(sample):
    audio = load_audio(sample["audio_path"])
    return {
        "image": _image(sample),
        "audio": chunk_single_second(audio, sample.get("idx", 0), 5)[None],  # (1, nps)
    }


def _avs_media(sample, total_seconds):
    audio = load_audio(sample["audio_path"])
    out = {
        "image": _image(sample),
        "audio": chunk_single_second(audio, sample.get("idx", 0), total_seconds)[None],
    }
    if sample.get("mask_path"):
        out["mask"] = load_binary_mask(sample["mask_path"])
    return out


def _avss_media(sample):
    audio = load_audio(sample["audio_path"])
    out = {
        "image": _image(sample),
        "audio": chunk_single_second(audio, sample.get("idx", 0), 10)[None],
    }
    if sample.get("mask_path"):
        out["mask"] = load_avss_label_mask(sample["mask_path"])
    return out


def _ref_avs_media(sample):
    audio = load_audio(sample["audio_path"])
    out = {
        "image": _image(sample),
        "audio": chunk_windows_1s(audio, 10),  # (10, nps)
    }
    if sample.get("mask_path"):
        out["mask"] = load_binary_mask(sample["mask_path"])
    return out


_AV = {"<video>": VIDEO_FRAMES * QUERY_TOKENS, "<audio>": VIDEO_FRAMES * QUERY_TOKENS}
_IA1 = {"<image>": QUERY_TOKENS, "<audio>": QUERY_TOKENS}

TASKS: Dict[str, TaskSpec] = {
    "avqa": TaskSpec(
        "avqa",
        lambda s: prompts.avqa_instruction(s["question"]),
        _avqa_media,
        _AV,
        metric="text",
    ),
    "ave": TaskSpec(
        "ave", lambda s: prompts.ave_instruction(), _ave_avvp_media, _AV, metric="text"
    ),
    "avvp": TaskSpec(
        "avvp", lambda s: prompts.avvp_instruction(), _ave_avvp_media, _AV,
        metric="f1",
        train_instruction=lambda s: prompts.avvp_train_instruction(),
    ),
    "avcap": TaskSpec(
        "avcap", lambda s: prompts.avcap_instruction(), _ave_avvp_media, _AV,
        metric="text",
    ),
    "arig": TaskSpec(
        "arig", lambda s: prompts.arig_instruction(), _arig_media, _IA1,
        metric="box",
        # train builder words it differently (unified_dataset.py:521)
        train_instruction=lambda s: prompts.arig_train_instruction(),
    ),
    "s4": TaskSpec(
        "s4",
        lambda s: prompts.avs_instruction(),
        lambda s: _avs_media(s, 5),
        _IA1,
        is_avs=True,
        max_new_tokens=100,
        metric="mask",
        # train surface: 5-frame video + 5 audio windows, frame 0 /
        # 'first' only (unified_dataset.py:326-363)
        train_instruction=lambda s: prompts.avs_seg_video_instruction("first"),
        train_media=lambda s: _avs_train_media(s, 5),
    ),
    "ms3": TaskSpec(
        "ms3",
        lambda s: prompts.avs_instruction(),
        lambda s: _avs_media(s, 5),
        _IA1,
        is_avs=True,
        max_new_tokens=100,
        metric="mask",
        # train surface: per-frame ordinal (unified_dataset.py:268-322)
        train_instruction=lambda s: prompts.avs_seg_video_instruction(
            prompts.ORDINALS[min(s.get("idx", 0), 9)]
        ),
        train_media=lambda s: _avs_train_media(s, 5),
    ),
    "avss": TaskSpec(
        "avss",
        lambda s: prompts.avs_instruction(),
        _avss_media,
        _IA1,
        is_avs=True,
        avss_head=True,
        max_new_tokens=100,
        metric="mask71",
        # train surface: 10-frame video + 10 audio windows, random frame
        # picked at annotation-build time (unified_dataset.py:428-445)
        train_instruction=lambda s: prompts.avs_seg_video_instruction(
            prompts.ORDINALS[min(s.get("idx", 0), 9)]
        ),
        train_media=lambda s: _avs_train_media(s, 10, avss=True),
    ),
    "ref-avs": TaskSpec(
        "ref-avs",
        lambda s: prompts.ref_avs_instruction(s["exp"]),
        _ref_avs_media,
        {"<image>": QUERY_TOKENS, "<audio>": VIDEO_FRAMES * QUERY_TOKENS},
        is_avs=True,
        max_new_tokens=100,
        metric="mask",
        # train surface (unified_dataset.py:658-678)
        train_instruction=lambda s: prompts.ref_avs_train_instruction(
            s["exp"], prompts.ORDINALS[min(s.get("idx", 0), 9)]
        ),
        train_media=lambda s: _avs_train_media(s, 10),
    ),
}


def _avs_train_media(sample, total_seconds, avss=False):
    """Reference AVS train recipe (unified_dataset.py:955-1085): video
    from the clip's frame stills + relative audio windows. The current
    frame feeds the seg head ('seg_image'); its mask is ALWAYS loaded
    here — the reference ships that commented out (quirk SURVEY §2.6.2)."""
    audio = load_audio(sample["audio_path"])
    paths = sample.get("image_path_list") or [sample["image_path"]] * total_seconds
    out = {
        "video": np.stack([load_image(p) for p in paths]),
        "audio": chunk_windows_1s(audio, total_seconds),
        "seg_image": _image(sample),
    }
    if sample.get("mask_path"):
        loader = load_avss_label_mask if avss else load_binary_mask
        out["mask"] = loader(sample["mask_path"])
    return out

AVS_TASKS = ("ms3", "s4", "avss", "ref-avs")


# ---------------------------------------------------------------------------
# Stage-1 pretrain tasks (``dataset/pretrain_dataset.py``): caption data for
# each modality + LVIS binary segmentation. Media recipes mirror the
# reference: 8 uniform video frames, 1-second audio windows padded to whole
# seconds (capped for static shapes), masks as gray>0 at 224.
# ---------------------------------------------------------------------------

PRETRAIN_VIDEO_FRAMES = 8
MAX_PRETRAIN_AUDIO_SECONDS = 10


def _pt_audio(sample):
    audio = load_audio(sample["audio_path"])
    sr = 16000
    if len(audio) < sr:
        audio = np.concatenate([audio, np.zeros(sr - len(audio), np.float32)])
    secs = min(-(-len(audio) // sr), MAX_PRETRAIN_AUDIO_SECONDS)
    audio = audio[: secs * sr]
    if len(audio) < secs * sr:
        audio = np.concatenate([audio, np.zeros(secs * sr - len(audio), np.float32)])
    return audio.reshape(secs, sr)


def _pt_image_caption_media(sample):
    return {"image": _image(sample)}


def _pt_video_caption_media(sample):
    return {"video": load_video_frames(sample["video_path"], PRETRAIN_VIDEO_FRAMES, 224)}


def _pt_audio_caption_media(sample):
    return {"audio": _pt_audio(sample)}


def _pt_lvis_media(sample):
    out = {"image": _image(sample)}
    if sample.get("mask_path"):
        out["mask"] = load_binary_mask(sample["mask_path"])
    return out


def _pt_image_instruction(s):
    return (
        f"This is an image:\n{prompts.IMAGE_SPAN}\n"
        f"Please answer the question:\n{s['question']}"
    )


def _pt_video_instruction(s):
    return (
        f"This is a video:\n{prompts.VIDEO_SPAN}\n"
        f"Please answer the question:\n{s['question']}"
    )


def _pt_audio_instruction(s):
    return f"This is an audio:\n{prompts.AUDIO_SPAN}\nPlease describe this audio."


def _pt_lvis_instruction(s):
    return (
        f"This is an image:\n{prompts.IMAGE_SPAN}\n"
        f"Please segment out the object that corresponding to the "
        f"{s['name']}, {s['def']} in the image."
    )


TASKS.update(
    {
        "image_caption": TaskSpec(
            "image_caption", _pt_image_instruction, _pt_image_caption_media,
            {"<image>": QUERY_TOKENS}, metric="text",
        ),
        "video_caption": TaskSpec(
            "video_caption", _pt_video_instruction, _pt_video_caption_media,
            {"<video>": PRETRAIN_VIDEO_FRAMES * QUERY_TOKENS}, metric="text",
        ),
        "audio_caption": TaskSpec(
            "audio_caption", _pt_audio_instruction, _pt_audio_caption_media,
            {"<audio>": MAX_PRETRAIN_AUDIO_SECONDS * QUERY_TOKENS}, metric="text",
        ),
        "lvis_seg": TaskSpec(
            "lvis_seg", _pt_lvis_instruction, _pt_lvis_media,
            {"<image>": QUERY_TOKENS}, is_avs=True, max_new_tokens=100,
            metric="mask",
        ),
    }
)

# Stage-1 pretrain EVAL variants — the reference ships a live eval driver
# per pretrain modality (``scripts/pretrain/inference_visual.py``,
# ``inference_audio.py``, ``inference.py`` [seg], ``inference_seg.py``):
# batch-1 loops decoding captions at max_new_tokens=200
# (``inference_visual.py:184``, ``inference_audio.py:171``) or masks at
# 100 (``inference.py:171``), dumping {label, output} JSONL (+ mask PNGs
# and online IoU for seg). Same prompts/media as the train tasks — only
# the decode budget and the scorer wiring differ. cli.evaluate streams
# them batched and scores captions with corpus BLEU (cli/score.py), which
# the reference never shipped (its caption evals dead-end at JSONL).
TASKS.update(
    {
        "image_caption-eval": TaskSpec(
            "image_caption-eval", _pt_image_instruction,
            _pt_image_caption_media, {"<image>": QUERY_TOKENS},
            max_new_tokens=200, metric="text",
        ),
        "video_caption-eval": TaskSpec(
            "video_caption-eval", _pt_video_instruction,
            _pt_video_caption_media,
            {"<video>": PRETRAIN_VIDEO_FRAMES * QUERY_TOKENS},
            max_new_tokens=200, metric="text",
        ),
        "audio_caption-eval": TaskSpec(
            "audio_caption-eval", _pt_audio_instruction,
            _pt_audio_caption_media,
            {"<audio>": MAX_PRETRAIN_AUDIO_SECONDS * QUERY_TOKENS},
            max_new_tokens=200, metric="text",
        ),
        "lvis_seg-eval": TaskSpec(
            "lvis_seg-eval", _pt_lvis_instruction, _pt_lvis_media,
            {"<image>": QUERY_TOKENS}, is_avs=True, max_new_tokens=100,
            metric="mask",
        ),
    }
)


# ---------------------------------------------------------------------------
# Full-split eval tasks — the UnifiedTestDataset surface
# (``dataset/unified_dataset.py:1274-2261``). Same models, different
# prompts/media than the bundled quick-start examples:
#   - ms3/s4: video (5 frame stills) + audio (5 relative windows) in the
#     prompt; the CURRENT frame feeds the seg head only ('seg_image' —
#     the reference computes multi-scale features from X_modals['<image>']
#     without splicing it, unified_arch.py:229-251);
#   - avss: image+audio (the idx-th tenth) with the 'recognize the
#     category' wording;
#   - ref-avs: video(10)+audio(10)+image prompt with the referential
#     expression;
#   - avqa/ave/avvp/avcap: relative equal-part audio windows.
# Records come from tasks/splits.py builders or hand-written JSONs with
# the same keys.
# ---------------------------------------------------------------------------


def _stills(paths, image_size=224):
    return np.stack([load_image(p, image_size) for p in paths])


def _ms3_s4_eval_media(sample):
    audio = load_audio(sample["audio_path"])
    out = {
        "video": _stills(sample["image_path_list"]),
        "audio": chunk_windows_1s(audio, 5),  # 5 relative windows
        "seg_image": _image(sample),  # current frame -> seg taps only
    }
    if sample.get("mask_path"):
        out["mask"] = load_binary_mask(sample["mask_path"])
    return out


def _avss_eval_media(sample):
    audio = load_audio(sample["audio_path"])
    out = {
        "image": _image(sample),
        "audio": chunk_single_second(audio, sample.get("idx", 0), 10)[None],
    }
    if sample.get("mask_path"):
        out["mask"] = load_avss_label_mask(sample["mask_path"])
    return out


def _ref_avs_eval_media(sample):
    audio = load_audio(sample["audio_path"])
    out = {
        "video": _stills(sample["image_path_list"]),
        "audio": chunk_windows_1s(audio, 10),
        "image": _image(sample),  # spliced (prompt has an image span)
    }
    if sample.get("mask_path"):
        out["mask"] = load_binary_mask(sample["mask_path"])
    return out


def _avs_frame_media(sample):
    """Per-frame parts of the ms3/s4 full-split recipe — everything else
    (the 5-still video + 5 audio windows) is identical across a clip's
    records and is encoded once on the engine's clip path."""
    out = {"seg_image": _image(sample)}
    if sample.get("mask_path"):
        out["mask"] = load_binary_mask(sample["mask_path"])
    return out


def _avs_clip_key(sample):
    return (sample["audio_path"], tuple(sample.get("image_path_list", ())))


def _arig_eval_media(sample):
    audio = load_audio(sample["audio_path"])
    return {
        "image": _image(sample),
        "audio": chunk_single_second(
            audio, sample.get("idx", 0), sample.get("tot", 5)
        )[None],
    }


def _ordinal(sample):
    return prompts.ORDINALS[min(sample.get("idx", 0), 9)]


_V5A5 = {"<video>": 5 * QUERY_TOKENS, "<audio>": 5 * QUERY_TOKENS}

TASKS.update(
    {
        # identical prompt to quick-start; audio = 10 relative windows of
        # the full clip (unified_dataset.py:1860-1885) instead of the
        # 2s-stride-6 sampling
        "avqa-eval": TaskSpec(
            "avqa-eval",
            lambda s: prompts.avqa_instruction(s["question"]),
            lambda s: {
                "video": _video(s),
                "audio": chunk_windows_1s(load_audio(s["audio_path"]), 10),
            },
            _AV,
            metric="text",
        ),
        "ave-eval": TaskSpec(
            "ave-eval", lambda s: prompts.ave_instruction(), _ave_avvp_media,
            _AV, metric="text",
        ),
        "avvp-eval": TaskSpec(
            "avvp-eval",
            lambda s: prompts.avvp_train_instruction(),  # test builder uses
            # the train wording for full splits (unified_dataset.py:1427)
            _ave_avvp_media,
            _AV,
            metric="f1",
        ),
        "avcap-eval": TaskSpec(
            "avcap-eval", lambda s: prompts.avcap_eval_instruction(),
            _ave_avvp_media, _AV, metric="text",
        ),
        "ms3-eval": TaskSpec(
            "ms3-eval",
            # the reference's ms3 TEST builder hardcodes 'third'
            # (unified_dataset.py:1546); s4 varies the ordinal
            lambda s: prompts.avs_seg_video_instruction("third"),
            _ms3_s4_eval_media,
            _V5A5,
            is_avs=True,
            max_new_tokens=100,
            metric="mask",
            frame_media=_avs_frame_media,
            clip_key=_avs_clip_key,
        ),
        "s4-eval": TaskSpec(
            "s4-eval",
            lambda s: prompts.avs_seg_video_instruction(_ordinal(s)),
            _ms3_s4_eval_media,
            _V5A5,
            is_avs=True,
            max_new_tokens=100,
            metric="mask",
            frame_media=_avs_frame_media,
            clip_key=_avs_clip_key,
        ),
        "avss-eval": TaskSpec(
            "avss-eval",
            lambda s: prompts.avss_eval_instruction(),
            _avss_eval_media,
            _IA1,
            is_avs=True,
            avss_head=True,
            max_new_tokens=100,
            metric="mask71",
        ),
        "ref-avs-eval": TaskSpec(
            "ref-avs-eval",
            lambda s: prompts.ref_avs_eval_instruction(s["exp"]),
            _ref_avs_eval_media,
            {
                "<video>": VIDEO_FRAMES * QUERY_TOKENS,
                "<audio>": VIDEO_FRAMES * QUERY_TOKENS,
                "<image>": QUERY_TOKENS,
            },
            is_avs=True,
            max_new_tokens=100,
            metric="mask",
        ),
        "arig-eval": TaskSpec(
            "arig-eval",
            lambda s: prompts.arig_eval_instruction(),
            _arig_eval_media,
            _IA1,
            metric="box",
        ),
    }
)
