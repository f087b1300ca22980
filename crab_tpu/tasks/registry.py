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
        "arig", lambda s: prompts.arig_instruction(), _arig_media, _IA1, metric="box"
    ),
    "s4": TaskSpec(
        "s4",
        lambda s: prompts.avs_instruction(),
        lambda s: _avs_media(s, 5),
        _IA1,
        is_avs=True,
        max_new_tokens=100,
        metric="mask",
    ),
    "ms3": TaskSpec(
        "ms3",
        lambda s: prompts.avs_instruction(),
        lambda s: _avs_media(s, 5),
        _IA1,
        is_avs=True,
        max_new_tokens=100,
        metric="mask",
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
    ),
    "ref-avs": TaskSpec(
        "ref-avs",
        lambda s: prompts.ref_avs_instruction(s["exp"]),
        _ref_avs_media,
        {"<image>": QUERY_TOKENS, "<audio>": VIDEO_FRAMES * QUERY_TOKENS},
        is_avs=True,
        max_new_tokens=100,
        metric="mask",
    ),
}

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
