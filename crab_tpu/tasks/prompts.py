"""Prompt templates and chat formatting for the nine AV-UIE tasks.

Templates are byte-identical to the reference's dataset builders
(``dataset/quick_start_dataset.py:148-270``, ``dataset/unified_dataset.py``)
— prompt parity is a correctness requirement for checkpoint reuse.
"""

from __future__ import annotations

SYSTEM_PROMPT = "You are a helpful assistant."

VIDEO_SPAN = "<video_start><video><video_end>"
AUDIO_SPAN = "<audio_start><audio><audio_end>"
IMAGE_SPAN = "<image_start><image><image_end>"

_AV_PREFIX = f"This is a video:\n{VIDEO_SPAN}\nThis is an audio:\n{AUDIO_SPAN}\n"
_IA_PREFIX = f"This is an image:\n{IMAGE_SPAN}\nThis is an audio:\n{AUDIO_SPAN}\n"


def avqa_instruction(question: str) -> str:
    return _AV_PREFIX + f"Please answer this question: {question}"


def ave_instruction() -> str:
    return _AV_PREFIX + "Please describe the events and time range that occurred in the video."


def avvp_instruction() -> str:
    return (
        _AV_PREFIX
        + "Please determine the events that occur based on the visual and audio "
        "information, as well as the start and end time of these events."
    )


def avvp_train_instruction() -> str:
    """The reference's TRAIN builder words this differently from the test
    builder ('...information in the video ... end times...' —
    ``unified_dataset.py:251`` vs ``quick_start_dataset.py:183``)."""
    return (
        _AV_PREFIX
        + "Please determine the events that occur based on the visual and audio "
        "information in the video, as well as the start and end times of these "
        "events."
    )


def arig_instruction() -> str:
    return _IA_PREFIX + "Please output the location coordinates of sounding object."


def avs_instruction() -> str:  # s4 / ms3 / avss
    return _IA_PREFIX + "Please segment out the object that makes the sound in the image."


def ref_avs_instruction(exp: str) -> str:
    return _IA_PREFIX + f"Please segment out {exp.lower()} in the image."


def avcap_instruction() -> str:
    return _AV_PREFIX + "Please describe this video and audio."


# ---------------------------------------------------------------------------
# Full-split / train variants — the reference words the SAME task three
# ways across its three dataset surfaces (quick_start_dataset.py,
# UnifiedDataset train builders, UnifiedTestDataset split builders).
# ---------------------------------------------------------------------------

ORDINALS = (
    "first", "second", "third", "fourth", "fifth",
    "sixth", "seventh", "eighth", "ninth", "tenth",
)


def avs_seg_video_instruction(th: str) -> str:
    """ms3/s4 train + full-split eval prompt: video+audio spans with an
    ordinal (``unified_dataset.py:315,448`` train; ``:1546`` test).
    Note the reference's ms3 TEST builder hardcodes 'third' for every
    frame while s4 varies the ordinal — replicated deliberately."""
    return _AV_PREFIX + (
        "Please recognize the category of object making sound in the video, "
        f"and then segment out the object that makes the sound at the {th} "
        "second of the video."
    )


def avss_eval_instruction() -> str:
    """AVSS full-split prompt (``unified_dataset.py:1597``)."""
    return _IA_PREFIX + (
        "Please recognize the category of the object making the sound in "
        "the image and segment it out."
    )


def avss_train_output(a_obj: str, th: str, mask_token: str) -> str:
    return (
        f"The object making the sound in the video is {a_obj}. The mask of "
        f"the object that makes the sound at the {th} second is "
        f"<mask_start>{mask_token}<mask_end>"
    )


def arig_train_instruction() -> str:
    """(``unified_dataset.py:521``)."""
    return _IA_PREFIX + (
        "Please recognize the category of object that makes the sound and "
        "then output its location coordinates."
    )


def arig_eval_instruction() -> str:
    """Full-split variant: 'the' instead of 'its'
    (``unified_dataset.py:1632``)."""
    return _IA_PREFIX + (
        "Please recognize the category of object that makes the sound and "
        "then output the location coordinates."
    )


def ref_avs_train_instruction(exp: str, th: str) -> str:
    """(``unified_dataset.py:662``)."""
    return _AV_PREFIX + (
        f"Please segment out {exp.lower()} at the {th} second in the video."
    )


def ref_avs_train_output(exp: str, obj: str, th: str, mask_token: str) -> str:
    """Train-surface answer (``unified_dataset.py:662``)."""
    return (
        f"At the {th} second in the video, {exp} is {obj}. "
        f"Its mask is <mask_start>{mask_token}<mask_end>"
    )


def ref_avs_eval_instruction(exp: str) -> str:
    """Full-split prompt: video+audio+image spans + referential expression
    (``unified_dataset.py:1725``)."""
    return (
        _AV_PREFIX
        + f"This is an image:\n{IMAGE_SPAN}\n"
        + "Please segment out the corresponding object in the image based "
        f"on the referential expression: {exp}"
    )


def avcap_eval_instruction() -> str:
    """Full-split variant drops 'and audio' (``unified_dataset.py:1697``)."""
    return _AV_PREFIX + "Please describe this video."


def s4_train_output(a_obj: str, mask_token: str) -> str:
    return (
        f"The object making the sound in the video is {a_obj}. The mask of the "
        f"object that makes the sound at the first second is "
        f"<mask_start>{mask_token}<mask_end>"
    )


def ref_avs_eval_output(exp: str, mask_token: str) -> str:
    """Quick-start / full-split answer surface — shorter than the train
    format (``unified_dataset.py:1729``). Previously this definition
    silently shadowed :func:`ref_avs_train_output`."""
    return f"{exp} is <mask_start>{mask_token}<mask_end>"


def llama2_chat(instruction: str, system: str = SYSTEM_PROMPT) -> str:
    """LLaMA-2-chat template (tokenizer.apply_chat_template equivalent,
    add_generation_prompt=True)."""
    return f"<s>[INST] <<SYS>>\n{system}\n<</SYS>>\n\n{instruction} [/INST]"


def qwen2_chat(instruction: str, system: str = SYSTEM_PROMPT) -> str:
    return (
        f"<|im_start|>system\n{system}<|im_end|>\n"
        f"<|im_start|>user\n{instruction}<|im_end|>\n"
        f"<|im_start|>assistant\n"
    )


CHAT_TEMPLATES = {"llama": llama2_chat, "qwen": qwen2_chat}
