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


def s4_train_output(a_obj: str, mask_token: str) -> str:
    return (
        f"The object making the sound in the video is {a_obj}. The mask of the "
        f"object that makes the sound at the first second is "
        f"<mask_start>{mask_token}<mask_end>"
    )


def ref_avs_train_output(exp: str, obj: str, mask_token: str) -> str:
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
