from crab_tpu.media.fbank import kaldi_fbank, beats_normalize, FbankConfig
from crab_tpu.media.audio import (
    load_audio,
    load_wav,
    chunk_windows_1s,
    chunk_windows_2s_stride6,
    chunk_single_second,
)
from crab_tpu.media.video import (
    clip_normalize,
    load_video_frames,
    load_image,
)
from crab_tpu.media.masks import (
    avs_palette,
    color_mask_to_label,
    load_binary_mask,
    load_avss_label_mask,
)

__all__ = [
    "kaldi_fbank",
    "beats_normalize",
    "FbankConfig",
    "load_audio",
    "load_wav",
    "chunk_windows_1s",
    "chunk_windows_2s_stride6",
    "chunk_single_second",
    "clip_normalize",
    "load_video_frames",
    "load_image",
    "avs_palette",
    "color_mask_to_label",
    "load_binary_mask",
    "load_avss_label_mask",
]
