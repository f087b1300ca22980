from crab_tpu.encoders.beats import beats_apply, init_beats
from crab_tpu.encoders.clip_vit import clip_vit_apply, init_clip_vit
from crab_tpu.encoders.projectors import init_projector, projector_apply
from crab_tpu.encoders.qformer import init_qformer, qformer_apply

__all__ = [
    "beats_apply",
    "init_beats",
    "clip_vit_apply",
    "init_clip_vit",
    "init_projector",
    "projector_apply",
    "init_qformer",
    "qformer_apply",
]
