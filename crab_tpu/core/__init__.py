from crab_tpu.core.config import (
    AudioEncoderConfig,
    CrabConfig,
    DecoderConfig,
    MoELoRAConfig,
    ProjectorConfig,
    SegConfig,
    VisionEncoderConfig,
)
from crab_tpu.core.mesh import MeshSpec, make_mesh
from crab_tpu.core.precision import Policy

__all__ = [
    "AudioEncoderConfig",
    "CrabConfig",
    "DecoderConfig",
    "MoELoRAConfig",
    "ProjectorConfig",
    "SegConfig",
    "VisionEncoderConfig",
    "MeshSpec",
    "make_mesh",
    "Policy",
]
