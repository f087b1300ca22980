"""Device mesh + sharding helpers.

The reference scales with torchrun + DeepSpeed ZeRO-2 over NCCL
(``deepspeed/stage2-offload.json``, ``scripts/finetune/finetune_hyperlora.sh``).
The TPU-native replacement is a single ``jax.sharding.Mesh`` over ICI with
GSPMD-compiled collectives: a ``data`` axis for batch/ZeRO sharding and a
``model`` axis for tensor parallelism of the decoder.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclass(frozen=True)
class MeshSpec:
    data: int = 1
    model: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.model


def make_mesh(
    spec: Optional[MeshSpec] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh.

    With no spec, uses every visible device on the data axis (pure DP).
    The model axis should ride ICI; on a single slice any contiguous
    device assignment does, so default ordering is fine.
    """
    if devices is None:
        devices = jax.devices()
    if spec is None:
        spec = MeshSpec(data=len(devices), model=1)
    if spec.num_devices > len(devices):
        raise ValueError(
            f"mesh spec {spec} needs {spec.num_devices} devices, "
            f"have {len(devices)}"
        )
    grid = np.asarray(devices[: spec.num_devices]).reshape(spec.data, spec.model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def make_multislice_mesh(
    dcn_data: int, data: int, model: int = 1
) -> Mesh:
    """Hybrid mesh for multi-slice training: a ('dcn', 'data', 'model')
    mesh where the leading axis crosses slice boundaries (DCN) and the
    inner axes stay on ICI. Shard only data-parallel gradient reduction
    over 'dcn'; keep tensor parallelism on 'model' (ICI).

    Requires jax.distributed.initialize() across hosts first.
    """
    from jax.experimental import mesh_utils

    devices = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(data, model),
        dcn_mesh_shape=(dcn_data, 1),
    )
    return Mesh(devices.reshape(dcn_data, data, model), ("dcn", DATA_AXIS, MODEL_AXIS))


def local_mesh() -> Mesh:
    """Single-device mesh (inference on one chip)."""
    return make_mesh(MeshSpec(1, 1), jax.devices()[:1])


def shard(mesh: Mesh, pspec: P) -> NamedSharding:
    return NamedSharding(mesh, pspec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
