"""Checkpointing: full train-state via orbax + filtered-delta export.

The reference saves *filtered* state dicts only (projectors + LoRA, or seg
head + embeddings) and never optimizer/RNG state
(``scripts/pretrain/trainer.py:183-203``) — so "resume" silently restarts
the optimizer. Here:

  - ``save_state``/``restore_state``: full, preemption-safe orbax
    checkpoints (params + optimizer + step);
  - ``export_delta``/``load_delta``: the reference-style small artifact
    (only the trainable subtree), with an explicit manifest instead of
    ``strict=False`` guessing.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from crab_tpu.train.state import TrainState, trainable_mask


def _pad_empty(tree):
    """Orbax refuses zero-size arrays; trainable-only training carries
    (0,)-shaped dummies for frozen leaves (train.state.split_trainable),
    which surface in optimizer/accumulator state. Swap them for size-1
    placeholders on save and swap back on restore."""
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda x: jnp.zeros((1,), x.dtype) if getattr(x, "size", 1) == 0 else x,
        tree,
    )


def save_state(path: str, state: TrainState):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), _pad_empty(state), force=True)
    ckptr.wait_until_finished()


def restore_state(path: str, template: TrainState) -> TrainState:
    import jax
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), _pad_empty(template))
    return jax.tree_util.tree_map(
        lambda t, r: t if getattr(t, "size", 1) == 0 else r, template, restored
    )


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = tree
    return out


def export_delta(path: str, params: Dict, modules: Sequence[str]):
    """Save only params matching `modules` (substring on path), npz +
    manifest — the analogue of ``finetune_weights.bin``."""
    mask = trainable_mask(params, modules)
    flat_p = _flatten(params)
    flat_m = _flatten(mask)
    keep = {k: np.asarray(v) for k, v in flat_p.items() if flat_m[k]}
    np.savez(path, **keep)
    manifest = {
        "modules": list(modules),
        "keys": sorted(keep.keys()),
        "shapes": {k: list(v.shape) for k, v in keep.items()},
    }
    with open(path + ".manifest.json", "w") as f:
        json.dump(manifest, f, indent=1)


def load_delta(path: str, params: Dict, strict: bool = True) -> Dict:
    """Overlay a delta file onto a param tree (returns a new tree)."""
    data = np.load(path)
    flat = dict(_flatten(params))
    missing = [k for k in data.files if k not in flat]
    if missing and strict:
        raise KeyError(f"delta keys not in model: {missing[:5]}...")

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return type(tree)(
                rebuild(v, f"{prefix}{i}/") for i, v in enumerate(tree)
            )
        key = prefix[:-1]
        if key in data.files:
            new = jnp.asarray(data[key])
            if strict and new.shape != tree.shape:
                raise ValueError(f"{key}: shape {new.shape} != {tree.shape}")
            return new.astype(tree.dtype)
        return tree

    return rebuild(params)
