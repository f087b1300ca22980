"""Compile-only memory analysis of the 7B train step (no execution):
where does the RESOURCE_EXHAUSTED come from?"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from crab_tpu.core.config import crab_7b
from crab_tpu.fusion.splice import IGNORE_LABEL, SampleSpec, build_splice_batch
from crab_tpu.fusion.tokens import SpecialTokens
from crab_tpu.lm.quant import init_llama_int8
from crab_tpu.encoders.beats import init_beats
from crab_tpu.encoders.clip_vit import init_clip_vit
from crab_tpu.encoders.projectors import init_projector
from crab_tpu.train.state import (
    STAGE_TRAINABLE, init_train_state, make_optimizer, make_train_step,
    trainable_mask,
)

B = int(_os.environ.get("B", "2"))
cfg = crab_7b().replace(compute_dtype="bfloat16", param_dtype="bfloat16")
special = SpecialTokens(base_vocab=32000)


def abstract(f, *a):
    return jax.eval_shape(f, *a)


params = abstract(
    lambda k: {
        "vision": init_clip_vit(k, cfg.vision, jnp.bfloat16),
        "audio": init_beats(k, cfg.audio, jnp.bfloat16),
        "vl_projector": init_projector(k, cfg.vl_projector, cfg.decoder.hidden_size, jnp.bfloat16),
        "al_projector": init_projector(k, cfg.al_projector, cfg.decoder.hidden_size, jnp.bfloat16),
        "decoder": init_llama_int8(k, cfg.decoder),
    },
    jax.random.PRNGKey(0),
)

rng = np.random.default_rng(0)
qv = cfg.vl_projector.num_query_tokens * 10
qa = cfg.al_projector.num_query_tokens * 10
prompt = np.concatenate([
    rng.integers(10, 30000, 40),
    [special.id("<video>"), special.id("<audio>")],
    rng.integers(10, 30000, 18),
]).astype(np.int64)
answer = rng.integers(10, 30000, 12).astype(np.int64)
full = np.concatenate([prompt, answer])
labels = np.full(len(full), IGNORE_LABEL, np.int64)
labels[len(prompt):] = answer
specs = [SampleSpec(full, {"<video>": qv, "<audio>": qa}, labels, "avqa") for _ in range(B)]
sb = build_splice_batch(specs, special, pad_to=768)
batch = {
    "media": {
        "video": jax.ShapeDtypeStruct((B, 10, 224, 224, 3), jnp.uint8),
        "audio": jax.ShapeDtypeStruct((B, 10, 32000), jnp.float32),
    },
    "text_ids": jax.ShapeDtypeStruct(sb.text_ids.shape, jnp.int64),
    "feat_idx": jax.ShapeDtypeStruct(sb.feat_idx.shape, jnp.int64),
    "attention_mask": jax.ShapeDtypeStruct(sb.attention_mask.shape, jnp.int64),
    "position_ids": jax.ShapeDtypeStruct(sb.position_ids.shape, jnp.int64),
    "labels": jax.ShapeDtypeStruct(sb.labels.shape, jnp.int64),
}

mask = trainable_mask(params, STAGE_TRAINABLE["finetune"])
opt = make_optimizer(1e-4, STAGE_TRAINABLE["finetune"], params)
step = make_train_step(cfg, opt, avs=False, trainable=mask, dropout_seed=0)
state = abstract(lambda p: init_train_state(p, opt, trainable=mask), params)

lowered = jax.jit(step).lower(state, batch)
compiled = lowered.compile()
ma = compiled.memory_analysis()
gb = 2.0 ** 30
print(f"B={B} args={ma.argument_size_in_bytes/gb:.2f} GB  "
      f"out={ma.output_size_in_bytes/gb:.2f} GB  "
      f"temp={ma.temp_size_in_bytes/gb:.2f} GB  "
      f"alias={ma.alias_size_in_bytes/gb:.2f} GB")
