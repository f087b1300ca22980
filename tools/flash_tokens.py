"""Flash-prefill token-level parity on chip (VERDICT r04 #7).

The Pallas online-softmax prefill kernel (opt-in; default for bench/
serve) diverges ~4.2e-2 rel from the XLA prefill path at the activation
level (tools/README.md). This tool measures the TOKEN-level consequence
on the serving path: the same batch of AVQA-shaped requests decoded
greedily with prefill_attn='flash' vs 'xla', same weights, same media —
prints per-sequence first-divergence positions and total flip counts.

Prefill numerics only move the FIRST generated token's logits (decode
steps run the same single-token path in both configs; after a flip the
sequences legitimately diverge), so the comparison reports the position
of the first mismatch per row, plus whether row 0's first token agrees.

Run: python tools/flash_tokens.py   (env FT_B batch, FT_NEW tokens,
     FT_LLM backbone — default qwen, the flagship)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

B = int(_os.environ.get("FT_B", "16"))
MAX_NEW = int(_os.environ.get("FT_NEW", "64"))
LLM = _os.environ.get("FT_LLM", "qwen")

from crab_tpu.core.config import backbone_preset
from crab_tpu.fusion.tokens import SpecialTokens
from crab_tpu.lm.quant import init_llama_int8
from crab_tpu.encoders.beats import init_beats
from crab_tpu.encoders.clip_vit import init_clip_vit
from crab_tpu.encoders.projectors import init_projector
from crab_tpu.runtime.engine import InferenceEngine
from crab_tpu.tasks import registry
from bench_serve import BenchTokenizer

_cfg_fn, _vocab, EOS_ID = backbone_preset(LLM)
special = SpecialTokens(base_vocab=_vocab)
base = _cfg_fn().replace(compute_dtype="bfloat16", param_dtype="bfloat16")


def cfg_with(pf):
    return base.replace(decoder=dataclasses.replace(
        base.decoder, kv_quant=True, int8_activations=True,
        prefill_attn=pf, flash_block_q=768, flash_block_k=768,
    ))


@jax.jit
def init_all(key):
    ks = jax.random.split(key, 5)
    return {
        "vision": init_clip_vit(ks[0], base.vision, jnp.bfloat16),
        "audio": init_beats(ks[1], base.audio, jnp.bfloat16),
        "vl_projector": init_projector(
            ks[2], base.vl_projector, base.decoder.hidden_size, jnp.bfloat16
        ),
        "al_projector": init_projector(
            ks[3], base.al_projector, base.decoder.hidden_size, jnp.bfloat16
        ),
        "decoder": init_llama_int8(ks[4], base.decoder),
    }


t0 = time.time()
params = init_all(jax.random.PRNGKey(0))
jax.block_until_ready(params)
print(f"# init: {time.time()-t0:.1f}s", file=_sys.stderr)

task = registry.TaskSpec(
    "ft-avqa",
    lambda s: registry.prompts.avqa_instruction(s["question"]),
    lambda s: s["media"],
    dict(registry.TASKS["avqa"].feature_lens),
    max_new_tokens=MAX_NEW,
)
registry.TASKS["ft-avqa"] = task

rng = np.random.default_rng(0)
samples = [
    {
        "question": "What is the left instrument of the first sounding instrument?",
        "media": {
            "video_yuv": rng.integers(0, 256, (10, 336, 224)).astype(np.uint8),
            "audio": (rng.standard_normal((10, 32000)) * 0.05).astype(np.float32),
        },
    }
    for _ in range(B)
]

tokens = {}
engine = InferenceEngine(
    cfg_with("flash"), params, BenchTokenizer(special), special,
    eos_id=EOS_ID, pad_id=0, pack_donate=True,
)
del params
for pf in ("flash", "xla"):
    engine.cfg = cfg_with(pf)
    # the engine caches compiled programs per (media_keys, avs, head) —
    # config changes need a fresh program cache
    engine._programs = {}
    t0 = time.time()
    out = engine.run("ft-avqa", samples)
    print(f"# {pf}: {time.time()-t0:.1f}s", file=_sys.stderr)
    tokens[pf] = np.asarray(out.tokens)

f, x = tokens["flash"], tokens["xla"]
first_div = []
for i in range(B):
    d = np.nonzero(f[i] != x[i])[0]
    first_div.append(int(d[0]) if len(d) else -1)
n_div = sum(1 for d in first_div if d >= 0)
print(json.dumps({
    "metric": "flash_prefill_token_parity",
    "llm": "Qwen2-7B" if LLM == "qwen" else "LLaMA-2-7B",
    "batch": B,
    "max_new": MAX_NEW,
    "rows_diverged": n_div,
    "first_divergence_positions": first_div,
    "first_token_identical_all_rows": bool(np.all(f[:, 0] == x[:, 0])),
}))
