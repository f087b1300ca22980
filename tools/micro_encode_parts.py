"""Encoder stage breakdown: CLIP vs BEATs vs Q-Formers vs fbank.

bench.py measures the resident encode program at ~303 ms for a batch of
16 AVQA clips (160 CLIP frames + 160 BEATs seconds + both Q-Formers).
CLIP ViT-L alone is ~1.6 TFLOP/clip, so 16 clips at the bf16 peak would
be ~130 ms — this tool splits the 303 ms to see which stage is off its
roofline before optimizing anything. Same chained-fori_loop timing rules
as the other micro tools (tools/README.md).

Run: EP_B=16 python tools/micro_encode_parts.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from crab_tpu.core.config import crab_7b
from crab_tpu.encoders.beats import beats_apply, init_beats
from crab_tpu.encoders.clip_vit import clip_vit_apply, init_clip_vit
from crab_tpu.encoders.projectors import init_projector, projector_apply
from crab_tpu.media.fbank import beats_fbank

B = int(_os.environ.get("EP_B", "16"))
FRAMES = 10
SECONDS = 10

cfg = crab_7b()
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 4)
vparams = jax.jit(lambda k: init_clip_vit(k, cfg.vision, jnp.bfloat16))(ks[0])
aparams = jax.jit(lambda k: init_beats(k, cfg.audio, jnp.bfloat16))(ks[1])
vproj = jax.jit(
    lambda k: init_projector(k, cfg.vl_projector, cfg.decoder.hidden_size, jnp.bfloat16)
)(ks[2])
aproj = jax.jit(
    lambda k: init_projector(k, cfg.al_projector, cfg.decoder.hidden_size, jnp.bfloat16)
)(ks[3])

pixels = jax.jit(
    lambda k: jax.random.normal(k, (B * FRAMES, 3, 224, 224), jnp.bfloat16)
)(jax.random.PRNGKey(1))
wav = jax.jit(
    lambda k: jax.random.normal(k, (B * SECONDS, 32000), jnp.float32) * 0.05
)(jax.random.PRNGKey(2))


def timeit(name, fn, params, *args):
    """fn(params, *inputs); params passed as a jit ARGUMENT — a closure
    capture would embed the 300M-param encoders as constants in the
    remote-compile request body (HTTP 413)."""
    def chain(n):
        def g(p, *a):
            def body(i, acc):
                perturbed = [
                    x + (acc * 0).astype(x.dtype)
                    if isinstance(x, jnp.ndarray) else x
                    for x in a
                ]
                out = fn(p, *perturbed)
                # full reduce over every leaf: consuming one element of
                # the first CLIP tap let XLA dead-code layers 15-23 —
                # the round-3/4 table's CLIP row (156 ms) measured only
                # 14 of 23 layers (caught round 5, micro_encgap.py)
                tot = sum(
                    jnp.sum(l.astype(jnp.float32))
                    for l in jax.tree_util.tree_leaves(out)
                )
                return acc + tot
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))
        f = jax.jit(g)
        float(f(params, *args))
        best = 1e9
        for _ in range(2):
            t0 = time.time()
            float(f(params, *args))
            best = min(best, time.time() - t0)
        return best

    t2, t6 = chain(2), chain(6)
    ms = (t6 - t2) / 4 * 1000
    print(f"{name}: {ms:.1f} ms")
    return ms


fb = jax.jit(lambda w: beats_fbank(w))(wav)
timeit(
    f"clip {B*FRAMES} frames (3 taps)",
    lambda p, px: clip_vit_apply(p, px, cfg.vision),
    vparams, pixels,
)
timeit(
    f"beats {B*SECONDS} seconds",
    lambda p, f: beats_apply(p, f, cfg.audio),
    aparams, fb,
)
timeit(
    f"fbank {B*SECONDS} seconds", lambda p, w: beats_fbank(w), {}, wav
)

v_last = clip_vit_apply(vparams, pixels, cfg.vision)[-1]  # (BF, N, W)
N, W = v_last.shape[1], v_last.shape[2]
v_feats = v_last.reshape(B, FRAMES, N, W)
a_tokens = beats_apply(aparams, fb, cfg.audio)  # (BS, N, 768)
a_feats = a_tokens.reshape(B, SECONDS, a_tokens.shape[1], a_tokens.shape[2])
timeit(
    "vl q-former",
    lambda p, f: projector_apply(p, f, cfg.vl_projector),
    vproj, v_feats,
)
timeit(
    "al q-former",
    lambda p, f: projector_apply(p, f, cfg.al_projector),
    aproj, a_feats,
)

# ---- W8A8 rows (round 5, VERDICT r04 #2): the same stages with
# encoders/quantize.py applied — CLIP runs s8xs8 on the MXU (2x rate;
# micro_mxu8.py measured 1.6-1.8x sustained on pure matmuls) ----
if _os.environ.get("EP_INT8", "1") == "1":
    from crab_tpu.encoders.quantize import quantize_encoder_tree

    vq = jax.jit(quantize_encoder_tree)(vparams)
    aq = jax.jit(quantize_encoder_tree)(aparams)
    timeit(
        f"clip {B*FRAMES} frames (3 taps, W8A8)",
        lambda p, px: clip_vit_apply(p, px, cfg.vision),
        vq, pixels,
    )
    timeit(
        f"beats {B*SECONDS} seconds (W8A8)",
        lambda p, f: beats_apply(p, f, cfg.audio),
        aq, fb,
    )
    # numerics check at the serving shape: rel err of the projector-
    # feeding tap and the seg taps
    ref = clip_vit_apply(vparams, pixels, cfg.vision)
    got = clip_vit_apply(vq, pixels, cfg.vision)
    for i, (r, g) in enumerate(zip(ref, got)):
        num = jnp.linalg.norm((g - r).astype(jnp.float32))
        den = jnp.linalg.norm(r.astype(jnp.float32)) + 1e-9
        print(f"clip tap{i} W8A8 rel err: {float(num/den):.4f}")
    ra = beats_apply(aparams, fb, cfg.audio)
    ga = beats_apply(aq, fb, cfg.audio)
    num = jnp.linalg.norm((ga - ra).astype(jnp.float32))
    den = jnp.linalg.norm(ra.astype(jnp.float32)) + 1e-9
    print(f"beats W8A8 rel err: {float(num/den):.4f}")
