"""Encode-stage glue ablation (round 5): where do the ~96 ms between the
sum of measured encoder parts (~208 ms — micro_encode_parts.py) and the
resident encode program (~303 ms — bench.py stage breakdown) go?

Rows (all chained-fori_loop timing, tools/README.md rules):
  full        — engine._encode_bank on the wire formats (yuv420 + pcm16)
  rgb-wire    — same but the video arrives as device-resident RGB u8
                (ablates the on-device yuv420_to_rgb conversion)
  prenorm     — pixels pre-normalized NCHW bf16 (ablates clip_normalize
                + the NHWC->NCHW moveaxis; keeps encoders + projectors)
  video-only / audio-only — the two modality pipelines separately

Run: EG_B=16 python tools/micro_encgap.py
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
from crab_tpu.encoders.beats import init_beats
from crab_tpu.encoders.clip_vit import clip_vit_apply, init_clip_vit
from crab_tpu.encoders.projectors import init_projector, projector_apply
from crab_tpu.media.fbank import beats_normalize, kaldi_fbank
from crab_tpu.media.video import clip_normalize, yuv420_to_rgb
from crab_tpu.runtime.model import encode_audio, encode_video

B = int(_os.environ.get("EG_B", "16"))
cfg = crab_7b().replace(compute_dtype="bfloat16", param_dtype="bfloat16")

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 4)
params = {
    "vision": jax.jit(lambda k: init_clip_vit(k, cfg.vision, jnp.bfloat16))(ks[0]),
    "audio": jax.jit(lambda k: init_beats(k, cfg.audio, jnp.bfloat16))(ks[1]),
    "vl_projector": jax.jit(lambda k: init_projector(
        k, cfg.vl_projector, cfg.decoder.hidden_size, jnp.bfloat16))(ks[2]),
    "al_projector": jax.jit(lambda k: init_projector(
        k, cfg.al_projector, cfg.decoder.hidden_size, jnp.bfloat16))(ks[3]),
}

rng = np.random.default_rng(0)
yuv = jnp.asarray(rng.integers(0, 256, (B, 10, 336, 224)).astype(np.uint8))
pcm = jnp.asarray(
    np.clip(rng.standard_normal((B, 10, 32000)) * 0.05 * 32768, -32768, 32767
            ).astype(np.int16)
)
rgb = jax.jit(yuv420_to_rgb)(yuv)  # (B, 10, 224, 224, 3) u8 resident
prenorm = jax.jit(
    lambda f: clip_normalize(f.reshape((-1,) + f.shape[2:])).astype(jnp.bfloat16)
)(rgb)  # (B*10, 3, 224, 224) bf16 resident
jax.block_until_ready((rgb, prenorm))


def timeit(name, fn, *args):
    def chain(n):
        def g(p, *a):
            def body(i, acc):
                pert = [
                    x + (acc * 0).astype(x.dtype) if isinstance(x, jnp.ndarray) else x
                    for x in a
                ]
                out = fn(p, *pert)
                # consume EVERYTHING with a full reduce: taking one
                # element lets XLA dead-code entire modality pipelines
                # (measured: 'full' read 42 ms with [0,0], 10x too low)
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
    print(f"{name}: {ms:.1f} ms", flush=True)
    return ms


def full(p, y, a):
    vt, _ = encode_video(p, cfg, yuv420_to_rgb(y))
    at = encode_audio(p, cfg, a)
    return jnp.concatenate([at, vt], axis=1)


def rgb_wire(p, r, a):
    vt, _ = encode_video(p, cfg, r)
    at = encode_audio(p, cfg, a)
    return jnp.concatenate([at, vt], axis=1)


def prenorm_row(p, px, a):
    taps = clip_vit_apply(p["vision"], px, cfg.vision)
    feats = taps[-1].reshape(B, 10, cfg.vision.tokens_per_image,
                             cfg.vision.hidden_size)
    vt = projector_apply(p["vl_projector"], feats, cfg.vl_projector)
    at = encode_audio(p, cfg, a)
    return jnp.concatenate([at, vt], axis=1)


def video_only(p, y):
    vt, _ = encode_video(p, cfg, yuv420_to_rgb(y))
    return vt


def audio_only(p, a):
    return encode_audio(p, cfg, a)


timeit("full (yuv wire)", full, yuv, pcm)
timeit("rgb wire", rgb_wire, rgb, pcm)
timeit("prenorm pixels", prenorm_row, prenorm, pcm)
timeit("video only (yuv)", video_only, yuv)
timeit("audio only (pcm16)", audio_only, pcm)
