"""Flash vs XLA prefill attention at the serving shape (round 4).

micro_prefill2.py localized 253 ms of the 1047 ms W8A8 prefill
(B=16, T=768) to attention — the XLA path materializes the (B,H,T,T)
fp32 score tensor around the softmax (1.2 GB/layer). This measures the
full packed prefill with cfg.prefill_attn='flash' (Pallas online-softmax
kernel, jax.experimental.pallas.ops.tpu.flash_attention) across block
sizes, plus a numerics check vs the XLA path on one layer.

This environment pays ~5.6 us fixed cost per Pallas grid step
(tools/README.md), so bigger blocks should win: at (bq, bk) the grid is
B*H*(T/bq) steps with T/bk inner iterations.

Run: [PA_BLOCKS=256:256,768:256,768:768] python tools/micro_prefill_attn.py
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

from crab_tpu.core.config import crab_7b
import crab_tpu.lm.llama as L
from crab_tpu.lm.pack import pack_decoder
from crab_tpu.lm.quant import init_llama_int8

B = int(_os.environ.get("PA_B", "16"))
T = int(_os.environ.get("PA_T", "768"))
BLOCKS = [
    tuple(int(x) for x in s.split(":"))
    for s in _os.environ.get("PA_BLOCKS", "256:256,768:256,768:768").split(",")
]


def build(variant, bq=256, bk=256):
    cfg = dataclasses.replace(
        crab_7b().decoder, kv_quant=True, int8_activations=True,
        prefill_attn=variant, flash_block_q=bq, flash_block_k=bk,
    )
    params = jax.jit(lambda k: init_llama_int8(k, cfg))(jax.random.PRNGKey(0))
    params = pack_decoder(params, cfg, donate=True)
    return cfg, params


def measure(cfg, params):
    emb = jax.jit(
        lambda k: jax.random.normal(k, (B, T, cfg.hidden_size), jnp.bfloat16)
        * 0.02
    )(jax.random.PRNGKey(1))
    mask = jnp.ones((B, T), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T)[None], (B, T))

    def chain(n):
        def fn(p, e):
            def body(i, acc):
                cache = L.KVCacheQ.zeros(cfg, B, T, e.dtype)
                logits, _, _, _ = L.llama_apply(
                    p, cfg, e + (acc * 0).astype(e.dtype),
                    attention_mask=mask, position_ids=pos, cache=cache,
                    last_logit_only=True,
                )
                return acc + logits[0, -1, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        f = jax.jit(fn)
        float(f(params, emb))
        best = 1e9
        for _ in range(2):
            t0 = time.time()
            float(f(params, emb))
            best = min(best, time.time() - t0)
        return best

    t2, t6 = chain(2), chain(6)
    return (t6 - t2) / 4.0 * 1000


def numerics():
    """One-layer logits diff, flash vs xla, with left padding."""
    cfg, params = build("xla")
    cfg1 = dataclasses.replace(cfg, num_layers=1)
    p1 = jax.tree.map(
        lambda a: a[:1] if a.ndim and a.shape[0] == cfg.num_layers else a,
        params,
        is_leaf=lambda a: hasattr(a, "shape"),
    )
    emb = jax.random.normal(
        jax.random.PRNGKey(2), (2, T, cfg.hidden_size), jnp.bfloat16
    ) * 0.02
    mask = np.ones((2, T), np.int32)
    mask[1, : T // 3] = 0  # left padding on row 1
    mask = jnp.asarray(mask)
    outs = {}
    for variant in ("xla", "flash"):
        c = dataclasses.replace(cfg1, prefill_attn=variant)
        logits, _, _, _ = jax.jit(
            lambda p, e, m, c=c: L.llama_apply(p, c, e, attention_mask=m)
        )(p1, emb, mask)
        outs[variant] = np.asarray(logits, np.float32)
    # compare VALID positions only: pad-query rows differ by design
    # (xla lets pad queries attend real keys; flash walls them off in
    # segment 0) and pads never feed valid positions in either path
    valid = np.asarray(mask, bool)
    d = np.abs(outs["xla"] - outs["flash"])[valid]
    ref = np.abs(outs["xla"])[valid]
    rel = d.max() / max(ref.max(), 1e-6)
    print(f"numerics (valid rows): max abs diff {d.max():.3e}  rel {rel:.3e}")
    return float(rel)


if __name__ == "__main__":
    res = {}
    cfg, params = build("xla")
    res["xla"] = round(measure(cfg, params), 1)
    print(f"xla: prefill {res['xla']:.0f} ms resident (B={B}, T={T})")
    del params
    for bq, bk in BLOCKS:
        cfg, params = build("flash", bq, bk)
        key = f"flash_{bq}x{bk}"
        try:
            res[key] = round(measure(cfg, params), 1)
            print(f"{key}: prefill {res[key]:.0f} ms resident")
        except Exception as e:  # VMEM OOM at big blocks: record, move on
            res[key] = str(e)[:120]
            print(f"{key}: FAILED {res[key]}")
        del params
    if _os.environ.get("PA_NUMERICS", "1") == "1":
        res["rel_err"] = numerics()
    print(json.dumps(res))
