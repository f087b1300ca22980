"""Parameter sharding rules over the ('data', 'model') mesh.

Replaces the reference's DeepSpeed ZeRO-2 data parallelism
(``deepspeed/stage2-offload.json``) with GSPMD sharding:

  - tensor parallelism: decoder projections split on the head/ffn axis
    over 'model' (megatron-style: q/k/v/gate/up column-split, o/down
    row-split — collectives ride ICI);
  - ZeRO/FSDP-style: the same weights split on the *other* matrix axis
    over 'data', so each data shard holds 1/data of every weight and XLA
    all-gathers per layer inside the scan;
  - encoders/projectors/seg (small, frozen or near-frozen) replicate;
  - embeddings/lm_head split on vocab over 'model'.

Everything is expressed as PartitionSpecs mirroring the param pytree, so
``jax.device_put(params, shard_params_specs(...))`` or pjit in/out specs
can consume it directly.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P



def decoder_layer_specs(fsdp: bool = True) -> Dict[str, Any]:
    """Specs for the stacked (L, in, out) decoder weights."""
    data = "data" if fsdp else None
    col = P(None, data, "model")  # (L, in[data], out[model])
    row = P(None, "model", data)  # (L, in[model], out[data])
    rep = P()

    def proj(spec, bias_spec=None, lora_out=False):
        # quantized storage mirrors 'w': w_q (L, in, out) shards like w;
        # the per-out-channel scale w_s (L, 1, out) and group-int4 scales
        # w_g (L, D/g, 2, O/2) shard on the out axis only (the group axis
        # need not align with the in-axis shards). Without these entries
        # int8/int4 decoders silently replicate on every device.
        out_axis = spec[2]  # 'model' for column-parallel, data for row
        d = {
            "w": spec,
            "w_q": spec,
            "w_s": P(None, None, out_axis),
            "w_p": spec,
            "w_g": P(None, None, None, out_axis),
        }
        if bias_spec is not None:
            d["b"] = bias_spec
        d["lora"] = {
            "route": P(),
            "A": P(),
            "B": P(None, None, None, "model") if lora_out else P(),
            # pack_decoder's fused o/down layout keeps these per-proj keys
            # (only qkv/gu get the `packed` dict). Without entries here the
            # fused expert matrices would silently replicate everywhere.
            # RA is tiny -> replicated; Bd (L, E*r, out) shards its out
            # axis like 'w' does (row-parallel o/down: out on `data`).
            "RA": P(),
            "Bd": P(None, None, out_axis),
        }
        return d

    # packed serving layout (lm/pack.py): column-parallel like its members
    # (output channels are independent, so the concat boundary need not
    # align with the model-axis shards); packed lora experts are one
    # block-diagonal Bd (L, n*E*r, sum_out) — see lm/pack.blockdiag_experts
    packed = {
        "w": col,
        "w_q": col,
        "w_s": P(None, None, "model"),
        "w_p": col,
        "w_g": P(None, None, None, "model"),
        "b": P(None, "model"),
        "lora": {
            "RA": P(),  # fused route+A (tiny; replicated like its parts)
            "route": P(),
            "A": P(),
            # block-diagonal experts (L, n*E*r, sum_out): column-parallel
            # like 'w' (each output column is an independent dot)
            "Bd": P(None, None, "model"),
        },
    }

    return {
        "attn_norm": {"scale": P()},
        "mlp_norm": {"scale": P()},
        "q": proj(col, P(None, "model"), lora_out=True),
        "k": proj(col, P(None, "model"), lora_out=True),
        "v": proj(col, P(None, "model"), lora_out=True),
        "o": proj(row, lora_out=False),
        "gate": proj(col, lora_out=True),
        "up": proj(col, lora_out=True),
        "down": proj(row, lora_out=False),
        "qkv": packed,
        "gu": packed,
    }


def crab_param_specs(params: Dict, fsdp: bool = True) -> Dict:
    """PartitionSpec pytree matching an init_crab/convert param tree."""
    layer_specs = decoder_layer_specs(fsdp)

    def spec_for(path, leaf):
        keys = [p.key for p in path if hasattr(p, "key")]
        if not keys:
            return P()
        if keys[0] == "decoder":
            if keys[1] == "embed":
                # extended vocab (base + 17) is rarely divisible by the
                # model axis; replicate the table, shard the lm_head on
                # hidden (row-parallel -> psum on logits)
                return P()
            if keys[1] in ("lm_head", "lm_head_q"):
                return P("model", None)
            if keys[1] == "lm_head_s":
                return P()  # per-vocab scale, replicated
            if keys[1] == "final_norm":
                return P()
            if keys[1] == "layers":
                node: Any = layer_specs
                for k in keys[2:]:
                    if isinstance(node, dict) and k in node:
                        node = node[k]
                    else:
                        return P()
                return node if isinstance(node, P) else P()
        return P()  # encoders / projectors / seg: replicated

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_crab_params(params: Dict, mesh: Mesh, fsdp: bool = True) -> Dict:
    """Place params on the mesh according to the spec tree."""
    specs = crab_param_specs(params, fsdp)
    return jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params,
        specs,
    )
