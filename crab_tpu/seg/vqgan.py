"""VQGAN f16/16384 mask tokenizer (the reference's optional mask->token
route).

Re-designs ``models/taming_transformer/`` + ``MaskEncoder``
(``models/multimodal_encoder.py:546-601``): the taming-transformers
ImageNet f16 VQ-GAN (ch 128, ch_mult (1,1,2,2,4), 2 res blocks, attention
at 16x16, 256-d codebook of 16384 entries). ``use_vqgan`` is off in every
reference config (``quick_start.py:525``) but is part of the component
inventory; here it is a pure-JAX encode/decode pair with a torch-ckpt
converter.

A 224x224 mask encodes to 14x14 = 196 codebook indices, shifted by
``token_shift`` into the extended LLM vocabulary.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DDCONFIG = {
    "z_channels": 256,
    "ch": 128,
    "ch_mult": (1, 1, 2, 2, 4),
    "num_res_blocks": 2,
    "attn_resolutions": (16,),
    "in_channels": 3,
    "out_ch": 3,
    "resolution": 256,
}
N_EMBED = 16384
EMBED_DIM = 256


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _group_norm(p, x, groups: int = 32, eps: float = 1e-6):
    """GroupNorm over (B, C, H, W)."""
    B, C, H, W = x.shape
    xf = x.astype(jnp.float32).reshape(B, groups, C // groups, H, W)
    mean = xf.mean(axis=(2, 3, 4), keepdims=True)
    var = jnp.square(xf - mean).mean(axis=(2, 3, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(B, C, H, W)
    return (
        xf * p["scale"][None, :, None, None] + p["bias"][None, :, None, None]
    ).astype(x.dtype)


def _conv(p, x, stride: int = 1, padding=1):
    if isinstance(padding, int):
        padding = [(padding, padding)] * 2
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + p["b"].astype(y.dtype)[None, :, None, None]


def _resnet_block(p, x):
    h = _conv(p["conv1"], _swish(_group_norm(p["norm1"], x)))
    h = _conv(p["conv2"], _swish(_group_norm(p["norm2"], h)))
    if "nin_shortcut" in p:
        x = _conv(p["nin_shortcut"], x, padding=0)
    return x + h


def _attn_block(p, x):
    B, C, H, W = x.shape
    h = _group_norm(p["norm"], x)
    q = _conv(p["q"], h, padding=0).reshape(B, C, H * W)
    k = _conv(p["k"], h, padding=0).reshape(B, C, H * W)
    v = _conv(p["v"], h, padding=0).reshape(B, C, H * W)
    logits = jnp.einsum("bcq,bck->bqk", q, k) / math.sqrt(C)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bqk,bck->bcq", w, v).reshape(B, C, H, W)
    return x + _conv(p["proj_out"], out, padding=0)


def encoder_apply(p, x):
    """(B, 3, H, W) in [-1, 1] -> (B, z_channels, H/16, W/16)."""
    h = _conv(p["conv_in"], x)
    for level in p["down"]:
        attn = level.get("attn", [])
        for b, blk in enumerate(level["blocks"]):
            h = _resnet_block(blk, h)
            if b < len(attn):  # taming interleaves attn after each block
                h = _attn_block(attn[b], h)
        if "downsample" in level:
            # taming uses asymmetric (0,1,0,1) padding with stride 2
            h = jnp.pad(h, ((0, 0), (0, 0), (0, 1), (0, 1)))
            h = jax.lax.conv_general_dilated(
                h, level["downsample"]["w"], (2, 2), [(0, 0), (0, 0)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            ) + level["downsample"]["b"][None, :, None, None]
    h = _resnet_block(p["mid"]["block_1"], h)
    h = _attn_block(p["mid"]["attn_1"], h)
    h = _resnet_block(p["mid"]["block_2"], h)
    h = _conv(p["conv_out"], _swish(_group_norm(p["norm_out"], h)))
    return h


def decoder_apply(p, z):
    """(B, z_channels, h, w) -> (B, 3, 16h, 16w)."""
    h = _conv(p["conv_in"], z)
    h = _resnet_block(p["mid"]["block_1"], h)
    h = _attn_block(p["mid"]["attn_1"], h)
    h = _resnet_block(p["mid"]["block_2"], h)
    for level in p["up"]:
        attn = level.get("attn", [])
        for b, blk in enumerate(level["blocks"]):
            h = _resnet_block(blk, h)
            if b < len(attn):
                h = _attn_block(attn[b], h)
        if "upsample" in level:
            B, C, H, W = h.shape
            h = jax.image.resize(h, (B, C, 2 * H, 2 * W), "nearest")
            h = _conv(level["upsample"], h)
    h = _conv(p["conv_out"], _swish(_group_norm(p["norm_out"], h)))
    return h


def quantize_indices(codebook: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Nearest-codebook-entry indices. z (B, C, H, W) -> (B, H*W)."""
    B, C, H, W = z.shape
    flat = z.transpose(0, 2, 3, 1).reshape(-1, C).astype(jnp.float32)
    cb = codebook.astype(jnp.float32)
    d = (
        jnp.sum(flat**2, axis=1, keepdims=True)
        + jnp.sum(cb**2, axis=1)[None]
        - 2.0 * flat @ cb.T
    )
    idx = jnp.argmin(d, axis=1)
    return idx.reshape(B, H * W)


def vqgan_encode_indices(params, images) -> jnp.ndarray:
    """images (B, 3, H, W) in [-1, 1] -> (B, (H/16)*(W/16)) codebook ids
    (``vqgan.py:94`` get_codebook_indices)."""
    z = encoder_apply(params["encoder"], images)
    z = _conv(params["quant_conv"], z, padding=0)
    return quantize_indices(params["codebook"], z)


def vqgan_decode_code(params, indices, hw: Tuple[int, int]) -> jnp.ndarray:
    """(B, N) ids -> (B, 3, 16h, 16w) reconstruction (``vqgan.py:69``)."""
    B = indices.shape[0]
    h, w = hw
    quant = jnp.take(params["codebook"], indices, axis=0, mode="clip")
    quant = quant.reshape(B, h, w, -1).transpose(0, 3, 1, 2)
    z = _conv(params["post_quant_conv"], quant, padding=0)
    return decoder_apply(params["decoder"], z)


class MaskTokenizer:
    """mask <-> LLM-token route (``MaskEncoder``, token_shift=32020).

    With ``use_vqgan`` the reference splices codebook indices (shifted
    into the extended vocabulary) into the token stream as *ids*, not
    features (``unified_arch.py:304-308``); ``expand_ids`` implements
    that splice on host token sequences.
    """

    def __init__(self, params, token_shift: int = 32020):
        self.params = params
        self.token_shift = token_shift
        self._encode = jax.jit(vqgan_encode_indices)

    def encode_mask(self, mask_images) -> jnp.ndarray:
        return self._encode(self.params, mask_images) + self.token_shift

    def decode_mask(self, indices, hw=(14, 14)) -> jnp.ndarray:
        ids = jnp.clip(indices - self.token_shift, 0, N_EMBED - 1)
        return vqgan_decode_code(self.params, ids, hw)

    def expand_ids(self, input_ids, mask_image, placeholder_id: int):
        """Replace each `placeholder_id` in a 1-D id array with the mask's
        shifted codebook ids (host-side, feeds fusion.splice as text)."""
        import numpy as np

        codes = np.asarray(self.encode_mask(mask_image[None])[0])
        out = []
        for t in np.asarray(input_ids).tolist():
            if t == placeholder_id:
                out.extend(codes.tolist())
            else:
                out.append(t)
        return np.asarray(out, np.int64)


# ---------------------------------------------------------------------------
# init + torch conversion
# ---------------------------------------------------------------------------


def _np(t):
    if hasattr(t, "detach"):
        return t.detach().cpu().float().numpy()
    return np.asarray(t, np.float32)


def _c(sd, name):
    return {"w": jnp.asarray(_np(sd[f"{name}.weight"])),
            "b": jnp.asarray(_np(sd[f"{name}.bias"]))}


def _gn(sd, name):
    return {"scale": jnp.asarray(_np(sd[f"{name}.weight"])),
            "bias": jnp.asarray(_np(sd[f"{name}.bias"]))}


def _res(sd, name, has_nin):
    p = {
        "norm1": _gn(sd, f"{name}.norm1"),
        "conv1": _c(sd, f"{name}.conv1"),
        "norm2": _gn(sd, f"{name}.norm2"),
        "conv2": _c(sd, f"{name}.conv2"),
    }
    if has_nin:
        p["nin_shortcut"] = _c(sd, f"{name}.nin_shortcut")
    return p


def _attn(sd, name):
    return {
        "norm": _gn(sd, f"{name}.norm"),
        "q": _c(sd, f"{name}.q"),
        "k": _c(sd, f"{name}.k"),
        "v": _c(sd, f"{name}.v"),
        "proj_out": _c(sd, f"{name}.proj_out"),
    }


def convert_vqgan(sd: Dict, cfg: Dict = DDCONFIG) -> Dict:
    """taming VQModel state dict -> crab_tpu param tree."""
    ch, mults = cfg["ch"], cfg["ch_mult"]
    nres = cfg["num_res_blocks"]
    levels = len(mults)
    res = cfg["resolution"]
    attn_res = set(cfg["attn_resolutions"])

    def has_key(k):
        return k in sd

    enc = {
        "conv_in": _c(sd, "encoder.conv_in"),
        "down": [],
        "mid": {
            "block_1": _res(sd, "encoder.mid.block_1", False),
            "attn_1": _attn(sd, "encoder.mid.attn_1"),
            "block_2": _res(sd, "encoder.mid.block_2", False),
        },
        "norm_out": _gn(sd, "encoder.norm_out"),
        "conv_out": _c(sd, "encoder.conv_out"),
    }
    cur_res = res
    for i in range(levels):
        level = {"blocks": []}
        for b in range(nres):
            nin = has_key(f"encoder.down.{i}.block.{b}.nin_shortcut.weight")
            level["blocks"].append(_res(sd, f"encoder.down.{i}.block.{b}", nin))
        if cur_res in attn_res:
            level["attn"] = [
                _attn(sd, f"encoder.down.{i}.attn.{b}") for b in range(nres)
                if has_key(f"encoder.down.{i}.attn.{b}.norm.weight")
            ]
        if i != levels - 1:
            level["downsample"] = _c(sd, f"encoder.down.{i}.downsample.conv")
            cur_res //= 2
        enc["down"].append(level)

    dec = {
        "conv_in": _c(sd, "decoder.conv_in"),
        "mid": {
            "block_1": _res(sd, "decoder.mid.block_1", False),
            "attn_1": _attn(sd, "decoder.mid.attn_1"),
            "block_2": _res(sd, "decoder.mid.block_2", False),
        },
        "up": [],
        "norm_out": _gn(sd, "decoder.norm_out"),
        "conv_out": _c(sd, "decoder.conv_out"),
    }
    # taming decoder iterates levels in REVERSED order at forward time
    cur_res = res // 2 ** (levels - 1)
    for i in reversed(range(levels)):
        level = {"blocks": []}
        for b in range(nres + 1):
            nin = has_key(f"decoder.up.{i}.block.{b}.nin_shortcut.weight")
            level["blocks"].append(_res(sd, f"decoder.up.{i}.block.{b}", nin))
        if cur_res in attn_res:
            level["attn"] = [
                _attn(sd, f"decoder.up.{i}.attn.{b}") for b in range(nres + 1)
                if has_key(f"decoder.up.{i}.attn.{b}.norm.weight")
            ]
        if i != 0:
            level["upsample"] = _c(sd, f"decoder.up.{i}.upsample.conv")
            cur_res *= 2
        dec["up"].append(level)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _c(sd, "quant_conv"),
        "post_quant_conv": _c(sd, "post_quant_conv"),
        "codebook": jnp.asarray(_np(sd["quantize.embedding.weight"])),
    }
