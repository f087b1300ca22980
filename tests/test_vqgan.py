"""VQGAN mask-tokenizer parity vs the reference taming VQModel
(read-only import, tiny config)."""

import sys
import types
import importlib.machinery

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from crab_tpu.seg.vqgan import (
    MaskTokenizer,
    convert_vqgan,
    vqgan_decode_code,
    vqgan_encode_indices,
)

TINY_DD = {
    "double_z": False,
    "z_channels": 32,
    "resolution": 32,
    "in_channels": 3,
    "out_ch": 3,
    "ch": 32,
    "ch_mult": (1, 2),
    "num_res_blocks": 2,
    "attn_resolutions": (16,),
    "dropout": 0.0,
}


@pytest.fixture(scope="module")
def torch_vq():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    # test_seg stubs this module (SegModule doesn't need it) — evict the
    # stub so the real implementation loads here
    mod = sys.modules.get("models.taming_transformer.vqgan")
    if mod is not None and not hasattr(mod.VQModel, "get_codebook_indices"):
        del sys.modules["models.taming_transformer.vqgan"]
    torch.manual_seed(3)
    from models.taming_transformer.vqgan import VQModel

    m = VQModel(ddconfig=TINY_DD, lossconfig=None, n_embed=64, embed_dim=32)
    return m.eval()


def _tiny_cfg():
    return {
        "z_channels": 32,
        "ch": 32,
        "ch_mult": (1, 2),
        "num_res_blocks": 2,
        "attn_resolutions": (16,),
        "in_channels": 3,
        "out_ch": 3,
        "resolution": 32,
    }


def test_vqgan_encode_parity(torch_vq):
    rng = np.random.default_rng(0)
    x = (rng.random((2, 3, 32, 32)).astype(np.float32) * 2 - 1)
    with torch.no_grad():
        ref_idx = torch_vq.get_codebook_indices(torch.from_numpy(x))
    params = convert_vqgan(torch_vq.state_dict(), _tiny_cfg())
    ours = vqgan_encode_indices(params, jnp.asarray(x))
    assert ours.shape == tuple(ref_idx.reshape(2, -1).shape)
    match = (np.asarray(ours) == ref_idx.reshape(2, -1).numpy()).mean()
    assert match > 0.98, match  # argmin ties can flip on fp noise


def test_vqgan_decode_parity(torch_vq):
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 64, (2, 16 * 16))
    with torch.no_grad():
        ref = torch_vq.decode_code(torch.from_numpy(idx)).numpy()
    params = convert_vqgan(torch_vq.state_dict(), _tiny_cfg())
    ours = vqgan_decode_code(params, jnp.asarray(idx), (16, 16))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_mask_tokenizer_roundtrip(torch_vq):
    params = convert_vqgan(torch_vq.state_dict(), _tiny_cfg())
    tok = MaskTokenizer(params, token_shift=100)
    rng = np.random.default_rng(2)
    mask = (rng.random((1, 3, 32, 32)).astype(np.float32) > 0.5) * 2.0 - 1.0
    ids = tok.encode_mask(jnp.asarray(mask.astype(np.float32)))
    assert int(ids.min()) >= 100
    rec = tok.decode_mask(ids, hw=(16, 16))
    assert rec.shape == (1, 3, 32, 32)


def test_expand_ids(torch_vq):
    params = convert_vqgan(torch_vq.state_dict(), _tiny_cfg())
    tok = MaskTokenizer(params, token_shift=500)
    rng = np.random.default_rng(3)
    mask = ((rng.random((3, 32, 32)) > 0.5) * 2.0 - 1.0).astype(np.float32)
    ids = np.asarray([1, 2, 999, 3], np.int64)  # 999 = <mask> placeholder
    out = tok.expand_ids(ids, jnp.asarray(mask), 999)
    n_codes = 16 * 16  # 32/2(levels-1 downsample... f2 here) -> 16x16
    assert len(out) == 3 + n_codes
    assert out[0] == 1 and out[-1] == 3
    assert (out[2:-1] >= 500).all()
