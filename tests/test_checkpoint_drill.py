"""Real-checkpoint end-to-end drill (synthetic artifacts, genuine formats).

The BASELINE "bit-comparable outputs" gate, runnable without the 7B
weights: compose the reference's FULL torch pipeline at crab_tiny dims —
HF ``LlamaForCausalLM`` wrapped with the reference's MoE-LoRA Linear
(``peft_hyper/tuners/lora.py:338-369``), CLIP, BEATs (the reference
module), Q-Former projectors — save genuine on-disk artifacts in the
reference's formats:

  - an HF ``save_pretrained`` LLaMA dir,
  - an HF CLIP ViT dir,
  - a BEATs-style ``{'cfg','model'}`` ``.pt``,
  - a peft-keyed ``finetune_weights.bin``
    (``utils/deepspeed_utils.py:23`` / ``scripts/quick_start.py:540-554``
    key layout: ``base_model.model.model.layers.N.self_attn.q_proj.
    lora_A.weight``, ``...model.vl_projector.visual_Qformer...``,
    embed_tokens + lm_head),

then run ``cli.quick_start`` with ONLY checkpoint flags and require the
generated tokens to be identical to the torch pipeline's greedy decode
from the same on-disk artifacts.

Shared pieces (and why sharing is sound): the host media decode + the
splice LAYOUT (both sides read the same uint8 frames / float windows and
place features at the same indices — layout parity vs the reference is
tests/test_fusion.py's job), and the kaldi fbank (torchaudio is a stub
in this env; fbank parity has its own oracle in tests/test_fbank.py).
Everything numeric downstream — encoders, projectors, MoE-LoRA decoder,
greedy loop — runs twice: once in torch from the artifacts, once through
the crab_tpu CLI load chain from the same files.
"""

import json

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from crab_tpu.core.config import crab_tiny
from crab_tpu.fusion.splice import SampleSpec, build_splice_batch
from crab_tpu.fusion.tokens import SpecialTokens
from crab_tpu.media.fbank import beats_normalize, kaldi_fbank
from crab_tpu.media.video import CLIP_MEAN, CLIP_STD
from crab_tpu.tasks import prompts
from crab_tpu.tasks.registry import TASKS

CFG = crab_tiny()  # the config cli.quick_start --tiny builds
SPECIAL = SpecialTokens(base_vocab=400)
N_NEW = 8
PROJS = {
    "self_attn.q_proj": (64, 64), "self_attn.k_proj": (64, 64),
    "self_attn.v_proj": (64, 64), "self_attn.o_proj": (64, 64),
    "mlp.gate_proj": (64, 128), "mlp.up_proj": (64, 128),
    "mlp.down_proj": (128, 64),
}


class RefMoELoRA(torch.nn.Module):
    """The reference MoE-LoRA Linear forward, literally
    (``peft_hyper/tuners/lora.py:338-369``): base + sum_i
    softmax(route(x))_i * B_i(A(x)) * alpha/r (eval mode: no dropout)."""

    def __init__(self, base: torch.nn.Linear, r: int, alpha: int, n: int):
        super().__init__()
        self.base, self.n, self.scaling = base, n, alpha / r
        din, dout = base.in_features, base.out_features
        self.lora_route = torch.nn.Linear(din, n, bias=False)
        self.lora_A = torch.nn.Linear(din, r, bias=False)
        for i in range(n):
            setattr(self, f"lora_B{i}", torch.nn.Linear(r, dout, bias=False))

    def forward(self, x):
        result = self.base(x)
        rw = F.softmax(self.lora_route(x), dim=-1, dtype=torch.float32).to(
            result.dtype
        )
        for i in range(self.n):
            result = result + rw[..., i : i + 1] * getattr(self, f"lora_B{i}")(
                self.lora_A(x)
            ) * self.scaling
        return result


def _qformer_ref_sd(qf, modality):
    """Blip2QFormerModel state dict -> the reference's vendored-BERT key
    names under {modality}_Qformer.bert. (tests/test_encoders helper)."""
    from tests.test_encoders import _blip2_to_reference_names

    return _blip2_to_reference_names(
        qf.state_dict(), prefix=f"{modality}_Qformer.bert."
    )


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    """Build the torch modules, save the reference-format artifacts."""
    from transformers import (
        Blip2QFormerConfig,
        CLIPVisionConfig,
        CLIPVisionModel,
        LlamaConfig,
        LlamaForCausalLM,
    )
    from transformers.models.blip_2.modeling_blip_2 import Blip2QFormerModel
    from tests.test_encoders import _import_reference_beats

    root = tmp_path_factory.mktemp("ref_artifacts")
    torch.manual_seed(1234)

    llama = LlamaForCausalLM(
        LlamaConfig(
            vocab_size=400, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
            attn_implementation="eager",
        )
    ).eval()
    llama.save_pretrained(root / "llama")

    clip = CLIPVisionModel(
        CLIPVisionConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=4,
            num_attention_heads=4, image_size=56, patch_size=14,
        )
    ).eval()
    clip.save_pretrained(root / "clip")

    BEATs, BEATsConfig = _import_reference_beats()
    bcfg = BEATsConfig(
        {
            "input_patch_size": 16, "embed_dim": 32, "encoder_layers": 2,
            "encoder_embed_dim": 64, "encoder_ffn_embed_dim": 128,
            "encoder_attention_heads": 4, "conv_pos": 16, "conv_pos_groups": 4,
            "layer_norm_first": False, "deep_norm": True,
            "relative_position_embedding": True, "num_buckets": 32,
            "max_distance": 64, "gru_rel_pos": True, "encoder_layerdrop": 0.0,
            "dropout": 0.0, "attention_dropout": 0.0, "activation_dropout": 0.0,
            "dropout_input": 0.0, "finetuned_model": False,
        }
    )
    beats = BEATs(bcfg).eval()
    torch.save({"cfg": bcfg.__dict__, "model": beats.state_dict()},
               root / "beats.pt")

    # projectors: LN -> 2-layer Q-Former -> 2-layer MLP (VLProjector /
    # ALProjector composition, multimodal_encoder.py:87-262)
    def make_projector(seed):
        torch.manual_seed(seed)
        qf = Blip2QFormerModel(
            Blip2QFormerConfig(
                hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
                intermediate_size=128, encoder_hidden_size=64,
                cross_attention_frequency=1,
            )
        ).eval()
        return {
            "qf": qf,
            "ln": torch.nn.LayerNorm(64).eval(),
            "query_tokens": torch.randn(1, 8, 64) * 0.02,
            "fc1": torch.nn.Linear(64, 64).eval(),
            "fc2": torch.nn.Linear(64, 64).eval(),
        }

    vl, al = make_projector(77), make_projector(88)
    for p in (vl, al):  # non-trivial LN so the delta load is observable
        with torch.no_grad():
            p["ln"].weight.mul_(1.1).add_(0.01)

    # ---- finetune_weights.bin: peft-wrapped key layout ----------------
    # LoRA values are PERTURBATION-scale (like real finetuned deltas):
    # with large synthetic weights the adapters dominate the hidden
    # states, router softmaxes saturate, and the two implementations'
    # ~3e-4 fp32 noise amplifies chaotically — token identity is only a
    # meaningful gate in the regime real checkpoints live in.
    torch.manual_seed(4321)
    sd = {}
    lora = CFG.decoder.lora  # rank 4, alpha 8, 3 experts
    for i in range(CFG.decoder.num_layers):
        for name, (din, dout) in PROJS.items():
            base = f"base_model.model.model.layers.{i}.{name}"
            sd[f"{base}.lora_route.weight"] = torch.randn(lora.num_experts, din) * 0.1
            sd[f"{base}.lora_A.weight"] = torch.randn(lora.rank, din) * 0.05
            for e in range(lora.num_experts):
                sd[f"{base}.lora_B{e}.weight"] = torch.randn(dout, lora.rank) * 0.05
    for modality, p in (("visual", vl), ("audio", al)):
        pfx = "base_model.model.model.vl_projector." if modality == "visual" \
            else "base_model.model.model.al_projector."
        sd.update({pfx + k: v for k, v in _qformer_ref_sd(p["qf"], modality).items()})
        sd[f"{pfx}{modality}_query_tokens"] = p["query_tokens"]
        sd[f"{pfx}{modality}_ln.weight"] = p["ln"].weight.data
        sd[f"{pfx}{modality}_ln.bias"] = p["ln"].bias.data
        sd[f"{pfx}{modality}_proj.0.weight"] = p["fc1"].weight.data
        sd[f"{pfx}{modality}_proj.0.bias"] = p["fc1"].bias.data
        sd[f"{pfx}{modality}_proj.2.weight"] = p["fc2"].weight.data
        sd[f"{pfx}{modality}_proj.2.bias"] = p["fc2"].bias.data
    # stage-3-style embed/lm_head rows for the 17 multimodal tokens
    V = CFG.decoder.vocab_size  # 512
    embed_full = torch.cat(
        [llama.get_input_embeddings().weight.data,
         torch.randn(V - 400, 64) * 0.02]
    )
    head_full = torch.cat(
        [llama.lm_head.weight.data, torch.randn(V - 400, 64) * 0.02]
    )
    sd["base_model.model.model.embed_tokens.weight"] = embed_full
    sd["base_model.model.lm_head.weight"] = head_full
    torch.save(sd, root / "finetune_weights.bin")

    # the drill sample: reference example assets (image + wav)
    example = [{
        "task": "arig",
        "audio_path": "/root/reference/assets/example/s4/audio.wav",
        "image_path": "/root/reference/assets/example/arig/1.jpg",
    }]
    with open(root / "examples.json", "w") as f:
        json.dump(example, f)

    return dict(root=root, llama=llama, clip=clip, beats=beats, vl=vl,
                al=al, delta=sd, example=example[0])


def _torch_reference_tokens(art):
    """The reference pipeline's greedy decode, in torch, loading every
    weight back FROM the saved artifacts (round-trips the files)."""
    from transformers import CLIPVisionModel, LlamaForCausalLM
    from tests.test_encoders import _import_reference_beats
    from crab_tpu.cli.quick_start import build_tokenizer
    import argparse

    root = art["root"]
    llama = LlamaForCausalLM.from_pretrained(root / "llama").eval()
    clip = CLIPVisionModel.from_pretrained(root / "clip").eval()
    BEATs, BEATsConfig = _import_reference_beats()
    ck = torch.load(root / "beats.pt", map_location="cpu", weights_only=False)
    beats = BEATs(BEATsConfig(ck["cfg"])).eval()
    beats.load_state_dict(ck["model"])
    sd = torch.load(root / "finetune_weights.bin", map_location="cpu",
                    weights_only=False)

    # peft-wrap: swap every projection for the reference MoE-LoRA Linear
    lora = CFG.decoder.lora
    with torch.no_grad():
        for i, layer in enumerate(llama.model.layers):
            for name in PROJS:
                holder = layer.self_attn if name.startswith("self_attn") else layer.mlp
                short = name.split(".")[1]
                mod = RefMoELoRA(getattr(holder, short), lora.rank,
                                 lora.alpha, lora.num_experts)
                base = f"base_model.model.model.layers.{i}.{name}"
                mod.lora_route.weight.copy_(sd[f"{base}.lora_route.weight"])
                mod.lora_A.weight.copy_(sd[f"{base}.lora_A.weight"])
                for e in range(lora.num_experts):
                    getattr(mod, f"lora_B{e}").weight.copy_(
                        sd[f"{base}.lora_B{e}.weight"]
                    )
                setattr(holder, short, mod.eval())
        llama.resize_token_embeddings(CFG.decoder.vocab_size)
        llama.get_input_embeddings().weight.copy_(
            sd["base_model.model.model.embed_tokens.weight"]
        )
        llama.lm_head.weight.copy_(sd["base_model.model.lm_head.weight"])

    # projector weights from the delta, reference key layout
    def projector_forward(modality, p, feats):
        pfx = f"base_model.model.model.{'vl' if modality == 'visual' else 'al'}_projector."
        with torch.no_grad():
            p["ln"].weight.copy_(sd[f"{pfx}{modality}_ln.weight"])
            p["ln"].bias.copy_(sd[f"{pfx}{modality}_ln.bias"])
            p["fc1"].weight.copy_(sd[f"{pfx}{modality}_proj.0.weight"])
            p["fc1"].bias.copy_(sd[f"{pfx}{modality}_proj.0.bias"])
            p["fc2"].weight.copy_(sd[f"{pfx}{modality}_proj.2.weight"])
            p["fc2"].bias.copy_(sd[f"{pfx}{modality}_proj.2.bias"])
            q = sd[f"{pfx}{modality}_query_tokens"]
            x = p["ln"](feats)
            out = p["qf"](
                query_embeds=q.expand(x.shape[0], -1, -1),
                encoder_hidden_states=x,
            ).last_hidden_state
            return p["fc2"](F.gelu(p["fc1"](out)))

    # ---- media: same host decode + fit as the engine ------------------
    task = TASKS["arig"]
    media = task.media(art["example"])
    from PIL import Image

    img = media["image"]
    if img.shape[1] != 56:  # engine._fit_media PIL resize
        img = np.stack([
            np.asarray(Image.fromarray(f).resize((56, 56)), np.uint8)
            for f in img
        ])
    px = (img.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
    px = np.moveaxis(px, -1, -3)  # (1, 3, 56, 56)

    audio = media["audio"]  # (1, nps) float32
    pcm = np.clip(np.round(audio * 32768.0), -32768, 32767).astype(np.float32)
    fb = np.array(beats_normalize(kaldi_fbank(jnp.asarray(pcm[None]))))[0]

    with torch.no_grad():
        hs = clip(torch.from_numpy(px), output_hidden_states=True).hidden_states
        vis_feats = hs[CFG.vision.select_layers[-1]][:, 1:]  # drop CLS
        vis_tokens = projector_forward("visual", art["vl"], vis_feats)
        af, _ = beats.extract_features(
            torch.from_numpy(fb), None, feature_only=True
        )
        aud_tokens = projector_forward("audio", art["al"], af)

    # ---- prompt + splice: the engine's exact layout --------------------
    args = argparse.Namespace(tokenizer="")
    tok = build_tokenizer(args, SPECIAL)
    instruction = prompts.CHAT_TEMPLATES["llama"](task.instruction(art["example"]))
    ids = np.asarray(tok.encode(instruction), np.int64)
    lens = {"<audio>": 8, "<image>": 8}
    n_real = len(ids) + sum(lens.values()) - len(lens)
    pad_to = ((n_real + 63) // 64) * 64  # engine seq bucket
    batch = build_splice_batch([SampleSpec(ids, lens)], SPECIAL, pad_to=pad_to)

    bank = torch.cat([aud_tokens, vis_tokens], dim=1)[0]  # (16, 64) audio-first
    with torch.no_grad():
        text_ids = torch.from_numpy(np.asarray(batch.text_ids))
        emb = llama.get_input_embeddings()(text_ids.clamp(min=0))
        fidx = torch.from_numpy(np.asarray(batch.feat_idx))
        use = (fidx >= 0).unsqueeze(-1)
        emb = torch.where(use, bank[fidx.clamp(min=0)], emb)

        attn = torch.from_numpy(np.asarray(batch.attention_mask))
        pos = torch.from_numpy(np.asarray(batch.position_ids))
        toks = []
        for _ in range(N_NEW):
            logits = llama(
                inputs_embeds=emb, attention_mask=attn, position_ids=pos
            ).logits[:, -1]
            t = int(logits.argmax(-1))
            toks.append(t)
            if t == 2:
                break
            emb = torch.cat(
                [emb, llama.get_input_embeddings()(torch.tensor([[t]]))], dim=1
            )
            attn = torch.cat([attn, torch.ones(1, 1, dtype=attn.dtype)], dim=1)
            pos = torch.cat([pos, pos[:, -1:] + 1], dim=1)
    return toks


def test_quick_start_reproduces_torch_from_artifacts(artifacts, tmp_path, capsys):
    """THE drill: cli.quick_start with only checkpoint flags emits the
    torch pipeline's exact greedy tokens (reference quick_start chain,
    ``scripts/quick_start.py:465-554``)."""
    from crab_tpu.cli import quick_start

    ref_tokens = _torch_reference_tokens(artifacts)
    assert len(ref_tokens) >= 4  # a degenerate instant-EOS run proves nothing

    root = artifacts["root"]
    out = tmp_path / "out"
    quick_start.main([
        "--examples", str(root / "examples.json"),
        "--tiny",
        "--llama", str(root / "llama"),
        "--clip", str(root / "clip"),
        "--beats", str(root / "beats.pt"),
        "--delta", str(root / "finetune_weights.bin"),
        "--out", str(out),
        "--max-new-tokens", str(N_NEW),
    ])
    with open(out / "results.jsonl") as f:
        rec = json.loads(f.readline())
    ref_text = " ".join(
        str(t) for t in (ref_tokens[: ref_tokens.index(2)] if 2 in ref_tokens
                         else ref_tokens)
    )
    assert rec["task"] == "arig"
    assert rec["predict"] == ref_text, (
        f"CLI tokens {rec['predict']!r} != torch reference {ref_text!r}"
    )


def test_delta_values_actually_land(artifacts):
    """Negative control: loading WITHOUT the delta produces different
    tokens (the comparison above isn't vacuous)."""
    from crab_tpu.runtime import loading
    from crab_tpu.runtime.model import init_crab
    import jax

    root = artifacts["root"]
    params = init_crab(jax.random.PRNGKey(0), CFG)
    params["decoder"] = loading.load_decoder(str(root / "llama"), CFG)
    with_delta = loading.apply_reference_delta(
        params, str(root / "finetune_weights.bin"), CFG
    )
    # lora exists (and is nonzero) only after the delta lands
    assert not np.allclose(
        np.asarray(with_delta["decoder"]["layers"]["q"]["lora"]["B"]), 0.0
    )
    assert "lora" not in params["decoder"]["layers"]["q"]
    # projector LN came from the file, not the random init
    ln = np.asarray(with_delta["vl_projector"]["ln_in"]["scale"])
    np.testing.assert_allclose(
        ln,
        artifacts["delta"][
            "base_model.model.model.vl_projector.visual_ln.weight"
        ].numpy(),
        rtol=1e-6,
    )
