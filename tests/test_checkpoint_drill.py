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

pytestmark = pytest.mark.slow  # oracle/e2e drills: nightly lane

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


# ---------------------------------------------------------------------------
# AVS stage-3 drill (VERDICT r04 #5): the reference's THIRD delta file —
# seg_module + embed_tokens + lm_head (finetune_hyper_lora_avs.sh:52,
# loaded at scripts/quick_start.py:540-554) — from on-disk artifacts to
# mask parity against the reference torch SegModule.
# ---------------------------------------------------------------------------

from crab_tpu.core.config import SegConfig  # noqa: E402 (drill section)

SEG256 = SegConfig(
    prompt_embed_dim=256,          # reference hardcodes 256 in the gate
    transformer_mlp_dim=2048,      # reference hardcodes 2048
    num_heads=8,
    avs_query_num=16,
    query_generator_num_layers=2,
    query_generator_hidden_dim=2048,
    vit_embedding_dim=64,
    image_embedding_size=4,
    low_res_mask_size=16,
    output_mask_size=56,
)
AVS_CFG = CFG.replace(seg=SEG256)


@pytest.fixture(scope="module")
def avs_artifacts(artifacts):
    """Extend the drill artifacts with the stage-3 AVS delta: a genuine
    reference SegModule's state_dict under the peft-wrapped key prefix,
    plus stage-3 embed/lm_head rows that DIFFER from stage-2's (the
    reference loads finetune_weights.bin first, then the AVS ckpt
    overwrites embeddings — load order must be observable)."""
    from tests.test_seg import _import_reference_seg

    SegModule = _import_reference_seg()
    torch.manual_seed(99)
    seg = SegModule(
        d_model=64,
        vit_image_embedding_dim=64,
        prompt_embed_dim=256,
        image_scale_nums=2,
        mask_decoder_transformer_depth=2,
        token_nums_per_scale=3,
        avs_query_num=16,
        num_classes=1,
        query_generator_num_layers=2,
        image_size=56,
        patch_size=14,
        image_embedding_size=4,
    ).eval()

    sd = {}
    for k, v in seg.state_dict().items():
        sd[f"base_model.model.model.seg_module.{k}"] = v
    # stage-3 embeddings: stage-2 values + a deterministic perturbation
    s2 = artifacts["delta"]
    torch.manual_seed(777)
    emb3 = s2["base_model.model.model.embed_tokens.weight"] + \
        torch.randn_like(s2["base_model.model.model.embed_tokens.weight"]) * 0.01
    head3 = s2["base_model.model.lm_head.weight"] + \
        torch.randn_like(s2["base_model.model.lm_head.weight"]) * 0.01
    sd["base_model.model.model.embed_tokens.weight"] = emb3
    sd["base_model.model.lm_head.weight"] = head3
    path = artifacts["root"] / "avs_ckpt.bin"
    torch.save(sd, path)
    return dict(artifacts, seg=seg, avs_path=path, emb3=emb3, head3=head3)


def _avs_spliced_ids():
    """Teacher-forced AVS sequence: ms3 prompt + the reference's answer
    shape carrying the six <mask_i> tokens (prompts.py AVS templates)."""
    import argparse

    tok = __import__(
        "crab_tpu.cli.quick_start", fromlist=["build_tokenizer"]
    ).build_tokenizer(argparse.Namespace(tokenizer=""), SPECIAL)
    text = prompts.CHAT_TEMPLATES["llama"](prompts.avs_instruction())
    answer = f"Sure, <mask_start>{SPECIAL.mask_token_str}<mask_end>"
    ids = np.asarray(tok.encode(text) + tok.encode(answer), np.int64)
    return ids


def _avs_media_tensors(art):
    """Host-decoded image + fbank for the s4 example (shared decode,
    same rationale as the NTP drill docstring)."""
    from PIL import Image

    task = TASKS["s4"]
    media = task.media({
        "audio_path": "/root/reference/assets/example/s4/audio.wav",
        "image_path": "/root/reference/assets/example/s4/0.jpg",
    })
    img = media["image"]
    if img.shape[1] != 56:
        img = np.stack([
            np.asarray(Image.fromarray(f).resize((56, 56)), np.uint8)
            for f in img
        ])
    px = (img.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
    px = np.moveaxis(px, -1, -3)  # (1, 3, 56, 56)
    audio = media["audio"]
    pcm = np.clip(np.round(audio * 32768.0), -32768, 32767).astype(np.float32)
    fb = np.array(beats_normalize(kaldi_fbank(jnp.asarray(pcm[None]))))[0]
    return img, px, fb


def _torch_avs_masks(art):
    """The reference pipeline's teacher-forced AVS mask prediction from
    the saved artifacts: the forward_avs semantics
    (``models/unified_llama.py:164-241``) — last-layer (post-norm) hidden
    states at the six <mask_i> input positions feed SegModule — which is
    also exactly what generate_avs gathers for tokens it has emitted
    (``unified_llama.py:333-353``; crab's capture_mask_hidden applies the
    same training-consistent shift)."""
    from transformers import CLIPVisionModel, LlamaForCausalLM
    from tests.test_encoders import _import_reference_beats

    root = art["root"]
    llama = LlamaForCausalLM.from_pretrained(root / "llama").eval()
    clip = CLIPVisionModel.from_pretrained(root / "clip").eval()
    BEATs, BEATsConfig = _import_reference_beats()
    ck = torch.load(root / "beats.pt", map_location="cpu", weights_only=False)
    beats = BEATs(BEATsConfig(ck["cfg"])).eval()
    beats.load_state_dict(ck["model"])
    sd = torch.load(root / "finetune_weights.bin", map_location="cpu",
                    weights_only=False)
    avs_sd = torch.load(art["avs_path"], map_location="cpu",
                        weights_only=False)

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
        # stage-2 then stage-3: AVS ckpt wins (reference load order)
        llama.get_input_embeddings().weight.copy_(
            avs_sd["base_model.model.model.embed_tokens.weight"]
        )
        llama.lm_head.weight.copy_(avs_sd["base_model.model.lm_head.weight"])

    # projectors from the stage-2 delta (reference key layout)
    def proj_tokens(modality, p, feats):
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

    _img, px, fb = _avs_media_tensors(art)
    with torch.no_grad():
        hs = clip(torch.from_numpy(px), output_hidden_states=True).hidden_states
        vis_feats = hs[CFG.vision.select_layers[-1]][:, 1:]
        vis_tokens = proj_tokens("visual", art["vl"], vis_feats)
        seg_feats = [
            hs[l][:, 1:] for l in CFG.vision.select_layers[:2]
        ]  # taps for the seg neck (unified_arch.py:229-251)
        af, _ = beats.extract_features(
            torch.from_numpy(fb), None, feature_only=True
        )
        aud_tokens = proj_tokens("audio", art["al"], af)

    ids = _avs_spliced_ids()
    lens = {"<audio>": 8, "<image>": 8}
    n_real = len(ids) + sum(lens.values()) - len(lens)
    pad_to = ((n_real + 63) // 64) * 64
    batch = build_splice_batch([SampleSpec(ids, lens)], SPECIAL, pad_to=pad_to)

    bank = torch.cat([aud_tokens, vis_tokens], dim=1)[0]
    with torch.no_grad():
        text_ids = torch.from_numpy(np.asarray(batch.text_ids))
        emb = llama.get_input_embeddings()(text_ids.clamp(min=0))
        fidx = torch.from_numpy(np.asarray(batch.feat_idx))
        emb = torch.where((fidx >= 0).unsqueeze(-1), bank[fidx.clamp(min=0)], emb)
        out = llama(
            inputs_embeds=emb,
            attention_mask=torch.from_numpy(np.asarray(batch.attention_mask)),
            position_ids=torch.from_numpy(np.asarray(batch.position_ids)),
            output_hidden_states=True,
        )
        h = out.hidden_states[-1]  # post-norm, = crab's last_hidden
        tid = np.asarray(batch.text_ids)[0]
        pos = [int(np.where(tid == m)[0][0]) for m in SPECIAL.mask_token_ids]
        pred = h[:, pos, :]  # (1, 6, 64)
        masks = art["seg"](
            pred,
            list(seg_feats),
            low_res_mask_size=AVS_CFG.seg.low_res_mask_size,
            gt_mask=None,
            batch_task_names=["s4"],
        )["pred_masks"]
    return torch.stack(masks, dim=0).numpy(), batch, np.asarray(bank)


def test_avs_stage3_artifacts_to_mask_parity(avs_artifacts):
    """THE AVS drill: load base + stage-2 + stage-3 artifacts through the
    crab load chain (the same build_params the CLI calls, with
    --avs-delta semantics) and require the teacher-forced mask logits to
    match the torch reference pipeline's."""
    import argparse

    import jax

    from crab_tpu.cli.quick_start import build_params
    from crab_tpu.lm.llama import llama_apply
    from crab_tpu.runtime.model import encode_video, encode_audio
    from crab_tpu.seg.seg_module import seg_apply

    ref_masks, _batch, _bank = _torch_avs_masks(avs_artifacts)

    root = avs_artifacts["root"]
    args = argparse.Namespace(
        random_init=False, tiny=True, llm="llama",
        llama=str(root / "llama"), clip=str(root / "clip"),
        beats=str(root / "beats.pt"),
        delta=str(root / "finetune_weights.bin"),
        avs_delta=str(avs_artifacts["avs_path"]),
        tokenizer="", int8=False, enc_int8=False,
    )
    params = build_params(args, AVS_CFG)

    # stage-3 embeddings landed (not stage-2's): observable load order
    np.testing.assert_allclose(
        np.asarray(params["decoder"]["embed"]),
        avs_artifacts["emb3"].numpy(), rtol=1e-5, atol=1e-6,
    )

    img, _px, _fb = _avs_media_tensors(avs_artifacts)
    task_media = TASKS["s4"].media({
        "audio_path": "/root/reference/assets/example/s4/audio.wav",
        "image_path": "/root/reference/assets/example/s4/0.jpg",
    })
    frames = jnp.asarray(img[None])  # (1, 1, 56, 56, 3)
    vis_tokens, seg_taps = encode_video(params, AVS_CFG, frames, True)
    aud = jnp.asarray(task_media["audio"][None])  # (1, 1, nps)
    aud_tokens = encode_audio(params, AVS_CFG, aud)
    bank = jnp.concatenate([aud_tokens, vis_tokens], axis=1)[0]

    ids = _avs_spliced_ids()
    lens = {"<audio>": 8, "<image>": 8}
    n_real = len(ids) + sum(lens.values()) - len(lens)
    pad_to = ((n_real + 63) // 64) * 64
    batch = build_splice_batch([SampleSpec(ids, lens)], SPECIAL, pad_to=pad_to)

    emb = jnp.take(params["decoder"]["embed"],
                   jnp.clip(jnp.asarray(batch.text_ids), 0, None), axis=0)
    fidx = jnp.asarray(batch.feat_idx)
    emb = jnp.where((fidx >= 0)[..., None], bank[jnp.clip(fidx, 0, None)], emb)

    _logits, h, _cache, _t = llama_apply(
        params["decoder"], AVS_CFG.decoder, emb,
        attention_mask=jnp.asarray(batch.attention_mask),
        position_ids=jnp.asarray(batch.position_ids),
    )
    tid = np.asarray(batch.text_ids)[0]
    pos = [int(np.where(tid == m)[0][0]) for m in SPECIAL.mask_token_ids]
    pred = h[:, np.asarray(pos), :].astype(jnp.float32)
    masks = seg_apply(params["seg"], pred, seg_taps, AVS_CFG.seg, task="binary")

    assert masks.shape == ref_masks.shape
    np.testing.assert_allclose(
        np.asarray(masks), ref_masks, rtol=2e-3, atol=2e-3
    )


def test_avs_delta_values_actually_land(avs_artifacts):
    """Negative control: without the AVS delta the seg params are the
    random init, and the stage-2 embeddings (not stage-3's) are live."""
    import jax

    from crab_tpu.runtime import loading
    from crab_tpu.runtime.model import init_crab

    root = avs_artifacts["root"]
    params = init_crab(jax.random.PRNGKey(0), AVS_CFG)
    params["decoder"] = loading.load_decoder(str(root / "llama"), AVS_CFG)
    stage2 = loading.apply_reference_delta(
        params, str(root / "finetune_weights.bin"), AVS_CFG
    )
    stage3 = loading.apply_reference_delta(
        stage2, str(avs_artifacts["avs_path"]), AVS_CFG
    )
    # seg swapped only by the stage-3 file
    s2_leaf = np.asarray(
        jax.tree_util.tree_leaves(stage2["seg"])[0]
    )
    s3_leaf = np.asarray(
        jax.tree_util.tree_leaves(stage3["seg"])[0]
    )
    assert s2_leaf.shape == s3_leaf.shape
    assert not np.allclose(s2_leaf, s3_leaf)
    # embeddings moved stage-2 -> stage-3
    assert not np.allclose(
        np.asarray(stage2["decoder"]["embed"]),
        np.asarray(stage3["decoder"]["embed"]),
    )


# ---------------------------------------------------------------------------
# Qwen drill (VERDICT r04 #5, second half): the reference's second model
# family (``--llm_name qwen``, finetune_hyperlora.py:44-45) — GQA
# (Hkv < H), qkv bias, rope 1e6 — from genuine HF Qwen2 artifacts +
# a peft-keyed delta through cli.quick_start, token-identical to the
# torch pipeline's greedy decode from the same files.
# ---------------------------------------------------------------------------

from crab_tpu.core.config import crab_qwen_tiny  # noqa: E402

QCFG = crab_qwen_tiny()
QPROJS = {
    "self_attn.q_proj": (64, 64), "self_attn.k_proj": (64, 32),
    "self_attn.v_proj": (64, 32), "self_attn.o_proj": (64, 64),
    "mlp.gate_proj": (64, 128), "mlp.up_proj": (64, 128),
    "mlp.down_proj": (128, 64),
}


@pytest.fixture(scope="module")
def qwen_artifacts(artifacts, tmp_path_factory):
    """HF Qwen2 save_pretrained dir + a peft-keyed qwen delta; CLIP,
    BEATs and the projector weights are shared with the LLaMA drill
    (the reference swaps only the decoder between families)."""
    from transformers import Qwen2Config, Qwen2ForCausalLM

    root = tmp_path_factory.mktemp("qwen_artifacts")
    torch.manual_seed(2024)
    qwen = Qwen2ForCausalLM(
        Qwen2Config(
            vocab_size=400, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, rope_theta=1000000.0,
            rms_norm_eps=1e-6, max_position_embeddings=2048,
            attn_implementation="eager", tie_word_embeddings=False,
        )
    ).eval()
    # Qwen2's qkv projections carry biases; make them non-trivial so the
    # bias path is observable end to end
    with torch.no_grad():
        for layer in qwen.model.layers:
            for pn in ("q_proj", "k_proj", "v_proj"):
                getattr(layer.self_attn, pn).bias.normal_(std=0.05)
    qwen.save_pretrained(root / "qwen")

    torch.manual_seed(31415)
    sd = {}
    lora = QCFG.decoder.lora
    for i in range(QCFG.decoder.num_layers):
        for name, (din, dout) in QPROJS.items():
            base = f"base_model.model.model.layers.{i}.{name}"
            sd[f"{base}.lora_route.weight"] = torch.randn(lora.num_experts, din) * 0.1
            sd[f"{base}.lora_A.weight"] = torch.randn(lora.rank, din) * 0.05
            for e in range(lora.num_experts):
                sd[f"{base}.lora_B{e}.weight"] = torch.randn(dout, lora.rank) * 0.05
    # reuse the LLaMA drill's projector delta keys (same modules)
    for k, v in artifacts["delta"].items():
        if "_projector." in k:
            sd[k] = v
    V = QCFG.decoder.vocab_size
    emb = torch.cat(
        [qwen.get_input_embeddings().weight.data, torch.randn(V - 400, 64) * 0.02]
    )
    head = torch.cat(
        [qwen.lm_head.weight.data, torch.randn(V - 400, 64) * 0.02]
    )
    sd["base_model.model.model.embed_tokens.weight"] = emb
    sd["base_model.model.lm_head.weight"] = head
    torch.save(sd, root / "finetune_weights_qwen.bin")

    example = [{
        "task": "arig",
        "audio_path": "/root/reference/assets/example/s4/audio.wav",
        "image_path": "/root/reference/assets/example/arig/1.jpg",
    }]
    with open(root / "examples.json", "w") as f:
        json.dump(example, f)
    return dict(root=root, base=artifacts, example=example[0])


def _torch_qwen_tokens(art):
    """Greedy decode of the torch Qwen2+MoE-LoRA pipeline from the saved
    artifacts (mirrors _torch_reference_tokens with the qwen chat style
    and GQA decoder)."""
    import argparse

    from transformers import CLIPVisionModel, Qwen2ForCausalLM
    from tests.test_encoders import _import_reference_beats
    from crab_tpu.cli.quick_start import build_tokenizer

    root = art["root"]
    base_root = art["base"]["root"]
    qwen = Qwen2ForCausalLM.from_pretrained(root / "qwen").eval()
    clip = CLIPVisionModel.from_pretrained(base_root / "clip").eval()
    BEATs, BEATsConfig = _import_reference_beats()
    ck = torch.load(base_root / "beats.pt", map_location="cpu",
                    weights_only=False)
    beats = BEATs(BEATsConfig(ck["cfg"])).eval()
    beats.load_state_dict(ck["model"])
    sd = torch.load(root / "finetune_weights_qwen.bin", map_location="cpu",
                    weights_only=False)

    lora = QCFG.decoder.lora
    with torch.no_grad():
        for i, layer in enumerate(qwen.model.layers):
            for name in QPROJS:
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
        qwen.resize_token_embeddings(QCFG.decoder.vocab_size)
        qwen.get_input_embeddings().weight.copy_(
            sd["base_model.model.model.embed_tokens.weight"]
        )
        qwen.lm_head.weight.copy_(sd["base_model.model.lm_head.weight"])

    def proj_tokens(modality, p, feats):
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

    from PIL import Image

    task = TASKS["arig"]
    media = task.media(art["example"])
    img = media["image"]
    if img.shape[1] != 56:
        img = np.stack([
            np.asarray(Image.fromarray(f).resize((56, 56)), np.uint8)
            for f in img
        ])
    px = (img.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
    px = np.moveaxis(px, -1, -3)
    audio = media["audio"]
    pcm = np.clip(np.round(audio * 32768.0), -32768, 32767).astype(np.float32)
    fb = np.array(beats_normalize(kaldi_fbank(jnp.asarray(pcm[None]))))[0]

    with torch.no_grad():
        hs = clip(torch.from_numpy(px), output_hidden_states=True).hidden_states
        vis_tokens = proj_tokens(
            "visual", art["base"]["vl"], hs[QCFG.vision.select_layers[-1]][:, 1:]
        )
        af, _ = beats.extract_features(
            torch.from_numpy(fb), None, feature_only=True
        )
        aud_tokens = proj_tokens("audio", art["base"]["al"], af)

    tok = build_tokenizer(argparse.Namespace(tokenizer=""), SPECIAL)
    instruction = prompts.CHAT_TEMPLATES["qwen"](task.instruction(art["example"]))
    ids = np.asarray(tok.encode(instruction), np.int64)
    lens = {"<audio>": 8, "<image>": 8}
    n_real = len(ids) + sum(lens.values()) - len(lens)
    pad_to = ((n_real + 63) // 64) * 64
    batch = build_splice_batch([SampleSpec(ids, lens)], SPECIAL, pad_to=pad_to)

    bank = torch.cat([aud_tokens, vis_tokens], dim=1)[0]
    with torch.no_grad():
        text_ids = torch.from_numpy(np.asarray(batch.text_ids))
        emb = qwen.get_input_embeddings()(text_ids.clamp(min=0))
        fidx = torch.from_numpy(np.asarray(batch.feat_idx))
        emb = torch.where((fidx >= 0).unsqueeze(-1), bank[fidx.clamp(min=0)], emb)
        attn = torch.from_numpy(np.asarray(batch.attention_mask))
        pos = torch.from_numpy(np.asarray(batch.position_ids))
        toks = []
        for _ in range(N_NEW):
            logits = qwen(
                inputs_embeds=emb, attention_mask=attn, position_ids=pos
            ).logits[:, -1]
            t = int(logits.argmax(-1))
            toks.append(t)
            if t == 2:
                break
            emb = torch.cat(
                [emb, qwen.get_input_embeddings()(torch.tensor([[t]]))], dim=1
            )
            attn = torch.cat([attn, torch.ones(1, 1, dtype=attn.dtype)], dim=1)
            pos = torch.cat([pos, pos[:, -1:] + 1], dim=1)
    return toks


def test_quick_start_qwen_reproduces_torch_from_artifacts(
    qwen_artifacts, tmp_path
):
    """The Qwen drill: cli.quick_start --llm qwen with only checkpoint
    flags emits the torch Qwen2 pipeline's exact greedy tokens (GQA
    cache path, qkv biases, rope 1e6 — finetune_hyperlora.py:44-45)."""
    from crab_tpu.cli import quick_start

    ref_tokens = _torch_qwen_tokens(qwen_artifacts)
    assert len(ref_tokens) >= 4

    root = qwen_artifacts["root"]
    base_root = qwen_artifacts["base"]["root"]
    out = tmp_path / "out_qwen"
    quick_start.main([
        "--examples", str(root / "examples.json"),
        "--tiny", "--llm", "qwen",
        "--llama", str(root / "qwen"),
        "--clip", str(base_root / "clip"),
        "--beats", str(base_root / "beats.pt"),
        "--delta", str(root / "finetune_weights_qwen.bin"),
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
        f"CLI tokens {rec['predict']!r} != torch qwen reference {ref_text!r}"
    )
