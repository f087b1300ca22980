"""Batched multimodal inference engine.

The analogue of the reference's per-task ``inference_*`` loops
(``scripts/quick_start.py``, ``scripts/finetune/inference_hyper_lora.py``)
re-designed for TPU:

  - one jitted encode+prefill+decode program per (task-shape, seq-bucket);
  - encoder fan-out, fbank frontend and the generate loop all on device;
  - AVS path runs generate with hidden capture, then the seg head, in the
    same program family.

Host responsibilities: media decode (cv2/PIL/wav), tokenization, layout
building (``fusion.splice``), metric accumulation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Protocol, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from crab_tpu.core.config import CrabConfig
from crab_tpu.fusion.splice import SampleSpec, build_splice_batch
from crab_tpu.fusion.tokens import SpecialTokens
from crab_tpu.lm.generate import GenerateResult, capture_mask_hidden, generate
from crab_tpu.runtime.model import encode_audio, encode_video
from crab_tpu.seg.seg_module import seg_apply
from crab_tpu.tasks.registry import TASKS, TaskSpec
from crab_tpu.tasks import prompts


class Tokenizer(Protocol):
    def encode(self, text: str) -> List[int]: ...
    def decode(self, ids: Sequence[int]) -> str: ...


@dataclass
class EngineOutput:
    texts: List[str]
    tokens: np.ndarray  # (B, max_new)
    masks: Optional[np.ndarray] = None  # (B, ncls, 224, 224) logits (AVS)
    mask_found: Optional[np.ndarray] = None  # (B,) bool


def _bucket(n: int, step: int = 64) -> int:
    return ((n + step - 1) // step) * step


class InferenceEngine:
    def __init__(
        self,
        cfg: CrabConfig,
        params: Dict,
        tokenizer: Tokenizer,
        special: SpecialTokens,
        chat_style: str = "llama",
        eos_id: int = 2,
        pad_id: int = 0,
        seq_bucket: int = 64,
        mesh=None,
        pack: bool = True,
        pack_donate: bool = False,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 1.0,
        sample_seed: int = 0,
        spec_k: int = 0,
        wire_video: str = "rgb",
    ):
        self.cfg = cfg
        if pack and "layers" in params.get("decoder", {}):
            # serving layout: fuse q/k/v and gate/up weights (and their
            # LoRA route/A matmuls) — token-identical, fewer/bigger
            # matmuls per decode step (lm/pack.py). pack_donate frees the
            # caller's q/k/v/gate/up buffers (single-copy peak HBM; the
            # input tree becomes unusable).
            from crab_tpu.lm.pack import pack_decoder

            params = dict(params)
            params["decoder"] = pack_decoder(
                params["decoder"], cfg.decoder, donate=pack_donate
            )
        if mesh is not None and mesh.size > 1:
            # multi-chip serving: shard the decoder TP over 'model' and
            # FSDP over 'data'; pjit propagates through all programs
            from crab_tpu.runtime.sharding import shard_crab_params

            params = shard_crab_params(params, mesh)
        self.params = params
        self.tokenizer = tokenizer
        self.special = special
        self.chat = prompts.CHAT_TEMPLATES[chat_style]
        self.eos_id = eos_id
        self.pad_id = pad_id
        self.seq_bucket = seq_bucket
        self._dtype = jnp.dtype(cfg.compute_dtype)
        self._programs = {}
        # sampling knobs (greedy by default — the reference's HF generate
        # default); each dispatch folds a fresh counter into the base key
        # so batches draw independent samples without host RNG state.
        self.temperature = float(temperature)
        self.top_k = int(top_k)
        self.top_p = float(top_p)
        self._base_key = jax.random.PRNGKey(sample_seed)
        self._sample_calls = 0
        # speculative decoding for the lock-step batch path (lm/spec.py's
        # spec_generate): greedy-lossless, so results are bit-identical —
        # only the tokens-per-weight-read changes.
        self.spec_k = int(spec_k)
        if self.spec_k and self.temperature > 0.0:
            raise ValueError(
                "spec_k requires greedy decoding (temperature == 0)"
            )
        # wire_video="yuv420": ship RGB media as codec-native I420 planes
        # (half the video H2D bytes; media.video module docstring). Media
        # recipes that decode files can hand the engine "video_yuv"
        # directly; this flag converts RGB-provided media at upload time.
        if wire_video not in ("rgb", "yuv420"):
            raise ValueError(f"wire_video must be rgb|yuv420, got {wire_video}")
        self.wire_video = wire_video

    def _next_key(self) -> jnp.ndarray:
        # Greedy (the default): samplers ignore the key, so hand every
        # dispatch the same cached one — a per-call fold_in is an extra
        # eager device op whose output the program must wait on, and
        # through this environment's relay that round trip measurably
        # slows the continuous-engine chunk loop (bench_serve.py).
        if self.temperature <= 0.0:
            return self._base_key
        self._sample_calls += 1
        return jax.random.fold_in(self._base_key, self._sample_calls)

    # ------------------------------------------------------------------
    # host side: prompt building
    # ------------------------------------------------------------------

    def build_sample(self, task: TaskSpec, sample: Dict) -> Tuple[SampleSpec, Dict]:
        instruction = self.chat(task.instruction(sample))
        ids = np.asarray(self.tokenizer.encode(instruction), np.int64)
        media = task.media(sample) if "media" not in sample else sample["media"]
        media = self._fit_media(media)
        # token budget derived from the actual media + config (the registry
        # feature_lens document the production values)
        lens = {}
        if "audio" in media:
            lens["<audio>"] = (
                media["audio"].shape[0] * self.cfg.al_projector.num_query_tokens
            )
        for key, tag in (("video", "video"), ("video_yuv", "video"), ("image", "image")):
            if key in media:
                lens[f"<{tag}>"] = (
                    media[key].shape[0] * self.cfg.vl_projector.num_query_tokens
                )
        return SampleSpec(ids, lens, None, task.name), media

    def _fit_media(self, media: Dict) -> Dict:
        """Resize frames to the configured ViT input size if needed —
        PIL bicubic to match the reference preprocessing path
        (``Image.resize`` default, quick_start_dataset.py:456-459)."""
        size = self.cfg.vision.image_size
        out = dict(media)
        if "video_yuv" in out and out["video_yuv"].shape[-1] != size:
            raise ValueError(
                "video_yuv planes must arrive pre-sized (decode-side "
                f"resize): width {out['video_yuv'].shape[-1]} != {size}"
            )
        for key in ("video", "image", "seg_image"):
            if key in out and out[key].shape[1] != size:
                from PIL import Image

                out[key] = np.stack(
                    [
                        np.asarray(
                            Image.fromarray(f).resize((size, size)), np.uint8
                        )
                        for f in out[key]
                    ]
                )
        return out

    # ------------------------------------------------------------------
    # device programs (jitted per shape bucket)
    # ------------------------------------------------------------------

    def _encode_bank(self, params, media: Dict[str, jnp.ndarray], want_seg):
        """Build the per-sample feature bank in splice order
        (audio, video, image). 'seg_image' feeds ONLY the seg head —
        the reference computes multi-scale features from
        X_modals['<image>'] without splicing it (unified_arch.py:229-251,
        the ms3/s4 full-split recipe)."""
        cfg = self.cfg
        parts = []
        seg_taps = None
        taps_external = "seg_image" in media
        if "audio" in media:
            parts.append(encode_audio(params, cfg, media["audio"]))
        if "video" in media or "video_yuv" in media:
            if "video_yuv" in media:
                # codec-native I420 planes over the wire (half the RGB
                # bytes); integer BT.601 -> RGB on device, bit-identical
                # to media.video.yuv420_to_rgb_host (tests/test_media.py)
                from crab_tpu.media.video import yuv420_to_rgb

                frames = yuv420_to_rgb(media["video_yuv"])
            else:
                frames = media["video"]
            tok, taps = encode_video(
                params, cfg, frames, want_seg and not taps_external
            )
            seg_taps = taps if taps is not None else seg_taps
            parts.append(tok)
        if "image" in media:
            tok, taps = encode_video(
                params, cfg, media["image"], want_seg and not taps_external
            )
            seg_taps = taps if taps is not None else seg_taps
            parts.append(tok)
        if want_seg and taps_external:
            _, seg_taps = encode_video(params, cfg, media["seg_image"], True)
        bank = jnp.concatenate(parts, axis=1)  # (B, stride, D)
        B, stride, D = bank.shape
        return bank.reshape(B * stride, D), seg_taps

    # The pipeline is three separately-jitted programs (encode -> generate
    # -> seg) rather than one: a single fused executable would hold encoder
    # params + 7B decoder + KV cache in one buffer arena and blow the HBM
    # budget on a 16 GB chip; split programs also pipeline across requests.

    def _make_encode(self, avs: bool):
        def encode(params, media):
            return self._encode_bank(params, media, avs)

        return jax.jit(encode)

    def _make_generate(self):
        cfg = self.cfg
        temperature, top_k, top_p = self.temperature, self.top_k, self.top_p
        spec_k = self.spec_k

        def gen(decoder_params, bank, text_ids, feat_idx, attn, pos, rng, max_new):
            emb = splice_from_arrays(
                decoder_params["embed"], text_ids, feat_idx, bank
            ).astype(self._dtype)
            if spec_k:
                from crab_tpu.lm.spec import spec_generate

                # prompt text rows feed the n-gram draft lookup; splice
                # and pad rows are -1 (never match)
                hist = jnp.where(
                    (feat_idx >= 0) | (attn == 0), -1, text_ids
                ).astype(jnp.int32)
                return spec_generate(
                    decoder_params,
                    cfg.decoder,
                    emb,
                    attn,
                    pos,
                    max_new_tokens=max_new,
                    eos_id=self.eos_id,
                    pad_id=self.pad_id,
                    spec_k=spec_k,
                    prompt_hist=hist,
                )
            return generate(
                decoder_params,
                cfg.decoder,
                emb,
                attn,
                pos,
                max_new_tokens=max_new,
                eos_id=self.eos_id,
                pad_id=self.pad_id,
                temperature=temperature,
                top_k=top_k,
                top_p=top_p,
                rng=rng,
            )

        return jax.jit(gen, static_argnames=("max_new",))

    def _make_seg(self, task_head: str):
        cfg = self.cfg

        def seg(seg_params, tokens, hidden, seg_taps):
            res = GenerateResult(tokens, hidden, None, None)
            pred, found = capture_mask_hidden(
                res, self.special.mask_token_ids, cfg.seg.num_mask_tokens
            )
            masks = seg_apply(
                seg_params, pred.astype(jnp.float32), seg_taps, cfg.seg, task=task_head
            )
            return masks, found

        return jax.jit(seg)

    def _program_for(self, media_keys, avs, task_head):
        key = (media_keys, avs, task_head)
        if key not in self._programs:
            self._programs[key] = (
                self._make_encode(avs),
                self._make_generate(),
                self._make_seg(task_head) if avs else None,
            )
        return self._programs[key]

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def run(self, task_name: str, samples: List[Dict]) -> EngineOutput:
        """Run one batch of same-task samples end to end."""
        return self._finalize(self._dispatch(task_name, samples))

    def run_clip(self, task_name: str, records: List[Dict]) -> EngineOutput:
        """Encode-once inference over one clip's per-frame records.

        For tasks with ``frame_media`` (ms3/s4 full splits) the 5-still
        video and audio windows are identical across a clip's records; the
        reference re-runs CLIP and BEATs on them for every frame
        (``inference_hyper_lora.py`` per-sample loop). Here the shared
        media is encoded once and the bank tiled across the batch — only
        the tiny per-frame seg_image encode runs per record."""
        return self._finalize(self._dispatch_clip(task_name, records))

    def run_clip_stream(self, task_name: str, clip_groups, depth: int = 2):
        """Pipelined run_clip over many clips (same overlap discipline as
        run_stream): host prep + H2D of clip i+1 overlap device execution
        of clip i. AVS full splits are thousands of clips of ~5 records;
        a synchronous loop pays the host media plane on the critical path."""
        from collections import deque

        pending: deque = deque()
        for records in clip_groups:
            pending.append(self._dispatch_clip(task_name, records))
            if len(pending) > depth:
                yield self._finalize(pending.popleft())
        while pending:
            yield self._finalize(pending.popleft())

    def _dispatch_clip(self, task_name: str, records: List[Dict]):
        """Host work + async device dispatch for one clip; no sync."""
        task = TASKS[task_name]
        assert task.frame_media is not None, f"{task_name} has no frame_media"
        B = len(records)
        # gt masks aren't consumed here (evaluate.py re-loads them from
        # mask_path for scoring) — strip the key so media recipes skip
        # the PNG decode entirely instead of loading-then-discarding
        nomask = [
            {k: v for k, v in r.items() if k != "mask_path"} for r in records
        ]
        shared = self._fit_media(
            {
                k: v
                for k, v in task.media(nomask[0]).items()
                if k not in ("seg_image", "mask")
            }
        )
        frames = [self._fit_media(task.frame_media(r)) for r in nomask]
        lens = {}
        if "audio" in shared:
            lens["<audio>"] = (
                shared["audio"].shape[0] * self.cfg.al_projector.num_query_tokens
            )
        for key in ("video", "image"):
            if key in shared:
                lens[f"<{key}>"] = (
                    shared[key].shape[0] * self.cfg.vl_projector.num_query_tokens
                )
        specs = []
        for r in records:
            ids = np.asarray(self.tokenizer.encode(self.chat(task.instruction(r))), np.int64)
            specs.append(SampleSpec(ids, dict(lens), None, task.name))
        batch = build_splice_batch(
            specs, self.special, pad_to=self._pad_len(specs, task), pad_id=self.pad_id
        )
        shared_batch = self._media_batch([shared])
        head = "avss" if task.avss_head else "binary"
        encode_fn, gen_fn, _ = self._program_for(
            tuple(sorted(shared_batch)), False, head
        )
        bank1, _ = encode_fn(self.params, shared_batch)  # (stride, D)
        bank = jnp.tile(bank1, (B, 1))
        res = gen_fn(
            self.params["decoder"],
            bank,
            jnp.asarray(batch.text_ids),
            jnp.asarray(batch.feat_idx),
            jnp.asarray(batch.attention_mask),
            jnp.asarray(batch.position_ids),
            self._next_key(),
            task.max_new_tokens,
        )
        masks = found = None
        if task.is_avs:
            taps_fn, seg_fn = self._clip_seg_programs(head)
            seg_imgs = jnp.asarray(np.stack([f["seg_image"] for f in frames]))
            seg_taps = taps_fn(self.params, seg_imgs)
            masks, found = seg_fn(self.params["seg"], res.tokens, res.hidden, seg_taps)
        return res, masks, found

    def _clip_seg_programs(self, head: str):
        key = ("clip-seg", head)
        if key not in self._programs:
            cfg = self.cfg

            def taps(params, seg_imgs):
                return encode_video(params, cfg, seg_imgs, True)[1]

            self._programs[key] = (jax.jit(taps), self._make_seg(head))
        return self._programs[key]

    def run_stream(
        self, task_name: str, batches, depth: int = 2
    ) -> List[EngineOutput]:
        """Pipelined execution over many batches.

        jax dispatch is async, so building + uploading upcoming batches
        overlaps with the device executing the current one — this hides
        the host media stacking and H2D transfer that a synchronous loop
        pays on the critical path. ``depth`` batches stay in flight;
        their device footprint is only inputs/outputs (media, token ids),
        the KV cache is program-local, so depth 2 costs ~20 MB, not a
        second cache.
        """
        from collections import deque

        outs: List[EngineOutput] = []
        pending: deque = deque()
        for samples in batches:
            pending.append(self._dispatch(task_name, samples))
            if len(pending) > depth:
                outs.append(self._finalize(pending.popleft()))
        while pending:
            outs.append(self._finalize(pending.popleft()))
        return outs

    def _media_batch(self, medias: List[Dict]) -> Dict[str, jnp.ndarray]:
        """Stack per-sample media and upload. Audio is shipped as PCM16
        (half the host->device bytes; exact round trip for WAV-sourced
        audio — encode_audio rescales on device)."""
        out = {}
        for k in medias[0]:
            if k == "mask":
                continue
            arr = np.stack([m[k] for m in medias])
            if k == "audio" and arr.dtype == np.float32:
                arr = np.clip(np.round(arr * 32768.0), -32768, 32767).astype(
                    np.int16
                )
            if k == "video" and self.wire_video == "yuv420":
                from crab_tpu.media.video import rgb_to_yuv420

                k, arr = "video_yuv", rgb_to_yuv420(arr)
            out[k] = jnp.asarray(arr)
        return out

    def _dispatch(self, task_name: str, samples: List[Dict]):
        """Host work + async device dispatch; no synchronization."""
        task = TASKS[task_name]
        specs, medias = [], []
        for s in samples:
            spec, media = self.build_sample(task, s)
            specs.append(spec)
            medias.append(media)

        batch = build_splice_batch(
            specs,
            self.special,
            pad_to=self._pad_len(specs, task),
            pad_id=self.pad_id,
        )
        media_batch = self._media_batch(medias)
        media_keys = tuple(sorted(media_batch.keys()))
        head = "avss" if task.avss_head else "binary"
        encode_fn, gen_fn, seg_fn = self._program_for(media_keys, task.is_avs, head)
        bank, seg_taps = encode_fn(self.params, media_batch)
        res = gen_fn(
            self.params["decoder"],
            bank,
            jnp.asarray(batch.text_ids),
            jnp.asarray(batch.feat_idx),
            jnp.asarray(batch.attention_mask),
            jnp.asarray(batch.position_ids),
            self._next_key(),
            task.max_new_tokens,
        )
        masks = found = None
        if task.is_avs and seg_fn is not None:
            masks, found = seg_fn(self.params["seg"], res.tokens, res.hidden, seg_taps)
        return res, masks, found

    def _finalize(self, handles) -> EngineOutput:
        """Fetch results (synchronizes on the dispatched computation)."""
        res, masks, found = handles
        tokens = np.asarray(res.tokens)
        texts = [self._decode(row) for row in tokens]
        return EngineOutput(
            texts=texts,
            tokens=tokens,
            masks=np.asarray(masks) if masks is not None else None,
            mask_found=np.asarray(found) if found is not None else None,
        )

    def route_telemetry(
        self, task_name: str, samples: List[Dict], per_token: bool = False
    ):
        """Router-weight telemetry over one prefill — the reference's
        route-weight dumps (``inference_hyper_lora.py:164-205``) without
        the model fork (``models/modeling_llama.py:1140-1252``).

        per_token=False: (num_layers, num_experts) mean q-proj weights.
        per_token=True: dict {'q','k','v','o'} of (L, B, T, E) full
        per-token router weights for every attention projection."""
        from crab_tpu.lm.llama import llama_apply

        task = TASKS[task_name]
        specs, medias = [], []
        for s in samples:
            spec, media = self.build_sample(task, s)
            specs.append(spec)
            medias.append(media)
        batch = build_splice_batch(
            specs, self.special, pad_to=self._pad_len(specs, task), pad_id=self.pad_id
        )
        media_batch = self._media_batch(medias)
        bank, _ = self._make_encode(False)(self.params, media_batch)
        emb = splice_from_arrays(
            self.params["decoder"]["embed"],
            jnp.asarray(batch.text_ids),
            jnp.asarray(batch.feat_idx),
            bank,
        ).astype(self._dtype)
        _, _, _, telemetry = llama_apply(
            self.params["decoder"],
            self.cfg.decoder,
            emb,
            attention_mask=jnp.asarray(batch.attention_mask),
            position_ids=jnp.asarray(batch.position_ids),
            collect_routes=True,
        )
        if per_token:
            return {k: np.asarray(telemetry[k]) for k in ("q", "k", "v", "o")}
        return np.asarray(telemetry["q_route_mean"])

    def _pad_len(self, specs: List[SampleSpec], task: TaskSpec) -> int:
        longest = 0
        for s in specs:
            n = len(s.input_ids) + sum(s.feature_lens.values()) - len(s.feature_lens)
            longest = max(longest, n)
        return _bucket(longest, self.seq_bucket)

    def _decode(self, row: np.ndarray) -> str:
        ids = [int(t) for t in row if t != self.pad_id]
        if self.eos_id in ids:
            ids = ids[: ids.index(self.eos_id)]
        return self.tokenizer.decode(ids)


def splice_from_arrays(embed_table, text_ids, feat_idx, feature_bank):
    """Array-arg version of fusion.splice.splice_embeds (jit-friendly).

    mode='clip': jnp.take's default fills out-of-bounds with NaN, which
    would silently poison the whole forward on a bad token id.
    """
    text_emb = jnp.take(embed_table, text_ids, axis=0, mode="clip")
    gathered = jnp.take(feature_bank, jnp.maximum(feat_idx, 0), axis=0, mode="clip")
    use_feat = (feat_idx >= 0)[..., None]
    return jnp.where(use_feat, gathered.astype(text_emb.dtype), text_emb)
