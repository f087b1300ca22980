"""Continuous-batching serving engine (slot scheduler over lm/cb.py).

Requests of mixed prompt lengths are admitted into free KV slots the
moment one opens; all active slots decode together in K-token chunks.
Unlike the batch engine (whole batch stalls on its longest member) chip
time follows per-request lengths. Greedy tokens are identical to
``InferenceEngine.run`` per request — scheduling changes, results don't
(tests/test_continuous.py).

AVS tasks are supported too: prefill keeps the request's multi-scale
seg taps, decode chunks capture the final-norm hidden states, and the
seg head runs at retirement with the same generate-layout buffers the
batch engine uses (identical masks asserted in tests). Built on the
same prompt builder / encoder programs as InferenceEngine, so any
registered task works.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from crab_tpu.fusion.splice import build_splice_batch
from crab_tpu.lm.cb import (
    SlotState,
    SlotStateQ,
    cb_decode_chunk,
    cb_prefill,
    deposit,
    retire,
)
from crab_tpu.runtime.engine import InferenceEngine, splice_from_arrays
from crab_tpu.tasks.registry import TASKS


def _hist_rows(sb) -> np.ndarray:
    """Prompt token ids per cache row; -1 at feature-splice and pad rows
    (the spec-decode draft lookup must only match real text)."""
    return np.where(
        (sb.feat_idx >= 0) | (sb.attention_mask == 0), -1, sb.text_ids
    ).astype(np.int32)


class _Request:
    __slots__ = (
        "idx", "task", "sample", "max_new", "tokens", "slot", "done",
        "is_avs", "seg_taps", "hiddens", "masks", "found", "error",
    )

    def __init__(self, idx, task, sample, max_new, is_avs=False):
        self.error = None
        self.idx = idx
        self.task = task
        self.sample = sample
        self.max_new = max_new
        self.tokens: List[int] = []
        self.slot: Optional[int] = None
        self.done = False
        self.is_avs = is_avs
        self.seg_taps = None
        self.hiddens: List[np.ndarray] = []  # per-chunk (k, D) rows
        self.masks = None
        self.found = None


class ContinuousEngine:
    def __init__(
        self,
        engine: InferenceEngine,
        slots: int = 4,
        max_len: int = 1024,
        chunk: int = 16,
        prefill_chunk: int = 0,
        admit_batch: int = 4,
        spec_k: int = 0,
        spec_adaptive: bool = False,
    ):
        """``prefill_chunk``: admit prompts in pieces of this many tokens,
        running a decode chunk for the active slots between pieces —
        bounds the decode stall per admission to one piece's prefill
        (~0.15 s at 7B/256 tokens) instead of the whole prompt (~0.4 s).
        0 = whole-prompt admission (single prefill program).

        ``admit_batch``: max requests per batched admission prefill —
        bounds the group prefill's transient HBM next to the live slot
        caches (a full-slot-count group at 7B OOMs beside an 8x1024
        cache; 4 is safe with headroom).

        ``spec_k``: >0 enables self-speculative (prompt-lookup) decoding —
        each decode forward verifies spec_k history-drafted tokens, so
        repeated n-grams emit several tokens per weight read (lm/spec.py).
        Greedy-only; token-identical to the plain chunk loop up to bf16
        tied-argmax rounding (lm/spec.py module docstring); requires
        temperature == 0 on the wrapped engine.

        ``spec_adaptive``: with spec_k > 0, fall back to plain chunks
        when the measured draft acceptance is below break-even and
        re-probe with one spec chunk every 8th chunk. The verify
        forward costs ~1 + (2.3 + 1.4k)/17.3 of a plain step (measured,
        tools/micro_spec.py), so speculation pays iff accepted/emitted
        > 1 - 1/cost — ~0.31 at k=4. Templated Crab answers clear it;
        adversarially random text does not (SERVE_r03 measured spec=4
        LOSING to plain on such a trace) — adaptive makes spec safe to
        leave on for any traffic. Tokens are identical either way
        (drafts are always verified); only scheduling changes."""
        self.engine = engine
        self.cfg = engine.cfg
        self.slots = slots
        self.max_len = max_len
        self.chunk = chunk
        self.prefill_chunk = prefill_chunk
        self.admit_batch = max(admit_batch, 1)
        self.spec_k = int(spec_k)
        if self.spec_k and getattr(engine, "temperature", 0.0) > 0.0:
            raise ValueError(
                "spec_k requires greedy decoding (engine temperature == 0):"
                " lossless speculation verifies argmax tokens; sampled"
                " distributions would need rejection sampling"
            )
        self._accepted = 0
        self.spec_adaptive = bool(spec_adaptive) and self.spec_k > 0
        # acceptance EMA starts optimistic (first chunks speculate);
        # break-even threshold from the verify-cost model, calibrated
        # IN-ENGINE: the micro model (1 + (2.3+1.4k)/17.3, k=4 -> 1.45x,
        # tools/micro_spec.py) underestimates the slot engine's spec
        # chunk — on the adversarially-random mixed trace, fixed spec=4
        # ran 15% slower than plain at ~0.34 acceptance (SERVE_r03.json:
        # 2.533 vs 2.990 req/s), implying a real in-engine verify cost
        # of ~1.84x at k=4 (x1.27 the micro model: slot KV scatters,
        # window masks, and the per-chunk host harvest don't amortize
        # the way the batch engine's do). The round-5 re-measurement
        # validates the resulting ~0.46 threshold from the other side:
        # at 0.40 measured acceptance, fixed spec=4 is within 1% of
        # plain (SERVE_r05.json: 3.147 vs 3.171) — right at break-even,
        # as the model predicts
        # The 1.27 in-engine penalty is KV-traffic-bound (slot KV
        # scatters and window masks scale with the Hkv*S rows touched
        # per chunk; the host harvest does not): on the GQA flagship
        # (Hkv/Hq = 4/28) the same mixed trace measures fixed spec=4
        # ABOVE plain (SERVE_r05_qwen_builder.json: 3.557 vs 3.422
        # req/s at ~0.35 acceptance), implying an in-engine cost of
        # ~1.48 ~= the batch micro model — the penalty tracks the KV
        # traffic. Scale it by the GQA ratio so the threshold follows
        # the backbone: MHA -> ~0.46 (validated r03 from the losing
        # side, r05 at par), Qwen GQA -> ~0.34 (validated by the r05
        # qwen rows, where the old MHA-calibrated 0.46 held the gate
        # on plain and cost 2.5% vs fixed spec).
        # Known approximation: kv_quant halves the same KV bytes but is
        # NOT modeled here (both calibration endpoints were measured on
        # bf16 slot caches; no kv8 adaptive row has been measured). The
        # error is in the SAFE direction — the threshold reads slightly
        # high for int8 slots, so the gate holds spec off marginally
        # more than optimal near break-even, never below plain.
        gqa = engine.cfg.decoder.num_kv_heads / engine.cfg.decoder.num_heads
        verify_cost = (1.0 + 0.27 * gqa) * (
            1.0 + (2.3 + 1.4 * self.spec_k) / 17.3
        )
        self._spec_threshold = 1.0 - 1.0 / verify_cost
        self._spec_ema = 1.0
        self._chunk_i = 0
        self.spec_chunks = 0
        self.plain_chunks = 0
        self._dtype = engine._dtype
        # cfg.decoder.kv_quant selects the int8 slot cache (SlotStateQ):
        # half the cache HBM per slot, tokens identical to the batch
        # engine's kv_quant decode. Prefill stays bf16 either way (the
        # request-local cache attends exact rows); deposit quantizes.
        state_cls = (
            SlotStateQ if self.cfg.decoder.kv_quant else SlotState
        )
        self.state = state_cls.zeros(
            self.cfg.decoder, slots, max_len, self._dtype
        )
        self._prefill_programs: Dict = {}
        self._seg_programs: Dict = {}
        cfgd = self.cfg.decoder

        def _chunk(params, state, rng, capture, use_spec):
            if use_spec:
                from crab_tpu.lm.spec import spec_decode_chunk

                del rng  # greedy-only
                return spec_decode_chunk(
                    params["decoder"], cfgd, state, self.chunk,
                    engine.eos_id, engine.pad_id, spec_k=self.spec_k,
                    capture_hidden=capture,
                )
            return cb_decode_chunk(
                params["decoder"], cfgd, state, self.chunk,
                engine.eos_id, engine.pad_id, capture_hidden=capture,
                temperature=engine.temperature, top_k=engine.top_k,
                top_p=engine.top_p, rng=rng,
            )

        # donate the slot state everywhere it flows through a program:
        # each call returns a full new SlotState, and without aliasing
        # XLA holds TWO copies of the (L, N, S, Hkv, hd) caches — at 7B
        # with 8x1024 slots that is 2 x 4.3 GB next to 6.5 GB of weights
        # (measured RESOURCE_EXHAUSTED). State flow is linear by
        # construction (self.state is reassigned at every call site).
        self._chunk_fn = jax.jit(
            _chunk, static_argnames=("capture", "use_spec"), donate_argnums=1
        )
        self._deposit = jax.jit(
            deposit, static_argnames="slot", donate_argnums=0
        )
        self._retire = jax.jit(retire, static_argnames="slot", donate_argnums=0)

    # -- prefill: encode + splice + prompt forward, one program per bucket
    def _prefill_for(self, media_keys, t_pad, avs):
        key = (media_keys, t_pad, avs)
        if key not in self._prefill_programs:
            engine = self.engine
            cfg = self.cfg

            def fn(params, media, text_ids, feat_idx, attn, pos, rng):
                bank, seg_taps = engine._encode_bank(params, media, avs)
                emb = splice_from_arrays(
                    params["decoder"]["embed"], text_ids, feat_idx, bank
                ).astype(self._dtype)
                out = cb_prefill(
                    params["decoder"], cfg.decoder, emb, attn, pos,
                    temperature=engine.temperature, top_k=engine.top_k,
                    top_p=engine.top_p, rng=rng,
                )
                return out + (seg_taps,)

            self._prefill_programs[key] = jax.jit(fn)
        return self._prefill_programs[key]

    # -- chunked admission: encode+splice once, then decoder prefill in
    # pieces through a request-local cache (bf16 KVCache appends at
    # offset), yielding to the decode loop between pieces
    def _embed_for(self, media_keys, t_pad, avs):
        key = ("embed", media_keys, t_pad, avs)
        if key not in self._prefill_programs:
            engine = self.engine

            def fn(params, media, text_ids, feat_idx):
                bank, seg_taps = engine._encode_bank(params, media, avs)
                emb = splice_from_arrays(
                    params["decoder"]["embed"], text_ids, feat_idx, bank
                ).astype(self._dtype)
                return emb, seg_taps

            self._prefill_programs[key] = jax.jit(fn)
        return self._prefill_programs[key]

    def _piece_for(self, piece_len, t_pad):
        key = ("piece", piece_len, t_pad)
        if key not in self._prefill_programs:
            cfgd = self.cfg.decoder

            engine = self.engine

            def fn(dparams, emb_piece, cache, amask, pos_piece, rng):
                from crab_tpu.lm.generate import sample_logits
                from crab_tpu.lm.llama import llama_apply

                logits, _, cache, _ = llama_apply(
                    dparams, cfgd, emb_piece, attention_mask=amask,
                    position_ids=pos_piece, cache=cache,
                    last_logit_only=True,
                )
                first = sample_logits(
                    logits[:, -1], rng, engine.temperature, engine.top_k,
                    engine.top_p,
                )
                return cache, first

            self._prefill_programs[key] = jax.jit(fn)
        return self._prefill_programs[key]

    def _seg_for(self, head):
        if head not in self._seg_programs:
            self._seg_programs[head] = self.engine._make_seg(head)
        return self._seg_programs[head]

    def _build(self, req: _Request):
        """Host-side build + validation for one admission (isolatable)."""
        engine = self.engine
        task = TASKS[req.task]
        spec, media = engine.build_sample(task, req.sample)
        t_pad = engine._pad_len([spec], task)
        if t_pad + req.max_new + self.spec_k > self.max_len:
            raise ValueError(
                f"prompt {t_pad} + max_new {req.max_new} + spec_k "
                f"{self.spec_k} exceeds slot length {self.max_len}"
                " (the last verify window scatters K/V spec_k rows past"
                " the final token)"
            )
        sig = (
            t_pad,
            req.is_avs,
            tuple(sorted((k, v.shape, str(v.dtype)) for k, v in media.items())),
        )
        return spec, media, t_pad, sig

    def _admit_group(self, items):
        """Batched admission: ONE prefill program admits several
        same-shape requests and deposits each row into its slot.

        Serial B=1 prefills were the continuous engine's handicap vs the
        batch engine (measured: 8 serial prefills cost ~2.5x one batched
        8-row prefill — the MXU parallelizes prompt rows nearly for
        free). Batched rows are numerically independent (left-padding +
        per-row masks), so tokens are identical to one-at-a-time
        admission — the same invariance the batch engine's
        composition tests pin down."""
        engine = self.engine
        reqs = [it[0] for it in items]
        specs = [it[2] for it in items]
        medias = [it[3] for it in items]
        t_pad = items[0][4]
        avs = reqs[0].is_avs
        sb = build_splice_batch(
            specs, engine.special, pad_to=t_pad, pad_id=engine.pad_id
        )
        media_batch = engine._media_batch(medias)
        fn = self._prefill_for(tuple(sorted(media_batch)), t_pad, avs)
        k, v, first, next_pos, seg_taps = fn(
            engine.params,
            media_batch,
            jnp.asarray(sb.text_ids),
            jnp.asarray(sb.feat_idx),
            jnp.asarray(sb.attention_mask),
            jnp.asarray(sb.position_ids),
            engine._next_key(),
        )
        amask = jnp.asarray(sb.attention_mask)
        hist = jnp.asarray(_hist_rows(sb))
        for i, it in enumerate(items):
            req, slot = it[0], it[1]
            if avs and seg_taps is not None:
                req.seg_taps = jax.tree_util.tree_map(
                    lambda x, i=i: x[i: i + 1], seg_taps
                )
            req.slot = slot
            self.state = self._deposit(
                self.state, slot, k[:, i: i + 1], v[:, i: i + 1],
                amask[i: i + 1], first[i: i + 1], next_pos[i: i + 1],
                hist[i: i + 1],
            )
        firsts = np.asarray(first)  # one sync for the whole group
        for req, ft in zip(reqs, firsts):
            req.tokens.append(int(ft))
            if int(ft) == engine.eos_id or req.max_new <= 1:
                self._finish(req)

    def _admit(self, req: _Request, slot: int, interleave=None, built=None):
        engine = self.engine
        spec, media, t_pad_b, _ = built if built is not None else self._build(req)
        sb = build_splice_batch(
            [spec], engine.special, pad_to=t_pad_b, pad_id=engine.pad_id
        )
        t_pad = sb.text_ids.shape[1]
        media_batch = engine._media_batch([media])
        chunked = (
            self.prefill_chunk
            and t_pad > self.prefill_chunk
            and interleave is not None
        )
        if chunked:
            # chunked admission: one full prefill program stalls every
            # active slot for the whole prompt (~0.4 s at 7B/700 tokens);
            # feeding the decoder in pieces and yielding to the decode
            # loop between them bounds the stall to one piece
            from crab_tpu.lm.llama import KVCache

            emb_fn = self._embed_for(
                tuple(sorted(media_batch)), t_pad, req.is_avs
            )
            emb, seg_taps = emb_fn(
                engine.params, media_batch,
                jnp.asarray(sb.text_ids), jnp.asarray(sb.feat_idx),
            )
            cache = KVCache.zeros(self.cfg.decoder, 1, t_pad, self._dtype)
            amask = jnp.asarray(sb.attention_mask)
            pos = jnp.asarray(sb.position_ids)
            P = self.prefill_chunk
            lo = 0
            first = None
            while lo < t_pad:
                hi = min(lo + P, t_pad)
                piece_fn = self._piece_for(hi - lo, t_pad)
                cache, first = piece_fn(
                    engine.params["decoder"], emb[:, lo:hi], cache,
                    amask, pos[:, lo:hi], engine._next_key(),
                )
                lo = hi
                if lo < t_pad:
                    interleave()
            k, v = cache.k, cache.v
            next_pos = pos[:, -1] + 1
        else:
            fn = self._prefill_for(
                tuple(sorted(media_batch)), t_pad, req.is_avs
            )
            k, v, first, next_pos, seg_taps = fn(
                engine.params,
                media_batch,
                jnp.asarray(sb.text_ids),
                jnp.asarray(sb.feat_idx),
                jnp.asarray(sb.attention_mask),
                jnp.asarray(sb.position_ids),
                engine._next_key(),
            )
        if req.is_avs:
            req.seg_taps = seg_taps
        # record the slot BEFORE the deposit: if anything below raises
        # (device errors surface at the np.asarray sync), the caller's
        # error path can retire the slot instead of leaking it active
        req.slot = slot
        self.state = self._deposit(
            self.state, slot, k, v, jnp.asarray(sb.attention_mask), first,
            next_pos, jnp.asarray(_hist_rows(sb)),
        )
        first_tok = int(np.asarray(first)[0])
        req.tokens.append(first_tok)
        if first_tok == engine.eos_id or req.max_new <= 1:
            self._finish(req)

    @property
    def spec_accepted(self) -> int:
        """Drafted-and-accepted tokens harvested so far (spec_k mode),
        clamped per slot per chunk to tokens the host actually kept."""
        return self._accepted

    def _finish(self, req: _Request):
        req.done = True
        if req.slot is not None:
            self.state = self._retire(self.state, req.slot)
            req.slot = None
        if req.is_avs:
            task = TASKS[req.task]
            # assemble the generate-layout buffers: tokens[0] from prefill,
            # hidden[0] = zeros, hidden[i>=1] = forward that processed
            # tokens[i-1] (same alignment as lm/generate.py)
            D = self.cfg.decoder.hidden_size
            L = task.max_new_tokens
            toks = np.full((1, L), self.engine.pad_id, np.int32)
            n = min(len(req.tokens), L)
            toks[0, :n] = req.tokens[:n]
            hid = np.zeros((1, L, D), np.float32)
            if req.hiddens:
                flat = np.concatenate(req.hiddens, axis=0)[: L - 1]
                hid[0, 1 : 1 + flat.shape[0]] = flat.astype(np.float32)
            head = "avss" if task.avss_head else "binary"
            seg_fn = self._seg_for(head)
            masks, found = seg_fn(
                self.engine.params["seg"],
                jnp.asarray(toks),
                jnp.asarray(hid, self._dtype),
                req.seg_taps,
            )
            req.masks = np.asarray(masks[0])
            req.found = bool(np.asarray(found)[0])
            req.seg_taps = None
            req.hiddens = []

    def run(
        self, requests: List[Dict], default_max_new: Optional[int] = None
    ) -> List[str]:
        """Process a request list to completion; returns texts in order."""
        return [r["text"] for r in self.run_requests(requests, default_max_new)]

    def run_requests(
        self, requests: List[Dict], default_max_new: Optional[int] = None
    ) -> List[Dict]:
        """Full results in submission order.

        Each request: {"task": name, "sample": {...}, "max_new": int?}.
        Returns per request {"text", "tokens"} plus, for AVS tasks,
        {"masks" (num_classes, H, W) logits, "mask_found" bool}.
        """
        reqs = []
        for i, r in enumerate(requests):
            task = TASKS[r["task"]]
            mn = r.get("max_new") or default_max_new or task.max_new_tokens
            reqs.append(
                _Request(i, r["task"], r["sample"], mn, is_avs=task.is_avs)
            )

        queue = list(reqs)
        by_slot: Dict[int, _Request] = {}

        def free_slots():
            used = set(by_slot)
            return [s for s in range(self.slots) if s not in used]

        def decode_round():
            """One decode chunk for every active slot + host harvest."""
            if not by_slot:
                return
            capture = any(r.is_avs for r in by_slot.values())
            use_spec = bool(self.spec_k)
            if self.spec_adaptive:
                self._chunk_i += 1
                # speculate while the acceptance EMA clears break-even;
                # below it, run plain chunks but re-probe with one spec
                # chunk every 8th so a regime change (templated answers
                # resuming) is picked up within ~8 chunks
                use_spec = (
                    self._spec_ema >= self._spec_threshold
                    or self._chunk_i % 8 == 0
                )
            if use_spec:
                self.spec_chunks += 1
            else:
                self.plain_chunks += 1
            res = self._chunk_fn(
                self.engine.params, self.state, self.engine._next_key(),
                capture, use_spec,
            )
            acc = None
            if use_spec:
                self.state, out, emitted, acc = res[:4]
                hid = np.asarray(res[4]) if capture else None
                acc = np.asarray(acc)  # rides the same sync as `out`
            elif capture:
                self.state, out, emitted, hid = res
                hid = np.asarray(hid)
            else:
                self.state, out, emitted = res
                hid = None
            out = np.asarray(out)  # (N, chunk) — sync point, once per chunk
            emitted = np.asarray(emitted)
            chunk_taken = chunk_acc = 0
            for s, req in list(by_slot.items()):
                taken = 0
                for t in out[s, : emitted[s]]:
                    req.tokens.append(int(t))
                    taken += 1
                    if (
                        int(t) == self.engine.eos_id
                        or len(req.tokens) >= req.max_new
                    ):
                        break
                if acc is not None:
                    # telemetry clamp: tokens emitted past a request's
                    # max_new are discarded in the loop above, so the
                    # device-side acceptance count would overstate what
                    # speculation actually delivered on budget-crossing
                    # chunks — count at most the kept tokens minus the
                    # one non-drafted token per verify forward. This is an
                    # UPPER-BOUND clamp: a chunk spans several verify
                    # forwards (one non-drafted token each), so truncated
                    # chunks can still overcount drafted-and-kept tokens
                    # by up to (verifies - 1); exact accounting would need
                    # per-slot verify counts from the chunk fn
                    kept = int(min(acc[s], max(taken - 1, 0)))
                    self._accepted += kept
                    chunk_taken += taken
                    chunk_acc += kept
                if req.is_avs and hid is not None and taken:
                    req.hiddens.append(hid[s, :taken])
                if req.tokens and (
                    req.tokens[-1] == self.engine.eos_id
                    or len(req.tokens) >= req.max_new
                ):
                    self._finish(req)
                    del by_slot[s]
            if use_spec and self.spec_adaptive and chunk_taken:
                # EMA over spec chunks only (plain chunks carry no
                # acceptance signal); 0.3 weight reacts within ~3 chunks
                self._spec_ema = (
                    0.7 * self._spec_ema + 0.3 * chunk_acc / chunk_taken
                )

        def fail(req, e):
            req.done = True
            req.tokens = []
            req.error = f"{type(e).__name__}: {e}"
            if req.slot is not None:
                # deposit may have landed before the failure; free the
                # device slot so it doesn't decode garbage
                self.state = self._retire(self.state, req.slot)
                req.slot = None

        while queue or by_slot:
            # admit as many as fit. Same-shape runs of the queue admit in
            # ONE batched prefill program (_admit_group); a malformed
            # request (oversized prompt, bad media) fails alone at build
            # time, not the stream. With prefill_chunk set, single
            # admissions yield to decode_round between prompt pieces so
            # active slots keep emitting during long prefills.
            admits = []
            for s in free_slots():
                if not queue:
                    break
                req = queue.pop(0)
                try:
                    built = self._build(req)
                except Exception as e:  # noqa: BLE001 — per-request isolation
                    fail(req, e)
                    continue
                admits.append((req, s, *built))
            # stable-sort the admitted window by shape signature so
            # same-shape requests group even when arrivals interleave
            # (slot assignment is positional, results stay per-request)
            admits.sort(key=lambda it: repr(it[5]))
            i = 0
            while i < len(admits):
                j = i + 1
                while (
                    j < len(admits)
                    and admits[j][5] == admits[i][5]
                    and j - i < self.admit_batch
                ):
                    j += 1  # same shape signature -> one prefill program
                group = admits[i:j]
                try:
                    if len(group) == 1:
                        req, s, *built = group[0]
                        self._admit(
                            req, s,
                            interleave=decode_round if by_slot else None,
                            built=tuple(built),
                        )
                    else:
                        self._admit_group(group)
                except Exception as e:  # noqa: BLE001
                    for req, *_ in group:
                        fail(req, e)
                else:
                    for req, s, *_ in group:
                        if not req.done:
                            by_slot[s] = req
                i = j
            decode_round()
        results: List[Dict] = []
        for r in reqs:
            d: Dict = {
                "text": self.engine._decode(np.asarray(r.tokens, np.int64)),
                "tokens": list(r.tokens),
            }
            if r.error:
                d["error"] = r.error
            if r.is_avs:
                d["masks"] = r.masks
                d["mask_found"] = r.found
            results.append(d)
        return results
