"""Fusion-layer tests: special tokens, splicing, device assembly."""

import numpy as np

import jax.numpy as jnp

from crab_tpu.fusion.splice import (
    IGNORE_LABEL,
    SampleSpec,
    build_splice_batch,
    splice_embeds,
)
from crab_tpu.fusion.tokens import NUM_ADDED_TOKENS, SpecialTokens


def test_special_token_registry():
    sp = SpecialTokens(base_vocab=32000)
    assert NUM_ADDED_TOKENS == 17
    assert sp.id("<image>") == 32000
    assert sp.id("<audio>") == 32006
    assert sp.id("<mask_0>") == 32011
    assert sp.id("<mask_5>") == 32016
    assert sp.vocab_size == 32017
    assert sp.mask_token_str == "".join(f"<mask_{i}>" for i in range(6))
    # Qwen ids match the reference's printed map (unified_arch.py:453-457)
    spq = SpecialTokens(base_vocab=151646)
    assert spq.id("<video>") == 151649
    assert spq.id("<mask_start>") == 151655
    assert spq.id("<mask_5>") == 151662


def _mk_sample(sp, prefix, placeholders, suffix, lens, labels=False):
    ids = list(prefix)
    for p in placeholders:
        ids.append(sp.id(p))
    ids += list(suffix)
    arr = np.asarray(ids, np.int64)
    labs = None
    if labels:
        labs = np.full(len(ids), IGNORE_LABEL, np.int64)
        labs[-len(suffix):] = suffix
    return SampleSpec(arr, dict(lens), labs, "avqa")


def test_splice_layout_and_assembly():
    sp = SpecialTokens(base_vocab=100)
    s1 = _mk_sample(sp, [1, 2], ["<audio>", "<video>"], [3], {"<audio>": 4, "<video>": 6})
    s2 = _mk_sample(sp, [4], ["<audio>"], [5, 6, 7], {"<audio>": 4})
    batch = build_splice_batch([s1, s2], sp, feature_order=("<audio>", "<video>"))

    # sample 1: 2 + 4 + 6 + 1 = 13 tokens; sample 2: 1 + 4 + 3 = 8
    assert batch.seq_len == 13
    assert batch.attention_mask[0].sum() == 13
    assert batch.attention_mask[1].sum() == 8
    # left padding: sample 2 starts at position 5
    assert np.all(batch.attention_mask[1, :5] == 0)
    # position ids restart at 0 on first real token
    assert batch.position_ids[1, 5] == 0
    assert batch.position_ids[1, -1] == 7
    # feature indices: bank stride = 4 + 6 = 10
    stride = 10
    row = batch.feat_idx[0]
    assert list(row[2:6]) == [0, 1, 2, 3]  # audio of sample 0
    assert list(row[6:12]) == [4, 5, 6, 7, 8, 9]  # video of sample 0
    assert list(batch.feat_idx[1, 6:10]) == [stride + 0, stride + 1, stride + 2, stride + 3]
    # text slots: no feature
    assert batch.feat_idx[0, 0] == -1 and batch.feat_idx[0, -1] == -1

    # device assembly: embeds from bank where feat_idx >= 0
    V, D = sp.vocab_size, 8
    table = np.random.default_rng(0).standard_normal((V, D)).astype(np.float32)
    bank = np.arange(2 * stride, dtype=np.float32)[:, None] * np.ones((1, D), np.float32)
    emb = np.asarray(splice_embeds(jnp.asarray(table), batch, jnp.asarray(bank)))
    np.testing.assert_allclose(emb[0, 2], 0.0)
    np.testing.assert_allclose(emb[0, 11], 9.0)
    np.testing.assert_allclose(emb[1, 6], 10.0)
    np.testing.assert_allclose(emb[0, 0], table[1])
    # pad positions use embed(pad_id)
    np.testing.assert_allclose(emb[1, 0], table[0])


def test_splice_labels_and_mask_positions():
    sp = SpecialTokens(base_vocab=100)
    suffix = [9, sp.id("<mask_start>")] + sp.mask_token_ids + [sp.id("<mask_end>")]
    s = _mk_sample(sp, [1], ["<audio>"], suffix, {"<audio>": 2}, labels=True)
    batch = build_splice_batch([s], sp, feature_order=("<audio>",))
    # mask token positions tracked (for train-time hidden gather)
    assert batch.mask_token_pos.shape == (1, 6)
    L = batch.seq_len
    start = L - len(suffix) + 2  # after 9, <mask_start>
    np.testing.assert_array_equal(batch.mask_token_pos[0], np.arange(start, start + 6))
    # labels: IGNORE on prompt + features, real ids on target
    assert np.all(batch.labels[0, : L - len(suffix)] == IGNORE_LABEL)
    assert batch.labels[0, L - len(suffix)] == 9


def test_pad_to_bucket():
    sp = SpecialTokens(base_vocab=100)
    s = _mk_sample(sp, [1], ["<audio>"], [2], {"<audio>": 2})
    batch = build_splice_batch([s], sp, feature_order=("<audio>",), pad_to=16)
    assert batch.seq_len == 16
    assert batch.attention_mask[0].sum() == 4


def test_splice_layout_properties_random():
    """Property test: random prompts/placeholders/lengths -> layout
    invariants hold (left pad, contiguous bank ranges, positions are a
    0-based cumsum over real tokens, labels align)."""
    import numpy as np

    from crab_tpu.fusion.splice import IGNORE_LABEL, SampleSpec, build_splice_batch
    from crab_tpu.fusion.tokens import SpecialTokens

    special = SpecialTokens(base_vocab=400)
    rng = np.random.default_rng(0)
    kinds = ["<audio>", "<video>", "<image>"]
    for trial in range(25):
        samples = []
        for b in range(rng.integers(1, 5)):
            n_ph = rng.integers(0, 4)
            toks, lens = [], {}
            for _ in range(rng.integers(1, 9)):
                toks.append(int(rng.integers(3, 300)))
            for kind in rng.permutation(kinds)[:n_ph]:
                toks.insert(int(rng.integers(0, len(toks) + 1)), special.id(kind))
                lens[kind] = int(rng.integers(1, 7))
            samples.append(SampleSpec(np.asarray(toks, np.int64), lens, None, "t"))
        sb = build_splice_batch(samples, special, pad_id=0)
        B, L = sb.text_ids.shape
        for b in range(B):
            attn = sb.attention_mask[b]
            # left padding: once attention starts it never stops
            first = int(np.argmax(attn)) if attn.any() else L
            assert (attn[first:] == 1).all() and (attn[:first] == 0).all()
            # positions: cumsum-1 over the attended region, clamped at 0
            expect = np.maximum(np.cumsum(attn) - 1, 0)
            assert (sb.position_ids[b] == expect).all()
            # feature indices: only inside the attended region, and every
            # placeholder's range is contiguous and sample-local
            fi = sb.feat_idx[b]
            assert (fi[:first] == -1).all()
            used = fi[fi >= 0]
            if used.size:
                runs = np.split(used, np.where(np.diff(used) != 1)[0] + 1)
                for r in runs:
                    assert (np.diff(r) == 1).all()
            # labels outside attended region are IGNORE
            assert (sb.labels[b][:first] == IGNORE_LABEL).all()
