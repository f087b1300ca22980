"""Offline scoring CLI — consumes inference JSONL dumps.

The analogue of the reference's offline evaluators: AVQA answer accuracy
(string match over the answer span, ``inference_hyper_lora.py:158-212``
dump + offline match), AVVP segment/event F1
(``utils/avvp_eval_metrics.py``), ARIG cIoU/IoU (``utils/ciou.py``), AVS
mIoU/F aggregation from per-frame records (``avss_utils.py:348-372``).

Input: results.jsonl where each record carries task-specific fields:
  avqa:  {predict, answer}
  avvp:  {predict | (SO_a, SO_v, SO_av), GT_a, GT_v, GT_av}  (25x10 0/1)
  arig:  {predict | box, gt_box}
  avs:   {iou, fscore, image_path}  (per-frame; averaged 5-per-video)
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict
from typing import Dict, List

import numpy as np

from crab_tpu.tasks import metrics as M
from crab_tpu.tasks.parsers import (
    avvp_text_to_matrices,
    normalize_answer,
    normalize_event_name,
    parse_box,
    parse_tagged_events,
)


def _load(fp: str) -> List[Dict]:
    with open(fp) as f:
        return [json.loads(line) for line in f if line.strip()]


def score_avqa(records: List[Dict], loose: bool = False) -> Dict:
    """Exact match on the normalized ``<answer>`` span. Substring
    containment (``loose=True``) inflates accuracy — gold "no" matches a
    prediction containing "normal" or "not" — so it is opt-in only, for
    dumps whose predictions lack the answer tag entirely."""
    total, correct = 0, 0
    by_type: Dict[str, List[int]] = defaultdict(list)
    for r in records:
        pred = normalize_answer(r["predict"])
        gold = normalize_answer(r.get("answer", r.get("output", "")))
        ok = int(gold != "" and (gold in pred if loose else gold == pred))
        total += 1
        correct += ok
        if r.get("question_type"):
            by_type[str(r["question_type"])].append(ok)
    out = {"accuracy": correct / max(total, 1), "n": total}
    for t, v in sorted(by_type.items()):
        out[f"acc[{t}]"] = float(np.mean(v))
    return out


def _avvp_mats(r: Dict, pred_key: str, gt_key: str):
    """Per-record (SO_a, SO_v, SO_av, GT_a, GT_v, GT_av) — direct 25x10
    matrices when present, otherwise bridged from the decoded/label text
    via the tagged-event parser (the step the reference left unshipped)."""
    if "SO_a" in r:
        pred = [np.asarray(r[k], np.float64) for k in ("SO_a", "SO_v", "SO_av")]
    else:
        pred = list(avvp_text_to_matrices(r[pred_key]))
    if "GT_a" in r:
        gt = [np.asarray(r[k], np.float64) for k in ("GT_a", "GT_v", "GT_av")]
    else:
        gt = list(avvp_text_to_matrices(r.get(gt_key, r.get("output", ""))))
    return pred + gt


def score_avvp(records: List[Dict]) -> Dict:
    f_seg = np.zeros(4)
    f_ev = np.zeros(4)
    n = 0
    for r in records:
        mats = _avvp_mats(r, "predict", "label")
        f_seg += np.asarray(M.avvp_segment_level(*mats))
        f_ev += np.asarray(M.avvp_event_level(*mats))
        n += 1
    names = ("audio", "visual", "av", "avg")
    out = {}
    for i, nm in enumerate(names):
        out[f"segment_{nm}"] = f_seg[i] / max(n, 1)
        out[f"event_{nm}"] = f_ev[i] / max(n, 1)
    out["n"] = n
    return out


def score_ave(records: List[Dict]) -> Dict:
    """AVE: event + time-range accuracy from decoded <event>/<range> text
    (the reference dumps JSONL at ``inference_hyper_lora.py:215-266`` and
    scores offline with unshipped code; this implements the AVE protocol:
    per-second event classification accuracy over the 10 s clip, plus
    whole-event accuracy and temporal IoU).

    Records carry predict + either (event, start_time, end_time) fields
    or a gt text in the same tagged format (answer/output)."""

    def seconds_vec(events, n=10):
        vec = ["__bg__"] * n
        for _, name, rng in events:
            if rng is None:
                s, e = 0, n
            else:
                s = int(max(min(rng[0], n), 0))
                e = int(max(min(round(rng[1]), n), 0))
                if e <= s:
                    e = min(s + 1, n)
            for t in range(s, e):
                vec[t] = normalize_event_name(name)
        return vec

    sec_correct = sec_total = 0
    event_ok, range_iou = [], []
    for r in records:
        pred_events = parse_tagged_events(r.get("predict", ""))
        if "event" in r:
            gt_rng = (
                (float(r["start_time"]), float(r["end_time"]))
                if "start_time" in r
                else None
            )
            gt_events = [("both", str(r["event"]), gt_rng)]
        else:
            gt_events = parse_tagged_events(r.get("answer", r.get("output", "")))
        pv, gv = seconds_vec(pred_events), seconds_vec(gt_events)
        sec_correct += sum(int(a == b) for a, b in zip(pv, gv))
        sec_total += len(gv)
        gt_names = {normalize_event_name(n) for _, n, _ in gt_events}
        pred_names = {normalize_event_name(n) for _, n, _ in pred_events}
        event_ok.append(int(bool(gt_names) and gt_names <= pred_names))
        for (_, gn, gr) in gt_events:
            if gr is None:
                continue
            best = 0.0
            for (_, pn, pr) in pred_events:
                if pr is None or normalize_event_name(pn) != normalize_event_name(gn):
                    continue
                lo = max(gr[0], pr[0])
                hi = min(gr[1], pr[1])
                union = max(gr[1], pr[1]) - min(gr[0], pr[0])
                best = max(best, max(hi - lo, 0.0) / union if union > 0 else 0.0)
            range_iou.append(best)
    out = {
        "second_accuracy": sec_correct / max(sec_total, 1),
        "event_accuracy": float(np.mean(event_ok)) if event_ok else 0.0,
        "n": len(records),
    }
    if range_iou:
        out["range_iou"] = float(np.mean(range_iou))
    return out


def score_arig(records: List[Dict]) -> Dict:
    cious, ious = [], []
    for r in records:
        box = r.get("box") or parse_box(r.get("predict", ""))
        gt = r.get("gt_box")
        if box is None or gt is None:
            cious.append(-1.0)
            ious.append(0.0)
            continue
        ious.append(M.box_iou(box, gt))
        cious.append(M.c_iou(box, gt))
    ious_a = np.asarray(ious)
    return {
        "ciou": float(np.mean(cious)),
        "iou": float(np.mean(ious_a)),
        # detection-style accuracy at IoU>=0.5 (common ARIG report)
        "iou@0.5": float(np.mean(ious_a >= 0.5)),
        "n": len(records),
    }


def score_avs(records: List[Dict], frames_per_video: int = 5) -> Dict:
    """Average per-frame IoU into per-video mIoU like
    ``compute_miou_from_jsonl`` (``avss_utils.py:348-372``)."""
    by_vid: Dict[str, List[float]] = defaultdict(list)
    fscores = []
    skipped = 0
    for r in records:
        if "miou" not in r and "iou" not in r:
            # evaluate.py writes metric-less rows for samples whose decode
            # lacked the six <mask_i> tokens (mask_found=False, the
            # reference's skip semantics) — count, don't crash
            skipped += 1
            continue
        vid = r.get("vid") or "/".join(str(r.get("image_path", "?")).split("/")[-3:-1])
        by_vid[vid].append(float(r["miou" if "miou" in r else "iou"]))
        if "fscore" in r:
            fscores.append(float(r["fscore"]))
    vid_miou = {v: float(np.mean(x)) for v, x in by_vid.items()}
    out = {
        "miou": float(np.mean(list(vid_miou.values()))) if vid_miou else 0.0,
        "videos": len(vid_miou),
    }
    if skipped:
        out["skipped_unfound"] = skipped
    if fscores:
        out["fscore"] = float(np.mean(fscores))
    return out


def _ngrams(tokens: List[str], n: int) -> Dict:
    out: Dict = defaultdict(int)
    for i in range(len(tokens) - n + 1):
        out[tuple(tokens[i: i + n])] += 1
    return out


def _cap_tokens(text: str) -> List[str]:
    import re as _re

    return _re.findall(r"[a-z0-9]+", text.lower())


def score_avcap(records: List[Dict]) -> Dict:
    """AVCap captioning: corpus BLEU-1..4 (uniform weights, brevity
    penalty — the standard Papineni formulation) so the 9th task's eval
    chain doesn't dead-end at text dumps. The reference scores captions
    offline with unshipped code; BLEU-4 is the headline caption metric.

    Records: {predict, caption | answer | output}; gold may be a string
    or a list of reference strings."""
    import math

    clip_len = ref_len = 0
    match = np.zeros(4)
    total = np.zeros(4)
    n_rec = 0
    for r in records:
        pred = _cap_tokens(r.get("predict", ""))
        gold = r.get("caption", r.get("answer", r.get("output", "")))
        refs = [_cap_tokens(g) for g in (gold if isinstance(gold, list) else [gold])]
        refs = [t for t in refs if t]
        if not refs:
            continue
        n_rec += 1
        clip_len += len(pred)
        # closest reference length (standard multi-ref brevity penalty)
        ref_len += min((abs(len(t) - len(pred)), len(t)) for t in refs)[1]
        for n in range(1, 5):
            pg = _ngrams(pred, n)
            if not pg:
                continue
            # clipped counts against the max over references
            rmax: Dict = defaultdict(int)
            for t in refs:
                for g, c in _ngrams(t, n).items():
                    rmax[g] = max(rmax[g], c)
            match[n - 1] += sum(min(c, rmax[g]) for g, c in pg.items())
            total[n - 1] += sum(pg.values())
    out: Dict = {"n": n_rec}
    if not n_rec:
        return out
    bp = 1.0 if clip_len > ref_len else math.exp(1 - ref_len / max(clip_len, 1))
    precisions = [match[i] / total[i] if total[i] else 0.0 for i in range(4)]
    for k in range(1, 5):
        if all(p > 0 for p in precisions[:k]):
            bleu = bp * math.exp(sum(math.log(p) for p in precisions[:k]) / k)
        else:
            bleu = 0.0
        out[f"bleu{k}"] = float(bleu)
    out["brevity_penalty"] = float(bp)
    return out


def score_lvis(records: List[Dict]) -> Dict:
    """LVIS seg pretrain: per-IMAGE mean IoU/F-score (no per-video
    grouping — LVIS samples are independent images, unlike the AVS
    clips score_avs averages per video). Mirrors the online
    ``mask_iou`` accumulation of the reference's seg-pretrain eval loop
    (``scripts/pretrain/inference.py:205-213``)."""
    ious, fscores = [], []
    skipped = 0
    for r in records:
        if "miou" not in r and "iou" not in r:
            skipped += 1
            continue
        ious.append(float(r["miou" if "miou" in r else "iou"]))
        if "fscore" in r:
            fscores.append(float(r["fscore"]))
    out: Dict = {
        "miou": float(np.mean(ious)) if ious else 0.0,
        "images": len(ious),
    }
    if fscores:
        out["fscore"] = float(np.mean(fscores))
    if skipped:
        out["skipped_unfound"] = skipped
    return out


SCORERS = {"avqa": score_avqa, "ave": score_ave, "avvp": score_avvp,
           "arig": score_arig, "avs": score_avs, "s4": score_avs,
           "ms3": score_avs, "ref-avs": score_avs, "avcap": score_avcap,
           # stage-1 pretrain eval surface (scripts/pretrain/inference*.py):
           # captions score corpus BLEU, LVIS seg per-image mIoU/F
           "image_caption": score_avcap, "video_caption": score_avcap,
           "audio_caption": score_avcap, "lvis_seg": score_lvis}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", required=True, choices=sorted(SCORERS))
    p.add_argument("--jsonl", required=True)
    p.add_argument(
        "--loose", action="store_true",
        help="avqa: substring containment instead of exact answer match",
    )
    args = p.parse_args(argv)
    records = _load(args.jsonl)
    if args.task == "avqa":
        result = score_avqa(records, loose=args.loose)
    else:
        result = SCORERS[args.task](records)
    print(json.dumps(result, indent=1))
    return result


if __name__ == "__main__":
    main()
