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
from crab_tpu.tasks.parsers import normalize_answer, parse_box


def _load(fp: str) -> List[Dict]:
    with open(fp) as f:
        return [json.loads(line) for line in f if line.strip()]


def score_avqa(records: List[Dict]) -> Dict:
    total, correct = 0, 0
    by_type: Dict[str, List[int]] = defaultdict(list)
    for r in records:
        pred = normalize_answer(r["predict"])
        gold = normalize_answer(r.get("answer", r.get("output", "")))
        ok = int(gold != "" and gold in pred)
        total += 1
        correct += ok
        if r.get("question_type"):
            by_type[str(r["question_type"])].append(ok)
    out = {"accuracy": correct / max(total, 1), "n": total}
    for t, v in sorted(by_type.items()):
        out[f"acc[{t}]"] = float(np.mean(v))
    return out


def score_avvp(records: List[Dict]) -> Dict:
    f_seg = np.zeros(4)
    f_ev = np.zeros(4)
    n = 0
    for r in records:
        mats = [np.asarray(r[k], dtype=np.float64)
                for k in ("SO_a", "SO_v", "SO_av", "GT_a", "GT_v", "GT_av")]
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
    for r in records:
        vid = r.get("vid") or "/".join(str(r.get("image_path", "?")).split("/")[-3:-1])
        by_vid[vid].append(float(r["miou" if "miou" in r else "iou"]))
        if "fscore" in r:
            fscores.append(float(r["fscore"]))
    vid_miou = {v: float(np.mean(x)) for v, x in by_vid.items()}
    out = {
        "miou": float(np.mean(list(vid_miou.values()))) if vid_miou else 0.0,
        "videos": len(vid_miou),
    }
    if fscores:
        out["fscore"] = float(np.mean(fscores))
    return out


SCORERS = {"avqa": score_avqa, "avvp": score_avvp, "arig": score_arig,
           "avs": score_avs, "s4": score_avs, "ms3": score_avs,
           "ref-avs": score_avs}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", required=True, choices=sorted(SCORERS))
    p.add_argument("--jsonl", required=True)
    args = p.parse_args(argv)
    records = _load(args.jsonl)
    result = SCORERS[args.task](records)
    print(json.dumps(result, indent=1))
    return result


if __name__ == "__main__":
    main()
