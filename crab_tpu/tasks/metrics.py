"""Task metrics — exact reimplementations of the reference's evaluators.

Sources: ``utils/avss_utils.py`` (mask mIoU, F-measure, AVSS per-class
mIoU/F, null score), ``utils/avvp_eval_metrics.py`` (AVVP segment/event
F1), ``utils/ciou.py`` (ARIG cIoU/IoU). numpy throughout — these run on
eval outputs, not in the hot path.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


# ---------------------------------------------------------------------------
# AVS binary masks (S4 / MS3 / Ref-AVS)
# ---------------------------------------------------------------------------


def mask_iou(pred_logits: np.ndarray, target: np.ndarray, eps: float = 1e-7) -> float:
    """(N, H, W) logits vs binary target; sigmoid>0.5, no-object handling
    (``avss_utils.py:22-47``)."""
    assert pred_logits.ndim == 3 and pred_logits.shape == target.shape
    N = pred_logits.shape[0]
    num_pixels = pred_logits.shape[-1] * pred_logits.shape[-2]
    pred = (_sigmoid(pred_logits) > 0.5).astype(np.int64)
    target = target.astype(np.int64)
    no_obj = target.sum(axis=(1, 2)) == 0
    inter = (pred * target).sum(axis=(1, 2)).astype(np.float64)
    union = np.maximum(pred, target).sum(axis=(1, 2)).astype(np.float64)
    inter_no_obj = ((1 - target) * (1 - pred)).sum(axis=(1, 2)).astype(np.float64)
    inter[no_obj] = inter_no_obj[no_obj]
    union[no_obj] = num_pixels
    return float(np.sum(inter / (union + eps)) / N)


def eval_fmeasure(pred_logits: np.ndarray, gt: np.ndarray, pr_num: int = 255) -> float:
    """Max-F over a 255-threshold PR sweep, beta^2 = 0.3
    (``avss_utils.py:50-95``)."""
    pred = _sigmoid(pred_logits)
    beta2 = 0.3
    thresholds = np.linspace(0, 1 - 1e-10, pr_num)
    avg_f = np.zeros(pr_num)
    img_num = 0
    score = np.zeros(pr_num)
    for i in range(pred.shape[0]):
        if gt[i].mean() == 0.0:
            continue
        y = gt[i]
        # vectorized PR sweep
        yp = pred[i][None] >= thresholds[:, None, None]  # (pr, H, W)
        tp = (yp * y[None]).sum(axis=(1, 2))
        with np.errstate(divide="ignore", invalid="ignore"):
            prec = tp / (yp.sum(axis=(1, 2)) + 1e-20)
            recall = tp / (y.sum() + 1e-20)
            f = (1 + beta2) * prec * recall / (beta2 * prec + recall)
        f = np.nan_to_num(f, nan=0.0)
        avg_f += f
        img_num += 1
        score = avg_f / img_num
    return float(score.max())


def metric_s_for_null(pred_logits: np.ndarray) -> float:
    """Ref-AVS test_n: s = sqrt(pred_area / total) (``avss_utils.py:8-19``)."""
    assert pred_logits.ndim == 3
    pred = (_sigmoid(pred_logits) > 0.5).astype(np.float64)
    return float(np.sqrt(pred.sum() / pred.size))


# ---------------------------------------------------------------------------
# AVSS 71-class
# ---------------------------------------------------------------------------


def batch_miou_fscore(
    output: np.ndarray,  # (BF, C, H, W) scores
    target: np.ndarray,  # (BF, H, W) int labels
    nclass: int,
    beta2: float = 0.3,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, List[float]]:
    """Per-class IoU/F accumulators (``avss_utils.py:379-419``)."""
    predict = output.argmax(axis=1) + 1
    target = target.astype(np.float64) + 1
    predict = predict * (target > 0)
    intersection = predict * (predict == target)
    ious = np.zeros(nclass)
    fscores = np.zeros(nclass)
    cls_count = np.zeros(nclass)
    vid_miou_list: List[float] = []
    bins = np.arange(1, nclass + 2)  # histogram over classes 1..nclass
    for i in range(target.shape[0]):
        area_inter = np.histogram(intersection[i], bins=bins.shape[0] - 1, range=(1, nclass))[0].astype(np.float64)
        area_pred = np.histogram(predict[i], bins=bins.shape[0] - 1, range=(1, nclass))[0].astype(np.float64)
        area_lab = np.histogram(target[i], bins=bins.shape[0] - 1, range=(1, nclass))[0].astype(np.float64)
        area_union = area_pred + area_lab - area_inter
        iou = area_inter / (2.220446049250313e-16 + area_union)
        ious += iou
        cls_count[np.nonzero(area_union)[0]] += 1
        with np.errstate(divide="ignore", invalid="ignore"):
            precision = area_inter / area_pred
            recall = area_inter / area_lab
            fscore = (1 + beta2) * precision * recall / (beta2 * precision + recall)
        fscores += np.nan_to_num(fscore, nan=0.0)
        denom = float((iou != 0).sum())
        vid_miou_list.append(float(iou.sum() / denom) if denom else float("nan"))
    return ious, fscores, cls_count, vid_miou_list


def calc_color_miou_fscore(pred_logits: np.ndarray, target: np.ndarray):
    """softmax + per-class accumulation (``avss_utils.py:422-433``)."""
    nclass = pred_logits.shape[1]
    e = np.exp(pred_logits - pred_logits.max(axis=1, keepdims=True))
    probs = e / e.sum(axis=1, keepdims=True)
    return batch_miou_fscore(probs, target, nclass)


def avss_summarize(miou_sum, fscore_sum, cls_count) -> dict:
    """Final AVSS numbers with and without background (class 0),
    mirroring the accumulation in ``quick_start.py:361-450``."""
    valid = cls_count > 0
    iou_pc = np.where(valid, miou_sum / np.maximum(cls_count, 1), 0.0)
    f_pc = np.where(valid, fscore_sum / np.maximum(cls_count, 1), 0.0)
    n = max(int(valid.sum()), 1)
    n_nb = max(int(valid[1:].sum()), 1)
    return {
        "miou": float(iou_pc[valid].sum() / n),
        "fscore": float(f_pc[valid].sum() / n),
        "miou_noBg": float(iou_pc[1:][valid[1:]].sum() / n_nb),
        "fscore_noBg": float(f_pc[1:][valid[1:]].sum() / n_nb),
    }


# ---------------------------------------------------------------------------
# ARIG boxes
# ---------------------------------------------------------------------------


def box_iou(box1: Sequence[float], box2: Sequence[float]) -> float:
    """(xmin, ymin, xmax, ymax) IoU (``ciou.py:57-83``)."""
    xmin1, ymin1, xmax1, ymax1 = box1
    xmin2, ymin2, xmax2, ymax2 = box2
    xx1, yy1 = max(xmin1, xmin2), max(ymin1, ymin2)
    xx2, yy2 = min(xmax1, xmax2), min(ymax1, ymax2)
    area1 = (xmax1 - xmin1) * (ymax1 - ymin1)
    area2 = (xmax2 - xmin2) * (ymax2 - ymin2)
    inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
    return inter / (area1 + area2 - inter + 1e-6)


def c_iou(rec1: Sequence[float], rec2: Sequence[float]) -> float:
    """Complete IoU, bit-matching ``ciou.py:86-111`` including its
    d_corner2 sign quirk (the reference adds the y corners)."""
    xmin1, ymin1, xmax1, ymax1 = rec1
    xmin2, ymin2, xmax2, ymax2 = rec2
    iou = box_iou(rec1, rec2)
    center1 = ((xmin1 + xmax1) / 2, (ymin1 + ymax1) / 2)
    center2 = ((xmin2 + xmax2) / 2, (ymin2 + ymax2) / 2)
    d_center2 = (center1[0] - center2[0]) ** 2 + (center1[1] - center2[1]) ** 2
    corner1 = (min(xmin1, xmax1, xmin2, xmax2), min(ymin1, ymax1, ymin2, ymax2))
    corner2 = (max(xmin1, xmax1, xmin2, xmax2), max(ymin1, ymax1, ymin2, ymax2))
    # NB: reference computes (y1 + y2)^2 here, not (y1 - y2)^2 (ciou.py:104)
    d_corner2 = (corner1[0] - corner2[0]) ** 2 + (corner1[1] + corner2[1]) ** 2
    w1, h1 = xmax1 - xmin1, ymax1 - ymin1
    w2, h2 = xmax2 - xmin2, ymax2 - ymin2
    v = 4 * (np.arctan(w1 / h1) - np.arctan(w2 / h2)) ** 2 / (np.pi**2)
    alpha = v / (1 - iou + v)
    return float(iou - d_center2 / d_corner2 - alpha * v)


# ---------------------------------------------------------------------------
# AVVP segment / event level F1
# ---------------------------------------------------------------------------


def _f1_list(TP, FP, FN) -> list:
    out = []
    for tp, fp, fn in zip(TP, FP, FN):
        if tp + fp != 0 or tp + fn != 0:
            out.append(2 * tp / (2 * tp + fn + fp))
    return out


def _avg_or_one(f: list) -> float:
    return float(sum(f) / len(f)) if f else 1.0


def avvp_segment_level(SO_a, SO_v, SO_av, GT_a, GT_v, GT_av):
    """(25, 10) binary matrices -> (f_a, f_v, f, f_av)
    (``avvp_eval_metrics.py:146-206``)."""
    def counts(SO, GT):
        TP = np.sum(SO * GT, axis=1)
        FN = np.sum((1 - SO) * GT, axis=1)
        FP = np.sum(SO * (1 - GT), axis=1)
        return TP, FN, FP

    TP_a, FN_a, FP_a = counts(SO_a, GT_a)
    TP_v, FN_v, FP_v = counts(SO_v, GT_v)
    TP_av, FN_av, FP_av = counts(SO_av, GT_av)
    TP, FN, FP = TP_a + TP_v, FN_a + FN_v, FP_a + FP_v
    return (
        _avg_or_one(_f1_list(TP_a, FP_a, FN_a)),
        _avg_or_one(_f1_list(TP_v, FP_v, FN_v)),
        _avg_or_one(_f1_list(TP, FP, FN)),
        _avg_or_one(_f1_list(TP_av, FP_av, FN_av)),
    )


def _extract_event(seq: np.ndarray) -> List[np.ndarray]:
    """Contiguous runs of 1s as 10-d indicator vectors
    (``avvp_eval_metrics.py:215-241``)."""
    events = []
    i = 0
    T = len(seq)
    while i < T:
        if seq[i] == 1:
            start = i
            while i < T and seq[i] == 1:
                i += 1
            v = np.zeros(T)
            v[start:i] = 1
            events.append(v)
        else:
            i += 1
    return events


def _event_wise(event_p, event_gt):
    TP = FP = FN = 0
    if event_p is not None:
        for x1 in event_p:
            if event_gt is not None:
                if any(
                    np.sum(x1 * x2) >= 0.5 * np.sum(x1 + x2 - x1 * x2)
                    for x2 in event_gt
                ):
                    TP += 1
                else:
                    FP += 1
            else:
                FP += 1
    if event_gt is not None:
        for x1 in event_gt:
            if event_p is not None:
                if not any(
                    np.sum(x1 * x2) >= 0.5 * np.sum(x1 + x2 - x1 * x2)
                    for x2 in event_p
                ):
                    FN += 1
            else:
                FN += 1
    return TP, FP, FN


def avvp_event_level(SO_a, SO_v, SO_av, GT_a, GT_v, GT_av):
    """(25, 10) matrices -> event-level (f_a, f_v, f, f_av)
    (``avvp_eval_metrics.py:33-143``)."""
    N = SO_a.shape[0]

    def per_class(SO, GT):
        TP = np.zeros(N)
        FP = np.zeros(N)
        FN = np.zeros(N)
        for n in range(N):
            ep = _extract_event(SO[n]) if SO[n].sum() != 0 else None
            eg = _extract_event(GT[n]) if GT[n].sum() != 0 else None
            tp, fp, fn = _event_wise(ep, eg)
            TP[n], FP[n], FN[n] = tp, fp, fn
        return TP, FP, FN

    TP_a, FP_a, FN_a = per_class(SO_a, GT_a)
    TP_v, FP_v, FN_v = per_class(SO_v, GT_v)
    TP_av, FP_av, FN_av = per_class(SO_av, GT_av)
    TP, FP, FN = TP_a + TP_v, FP_a + FP_v, FN_a + FN_v
    return (
        _avg_or_one(_f1_list(TP_a, FP_a, FN_a)),
        _avg_or_one(_f1_list(TP_v, FP_v, FN_v)),
        _avg_or_one(_f1_list(TP, FP, FN)),
        _avg_or_one(_f1_list(TP_av, FP_av, FN_av)),
    )
