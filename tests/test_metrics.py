"""Metric parity vs the reference implementations (imported read-only)."""

import sys

import numpy as np
import pytest
import torch

from crab_tpu.tasks import metrics as M
from crab_tpu.tasks.parsers import (
    extract_tag,
    normalize_answer,
    parse_box,
    parse_events,
)

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")


@pytest.fixture(scope="module")
def ref_avss_utils():
    from utils import avss_utils

    return avss_utils


@pytest.fixture(scope="module")
def ref_avvp():
    from utils import avvp_eval_metrics

    return avvp_eval_metrics


@pytest.fixture(scope="module")
def ref_ciou():
    from utils import ciou

    return ciou


def test_mask_iou_parity(ref_avss_utils, rng):
    pred = rng.standard_normal((4, 32, 32)).astype(np.float32)
    gt = (rng.random((4, 32, 32)) > 0.6).astype(np.float32)
    gt[2] = 0  # no-object case
    ref = ref_avss_utils.mask_iou(torch.from_numpy(pred), torch.from_numpy(gt)).item()
    ours = M.mask_iou(pred, gt)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_fmeasure_parity(ref_avss_utils, rng):
    pred = rng.standard_normal((3, 24, 24)).astype(np.float32)
    gt = (rng.random((3, 24, 24)) > 0.5).astype(np.float32)
    gt[1] = 0  # skipped sample
    ref = ref_avss_utils.Eval_Fmeasure(torch.from_numpy(pred), torch.from_numpy(gt))
    ours = M.eval_fmeasure(pred, gt)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_null_metric_parity(ref_avss_utils, rng):
    pred = rng.standard_normal((1, 16, 16)).astype(np.float32)
    ref = ref_avss_utils.metric_s_for_null(torch.from_numpy(pred)).item()
    np.testing.assert_allclose(M.metric_s_for_null(pred), ref, rtol=1e-5)


def test_avss_miou_parity(ref_avss_utils, rng):
    C = 71
    pred = rng.standard_normal((2, C, 16, 16)).astype(np.float32)
    target = rng.integers(0, C, (2, 16, 16))
    r_miou, r_f, r_cnt, r_vid = ref_avss_utils.calc_color_miou_fscore(
        torch.from_numpy(pred), torch.from_numpy(target), T=10
    )
    o_miou, o_f, o_cnt, o_vid = M.calc_color_miou_fscore(pred, target)
    np.testing.assert_allclose(o_miou, r_miou.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(o_f, r_f.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(o_cnt, r_cnt.numpy())
    np.testing.assert_allclose(o_vid, [v.item() for v in r_vid], rtol=1e-4)


def test_avvp_parity(ref_avvp, rng):
    def mats():
        return (rng.random((25, 10)) > 0.7).astype(np.float64)

    SO_a, SO_v, SO_av = mats(), mats(), mats()
    GT_a, GT_v, GT_av = mats(), mats(), mats()
    ref_seg = ref_avvp.segment_level(SO_a, SO_v, SO_av, GT_a, GT_v, GT_av)
    ours_seg = M.avvp_segment_level(SO_a, SO_v, SO_av, GT_a, GT_v, GT_av)
    np.testing.assert_allclose(ours_seg, ref_seg, rtol=1e-9)
    ref_ev = ref_avvp.event_level(SO_a, SO_v, SO_av, GT_a, GT_v, GT_av)
    ours_ev = M.avvp_event_level(SO_a, SO_v, SO_av, GT_a, GT_v, GT_av)
    np.testing.assert_allclose(ours_ev, ref_ev, rtol=1e-9)


def test_ciou_parity(ref_ciou):
    r1 = (10.0, 20.0, 110.0, 140.0)
    r2 = (30.0, 40.0, 120.0, 160.0)
    np.testing.assert_allclose(M.c_iou(r1, r2), ref_ciou.c_iou(r1, r2), rtol=1e-9)
    np.testing.assert_allclose(
        M.box_iou(r1, r2), ref_ciou.intersection_over_union(r1, r2), rtol=1e-9
    )


def test_parsers():
    assert extract_tag("x <answer>piano</answer> y", "answer") == "piano"
    assert normalize_answer("<answer> Piano. </answer>") == "piano"
    assert normalize_answer("the left one") == "the left one"
    box = parse_box(
        "Its coordinate of top left corner is (12,34) and coordinate of "
        "bottom right corner is (56,78)"
    )
    assert box == (12.0, 34.0, 56.0, 78.0)
    ev = parse_events("<event>dog barking</event><range>2,5</range>")
    assert ev == [("dog barking", "2,5")]


def test_avss_summarize():
    miou = np.zeros(71)
    f = np.zeros(71)
    cnt = np.zeros(71)
    miou[0], miou[3] = 4.0, 2.0
    f[0], f[3] = 2.0, 1.0
    cnt[0], cnt[3] = 4, 2
    out = M.avss_summarize(miou, f, cnt)
    np.testing.assert_allclose(out["miou"], (1.0 + 1.0) / 2)
    np.testing.assert_allclose(out["miou_noBg"], 1.0)
