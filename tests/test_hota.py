"""HOTA on hand-built toy sequences vs hand-computed values, and AP vs an
independent pycocotools-style oracle (reference ships these in sam3/eval/)."""

import numpy as np

from skix.metrics.detection_eval import average_precision
from skix.metrics.tracking_eval import evaluate_hota, evaluate_tracking

A = np.array([0.0, 0, 10, 10])
B = np.array([100.0, 100, 110, 110])
C = np.array([50.0, 50, 60, 60])


def _seq(spec):
    """spec: list per frame of (id, box) tuples → (boxes, ids) lists."""
    boxes, ids = [], []
    for frame in spec:
        boxes.append(np.asarray([b for _, b in frame]).reshape(-1, 4))
        ids.append(np.asarray([i for i, _ in frame], np.int64))
    return boxes, ids


class TestHotaHandComputed:
    def test_perfect_tracking(self):
        gt_b, gt_i = _seq([[(1, A), (2, B)]] * 4)
        out = evaluate_hota(gt_b, gt_i, gt_b, gt_i)
        assert abs(out["HOTA"] - 1.0) < 1e-9
        assert abs(out["DetA"] - 1.0) < 1e-9
        assert abs(out["AssA"] - 1.0) < 1e-9

    def test_identity_switch_three_tracks(self):
        """gt1 covered by pred10 (frames 0-1) then pred11 (frames 2-3);
        gt2 by pred12 throughout. Hand computation:
        DetA = 8/8 = 1; A(1,10) = A(1,11) = 2/(4+2-2) = 0.5; A(2,12) = 1;
        AssA = (2·0.5 + 2·0.5 + 4·1)/8 = 0.75 → HOTA = √0.75."""
        gt_b, gt_i = _seq([[(1, A), (2, B)]] * 4)
        pred_b, pred_i = _seq([
            [(10, A), (12, B)], [(10, A), (12, B)],
            [(11, A), (12, B)], [(11, A), (12, B)],
        ])
        out = evaluate_hota(pred_b, pred_i, gt_b, gt_i)
        assert abs(out["DetA"] - 1.0) < 1e-9
        assert abs(out["AssA"] - 0.75) < 1e-9
        assert abs(out["HOTA"] - np.sqrt(0.75)) < 1e-9

    def test_false_positive_lowers_deta_only(self):
        gt_b, gt_i = _seq([[(1, A), (2, B)]] * 4)
        pred_b, pred_i = _seq([
            [(10, A), (12, B), (13, C)],  # extra FP track at frame 0
            [(10, A), (12, B)],
            [(11, A), (12, B)], [(11, A), (12, B)],
        ])
        out = evaluate_hota(pred_b, pred_i, gt_b, gt_i)
        assert abs(out["DetA"] - 8.0 / 9.0) < 1e-9
        assert abs(out["AssA"] - 0.75) < 1e-9
        assert abs(out["HOTA"] - np.sqrt(8.0 / 9.0 * 0.75)) < 1e-9

    def test_partial_coverage_lowers_assa(self):
        """gt track present 4 frames, pred covers only frames 0-1:
        TPA=2, gt dets=4, pred dets=2 → A = 2/(4+2−2) = 0.5; DetA = 2/4.
        (Regression: matched-frame denominators inflated AssA to 1.0.)"""
        gt_b, gt_i = _seq([[(1, A)]] * 4)
        pred_b, pred_i = _seq([[(10, A)], [(10, A)], [], []])
        out = evaluate_hota(pred_b, pred_i, gt_b, gt_i)
        assert abs(out["DetA"] - 0.5) < 1e-9
        assert abs(out["AssA"] - 0.5) < 1e-9
        assert abs(out["HOTA"] - 0.5) < 1e-9

    def test_missed_detections(self):
        gt_b, gt_i = _seq([[(1, A), (2, B)]] * 4)
        pred_b, pred_i = _seq([
            [(10, A)], [(10, A)], [(10, A)], [(10, A)],  # gt2 never found
        ])
        out = evaluate_hota(pred_b, pred_i, gt_b, gt_i)
        # TP=4, FN=4 → DetA = 4/8; (1,10) association perfect → AssA = 1
        assert abs(out["DetA"] - 0.5) < 1e-9
        assert abs(out["AssA"] - 1.0) < 1e-9
        assert abs(out["HOTA"] - np.sqrt(0.5)) < 1e-9

    def test_alignment_prefers_consistent_identity(self):
        """Two preds sit exactly on gt1 in frame 2; pred11 also covers gt1
        in frames 3-5, so the alignment-biased matching must pick pred11
        there (pred10 only ever appears in frame 2)."""
        gt_b, gt_i = _seq([[(1, A)]] * 6)
        pred_b, pred_i = _seq([
            [(11, A)], [(11, A)],
            [(10, A), (11, A)],
            [(11, A)], [(11, A)], [(11, A)],
        ])
        out = evaluate_hota(pred_b, pred_i, gt_b, gt_i)
        # all 6 gt dets matched (pred10's extra det in frame 2 is the FP)
        assert abs(out["DetA"] - 6.0 / 7.0) < 1e-9
        # every match goes to pred11: A(1,11) = 6/(6+6-6) = 1
        assert abs(out["AssA"] - 1.0) < 1e-9

    def test_localization_sweep(self):
        """Half-overlapping boxes stop matching above their IoU."""
        shifted = A + np.array([5.0, 0, 5, 0])  # IoU = 1/3
        gt_b, gt_i = _seq([[(1, A)]] * 2)
        pred_b, pred_i = _seq([[(10, shifted)]] * 2)
        out = evaluate_hota(pred_b, pred_i, gt_b, gt_i)
        iou = 1.0 / 3.0
        # below the IoU: TP=2, FN=FP=0 → DetA=1; above: TP=0, FN=FP=2 → 0
        per_alpha_det = (out["alphas"] <= iou + 1e-12) * 1.0
        np.testing.assert_allclose(out["DetA_alpha"], per_alpha_det,
                                   atol=1e-9)


class TestAPOracle:
    def _oracle_ap(self, scores, is_tp, n_gt):
        """pycocotools-style accumulate: precision envelope + 101-pt
        recall sampling via searchsorted."""
        order = np.argsort(-np.asarray(scores), kind="mergesort")
        tp = np.cumsum(np.asarray(is_tp, float)[order])
        fp = np.cumsum(1.0 - np.asarray(is_tp, float)[order])
        rc = tp / n_gt
        pr = tp / np.maximum(tp + fp, np.finfo(float).eps)
        # envelope (pycocotools cocoeval.py accumulate)
        for i in range(len(pr) - 1, 0, -1):
            pr[i - 1] = max(pr[i - 1], pr[i])
        rec_thrs = np.linspace(0, 1, 101)
        inds = np.searchsorted(rc, rec_thrs, side="left")
        q = np.zeros(101)
        for ri, pi in enumerate(inds):
            if pi < len(pr):
                q[ri] = pr[pi]
        return float(np.mean(q))

    def test_ap_matches_pycocotools_style_oracle(self):
        rng = np.random.default_rng(3)
        # one image, GT boxes on a grid; predictions = each GT jittered +
        # random decoys; scores random → non-trivial PR curve
        gts = np.stack([np.array([i * 20.0, j * 20, i * 20 + 10,
                                  j * 20 + 10])
                        for i in range(3) for j in range(3)])
        preds, scores, is_tp_ref = [], [], None
        for g in gts:
            preds.append(g + rng.normal(0, 1.0, 4))
        for _ in range(6):
            preds.append(rng.uniform(100, 200, 4))
        preds = np.stack(preds)
        preds[:, 2:] = np.maximum(preds[:, 2:], preds[:, :2] + 1)
        scores = rng.uniform(0.1, 1.0, len(preds))

        got = average_precision([preds], [scores], [gts],
                                iou_threshold=0.5)

        # oracle does its OWN greedy matching with the same rule
        from skix.metrics.detection_eval import _iou_matrix

        order = np.argsort(-scores)
        taken = np.zeros(len(gts), bool)
        iou = _iou_matrix(preds, gts)
        is_tp = np.zeros(len(preds), bool)
        for i in order:
            cand = np.where(~taken & (iou[i] >= 0.5))[0]
            if len(cand):
                j = cand[np.argmax(iou[i][cand])]
                taken[j] = True
                is_tp[i] = True
        want = self._oracle_ap(scores, is_tp, len(gts))
        assert abs(got - want) < 1e-6

    def test_perfect_and_empty(self):
        g = [np.array([[0.0, 0, 10, 10]])]
        assert abs(average_precision(g, [np.array([0.9])], g) - 1.0) < 1e-9
        assert average_precision([np.zeros((0, 4))], [np.zeros(0)], g) == 0.0


class TestMotaStillWorks:
    def test_identity_switch_counted(self):
        gt_b, gt_i = _seq([[(1, A)]] * 4)
        pred_b, pred_i = _seq([[(10, A)], [(10, A)], [(11, A)], [(11, A)]])
        out = evaluate_tracking(pred_b, pred_i, gt_b, gt_i)
        assert out["id_switches"] == 1


class TestVideoInstanceAP:
    def _toy(self):
        H = W = 16
        sq = np.zeros((H, W), bool)
        sq[2:8, 2:8] = True
        sq2 = np.zeros((H, W), bool)
        sq2[9:15, 9:15] = True
        gt_masks = [np.stack([sq, sq2])] * 3
        gt_ids = [np.array([1, 2])] * 3
        return sq, sq2, gt_masks, gt_ids

    def test_perfect_tracks(self):
        from skix.metrics.tracking_eval import video_instance_ap

        sq, sq2, gt_masks, gt_ids = self._toy()
        out = video_instance_ap(gt_masks, gt_ids, {1: 0.9, 2: 0.8},
                                gt_masks, gt_ids)
        assert abs(out["mAP"] - 1.0) < 1e-9

    def test_one_track_half_overlap(self):
        from skix.metrics.tracking_eval import (spatiotemporal_mask_iou,
                                                video_instance_ap)

        sq, sq2, gt_masks, gt_ids = self._toy()
        half = np.zeros_like(sq)
        half[2:8, 2:5] = True  # covers half the columns of sq
        pred_masks = [np.stack([half, sq2])] * 3
        pred_ids = [np.array([10, 20])] * 3
        iou, p_ids, g_ids = spatiotemporal_mask_iou(pred_masks, pred_ids,
                                                    gt_masks, gt_ids)
        # |half|=18, |sq|=36, inter=18, union=36 → 0.5
        assert abs(iou[p_ids.index(10), g_ids.index(1)] - 0.5) < 1e-9
        out = video_instance_ap(pred_masks, pred_ids, {10: 0.9, 20: 0.8},
                                gt_masks, gt_ids)
        # at thr .5 both match (AP=1); above .5 only sq2 matches
        assert abs(out["AP50"] - 1.0) < 1e-6
        assert out["AP75"] < 1.0

    def test_identity_switch_fragments_track(self):
        from skix.metrics.tracking_eval import video_instance_ap

        sq, sq2, gt_masks, gt_ids = self._toy()
        # pred id 10 covers frames 0-1, id 11 frame 2 → each has ST-IoU
        # 2/3 and 1/3 vs gt track 1
        pred_masks = [np.stack([sq]), np.stack([sq]), np.stack([sq])]
        pred_ids = [np.array([10]), np.array([10]), np.array([11])]
        out = video_instance_ap(pred_masks, pred_ids, {10: 0.9, 11: 0.8},
                                [np.stack([sq])] * 3, [np.array([1])] * 3)
        assert abs(out["AP50"] - 1.0) < 1e-6   # the 2/3 fragment matches
        assert abs(out["AP75"] - 0.0) < 1e-6   # nothing reaches 0.75
