"""TETA + cgF1 evaluator tests.

TETA core is parity-tested against the reference's vendored metric class
(sam3/eval/teta_eval_toolkit/metrics/teta.py) imported as an oracle;
cgF1 against hand-computed values (reference: sam3/eval/cgf1_eval.py).
"""

import importlib
import importlib.machinery
import sys
import types

import numpy as np
import pytest

from skix.metrics.cgf1 import evaluate_cgf1
from skix.metrics.teta import ALPHAS, CLS_ALPHAS, evaluate_teta, teta_core

REF_TETA_DIR = ("/root/reference/prepare_front_results/sam3/eval/"
                "teta_eval_toolkit")


def _import_reference_teta():
    """Import the vendored TETA metric without executing the toolkit's
    __init__ (it imports a datasets module that is not vendored)."""
    for name, path in [("teta_tk", REF_TETA_DIR),
                       ("teta_tk.metrics", REF_TETA_DIR + "/metrics")]:
        mod = types.ModuleType(name)
        spec = importlib.machinery.ModuleSpec(name, None, is_package=True)
        spec.submodule_search_locations = [path]
        mod.__spec__ = spec
        mod.__path__ = [path]
        sys.modules[name] = mod
    return importlib.import_module("teta_tk.metrics.teta").TETA


def _box(cx, cy, s=10.0):
    return [cx - s / 2, cy - s / 2, cx + s / 2, cy + s / 2]


class TestTETACoreParity:
    def _toy_data(self):
        """3 frames, 2 GT tracks, 3 tracker tracks (one class-swapped,
        one drifting), single evaluated class 0."""
        rng = np.random.default_rng(41)
        gt_ids = [np.array([0, 1]), np.array([0, 1]), np.array([1])]
        tk_ids = [np.array([0, 1, 2]), np.array([0, 2]), np.array([1, 2])]
        sims = [rng.uniform(0.0, 1.0, (len(g), len(k)))
                for g, k in zip(gt_ids, tk_ids)]
        # overlap (FP-candidate) subsets per frame
        ov = [np.array([0, 2]), np.array([0]), np.array([1, 2])]
        tk_classes = [np.array([0, 5, 0]), np.array([0, 0]),
                      np.array([5, 0])]
        num_gt_dets = sum(len(g) for g in gt_ids)
        num_ov = sum(len(o) for o in ov)
        return dict(gt_ids=gt_ids, tk_ids=tk_ids, sims=sims, ov=ov,
                    tk_classes=tk_classes, num_gt_ids=2, num_tk_ids=3,
                    num_gt_dets=num_gt_dets, num_ov=num_ov)

    def test_matches_reference_metric_class(self):
        TETA = _import_reference_teta()
        d = self._toy_data()

        ref_data = {
            "num_tk_overlap_dets": d["num_ov"],
            "num_gt_dets": d["num_gt_dets"],
            "num_tk_cls_dets": 0,
            "num_gt_ids": d["num_gt_ids"],
            "num_tk_ids": d["num_tk_ids"],
            "gt_ids": d["gt_ids"],
            "tk_ids": d["tk_ids"],
            "tk_overlap_ids": d["ov"],
            "tk_class_eval_tk_ids": [np.array([])] * 3,
            "sim_scores": d["sims"],
            "tk_classes": d["tk_classes"],
            "gt_classes": [0, 0, 0],
            "gt_id_map": {i: i for i in range(d["num_gt_ids"])},
            "tk_id_map": {i: i for i in range(d["num_tk_ids"])},
        }
        ref = TETA(exhaustive=False)
        cls_fp_thr = {"cls0": np.zeros(len(CLS_ALPHAS)),
                      "other": np.zeros(len(CLS_ALPHAS))}
        ref_res, ref_cls_fp, _ = ref.eval_sequence_single_thr(
            ref_data, "cls0", {5: "other"}, cls_fp_thr, thr=50)

        res, fp_other = teta_core(
            d["gt_ids"], d["tk_ids"], d["sims"], d["ov"], d["tk_classes"],
            gt_class=0, num_gt_ids=d["num_gt_ids"],
            num_tk_ids=d["num_tk_ids"], num_gt_dets=d["num_gt_dets"],
            num_tk_overlap_dets=d["num_ov"], loc_thr=0.5)

        for field in ("Loc_TP", "Loc_FN", "Loc_FP", "Cls_TP", "Cls_FN",
                      "LocA", "LocRe", "LocPr", "AssocA", "AssocRe",
                      "AssocPr", "TETA"):
            np.testing.assert_allclose(
                np.asarray(res[field]), np.asarray(ref_res[field]),
                atol=1e-10, err_msg=field)
        np.testing.assert_allclose(fp_other.get(5, np.zeros(len(CLS_ALPHAS))),
                                   ref_cls_fp["other"], atol=1e-10)

    def test_empty_tracker(self):
        res, _ = teta_core([np.array([0])], [np.array([], np.int64)],
                           [np.zeros((1, 0))], [np.array([], np.int64)],
                           [np.array([], np.int64)], 0, 1, 0, 1, 0)
        np.testing.assert_array_equal(res["Loc_FN"],
                                      np.ones(len(ALPHAS)))
        assert float(res["LocA"].max()) == 0.0


class TestEvaluateTETA:
    def _perfect(self, swap_class=False):
        frames = 4
        gt_b, gt_i, gt_c, pb, pi, pc = [], [], [], [], [], []
        for t in range(frames):
            b = np.array([_box(20 + 5 * t, 20), _box(60, 60 + 5 * t)])
            gt_b.append(b)
            gt_i.append(np.array([0, 1]))
            gt_c.append(np.array([0, 0]))
            pb.append(b.copy())
            pi.append(np.array([10, 11]))
            pc.append(np.array([0, 1 if swap_class else 0]))
        return pb, pi, pc, gt_b, gt_i, gt_c

    def test_perfect_tracking_is_one(self):
        out = evaluate_teta(*self._perfect())
        assert out["LocA"] == pytest.approx(1.0)
        assert out["AssocA"] == pytest.approx(1.0)
        assert out["ClsA"] == pytest.approx(1.0)
        assert out["TETA"] == pytest.approx(1.0)

    def test_class_swap_hits_only_cls(self):
        """THE TETA property: a classification mistake does not reduce
        localization or association (the cluster keeps the det)."""
        out = evaluate_teta(*self._perfect(swap_class=True))
        assert out["LocA"] == pytest.approx(1.0)
        assert out["AssocA"] == pytest.approx(1.0)
        assert out["ClsA"] == pytest.approx(0.5)  # half the matches wrong
        assert out["TETA"] == pytest.approx((1 + 1 + 0.5) / 3)

    def test_id_switch_hits_assoc_not_loc(self):
        pb, pi, pc, gt_b, gt_i, gt_c = self._perfect()
        pi = [np.array([10, 11]), np.array([10, 11]),
              np.array([12, 11]), np.array([12, 11])]  # track 0 re-ids
        out = evaluate_teta(pb, pi, pc, gt_b, gt_i, gt_c)
        assert out["LocA"] == pytest.approx(1.0)
        assert out["AssocA"] < 1.0
        assert out["ClsA"] == pytest.approx(1.0)

    def test_false_positive_track_counts_when_overlapping(self):
        pb, pi, pc, gt_b, gt_i, gt_c = self._perfect()
        # an extra det right on GT 0 (overlap → FP candidate, unmatched)
        pb = [np.concatenate([b, b[:1] + 1.0]) for b in pb]
        pi = [np.concatenate([i, [99]]) for i in pi]
        pc = [np.concatenate([c, [0]]) for c in pc]
        out = evaluate_teta(pb, pi, pc, gt_b, gt_i, gt_c)
        assert out["LocA"] < 1.0
        # a far-away det is NOT an FP candidate (outside every cluster)
        pb2, pi2, pc2, gt_b, gt_i, gt_c = self._perfect()
        pb2 = [np.concatenate([b, [_box(200, 200)]]) for b in pb2]
        pi2 = [np.concatenate([i, [99]]) for i in pi2]
        pc2 = [np.concatenate([c, [7]]) for c in pc2]
        out2 = evaluate_teta(pb2, pi2, pc2, gt_b, gt_i, gt_c)
        assert out2["LocA"] == pytest.approx(1.0)


class TestTETAMultiClass:
    def test_cls_fp_cross_charging(self):
        """A detection matched under class A's cluster but predicted as
        class B charges Cls_FP to class B (reference teta.py:160-164 via
        eval_sequence's cls_fp pooling)."""
        frames = 3
        b0, b1 = _box(20, 20), _box(60, 60)
        gt_b = [np.array([b0, b1])] * frames
        gt_i = [np.array([0, 1])] * frames
        gt_c = [np.array([0, 1])] * frames  # one GT per class
        pb = [np.array([b0, b1])] * frames
        pi = [np.array([10, 11])] * frames
        # tracker calls BOTH objects class 1 → class 0's match is a
        # classification miss charged to class 1
        pc = [np.array([1, 1])] * frames
        out = evaluate_teta(pb, pi, pc, gt_b, gt_i, gt_c)
        r0 = out["per_class"][0]
        r1 = out["per_class"][1]
        # localization unaffected for both classes
        assert np.mean(r0["LocA"]) == pytest.approx(1.0)
        assert np.mean(r1["LocA"]) == pytest.approx(1.0)
        # class 0: its matched det is wrongly classified → ClsA = 0
        assert r0["ClsA"] == pytest.approx(0.0)
        # class 1: own match correct but carries the cross-charged FP:
        # Cls_TP = 3 (frames), Cls_FP = 3 → ClsA = 3/(3+0+3) = 0.5
        np.testing.assert_allclose(r1["Cls_FP"], 3.0)
        assert r1["ClsA"] == pytest.approx(0.5)

    def test_class_average(self):
        frames = 2
        gt_b = [np.array([_box(20, 20)])] * frames
        gt_i = [np.array([0])] * frames
        gt_c = [np.array([2])] * frames
        pb = [np.array([_box(20, 20)])] * frames
        pi = [np.array([5])] * frames
        pc = [np.array([2])] * frames
        out = evaluate_teta(pb, pi, pc, gt_b, gt_i, gt_c,
                            class_list=[2])
        assert out["TETA"] == pytest.approx(1.0)


class TestSuite:
    def test_perfect_tracking_all_metrics(self):
        """VEvalEvaluator composition (saco_veval_eval.py:17): all five
        metric families over one sequence in one call."""
        from skix.metrics.suite import evaluate_tracking_suite

        frames = 3
        boxes = np.array([_box(20, 20), _box(60, 60)])
        masks = np.zeros((2, 32, 32), bool)
        masks[0, 4:12, 4:12] = True
        masks[1, 20:30, 20:30] = True
        ids = np.array([0, 1])
        scores = np.array([0.9, 0.9])
        out = evaluate_tracking_suite(
            [boxes] * frames, [ids] * frames, [scores] * frames,
            [boxes] * frames, [ids + 7] * frames,
            pred_masks=[masks] * frames, gt_masks=[masks] * frames)
        for key in ("HOTA", "MOTA", "TETA", "mask_AP"):
            assert out[key] == pytest.approx(1.0, abs=1e-6), (key, out)
        assert out["pmF1"] > 0.99
        assert out["id_switches"] == 0

    def test_degraded_tracking_degrades(self):
        from skix.metrics.suite import evaluate_tracking_suite

        frames = 4
        boxes = np.array([_box(20, 20), _box(60, 60)])
        ids_good = np.array([0, 1])
        # identity flips halfway → association metrics drop
        pids = [ids_good, ids_good, ids_good[::-1], ids_good[::-1]]
        scores = np.array([0.9, 0.9])
        out = evaluate_tracking_suite(
            [boxes] * frames, pids, [scores] * frames,
            [boxes] * frames, [ids_good] * frames)
        assert out["HOTA"] < 1.0
        assert out["AssocA"] < 1.0
        assert out["LocA"] == pytest.approx(1.0)
        assert out["id_switches"] >= 2


class TestCGF1:
    def test_hand_computed_toy(self):
        # img0: two perfect matches; img1: low-score det only (→ IL_TN
        # after thresholding); img2: one GT, no det (→ IL_FN)
        pred_boxes = [np.array([_box(10, 10), _box(40, 40)]),
                      np.array([_box(5, 5)]),
                      np.zeros((0, 4))]
        pred_scores = [np.array([0.9, 0.8]), np.array([0.3]),
                       np.zeros((0,))]
        gt_boxes = [np.array([_box(10, 10), _box(40, 40)]),
                    np.zeros((0, 4)),
                    np.array([_box(70, 70)])]
        out = evaluate_cgf1(pred_boxes, pred_scores, gt_boxes,
                            threshold=0.5)
        assert out["IL_MCC"] == pytest.approx(0.5, abs=1e-4)
        assert out["recall"] == pytest.approx(2 / 3, abs=1e-3)
        assert out["precision"] == pytest.approx(1.0, abs=1e-3)
        assert out["F1"] == pytest.approx(0.8, abs=1e-3)
        assert out["positive_micro_F1"] == pytest.approx(0.8, abs=1e-3)
        assert out["positive_macro_F1"] == pytest.approx(1.0, abs=1e-3)
        assert out["cgF1"] == pytest.approx(0.4, abs=1e-3)

    def test_iou_threshold_sweep(self):
        # one det with IoU ≈ 0.6 vs the GT: TP at 0.5, FP at 0.75
        gt = np.array([[0.0, 0.0, 10.0, 10.0]])
        det = np.array([[0.0, 0.0, 10.0, 8.0]])  # IoU 0.8
        out = evaluate_cgf1([det], [np.array([0.9])], [gt])
        assert out["F1@0.5"] == pytest.approx(1.0, abs=1e-3)
        assert out["F1@0.75"] == pytest.approx(1.0, abs=1e-3)
        det2 = np.array([[0.0, 0.0, 10.0, 6.0]])  # IoU 0.6
        out2 = evaluate_cgf1([det2], [np.array([0.9])], [gt])
        assert out2["F1@0.5"] == pytest.approx(1.0, abs=1e-3)
        assert out2["F1@0.75"] == pytest.approx(0.0, abs=1e-3)

    def test_hungarian_matching_not_greedy(self):
        # IoU matrix where greedy best-first pairs (0,0)=0.6 and strands
        # det1 (its only other option is 0.0) but Hungarian pairs both
        # above a 0.3 threshold (reference uses linear_sum_assignment,
        # cgf1_eval.py:292)
        from skix.metrics.cgf1 import _evaluate_image
        iou = np.array([[0.6, 0.5], [0.55, 0.0]])
        res = _evaluate_image(iou, n_dt=2, n_gt=2,
                              iou_thrs=np.array([0.3]))
        assert res["TPs"][0] == 2 and res["FPs"][0] == 0

    def test_mask_mode(self):
        m = np.zeros((1, 16, 16), bool)
        m[0, :8, :8] = True
        out = evaluate_cgf1([m.astype(float)], [np.array([0.9])],
                            [m.astype(float)], use_masks=True)
        assert out["cgF1@0.5"] == pytest.approx(out["IL_MCC"], abs=1e-3)

    def test_all_negative_images(self):
        out = evaluate_cgf1([np.zeros((0, 4))], [np.zeros(0)],
                            [np.zeros((0, 4))])
        assert out["IL_FPR"] == pytest.approx(0.0, abs=1e-4)
        assert out["cgF1"] == pytest.approx(0.0, abs=1e-4)
