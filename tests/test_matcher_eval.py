"""Matcher, detection losses, and AP evaluator tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.tracking.matcher import (
    auction_assign,
    cxcywh_to_xyxy,
    detection_loss,
    dice_loss,
    generalized_iou,
    greedy_assign,
    hungarian_assign_host,
    matching_cost,
    sigmoid_focal_loss,
)
from skix.metrics.detection_eval import average_precision, mean_average_precision

rng = np.random.default_rng(173)


class TestMatching:
    def test_greedy_matches_hungarian_separated(self):
        # well-separated costs → greedy == Hungarian
        cost = np.array([[0.1, 5.0, 5.0],
                         [5.0, 0.2, 5.0],
                         [5.0, 5.0, 0.3],
                         [4.0, 4.0, 4.0]])
        valid = np.ones(3, bool)
        g = np.asarray(greedy_assign(jnp.asarray(cost), jnp.asarray(valid)))
        h = hungarian_assign_host(cost, valid)
        np.testing.assert_array_equal(np.sort(g[g >= 0]), np.sort(h[h >= 0]))
        assert g[0] == 0 and g[1] == 1 and g[2] == 2

    def test_greedy_respects_validity(self):
        cost = np.zeros((2, 3))
        valid = np.array([True, False, False])
        g = np.asarray(greedy_assign(jnp.asarray(cost), jnp.asarray(valid)))
        assert (g >= 0).sum() == 1 and 1 not in g and 2 not in g

    def test_cost_prefers_overlap(self):
        pred = jnp.asarray([[0.5, 0.5, 0.2, 0.2], [0.1, 0.1, 0.2, 0.2]])
        scores = jnp.asarray([0.9, 0.9])
        gt = jnp.asarray([[0.5, 0.5, 0.2, 0.2]])
        c = np.asarray(matching_cost(pred, scores, gt))
        assert c[0, 0] < c[1, 0]

    def test_one_to_many_repeats(self):
        """repeats=k tiles the GT columns (reference matcher.py:15-17):
        each ground truth absorbs up to k distinct queries."""
        # 6 queries, 2 GTs; queries 0-2 close to GT0, 3-5 close to GT1
        cost = np.full((6, 2), 5.0)
        cost[:3, 0] = [0.1, 0.2, 0.3]
        cost[3:, 1] = [0.1, 0.2, 0.3]
        valid = np.ones(2, bool)
        g1 = np.asarray(greedy_assign(jnp.asarray(cost), jnp.asarray(valid)))
        assert (g1 == 0).sum() == 1 and (g1 == 1).sum() == 1
        g3 = np.asarray(greedy_assign(jnp.asarray(cost), jnp.asarray(valid),
                                      repeats=3))
        assert (g3 == 0).sum() == 3 and (g3 == 1).sum() == 3
        np.testing.assert_array_equal(g3[:3], 0)
        np.testing.assert_array_equal(g3[3:], 1)
        # a query is never assigned twice (assignment is a function of q)
        g2 = np.asarray(greedy_assign(jnp.asarray(cost), jnp.asarray(valid),
                                      repeats=2))
        assert (g2 >= 0).sum() == 4

    def test_auction_total_cost_parity_vs_hungarian(self):
        """auction_assign is an exact LAP: optimal total cost matches
        scipy Hungarian on random instances (where greedy need not)."""
        from scipy.optimize import linear_sum_assignment

        lrng = np.random.default_rng(7)
        fn = jax.jit(auction_assign, static_argnames=("repeats",))
        for _ in range(12):
            Q = int(lrng.integers(3, 28))
            G = int(lrng.integers(1, 9))
            nv = int(lrng.integers(1, min(G, Q) + 1))
            valid = np.zeros(G, bool)
            valid[lrng.permutation(G)[:nv]] = True
            cost = lrng.normal(size=(Q, G)).astype(np.float32) * 10
            a = np.asarray(fn(jnp.asarray(cost), jnp.asarray(valid)))
            # feasible: each valid gt exactly once, invalid never
            counts = np.bincount(a[a >= 0], minlength=G)
            np.testing.assert_array_equal(counts, valid.astype(int))
            got = cost[a >= 0, a[a >= 0]].sum()
            sub = cost[:, valid]
            r, c = linear_sum_assignment(sub)
            want = sub[r, c].sum()
            assert abs(got - want) <= 1e-4 * max(abs(want), 1.0), (got, want)

    def test_auction_one_to_many_parity(self):
        """repeats=k auction == Hungarian on k-tiled columns (DAC o2m)."""
        from scipy.optimize import linear_sum_assignment

        lrng = np.random.default_rng(11)
        cost = lrng.normal(size=(24, 5)).astype(np.float32)
        valid = np.ones(5, bool)
        a = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(valid),
                                      repeats=3))
        counts = np.bincount(a[a >= 0], minlength=5)
        np.testing.assert_array_equal(counts, 3)
        got = cost[a >= 0, a[a >= 0]].sum()
        tiled = cost[:, np.repeat(np.arange(5), 3)]
        r, c = linear_sum_assignment(tiled)
        want = tiled[r, c].sum()
        assert abs(got - want) <= 1e-4 * max(abs(want), 1.0)

    def test_auction_edge_cases(self):
        # no valid gt → all -1
        a = np.asarray(auction_assign(jnp.ones((6, 3)), jnp.zeros(3, bool)))
        assert (a == -1).all()
        # infeasible (slots > queries): every query assigned, no hang
        lrng = np.random.default_rng(3)
        cost = lrng.normal(size=(5, 3)).astype(np.float32)
        a = np.asarray(auction_assign(jnp.asarray(cost), jnp.ones(3, bool),
                                      repeats=4))
        assert (a >= 0).all()
        # all-tie costs: still a valid one-to-one assignment
        a = np.asarray(auction_assign(jnp.zeros((4, 2)), jnp.ones(2, bool)))
        counts = np.bincount(a[a >= 0], minlength=2)
        np.testing.assert_array_equal(counts, 1)

    def test_detection_loss_exact_runs(self):
        lrng = np.random.default_rng(5)
        boxes = jnp.asarray(lrng.uniform(0.2, 0.8, (10, 4)).astype(np.float32))
        logits = jnp.asarray(lrng.normal(size=10).astype(np.float32))
        gt = jnp.asarray(lrng.uniform(0.2, 0.8, (3, 4)).astype(np.float32))
        gv = jnp.ones(3, bool)
        out = detection_loss(boxes, logits, gt, gv, exact=True)
        assert np.isfinite(float(out.total))
        # exact matching can only lower-or-equal the matched cost piece;
        # both variants must be finite and close in scale
        out_g = detection_loss(boxes, logits, gt, gv, exact=False)
        assert np.isfinite(float(out_g.total))

    def test_giou_identity_and_disjoint(self):
        a = cxcywh_to_xyxy(jnp.asarray([[0.5, 0.5, 0.2, 0.2]]))
        b = cxcywh_to_xyxy(jnp.asarray([[0.9, 0.9, 0.1, 0.1]]))
        gi = np.asarray(generalized_iou(a, a))
        np.testing.assert_allclose(gi[0, 0], 1.0, atol=1e-5)
        assert float(generalized_iou(a, b)[0, 0]) < 0.0  # disjoint → negative


class TestIABCE:
    """IoU-aware BCE + presence recipe (reference
    train/loss/loss_fns.py IABCEMdetr at the shipped roboflow config)."""

    def _numpy_oracle(self, logits, boxes_xyxy, gt_xyxy, assign,
                      pos_weight=10.0, alpha=0.25, gamma=2.0):
        """Direct transcription of IABCEMdetr.get_loss:348-471
        (pos_focal=False): t = clip(p^a * iou^(1-a), 0.01) on matched,
        BCE(l,t)*matched*pos_weight + BCE(l,0)*(1-matched)*p^gamma,
        mean over queries."""
        p = 1 / (1 + np.exp(-logits))

        def bce(l, t):
            return np.clip(l, 0, None) - l * t + np.log1p(np.exp(-abs(l)))

        matched = assign >= 0
        tgt = gt_xyxy[np.clip(assign, 0, None)]
        lt = np.maximum(boxes_xyxy[:, :2], tgt[:, :2])
        rb = np.minimum(boxes_xyxy[:, 2:], tgt[:, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[:, 0] * wh[:, 1]
        a = (boxes_xyxy[:, 2] - boxes_xyxy[:, 0]) * (
            boxes_xyxy[:, 3] - boxes_xyxy[:, 1])
        b = (tgt[:, 2] - tgt[:, 0]) * (tgt[:, 3] - tgt[:, 1])
        iou = inter / (a + b - inter + 1e-7)
        t = np.clip(p ** alpha * iou ** (1 - alpha), 0.01, None)
        t = np.where(matched, t, 0.0)
        pos = bce(logits, t) * matched * pos_weight
        neg = bce(logits, 0.0) * (~matched) * p ** gamma
        return np.mean(pos + neg)

    def test_iabce_matches_numpy_oracle(self):
        from skix.tracking.matcher import (cxcywh_to_xyxy,
                                           iabce_classification_loss)

        lrng = np.random.default_rng(21)
        logits = lrng.normal(size=16).astype(np.float32)
        boxes = lrng.uniform(0.3, 0.7, (16, 4)).astype(np.float32)
        boxes[:, 2:] = lrng.uniform(0.05, 0.25, (16, 2))
        gt = np.array([[0.4, 0.4, 0.2, 0.2], [0.6, 0.6, 0.1, 0.15]],
                      np.float32)
        assign = np.full(16, -1, np.int32)
        assign[3], assign[11] = 0, 1
        got = float(iabce_classification_loss(
            jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(gt),
            jnp.asarray(assign)))
        want = self._numpy_oracle(
            logits, np.asarray(cxcywh_to_xyxy(jnp.asarray(boxes))),
            np.asarray(cxcywh_to_xyxy(jnp.asarray(gt))), assign)
        assert got == pytest.approx(want, rel=1e-5)

    def test_keep_gates_empty_image(self):
        """use_presence semantics: an image with no visible GT
        contributes zero cls loss (loss_fns.py:404-421)."""
        from skix.tracking.matcher import detection_loss

        lrng = np.random.default_rng(5)
        boxes = jnp.asarray(lrng.uniform(0.2, 0.8, (8, 4)).astype(np.float32))
        logits = jnp.asarray(lrng.normal(size=8).astype(np.float32))
        gt = jnp.zeros((2, 4), jnp.float32)
        out = detection_loss(boxes, logits, gt, jnp.zeros(2, bool),
                             cls="iabce")
        assert float(out.cls) == 0.0
        # focal recipe does NOT gate (negatives still supervised)
        out_f = detection_loss(boxes, logits, gt, jnp.zeros(2, bool),
                               cls="focal")
        assert float(out_f.cls) > 0.0

    def test_presence_loss_direction(self):
        from skix.tracking.matcher import presence_loss

        gt = jnp.asarray([[0.5, 0.5, 0.2, 0.2]])
        gv = jnp.ones(1, bool)
        hi, keep = presence_loss(jnp.asarray(4.0), gt, gv)
        lo, _ = presence_loss(jnp.asarray(-4.0), gt, gv)
        assert float(keep) == 1.0 and float(hi) < float(lo)
        # zero-size boxes are not visible (loss_fns.py:415-419)
        _, keep0 = presence_loss(jnp.asarray(0.0),
                                 jnp.zeros((1, 4)), gv)
        assert float(keep0) == 0.0

    def test_sam3_loss_reference_recipe_grads(self):
        """cls=iabce + presence: loss is finite and gradient reaches
        both the boxes and the presence logit."""
        from skix.tracking.matcher import sam3_detection_loss

        class Out:
            pass

        lrng = np.random.default_rng(3)
        B, Q, G = 2, 10, 3
        boxes = jnp.asarray(lrng.uniform(0.3, 0.7, (B, Q, 4)).astype(np.float32))
        scores = jnp.asarray(lrng.normal(size=(B, Q)).astype(np.float32))
        pres = jnp.asarray(lrng.normal(size=(B,)).astype(np.float32))
        gt = jnp.asarray(lrng.uniform(0.3, 0.7, (B, G, 4)).astype(np.float32))
        gv = jnp.ones((B, G), bool)

        def loss(bx, pr):
            o = Out()
            o.boxes_cxcywh, o.scores, o.presence = bx, scores, pr
            o.aux_boxes, o.aux_scores = (bx,), ()
            o.o2m_boxes = None
            return sam3_detection_loss(o, gt, gv, cls="iabce",
                                       w_class=20.0, w_presence=20.0)

        val, (gb, gp) = jax.value_and_grad(loss, argnums=(0, 1))(
            boxes, pres)
        assert np.isfinite(float(val))
        assert float(jnp.abs(gb).sum()) > 0
        assert float(jnp.abs(gp).sum()) > 0


class TestDet2TrkAssoc:
    """Video-training association loss (reference loss_fns.py:1153)."""

    def _oracle(self, logits, ids_det, ids_trk, num_boxes,
                det_logits=None, use_fp=False, fp_as_new=False,
                exhaustive=None):
        """Transcription of Det2TrkAssoc.get_loss:1168-1226."""
        B, Qd, K = logits.shape
        Qt = K - 2
        labels = np.full((B, Qd), -1, np.int64)
        for b in range(B):
            for q in range(Qd):
                if ids_det[b, q] >= 0:
                    hit = [t for t in range(Qt)
                           if ids_trk[b, t] >= 0
                           and ids_trk[b, t] == ids_det[b, q]]
                    labels[b, q] = hit[0] if hit else Qt
                elif use_fp and det_logits[b, q] > 0:
                    if fp_as_new:
                        labels[b, q] = Qt
                    elif exhaustive is None or exhaustive[b]:
                        labels[b, q] = Qt + 1
        total = 0.0
        for b in range(B):
            if not (ids_trk[b] >= 0).any():
                continue
            for q in range(Qd):
                if labels[b, q] < 0:
                    continue
                z = logits[b, q] - logits[b, q].max()
                total += -(z[labels[b, q]] - np.log(np.exp(z).sum()))
        return total / (B * num_boxes)

    def test_parity_vs_oracle(self):
        from skix.tracking.matcher import det2trk_assoc_loss

        lrng = np.random.default_rng(17)
        B, Qd, Qt = 3, 6, 4
        logits = lrng.normal(size=(B, Qd, Qt + 2)).astype(np.float32)
        ids_det = lrng.integers(-1, 5, (B, Qd)).astype(np.int32)
        ids_trk = lrng.integers(-1, 5, (B, Qt)).astype(np.int32)
        # make track object ids unique per frame (GT invariant)
        for b in range(B):
            seen = set()
            for t in range(Qt):
                if ids_trk[b, t] in seen:
                    ids_trk[b, t] = -1
                seen.add(int(ids_trk[b, t]))
        det_logits = lrng.normal(size=(B, Qd)).astype(np.float32)
        exhaustive = np.array([True, False, True])
        for use_fp, fp_as_new, exh in [(False, False, None),
                                       (True, False, None),
                                       (True, True, None),
                                       (True, False, exhaustive)]:
            got = float(det2trk_assoc_loss(
                jnp.asarray(logits), jnp.asarray(ids_det),
                jnp.asarray(ids_trk), 5.0,
                det_logits=jnp.asarray(det_logits), use_fp_loss=use_fp,
                treat_fp_as_new_obj=fp_as_new,
                is_exhaustive=(jnp.asarray(exh) if exh is not None
                               else None)))
            want = self._oracle(logits, ids_det, ids_trk, 5.0,
                                det_logits, use_fp, fp_as_new, exh)
            assert got == pytest.approx(want, rel=1e-5), (use_fp,
                                                          fp_as_new)

    def test_no_tracks_means_zero(self):
        from skix.tracking.matcher import det2trk_assoc_loss

        logits = jnp.zeros((1, 4, 5))
        loss = det2trk_assoc_loss(logits, jnp.zeros((1, 4), jnp.int32),
                                  jnp.full((1, 3), -1, jnp.int32), 2.0)
        assert float(loss) == 0.0

    def test_bidirectional_parity_vs_oracle(self):
        """TrackingByDetectionAssoc (loss_fns.py:1229-1307): transposed
        CE both ways, last row/col = occluded/new-object classes."""
        from skix.tracking.matcher import tracking_by_detection_assoc_loss

        lrng = np.random.default_rng(23)
        B, Qd, Qt = 2, 5, 3
        logits = lrng.normal(size=(B, Qd + 1, Qt + 1)).astype(np.float32)
        ids_det = np.array([[0, 1, -1, 3, -1], [2, -1, -1, -1, 4]],
                           np.int32)
        ids_trk = np.array([[1, 0, 9], [-1, 4, -1]], np.int32)
        d2t, t2d = tracking_by_detection_assoc_loss(
            jnp.asarray(logits), jnp.asarray(ids_det),
            jnp.asarray(ids_trk), 4.0)

        def ce(z, lab):
            z = z - z.max()
            return -(z[lab] - np.log(np.exp(z).sum()))

        want_d2t = 0.0
        want_t2d = 0.0
        for b in range(B):
            if not (ids_trk[b] >= 0).any():
                continue
            for q in range(Qd):
                if ids_det[b, q] < 0:
                    continue
                hits = [t for t in range(Qt)
                        if ids_trk[b, t] == ids_det[b, q]
                        and ids_trk[b, t] >= 0]
                lab = hits[0] if hits else Qt
                want_d2t += ce(logits[b, q], lab)
            for t in range(Qt):
                if ids_trk[b, t] < 0:
                    continue
                hits = [q for q in range(Qd)
                        if ids_det[b, q] == ids_trk[b, t]
                        and ids_det[b, q] >= 0]
                lab = hits[0] if hits else Qd
                want_t2d += ce(logits[b, :, t], lab)
        want_d2t /= B * 4.0
        want_t2d /= B * 4.0
        assert float(d2t) == pytest.approx(want_d2t, rel=1e-5)
        assert float(t2d) == pytest.approx(want_t2d, rel=1e-5)


class TestPointSampling:
    """PointRend mask-loss sampling (reference mask_sampling.py +
    Masks._sampled_loss)."""

    def test_point_sample_parity_vs_torch_grid_sample(self):
        """Exact semantics check against F.grid_sample
        (align_corners=False, padding_mode='zeros') — the reference's
        point_sample is a thin wrapper over it."""
        import torch
        import torch.nn.functional as F

        from skix.tracking.matcher import point_sample

        lrng = np.random.default_rng(31)
        N, H, W, P = 3, 7, 11, 40
        masks = lrng.normal(size=(N, H, W)).astype(np.float32)
        coords = lrng.uniform(-0.05, 1.05, (N, P, 2)).astype(np.float32)
        got = np.asarray(point_sample(jnp.asarray(masks),
                                      jnp.asarray(coords)))
        # torch point_sample: grid in [-1,1], input (N,1,H,W),
        # grid (N,1,P,2)
        grid = torch.from_numpy(2.0 * coords - 1.0)[:, None]
        want = F.grid_sample(torch.from_numpy(masks)[:, None], grid,
                             align_corners=False,
                             padding_mode="zeros")[:, 0, 0].numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_uncertain_points_concentrate_on_boundary(self):
        from skix.tracking.matcher import (point_sample,
                                           uncertain_point_coords)

        # logits = signed distance from x=0.5 -> boundary at x=0.5
        H = W = 64
        xs = (np.arange(W) + 0.5) / W
        logits = np.tile(((xs - 0.5) * 20).astype(np.float32), (H, 1))
        lg = jnp.asarray(logits)[None]
        coords = uncertain_point_coords(lg, jax.random.PRNGKey(0),
                                        num_points=128,
                                        importance_ratio=0.75)
        at = np.abs(np.asarray(point_sample(lg, coords)))[0]
        # the 96 importance points must hug the boundary (96 best of
        # 384 uniform candidates on a +-10 slope land within |logit|~2)
        assert np.median(at[:96]) < 2.0
        # uniform points would have median |logit| ~5
        assert np.median(at[:96]) < 0.5 * np.median(at[96:])

    def test_sampled_mask_loss_tracks_full_loss(self):
        """With many points the sampled loss ranks mask quality the
        same way as the full-grid loss (good pred << bad pred)."""
        from skix.tracking.matcher import sam3_mask_loss

        class Out:
            pass

        lrng = np.random.default_rng(7)
        B, Q, G, Hm = 1, 4, 2, 32
        gt = np.zeros((B, G, Hm, Hm), np.float32)
        gt[0, 0, 4:16, 4:16] = 1
        gt[0, 1, 18:30, 18:30] = 1
        gt_boxes = jnp.asarray([[[0.3, 0.3, 0.4, 0.4],
                                 [0.75, 0.75, 0.4, 0.4]]], jnp.float32)
        gv = jnp.ones((B, G), bool)
        boxes = jnp.asarray(np.tile(np.asarray(gt_boxes)[0][None, :1],
                                    (1, Q, 1)))
        boxes = jnp.asarray(lrng.uniform(0.2, 0.8, (B, Q, 4)),
                            jnp.float32).at[0, 0].set(gt_boxes[0, 0]).at[
            0, 1].set(gt_boxes[0, 1])
        scores = jnp.full((B, Q), 2.0)

        def make(pred_quality):
            o = Out()
            o.boxes_cxcywh, o.scores = boxes, scores
            ml = np.full((B, Q, Hm, Hm), -8.0, np.float32)
            if pred_quality == "good":
                ml[0, 0] = np.where(gt[0, 0] > 0, 8.0, -8.0)
                ml[0, 1] = np.where(gt[0, 1] > 0, 8.0, -8.0)
            o.mask_logits = jnp.asarray(ml)
            return o

        key = jax.random.PRNGKey(3)
        good_s = float(sam3_mask_loss(make("good"), gt_boxes,
                                      jnp.asarray(gt), gv,
                                      num_sample_points=256, rng=key))
        bad_s = float(sam3_mask_loss(make("bad"), gt_boxes,
                                     jnp.asarray(gt), gv,
                                     num_sample_points=256, rng=key))
        good_f = float(sam3_mask_loss(make("good"), gt_boxes,
                                      jnp.asarray(gt), gv))
        bad_f = float(sam3_mask_loss(make("bad"), gt_boxes,
                                     jnp.asarray(gt), gv))
        assert good_s < bad_s and good_f < bad_f
        assert good_s < 0.2 * bad_s

    def test_sampled_loss_grad_flows_and_requires_rng(self):
        from skix.tracking.matcher import sam3_mask_loss

        class Out:
            pass

        lrng = np.random.default_rng(9)
        B, Q, G, Hm = 1, 3, 1, 16
        gt = jnp.asarray(lrng.integers(0, 2, (B, G, Hm, Hm)),
                         jnp.float32)
        gt_boxes = jnp.asarray(lrng.uniform(0.3, 0.6, (B, G, 4)),
                               jnp.float32)
        gv = jnp.ones((B, G), bool)

        def loss(ml):
            o = Out()
            o.boxes_cxcywh = jnp.asarray(
                lrng.uniform(0.3, 0.6, (B, Q, 4)), jnp.float32)
            o.scores = jnp.zeros((B, Q))
            o.mask_logits = ml
            return sam3_mask_loss(o, gt_boxes, gt, gv,
                                  num_sample_points=64,
                                  rng=jax.random.PRNGKey(0))

        ml = jnp.asarray(lrng.normal(size=(B, Q, Hm, Hm)), jnp.float32)
        g = jax.grad(loss)(ml)
        assert float(jnp.abs(g).sum()) > 0
        with pytest.raises(ValueError, match="rng"):
            o = type("O", (), {})()
            o.boxes_cxcywh = jnp.zeros((B, Q, 4))
            o.scores = jnp.zeros((B, Q))
            o.mask_logits = ml
            sam3_mask_loss(o, gt_boxes, gt, gv, num_sample_points=64)


class TestLosses:
    def test_focal_downweights_easy(self):
        easy = float(sigmoid_focal_loss(jnp.asarray(8.0), jnp.asarray(1.0)))
        hard = float(sigmoid_focal_loss(jnp.asarray(-8.0), jnp.asarray(1.0)))
        assert hard > 100 * easy

    def test_dice_perfect_zero(self):
        m = jnp.full((1, 8, 8), 20.0)  # sigmoid ≈ 1
        t = jnp.ones((1, 8, 8))
        assert float(dice_loss(m, t)[0]) < 0.01

    def test_detection_loss_improves_with_training(self):
        import optax

        Q, G = 6, 2
        gt = jnp.asarray([[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.2, 0.3]])
        gt_valid = jnp.ones(G, bool)
        params = {
            "boxes": jnp.asarray(rng.uniform(0.2, 0.8, (Q, 4)), jnp.float32),
            "logits": jnp.zeros(Q),
        }
        opt = optax.adam(5e-2)
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            def loss_fn(p):
                return detection_loss(jax.nn.sigmoid(p["boxes"] * 4 - 2),
                                      p["logits"], gt, gt_valid).total
            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, state = opt.update(grads, state)
            return optax.apply_updates(params, upd), state, loss

        losses = []
        for _ in range(60):
            params, state, loss = step(params, state)
            losses.append(float(loss))
        assert losses[-1] < 0.5 * losses[0]


class TestAP:
    def test_perfect_detector(self):
        gts = [np.array([[0, 0, 10, 10], [20, 20, 30, 30]])]
        preds = [gts[0].copy()]
        scores = [np.array([0.9, 0.8])]
        assert average_precision(preds, scores, gts, 0.5) > 0.99

    def test_all_misses(self):
        gts = [np.array([[0, 0, 10, 10]])]
        preds = [np.array([[50, 50, 60, 60]])]
        scores = [np.array([0.9])]
        assert average_precision(preds, scores, gts, 0.5) == 0.0

    def test_ranking_matters(self):
        gts = [np.array([[0, 0, 10, 10]])]
        # high-scored FP before the TP lowers AP
        preds = [np.array([[50, 50, 60, 60], [0, 0, 10, 10]])]
        hi_fp = [np.array([0.95, 0.6])]
        lo_fp = [np.array([0.1, 0.6])]
        assert (average_precision(preds, lo_fp, gts, 0.5)
                > average_precision(preds, hi_fp, gts, 0.5))

    def test_map_dict(self):
        gts = [np.array([[0, 0, 10, 10]])]
        preds = [np.array([[1, 1, 10.5, 10.5]])]
        scores = [np.array([0.9])]
        rep = mean_average_precision(preds, scores, gts)
        assert rep["AP50"] > 0.9
        assert 0 <= rep["mAP"] <= 1
