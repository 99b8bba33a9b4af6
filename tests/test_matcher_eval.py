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
