"""ByteTrack fixed-slot tracker (reference: ultralytics bytetrack driving
YOLOv11Pose — prepare_dataset/model/yolov11_pose.py:173,
configs/prepare_dataset.yaml:45-58)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.perception.byte_track import (ByteTrackConfig, ByteTrackState,
                                        _kalman_initiate, _kalman_predict,
                                        _kalman_update, byte_track_step,
                                        estimate_global_motion,
                                        init_byte_track_state,
                                        track_sequence_ids, xyah_to_xyxy,
                                        xyxy_to_xyah)


def _clip(tracks, T, N=4, noise=0.0, seed=0):
    """tracks: list of (t0, t1, x0, y0, vx, vy, w, h, score) → det arrays.
    Detection slot per frame is shuffled deterministically."""
    rng = np.random.default_rng(seed)
    boxes = np.zeros((T, N, 4), np.float32)
    scores = np.zeros((T, N), np.float32)
    valid = np.zeros((T, N), bool)
    truth = np.full((T, N), -1, np.int32)
    for t in range(T):
        slots = rng.permutation(N)
        si = 0
        for k, (t0, t1, x0, y0, vx, vy, w, h, sc) in enumerate(tracks):
            if not (t0 <= t < t1):
                continue
            n = slots[si]; si += 1
            cx = x0 + vx * t + rng.normal() * noise
            cy = y0 + vy * t + rng.normal() * noise
            boxes[t, n] = [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2]
            scores[t, n] = sc
            valid[t, n] = True
            truth[t, n] = k
    return boxes, scores, valid, truth


class TestKalman:
    def test_initiate_predict_keeps_static_box(self):
        z = jnp.asarray([50.0, 40.0, 0.5, 20.0])
        m, P = _kalman_initiate(z)
        m2, P2 = _kalman_predict(m, P)
        np.testing.assert_allclose(np.asarray(m2[:4]), np.asarray(z))
        assert np.all(np.linalg.eigvalsh(np.asarray(P2)) > 0)

    def test_update_pulls_toward_measurement(self):
        m, P = _kalman_initiate(jnp.asarray([50.0, 40.0, 0.5, 20.0]))
        m, P = _kalman_predict(m, P)
        z = jnp.asarray([55.0, 40.0, 0.5, 20.0])
        m2, _ = _kalman_update(m, P, z)
        assert 50.0 < float(m2[0]) <= 55.0

    def test_velocity_learned_from_motion(self):
        m, P = _kalman_initiate(jnp.asarray([0.0, 0.0, 1.0, 10.0]))
        for t in range(1, 6):
            m, P = _kalman_predict(m, P)
            m, P = _kalman_update(
                m, P, jnp.asarray([3.0 * t, 0.0, 1.0, 10.0]))
        assert float(m[4]) > 1.0      # vx learned ≈ 3

    def test_xyah_roundtrip(self):
        b = jnp.asarray([[10.0, 20.0, 30.0, 60.0]])
        np.testing.assert_allclose(np.asarray(xyah_to_xyxy(xyxy_to_xyah(b))),
                                   np.asarray(b), atol=1e-5)


class TestByteTrack:
    def test_stable_ids_two_objects(self):
        boxes, scores, valid, truth = _clip(
            [(0, 10, 20, 20, 1.0, 0.0, 10, 20, 0.9),
             (0, 10, 90, 60, -1.0, 0.0, 12, 24, 0.8)], T=10, noise=0.2)
        ids = np.asarray(track_sequence_ids(boxes, scores, valid))
        for k in range(2):
            got = ids[truth == k]
            assert got[0] >= 0
            assert (got == got[0]).all(), (k, got)
        id0 = ids[truth == 0][0]
        id1 = ids[truth == 1][0]
        assert id0 != id1

    def test_crossing_objects_keep_identity(self):
        """Two objects swap sides; Kalman velocity keeps ids straight
        through the crossing (pure IoU-on-static-boxes would swap)."""
        boxes, scores, valid, truth = _clip(
            [(0, 21, 10, 50, 4.0, 0.0, 10, 16, 0.9),
             (0, 21, 90, 50, -4.0, 0.0, 10, 16, 0.9)], T=21, noise=0.1)
        ids = np.asarray(track_sequence_ids(boxes, scores, valid))
        a = ids[truth == 0]
        b = ids[truth == 1]
        # at the exact coincidence frame (t=10 both boxes identical) NO
        # cost can disambiguate — assert identity through approach and,
        # crucially, that ids come back out straight after the crossing
        clear = np.abs((10 + 4 * np.arange(21)) - (90 - 4 * np.arange(21))
                       ) >= 16
        assert (a[clear] == a[0]).all() and (b[clear] == b[0]).all()
        assert a[0] != b[0]

    def test_occlusion_gap_reassociates(self):
        """A track missing for a few frames (inside track_buffer)
        re-associates with the SAME id when it reappears."""
        boxes, scores, valid, truth = _clip(
            [(0, 6, 50, 50, 2.0, 0.0, 12, 20, 0.9),
             (9, 16, 50, 50, 2.0, 0.0, 12, 20, 0.9)], T=16)
        # the second segment continues the first's trajectory (x=50+2t;
        # the lost track's Kalman keeps predicting with its velocity)
        ids = np.asarray(track_sequence_ids(boxes, scores, valid))
        pre = ids[truth == 0]
        post = ids[truth == 1]
        assert (pre == pre[0]).all()
        assert (post == pre[0]).all(), (pre, post)

    def test_lost_beyond_buffer_gets_new_id(self):
        boxes, scores, valid, truth = _clip(
            [(0, 4, 50, 50, 0.0, 0.0, 12, 20, 0.9),
             (12, 18, 50, 50, 0.0, 0.0, 12, 20, 0.9)], T=18)
        cfg = ByteTrackConfig(track_buffer=5)
        ids = np.asarray(track_sequence_ids(boxes, scores, valid, cfg))
        assert ids[truth == 1][0] != ids[truth == 0][0]

    def test_low_score_detection_keeps_track_alive(self):
        """ByteTrack's signature behavior: a score dip below
        track_high_thresh (but above low) still matches in the second
        association instead of dropping the track."""
        tracks = [(0, 12, 40, 40, 1.0, 0.0, 10, 18, 0.9)]
        boxes, scores, valid, truth = _clip(tracks, T=12)
        dip = (truth == 0) & (np.arange(12)[:, None] % 3 == 2)
        scores[dip] = 0.15            # below high 0.25, above low 0.1
        ids = np.asarray(track_sequence_ids(boxes, scores, valid))
        got = ids[truth == 0]
        assert (got == got[0]).all() and got[0] >= 0

    def test_unconfirmed_track_needs_second_hit_to_emit(self):
        """A detection appearing mid-clip spawns an unconfirmed track
        (no id emitted); it activates — and emits — on its second hit."""
        boxes, scores, valid, truth = _clip(
            [(0, 8, 20, 20, 0.0, 0.0, 10, 16, 0.9),
             (4, 8, 80, 60, 0.0, 0.0, 10, 16, 0.9)], T=8)
        ids = np.asarray(track_sequence_ids(boxes, scores, valid))
        second = ids[truth == 1]
        assert second[0] == -1        # spawn frame: unconfirmed
        assert (second[1:] >= 0).all()
        assert (second[1:] == second[1]).all()

    def test_first_frame_spawns_emit_immediately(self):
        boxes, scores, valid, truth = _clip(
            [(0, 3, 20, 20, 0.0, 0.0, 10, 16, 0.9)], T=3)
        ids = np.asarray(track_sequence_ids(boxes, scores, valid))
        assert (ids[truth == 0] >= 0).all()

    def test_jit_and_scan_clean(self):
        boxes, scores, valid, _ = _clip(
            [(0, 5, 20, 20, 1.0, 0.0, 10, 16, 0.9)], T=5)
        f = jax.jit(lambda b, s, v: track_sequence_ids(b, s, v))
        ids = f(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))
        assert ids.shape == (5, 4) and ids.dtype == jnp.int32

    def test_gmc_affine_recovered_from_flow(self):
        """estimate_global_motion fits the exact affine that generated
        a synthetic flow field (rotation + scale + translation)."""
        H, W = 64, 96
        A = np.array([[1.02, -0.05], [0.05, 1.02]], np.float32)
        b = np.array([3.0, -2.0], np.float32)
        gy, gx = np.mgrid[0:H, 0:W].astype(np.float32)
        P = np.stack([gx, gy], 0)                       # (2, H, W)
        tgt = np.einsum("ij,jhw->ihw", A, P) + b[:, None, None]
        flow = (tgt - P)[None]                          # (1, 2, H, W)
        M = np.asarray(estimate_global_motion(flow, stride=8))[0]
        np.testing.assert_allclose(M[:, :2], A, atol=1e-3)
        np.testing.assert_allclose(M[:, 2], b, atol=0.2)

    def test_botsort_gmc_survives_camera_pan(self):
        """A hard camera pan shifts every box by more than its own width
        per frame: IoU association without motion compensation loses the
        track (new id), while the BoT-SORT configuration (motion warps
        from flow) keeps ONE id — the reference's tracker_type: botsort
        behavior."""
        T, N, W = 8, 4, 400
        pan = 30.0                                  # px/frame, box w=16
        boxes = np.zeros((T, N, 4), np.float32)
        scores = np.zeros((T, N), np.float32)
        valid = np.zeros((T, N), bool)
        for t in range(T):
            cx = 50 + pan * t                       # static in world
            boxes[t, 0] = [cx - 8, 42, cx + 8, 74]
            scores[t, 0] = 0.9
            valid[t, 0] = True
        flow = np.zeros((T - 1, 2, 32, W), np.float32)
        flow[:, 0] = pan                            # uniform x-shift
        motion = estimate_global_motion(flow, stride=8)
        ids_plain = np.asarray(track_sequence_ids(boxes, scores, valid))
        ids_gmc = np.asarray(track_sequence_ids(boxes, scores, valid,
                                                motion=motion))
        assert len(set(ids_plain[:, 0].tolist())) > 1   # track breaks
        assert (ids_gmc[:, 0] == ids_gmc[0, 0]).all()   # GMC holds it
        assert ids_gmc[0, 0] >= 0

    def test_selection_consumes_track_ids(self):
        """End-to-end with person selection: the tracker's ids make
        selection stick to the SAME person across frames even when a
        larger detection appears (priority 1 beats area)."""
        from skix.perception import select_person_sequence

        T, N = 6, 4
        boxes_xyxy, scores, valid, truth = _clip(
            [(0, 6, 30, 40, 0.0, 0.0, 10, 20, 0.9),   # the athlete
             (2, 6, 70, 40, 0.0, 0.0, 30, 60, 0.95)],  # bigger latecomer
            T=T)
        ids = np.asarray(track_sequence_ids(boxes_xyxy, scores, valid))
        # cxcywh for the selection contract
        cxy = np.stack([(boxes_xyxy[..., 0] + boxes_xyxy[..., 2]) / 2,
                        (boxes_xyxy[..., 1] + boxes_xyxy[..., 3]) / 2,
                        boxes_xyxy[..., 2] - boxes_xyxy[..., 0],
                        boxes_xyxy[..., 3] - boxes_xyxy[..., 1]], -1)
        kpts = np.zeros((T, N, 17, 3), np.float32)
        kpts[..., :2] = cxy[:, :, None, :2]
        sel = select_person_sequence(jnp.asarray(cxy), jnp.asarray(kpts),
                                     det_valid=jnp.asarray(valid),
                                     track_ids=jnp.asarray(ids))
        got_x = np.asarray(sel.boxes)[:, 0]
        np.testing.assert_allclose(got_x, 30.0, atol=1.0)


class TestExactMatch:
    def _lapjv_oracle(self, sim, row_ok, col_ok, thresh):
        """lap.lapjv(cost_limit) semantics via scipy on the extended
        matrix: each track may stay unmatched at cost 1-thresh."""
        from scipy.optimize import linear_sum_assignment
        K, N = sim.shape
        big = 2.0
        cost = np.where(col_ok[None, :], 1.0 - sim, big)
        ext = np.full((K, N + K), big)
        ext[:, :N] = cost
        ext[np.arange(K), N + np.arange(K)] = 1.0 - thresh
        ext[~row_ok] = big  # excluded rows: irrelevant columns
        rows = np.where(row_ok)[0]
        ri, ci = linear_sum_assignment(ext[rows])
        assign = np.full(K, -1, np.int64)
        for r, c in zip(rows[ri], ci):
            if c < N:
                assign[r] = c
        total = sum(1.0 - sim[r, assign[r]] if assign[r] >= 0
                    else 1.0 - thresh for r in rows)
        return assign, total

    def test_parity_vs_scipy_extended(self):
        from skix.perception.byte_track import _exact_match
        rng = np.random.default_rng(11)
        for case in range(20):
            K, N = int(rng.integers(2, 7)), int(rng.integers(1, 7))
            sim = rng.random((K, N)).astype(np.float32)
            row_ok = rng.random(K) < 0.8
            col_ok = rng.random(N) < 0.8
            thresh = float(rng.uniform(0.1, 0.5))
            want, want_total = self._lapjv_oracle(sim, row_ok, col_ok,
                                                  thresh)
            got = np.asarray(_exact_match(jnp.asarray(sim), row_ok,
                                          col_ok, thresh))
            assert (got[~row_ok] == -1).all()
            got_total = sum(
                1.0 - sim[r, got[r]] if got[r] >= 0 else 1.0 - thresh
                for r in np.where(row_ok)[0])
            # same optimal total (assignments may differ only at ties)
            np.testing.assert_allclose(got_total, want_total, atol=1e-4)
            # no det matched twice, no gated pair matched
            real = got[got >= 0]
            assert len(set(real.tolist())) == len(real)
            for r in np.where(got >= 0)[0]:
                assert sim[r, got[r]] >= thresh - 1e-5

    def test_step_recovers_crossover_greedy_misses(self):
        """Two tracks, two dets with IoUs ~[[0.5, 0.45], [0.4, 0]]:
        greedy's global-max pick (t0, A) consumes the only above-gate
        option of t1 and strands it; the exact LAP takes the jointly
        cheaper crossover t0<-B, t1<-A (cost 0.55+0.6 < 0.5+0.8-dummy)."""
        t0_box = np.array([0, 0, 10, 10], np.float32)
        t1_box = np.array([8.38, 0, 18.38, 10], np.float32)
        bA = np.array([2.67, 0, 14.67, 10], np.float32)   # IoU: t0 .50, t1 .40
        bB = np.array([-3.79, 0, 6.21, 10], np.float32)   # IoU: t0 .45, t1 0

        def run(exact):
            cfg = ByteTrackConfig(max_tracks=4, fuse_score=False,
                                  exact_match=exact)
            st = init_byte_track_state(cfg)
            z = np.zeros(4, np.float32)
            b0 = np.stack([t0_box, t1_box, z, z])
            s0 = np.array([0.9, 0.9, 0, 0], np.float32)
            v0 = np.array([True, True, False, False])
            st, ids0 = byte_track_step(st, b0, s0, v0, cfg)
            assert np.asarray(ids0)[:2].tolist() == [0, 1]
            b1 = np.stack([bB, bA, z, z])
            st, ids = byte_track_step(st, b1, s0, v0, cfg)
            return np.asarray(ids)

        ids_exact = run(True)
        assert ids_exact[:2].tolist() == [0, 1], ids_exact
        ids_greedy = run(False)
        # greedy: A grabbed by t0, B below t1's gate -> t1 stranded
        # (B spawns an unconfirmed track that does not emit this frame)
        assert ids_greedy[:2].tolist() != [0, 1], ids_greedy

    def test_sequence_jit_clean_with_exact(self):
        boxes, scores, valid, truth = _clip(
            [(0, 8, 20, 20, 1.0, 0.0, 10, 20, 0.9),
             (0, 8, 60, 60, -1.0, 0.0, 12, 24, 0.8)], T=8, noise=0.1)
        cfg = ByteTrackConfig(exact_match=True)
        ids = np.asarray(track_sequence_ids(boxes, scores, valid, cfg))
        for k in range(2):
            got = ids[truth == k]
            assert got[0] >= 0 and (got == got[0]).all()
