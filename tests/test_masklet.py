"""Masklet (mask-level) video propagation tests.

Semantics under test mirror the reference per-frame loop
(sam3/model/sam3_video_base.py): mask-IoU det↔track association,
keep-alive, hotstart unmatch/duplicate removal, occlusion suppression,
spawn bookkeeping — plus the integrated detector+memory-tracker model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skix.tracking.masklet import (MaskletConfig, MaskletVideoModel,
                                   NO_OBJ_LOGIT, init_masklet_state,
                                   masklet_update, track_masklets)

H = W = 24


def sq(y0, x0, h=6, w=6, lo=-8.0, hi=8.0):
    """A filled-square mask-logit map."""
    m = np.full((H, W), lo, np.float32)
    m[y0:y0 + h, x0:x0 + w] = hi
    return m


def empty_trk(K=4):
    return jnp.full((K, H, W), NO_OBJ_LOGIT, jnp.float32)


def dets(*masks, scores=None, n=4):
    dm = np.full((n, H, W), -8.0, np.float32)
    ds = np.zeros(n, np.float32)
    dv = np.zeros(n, bool)
    for i, m in enumerate(masks):
        dm[i] = m
        ds[i] = 0.9 if scores is None else scores[i]
        dv[i] = True
    return jnp.asarray(dm), jnp.asarray(ds), jnp.asarray(dv)


class TestMaskletUpdate:
    def test_first_frame_spawns(self):
        cfg = MaskletConfig(max_objects=4, max_dets=4)
        st = init_masklet_state(cfg)
        dm, ds, dv = dets(sq(2, 2), sq(12, 12), scores=[0.9, 0.7, 0, 0])
        st2, out = masklet_update(st, empty_trk(), dm, ds, dv, cfg)
        assert int(out["spawn"].sum()) == 2
        assert int(st2.active.sum()) == 2
        ids = np.asarray(st2.obj_id)
        assert sorted(ids[np.asarray(st2.active)]) == [0, 1]
        # spawn output masks are the detection masks
        k0 = int(np.argmax(np.asarray(out["spawn"])))
        assert np.array_equal(np.asarray(out["out_mask_logits"][k0] > 0),
                              np.asarray(dm[int(out["spawn_det"][k0])] > 0))
        assert int(st2.next_id) == 2

    def test_low_score_det_does_not_spawn(self):
        cfg = MaskletConfig(max_objects=4, new_det_thresh=0.5)
        st = init_masklet_state(cfg)
        dm, ds, dv = dets(sq(2, 2), scores=[0.3, 0, 0, 0])
        st2, out = masklet_update(st, empty_trk(), dm, ds, dv, cfg)
        assert int(st2.active.sum()) == 0

    def test_matched_track_not_respawned(self):
        cfg = MaskletConfig(max_objects=4)
        st = init_masklet_state(cfg)
        dm, ds, dv = dets(sq(2, 2))
        st, out = masklet_update(st, empty_trk(), dm, ds, dv, cfg)
        # same mask now propagated by the track → det matches, no spawn
        trk = jnp.asarray(np.stack([sq(2, 2) if a else sq(0, 0, 0, 0)
                                    for a in np.asarray(st.active)]))
        st2, out2 = masklet_update(st, trk, dm, ds, dv, cfg)
        assert int(out2["spawn"].sum()) == 0
        assert int(st2.active.sum()) == 1
        assert np.asarray(out2["matched"]).sum() == 1

    def test_keep_alive_clamps(self):
        cfg = MaskletConfig(max_objects=4, max_trk_keep_alive=2,
                            min_trk_keep_alive=-2)
        st = init_masklet_state(cfg)
        dm, ds, dv = dets(sq(2, 2))
        st, _ = masklet_update(st, empty_trk(), dm, ds, dv, cfg)
        k = int(np.argmax(np.asarray(st.active)))
        trk = empty_trk().at[k].set(jnp.asarray(sq(2, 2)))
        for _ in range(4):   # matched 4× → clamp at +2
            st, _ = masklet_update(st, trk, dm, ds, dv, cfg)
        assert int(st.keep_alive[k]) == 2
        nodet = dets(n=4)    # all invalid
        for _ in range(6):   # unmatched 6× → clamp at −2
            st, _ = masklet_update(st, trk, *nodet, cfg)
        assert int(st.keep_alive[k]) == -2
        assert int(st.unmatched_count[k]) == 6
        # no hotstart (delay 0) → never removed
        assert bool(st.active[k])

    def test_hotstart_unmatch_removal(self):
        cfg = MaskletConfig(max_objects=4, hotstart_delay=8,
                            hotstart_unmatch_thresh=2)
        st = init_masklet_state(cfg)
        dm, ds, dv = dets(sq(2, 2))
        st, _ = masklet_update(st, empty_trk(), dm, ds, dv, cfg)
        k = int(np.argmax(np.asarray(st.active)))
        trk = empty_trk().at[k].set(jnp.asarray(sq(2, 2)))
        nodet = dets(n=4)
        st, out = masklet_update(st, trk, *nodet, cfg)   # unmatched #1
        assert bool(st.active[k])
        st, out = masklet_update(st, trk, *nodet, cfg)   # unmatched #2
        assert bool(out["removed"][k])
        assert not bool(st.active[k])

    def test_duplicate_removal_keeps_earlier_track(self):
        cfg = MaskletConfig(max_objects=4, hotstart_delay=8,
                            hotstart_dup_thresh=2)
        st = init_masklet_state(cfg)
        dm, ds, dv = dets(sq(2, 2))
        st, _ = masklet_update(st, empty_trk(), dm, ds, dv, cfg)
        k0 = int(np.argmax(np.asarray(st.active)))
        # frame 1: a second det elsewhere spawns track 1
        dm2, ds2, dv2 = dets(sq(2, 2), sq(14, 14))
        trk = empty_trk().at[k0].set(jnp.asarray(sq(2, 2)))
        st, _ = masklet_update(st, trk, dm2, ds2, dv2, cfg)
        k1 = [k for k in range(4)
              if bool(st.active[k]) and k != k0][0]
        # now both tracks drift onto the SAME detection for 2 frames
        trk_dup = (empty_trk().at[k0].set(jnp.asarray(sq(2, 2)))
                   .at[k1].set(jnp.asarray(sq(3, 3))))
        st, out = masklet_update(st, trk_dup, dm, ds, dv, cfg)
        assert bool(st.active[k1])
        st, out = masklet_update(st, trk_dup, dm, ds, dv, cfg)
        # the later-appearing track is removed, the earlier survives
        assert bool(out["removed"][k1])
        assert not bool(st.active[k1])
        assert bool(st.active[k0])

    def test_mask_iou_separates_what_box_iou_merges(self):
        """VERDICT task 6: two concentric-box objects (an L-frame and its
        inner block) — box IoU ≈ 1 so box duplicate-suppression merges
        them; mask IoU ≈ 0 keeps both alive."""
        outer = np.full((H, W), -8.0, np.float32)
        outer[2:18, 2:18] = 8.0
        outer[3:17, 3:17] = -8.0        # 1-px hollow frame
        inner = sq(3, 3, 14, 14)        # block filling the frame
        # box IoU = 14²/16² ≈ 0.77 (> dup threshold); mask IoU = 0
        cfg = MaskletConfig(max_objects=4, hotstart_delay=8,
                            hotstart_dup_thresh=1)
        st = init_masklet_state(cfg)
        dm, ds, dv = dets(outer, inner)
        st, _ = masklet_update(st, empty_trk(), dm, ds, dv, cfg)
        trk = jnp.stack([jnp.asarray(outer), jnp.asarray(inner),
                         jnp.full((H, W), -8.0), jnp.full((H, W), -8.0)])
        # order tracks by spawn slot
        order = np.argsort(-np.asarray(st.active).astype(int))
        del order
        for _ in range(3):
            st, out = masklet_update(st, trk[:4], dm, ds, dv, cfg)
        assert int(st.active.sum()) == 2   # mask IoU keeps both

        # box-level tracker with the same geometry merges them
        from skix.ops.masks import masks_to_boxes
        from skix.tracking.lifecycle import (TrackerConfig,
                                             init_tracker_state,
                                             tracker_step)
        boxes = masks_to_boxes(jnp.stack([jnp.asarray(outer) > 0,
                                          jnp.asarray(inner) > 0]))
        bcfg = TrackerConfig(max_objects=4, duplicate_iou_threshold=0.7,
                             min_hits_to_confirm=1)
        bst = init_tracker_state(bcfg)
        for _ in range(3):
            bst, bout = tracker_step(
                bst, boxes, jnp.asarray([0.9, 0.9]),
                jnp.asarray([True, True]), bcfg)
        # box duplicate-suppression keeps killing one of the pair (then
        # respawning it as a NEW id): identity churn, next_id grows past 2
        assert int(bst.next_id) > 2
        # whereas the masklet tracker held exactly ids {0, 1}
        assert int(st.next_id) == 2

    def test_occlusion_suppression(self):
        cfg = MaskletConfig(max_objects=4, occlusion_suppress_iou=0.5)
        st = init_masklet_state(cfg)
        dm, ds, dv = dets(sq(2, 2), sq(14, 14))
        st, _ = masklet_update(st, empty_trk(), dm, ds, dv, cfg)
        ka, kb = [k for k in range(4) if bool(st.active[k])]
        # frame 1: track b occluded (empty mask) → last_occluded set
        trk = empty_trk().at[ka].set(jnp.asarray(sq(2, 2)))
        dm1, ds1, dv1 = dets(sq(2, 2))
        st, _ = masklet_update(st, trk, dm1, ds1, dv1, cfg)
        assert int(st.last_occluded[kb]) == 1
        assert int(st.last_occluded[ka]) == -1
        # frame 2: b reappears ON TOP of a → b (recently occluded) loses
        # only when a was also occluded before; make a occluded once first
        trk_b = (empty_trk().at[ka].set(jnp.asarray(sq(2, 2)))
                 .at[kb].set(jnp.asarray(sq(3, 3))))
        # give a an occlusion record older than b's
        st = st._replace(last_occluded=st.last_occluded.at[ka].set(0))
        st, out = masklet_update(st, trk_b, dm1, ds1, dv1, cfg)
        assert bool(out["occ_suppressed"][kb])
        assert not bool(out["occ_suppressed"][ka])
        assert float(out["out_mask_logits"][kb].max()) <= NO_OBJ_LOGIT

    def test_confirmation_status(self):
        cfg = MaskletConfig(max_objects=4, confirmation_consecutive_det=3)
        st = init_masklet_state(cfg)
        dm, ds, dv = dets(sq(2, 2))
        st, out = masklet_update(st, empty_trk(), dm, ds, dv, cfg)
        k = int(np.argmax(np.asarray(st.active)))
        assert not bool(st.confirmed[k])        # spawn = 1 consecutive det
        trk = empty_trk().at[k].set(jnp.asarray(sq(2, 2)))
        st, _ = masklet_update(st, trk, dm, ds, dv, cfg)
        assert not bool(st.confirmed[k])
        st, _ = masklet_update(st, trk, dm, ds, dv, cfg)
        assert bool(st.confirmed[k])            # 3 consecutive → confirmed
        # sticky through an unmatched frame
        st, _ = masklet_update(st, trk, *dets(n=4), cfg)
        assert bool(st.confirmed[k])

    def test_capacity_drops_lowest_scores(self):
        cfg = MaskletConfig(max_objects=2, max_dets=4)
        st = init_masklet_state(cfg)
        dm, ds, dv = dets(sq(0, 0), sq(8, 8), sq(16, 16),
                          scores=[0.6, 0.9, 0.8])
        st, out = masklet_update(st, jnp.full((2, H, W), NO_OBJ_LOGIT),
                                 dm, ds, dv, cfg)
        assert int(st.active.sum()) == 2
        kept = np.asarray(out["spawn_score"])[np.asarray(st.active)]
        assert sorted(np.round(kept, 3)) == [0.8, 0.9]

    def test_reverse_hotstart_window(self):
        """Reverse propagation flips the hotstart window to
        ``first_frame < frame_idx + delay`` (reference
        sam3_video_base.py:1336-1340,1383): walking DOWN from frame 10,
        an object spawned at 10 stays removable while the (decreasing)
        frame index is within ``delay`` below its first frame — and
        becomes immortal once the window expires. The forward
        comparison (`first_frame > frame_idx − delay`) with a
        decreasing counter would never expire."""
        nodet = dets(n=4)
        dm, ds, dv = dets(sq(2, 2))

        # delay=8: removal fires at fidx=8 (10 < 8+8) after 2 unmatched
        cfg = MaskletConfig(max_objects=4, reverse=True, hotstart_delay=8,
                            hotstart_unmatch_thresh=2)
        st = init_masklet_state(cfg, start_frame=10)
        st, _ = masklet_update(st, empty_trk(), dm, ds, dv, cfg)  # f10
        assert int(st.frame_idx) == 9          # counter decrements
        k = int(np.argmax(np.asarray(st.active)))
        assert int(st.first_frame[k]) == 10
        trk = empty_trk().at[k].set(jnp.asarray(sq(2, 2)))
        st, _ = masklet_update(st, trk, *nodet, cfg)              # f9
        assert bool(st.active[k])
        st, out = masklet_update(st, trk, *nodet, cfg)            # f8
        assert bool(out["removed"][k])

        # delay=1: window already expired at fidx=9 (10 < 10 is False)
        cfg = MaskletConfig(max_objects=4, reverse=True, hotstart_delay=1,
                            hotstart_unmatch_thresh=2)
        st = init_masklet_state(cfg, start_frame=10)
        st, _ = masklet_update(st, empty_trk(), dm, ds, dv, cfg)
        k = int(np.argmax(np.asarray(st.active)))
        trk = empty_trk().at[k].set(jnp.asarray(sq(2, 2)))
        for _ in range(4):
            st, out = masklet_update(st, trk, *nodet, cfg)
        assert not bool(out["removed"][k])
        assert bool(st.active[k])

    def test_reverse_duplicate_keeps_first_in_walk(self):
        """Reverse duplicate removal keeps the MAX-first-frame track
        (reference :1414-1419) — the one that appeared first in the
        backward walk. The forward min-key would remove it instead."""
        cfg = MaskletConfig(max_objects=4, reverse=True, hotstart_delay=20,
                            hotstart_dup_thresh=2)
        st = init_masklet_state(cfg, start_frame=10)
        dm, ds, dv = dets(sq(2, 2))
        st, _ = masklet_update(st, empty_trk(), dm, ds, dv, cfg)  # f10: A
        k0 = int(np.argmax(np.asarray(st.active)))
        dm2, ds2, dv2 = dets(sq(2, 2), sq(14, 14))
        trk = empty_trk().at[k0].set(jnp.asarray(sq(2, 2)))
        st, _ = masklet_update(st, trk, dm2, ds2, dv2, cfg)       # f9: B
        k1 = [k for k in range(4) if bool(st.active[k]) and k != k0][0]
        assert int(st.first_frame[k0]) == 10
        assert int(st.first_frame[k1]) == 9
        trk_dup = (empty_trk().at[k0].set(jnp.asarray(sq(2, 2)))
                   .at[k1].set(jnp.asarray(sq(3, 3))))
        st, out = masklet_update(st, trk_dup, dm, ds, dv, cfg)    # f8
        assert bool(st.active[k1])
        st, out = masklet_update(st, trk_dup, dm, ds, dv, cfg)    # f7
        # A (first_frame 10 = max = first-appearer in the walk) survives
        assert bool(out["removed"][k1])
        assert bool(st.active[k0])

    def test_reverse_occlusion_cmp_flips(self):
        """Reverse occlusion suppression uses lt (reference :1046) —
        including the sentinel quirk: a never-occluded slot (−1)
        compares as most-recently-occluded and loses to a previously
        occluded overlapper."""
        cfg = MaskletConfig(max_objects=4, occlusion_suppress_iou=0.5,
                            reverse=True)
        st = init_masklet_state(cfg, start_frame=10)
        dm, ds, dv = dets(sq(2, 2), sq(12, 12))
        st, _ = masklet_update(st, empty_trk(), dm, ds, dv, cfg)   # f10
        ka, kb = np.where(np.asarray(st.active))[0][:2]
        nodet = dets(n=4)
        # f9: B's mask goes empty → last_occluded[B] = 9
        trk = empty_trk().at[ka].set(jnp.asarray(sq(2, 2)))
        st, _ = masklet_update(st, trk, *nodet, cfg)
        assert int(st.last_occluded[kb]) == 9
        assert int(st.last_occluded[ka]) == -1
        # f8: both propagate onto overlapping masks. Under lt, A
        # (−1 sentinel) < B (9) and B was occluded (>−1) → A loses.
        trk2 = (empty_trk().at[ka].set(jnp.asarray(sq(2, 2)))
                .at[kb].set(jnp.asarray(sq(3, 3))))
        st, out = masklet_update(st, trk2, *nodet, cfg)
        assert bool(out["occ_suppressed"][ka])
        assert not bool(out["occ_suppressed"][kb])


class TestTrackMasklets:
    def test_identity_through_occlusion(self):
        """Two objects; one disappears mid-clip (occluded) and reappears
        near its last position — its id survives (keep-alive only decays;
        no hotstart) and no duplicate track spawns at reappearance."""
        cfg = MaskletConfig(max_objects=4, max_dets=4)
        T = 9
        dm = np.full((T, 4, H, W), -8.0, np.float32)
        ds = np.zeros((T, 4), np.float32)
        dv = np.zeros((T, 4), bool)
        for t in range(T):
            dm[t, 0] = sq(2, 2)        # static object A
            ds[t, 0] = 0.9
            dv[t, 0] = True
            if t < 3 or t >= 6:        # B occluded frames 3..5
                dm[t, 1] = sq(14, 14 + min(t, 2))
                ds[t, 1] = 0.8
                dv[t, 1] = True
        outs = jax.jit(lambda a, b, c: track_masklets(a, b, c, cfg))(
            dm, ds, dv)
        ids = np.asarray(outs["obj_id"])        # (T, K)
        act = np.asarray(outs["active"])
        # exactly two ids ever assigned
        assert set(ids[act]) == {0, 1}
        # B's id at t=2 equals B's id at t=8 (identity through occlusion)
        id_b_before = ids[2][act[2] & (ids[2] != ids[0][act[0]][0])]
        b_slot = np.where(act[2] & (ids[2] == 1))[0]
        assert act[8][b_slot].all() and (ids[8][b_slot] == 1).all()
        del id_b_before
        # no third track ever spawns
        assert int(act.sum(1).max()) == 2

    def test_boxes_follow_masks(self):
        cfg = MaskletConfig(max_objects=2, max_dets=2)
        T = 4
        dm = np.full((T, 2, H, W), -8.0, np.float32)
        ds = np.full((T, 2), 0.9, np.float32)
        dv = np.ones((T, 2), bool)
        for t in range(T):
            dm[t, 0] = sq(2, 2 + 2 * t)
            dm[t, 1] = sq(14, 14)
        outs = track_masklets(dm, ds, dv, cfg)
        boxes = np.asarray(outs["boxes"])       # (T, K, 4) xyxy lowres
        act = np.asarray(outs["active"])
        assert act[-1].sum() == 2
        # the moving object's box x moves right over time
        ids = np.asarray(outs["obj_id"])
        mov = np.where(act[0] & (ids[0] == 0))[0][0]
        assert boxes[3, mov, 0] > boxes[0, mov, 0]


class TestFillHoles:
    def test_fill_and_sprinkle(self):
        from skix.ops.masks import fill_holes_in_mask_scores

        m = np.full((H, W), -5.0, np.float32)
        m[4:16, 4:16] = 5.0
        m[8:10, 8:10] = -5.0       # 4-px hole → filled
        m[20:21, 20:21] = 5.0      # 1-px sprinkle → removed
        out = np.asarray(fill_holes_in_mask_scores(jnp.asarray(m), 8))
        assert (out[8:10, 8:10] > 0).all()
        assert (out[20, 20] < 0)
        assert (out[4:8, 4:8] == 5.0).all()    # big structures untouched

    def test_disabled(self):
        from skix.ops.masks import fill_holes_in_mask_scores

        m = jnp.asarray(sq(2, 2))
        assert np.array_equal(np.asarray(fill_holes_in_mask_scores(m, 0)),
                              np.asarray(m))


class TestMaskletVideoModel:
    @pytest.fixture(scope="class")
    def model(self):
        from skix.tracking.detector import embed_text_prompt
        from skix.tracking.memory_tracker import MaskMemoryTracker
        from skix.tracking.sam3_detector import Sam3Detector

        det = Sam3Detector.tiny()
        rng = jax.random.PRNGKey(0)
        prompt = jnp.tile(embed_text_prompt("person", det.d_model)[None],
                          (4, 1))
        # init WITH all-invalid geometry slots (the VideoPredictor
        # convention) so the geometry encoder's params exist for the
        # session geometric-prompt path
        Np, Nb = det.max_points, det.max_boxes
        det_vars = jax.jit(det.init)(
            rng, jnp.zeros((1, 112, 112, 3)), prompt[None],
            points=jnp.zeros((1, Np, 2)),
            point_labels=jnp.zeros((1, Np), jnp.int32),
            point_valid=jnp.zeros((1, Np), bool),
            boxes=jnp.zeros((1, Nb, 4)),
            box_labels=jnp.zeros((1, Nb), jnp.int32),
            box_valid=jnp.zeros((1, Nb), bool))
        trk = MaskMemoryTracker(features=16, num_heads=2, mem_slots=3)
        from skix.tracking.memory_tracker import init_memory

        import functools

        trk_vars = jax.jit(functools.partial(trk.init, method=trk.step))(
            jax.random.PRNGKey(1), jnp.zeros((1, 112, 112, 3)),
            init_memory(3, 14, 14, 16))
        cfg = MaskletConfig(max_objects=4, max_dets=6,
                            score_threshold_detection=0.0,
                            new_det_thresh=0.0)
        return MaskletVideoModel(det, det_vars, trk, trk_vars, cfg), prompt

    def test_propagate_streams_masks(self, model):
        mdl, prompt = model
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, (3, 64, 48, 3), np.uint8)
        outs = list(mdl.propagate(frames, prompt))
        assert [o["frame_index"] for o in outs] == [0, 1, 2]
        o = outs[-1]["outputs"]
        assert o["mask"].shape == (4, 64, 48) and o["mask"].dtype == bool
        assert o["boxes"].shape == (4, 4)
        assert o["obj_id"].shape == (4,)
        assert o["tracker_score"].shape == (4,)
        # with thresholds at 0, something spawns on frame 0
        assert np.asarray(outs[0]["outputs"]["active"]).any()
        # active slots carry live ids
        act = o["active"]
        assert (o["obj_id"][act] >= 0).all()

    def test_fused_step_matches_decomposed(self, model):
        """The one-dispatch hot path (_full_frame_step) must equal the
        prep → detect → core composition it replaced."""
        from skix.tracking.masklet import (_masklet_frame_core,
                                           _prep_frame)
        from skix.utils.jitapply import apply_model

        mdl, prompt = model
        rng = np.random.default_rng(7)
        frame = rng.integers(0, 255, (64, 48, 3), np.uint8)
        state0, banks0 = mdl.init_state((mdl.trk_img_size,) * 2)

        # fused (the step() default)
        s1, b1, o1 = mdl.step(frame, prompt, state0, banks0)

        # decomposed oracle
        det_in, tin = _prep_frame(jnp.asarray(frame), True,
                                  mdl.detector.img_size, mdl.trk_img_size)
        det = apply_model(mdl.detector, None, mdl.det_variables, det_in,
                          prompt[None])
        s2, b2, o2 = _masklet_frame_core(
            mdl.tracker, mdl.cfg, mdl.fill_holes, mdl.trk_variables, tin,
            det.boxes_cxcywh[0], det.scores[0], det.mask_logits[0],
            state0, banks0)

        for a, b in zip(jax.tree.leaves((s1, b1)), jax.tree.leaves((s2, b2))):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       atol=1e-5)
        np.testing.assert_allclose(np.asarray(o1["out_mask_logits"]),
                                   np.asarray(o2["out_mask_logits"]),
                                   atol=1e-5)

    def test_session_masklet_path(self, model):
        """VideoPredictor(tracker=...) streams per-object masks — the
        reference predictor protocol with masklet outputs."""
        from skix.tracking.session import VideoPredictor

        mdl, prompt = model
        pred = VideoPredictor(mdl.detector, mdl.det_variables,
                              tracker=(mdl.tracker, mdl.trk_variables),
                              masklet_cfg=mdl.cfg, smoke_prompts=True)
        rng = np.random.default_rng(2)
        frames = rng.integers(0, 255, (2, 40, 56, 3), np.uint8)
        sid = pred.start_session(frames)
        pred.add_prompt(sid, "person")
        outs = list(pred.propagate_in_video(sid, "person"))
        assert len(outs) == 2
        o = outs[-1]["outputs"]
        assert o["mask"].shape == (4, 40, 56)
        assert o["bbox"].shape == (4, 4)
        assert "tracker_score" in o and "confirmed" in o
        # remove_object hides the id from the stream
        live = o["obj_id"][o["active"]]
        if len(live):
            pred.remove_object(sid, int(live[0]))
            outs2 = list(pred.propagate_in_video(sid, "person"))
            o2 = outs2[0]["outputs"]
            assert int(live[0]) not in set(o2["obj_id"][o2["active"]])
        pred.close_session(sid)

    def test_session_masklet_geometry_prompt(self, model):
        """Geometric prompts flow through the masklet path too: the
        session adapter hands ``geometry_by_frame`` to
        MaskletVideoModel.propagate, which routes prompted frames onto
        the decomposed step (regression for the adapter refactor — the
        session used to run its own per-frame loop)."""
        from skix.tracking.session import VideoPredictor

        mdl, prompt = model
        pred = VideoPredictor(mdl.detector, mdl.det_variables,
                              tracker=(mdl.tracker, mdl.trk_variables),
                              masklet_cfg=mdl.cfg, smoke_prompts=True)
        rng = np.random.default_rng(5)
        frames = rng.integers(0, 255, (2, 40, 56, 3), np.uint8)

        sid = pred.start_session(frames)
        pred.add_prompt(sid, "person")
        base = [o["outputs"] for o in pred.propagate_in_video(sid, "person")]

        sid2 = pred.start_session(frames)
        pred.add_prompt(sid2, "person", frame_idx=0,
                        points=[[20.0, 20.0]], point_labels=[1],
                        boxes_xyxy=[[5.0, 5.0, 35.0, 35.0]])
        geo = [o["outputs"] for o in pred.propagate_in_video(sid2, "person")]
        assert len(geo) == 2
        assert geo[0]["mask"].shape == (4, 40, 56)
        # geometry conditions the prompted frame's detections → the
        # spawned-slot scores differ from the no-geometry run
        assert not np.allclose(base[0]["score"], geo[0]["score"])

    def test_propagate_clip_matches_streaming(self, model):
        """The chunk-scanned path (lax.scan over the fused frame step,
        padded+masked tail) must produce EXACTLY the streaming loop's
        outputs — including the final partial chunk whose padded steps
        must not advance state."""
        mdl, prompt = model
        rng = np.random.default_rng(11)
        frames = rng.integers(0, 255, (5, 40, 56, 3)).astype(np.uint8)
        ref = [o["outputs"] for o in mdl.propagate(frames, prompt)]
        got = [o["outputs"] for o in mdl.propagate_clip(frames, prompt,
                                                        chunk=2)]
        assert len(got) == len(ref) == 5
        for r, g in zip(ref, got):
            for k in ("obj_id", "active", "confirmed"):
                np.testing.assert_array_equal(g[k], r[k], err_msg=k)
            for k in ("score", "tracker_score", "boxes",
                      "mask_logits_lowres"):
                np.testing.assert_allclose(g[k], r[k], atol=1e-5,
                                           err_msg=k)
            np.testing.assert_array_equal(g["mask"], r["mask"])

    def test_skip_lowres_logits_changes_nothing_else(self, model):
        """include_lowres_logits=False (the session path) must drop ONLY
        the logits key — masks/boxes/ids identical on both paths."""
        mdl, prompt = model
        rng = np.random.default_rng(12)
        frames = rng.integers(0, 255, (3, 40, 56, 3)).astype(np.uint8)
        full = [o["outputs"] for o in mdl.propagate_clip(frames, prompt,
                                                         chunk=2)]
        slim = [o["outputs"] for o in mdl.propagate_clip(
            frames, prompt, chunk=2, include_lowres_logits=False)]
        slim_s = [o["outputs"] for o in mdl.propagate(
            frames, prompt, include_lowres_logits=False)]
        for f, g, h in zip(full, slim, slim_s):
            assert "mask_logits_lowres" in f
            assert "mask_logits_lowres" not in g
            assert "mask_logits_lowres" not in h
            for k in g:
                np.testing.assert_array_equal(g[k], f[k], err_msg=k)
                np.testing.assert_array_equal(h[k], f[k], err_msg=k)

    def test_packed_mask_download_is_exact(self):
        """The packed-bit mask transfer (device packbits → host
        unpackbits) must reproduce the plain upsample+threshold masks
        bit-for-bit, including non-multiple-of-8 pixel counts."""
        from skix.tracking.masklet import (_unpack_masks, _upsample_masks,
                                           _upsample_pack_masks)

        rng = np.random.default_rng(21)
        for shape, hw in [((4, 8, 8), (23, 31)),     # H*W % 8 != 0
                          ((3, 6, 6), (40, 56)),
                          ((2, 4, 8, 8), (17, 19))]:  # batched (C, K, ...)
            logits = jnp.asarray(rng.normal(0, 4, shape), jnp.float32)
            packed = _upsample_pack_masks(logits, *hw)
            got = _unpack_masks(packed, *hw)
            if len(shape) == 3:
                ref = np.asarray(_upsample_masks(logits, *hw))
            else:
                ref = np.stack([np.asarray(_upsample_masks(l, *hw))
                                for l in logits])
            np.testing.assert_array_equal(got, ref)

    def test_session_masklet_directioned(self, model):
        """Directioned propagation maps through the masklet path too:
        a mid-clip start yields forward then backward segments with
        GLOBAL frame indices, each restarting tracking."""
        from skix.tracking.session import VideoPredictor

        mdl, prompt = model
        pred = VideoPredictor(mdl.detector, mdl.det_variables,
                              tracker=(mdl.tracker, mdl.trk_variables),
                              masklet_cfg=mdl.cfg, scan_chunk=2,
                              smoke_prompts=True)
        rng = np.random.default_rng(13)
        frames = rng.integers(0, 255, (4, 40, 56, 3), np.uint8)
        sid = pred.start_session(frames)
        pred.add_prompt(sid, "person")
        outs = list(pred.propagate_in_video(
            sid, "person", start_frame_idx=2,
            propagation_direction="both"))
        assert [o["frame_index"] for o in outs] == [2, 3, 2, 1, 0]
        for o in outs:
            assert o["outputs"]["mask"].shape == (4, 40, 56)
        # the backward pass re-detects frame 2 from scratch — same
        # frame, same detector → identical spawn scores
        np.testing.assert_allclose(outs[0]["outputs"]["score"],
                                   outs[2]["outputs"]["score"], atol=1e-5)

    def test_memory_banks_written(self, model):
        mdl, prompt = model
        rng = np.random.default_rng(1)
        frames = rng.integers(0, 255, (2, 56, 56, 3), np.uint8)
        state, banks = mdl.init_state((112, 112))
        s1, b1, o1 = mdl.step(frames[0], prompt, state, banks)
        spawned = np.asarray(o1["spawn"])
        if spawned.any():
            k = int(np.argmax(spawned))
            assert bool(b1.valid[k, 0])          # conditioning slot pinned
            assert not np.asarray(b1.valid)[~spawned][:, 1:].any()
        s2, b2, o2 = mdl.step(frames[1], prompt, s1, b1)
        # survivors write the recent ring
        surv = np.asarray(o2["active"] & ~o2["spawn"]) & spawned
        if surv.any():
            k = int(np.argmax(surv))
            assert np.asarray(b2.valid)[k, 1:].any()
