"""SAM2-style interactive VOS predictor (reference
sam3_tracking_predictor.py): prompt protocol semantics on tiny random
models, and real tracking behavior with the committed fixture tracker."""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.tracking.memory_tracker import MaskMemoryTracker
from skix.tracking.vos_predictor import InteractiveVideoPredictor

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))

FIXTURE = Path(__file__).parent / "fixtures" / "tracker_tiny.npz"


def _tiny_tracker(features=16):
    import functools

    from skix.tracking.memory_tracker import init_memory

    trk = MaskMemoryTracker(features=features, num_heads=2, mem_slots=3)
    v = jax.jit(functools.partial(trk.init, method=trk.step))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        init_memory(3, 8, 8, features))
    return trk, v


def _tiny_segmenter():
    from skix.tracking.sam_prompt_encoder import InteractiveSegmenter

    seg = InteractiveSegmenter(features=16, img_size=64, num_heads=2)

    # init through the mask_in path too, so the prompt encoder's mask
    # downscaler params exist for correction clicks
    def _full(mdl, im, p, l, m):
        feats = mdl.encode_image(im)
        return mdl.predict_from_embedding(feats, p, l, None, m)

    v = seg.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)),
                 jnp.zeros((1, 4, 2)), jnp.full((1, 4), -1, jnp.int32),
                 jnp.zeros((1, 32, 32, 1)), method=_full)
    return seg, v


def _frames(T=5, hw=64, seed=0):
    return (np.random.default_rng(seed).random((T, hw, hw, 3))
            .astype(np.float32))


class TestProtocol:
    @pytest.fixture(scope="class")
    def pred(self):
        trk, tv = _tiny_tracker()
        seg, sv = _tiny_segmenter()
        return InteractiveVideoPredictor(trk, tv, seg, sv,
                                         max_cond_frames=2, num_recent=2)

    def test_add_new_mask_and_propagate(self, pred):
        st = pred.init_state(_frames())
        m = np.zeros((64, 64), bool)
        m[10:30, 10:30] = True
        grid = pred.add_new_mask(st, 1, obj_id=5, mask=m)
        assert grid.shape == st["grid_hw"]
        outs = list(pred.propagate_in_video(st))
        assert [o["frame_index"] for o in outs] == [1, 2, 3, 4]
        assert outs[0]["obj_ids"] == [5]
        assert outs[0]["masks"].shape == (1, 64, 64)
        # the conditioning frame reports the prompt itself
        assert outs[0]["masks"][0, 15, 15]
        assert not outs[0]["masks"][0, 50, 50]

    def test_reverse_and_window(self, pred):
        st = pred.init_state(_frames())
        m = np.zeros((64, 64), bool)
        m[5:20, 5:20] = True
        pred.add_new_mask(st, 3, obj_id=0, mask=m)
        outs = list(pred.propagate_in_video(st, reverse=True))
        assert [o["frame_index"] for o in outs] == [3, 2, 1, 0]
        outs = list(pred.propagate_in_video(st, start_frame_idx=1,
                                            max_frame_num_to_track=2))
        assert [o["frame_index"] for o in outs] == [1, 2, 3]

    def test_no_prompt_raises(self, pred):
        st = pred.init_state(_frames())
        with pytest.raises(RuntimeError):
            list(pred.propagate_in_video(st))

    def test_box_becomes_corner_points(self, pred):
        st = pred.init_state(_frames())
        pred.add_new_points_or_box(st, 0, obj_id=1,
                                   box=[8.0, 8.0, 40.0, 40.0])
        pts, lab = st["objects"][1]["points"][0]
        assert lab[:2].tolist() == [2, 3]          # SAM corner labels
        np.testing.assert_allclose(pts[0], [8, 8])
        np.testing.assert_allclose(pts[1], [40, 40])
        # correction click accumulates AFTER the box
        pred.add_new_points_or_box(st, 0, obj_id=1, points=[[20.0, 20.0]],
                                   labels=[1], clear_old_points=False)
        pts, lab = st["objects"][1]["points"][0]
        assert lab.tolist() == [2, 3, 1]

    def test_box_requires_clearing_points(self, pred):
        st = pred.init_state(_frames())
        with pytest.raises(ValueError, match="clearing old points"):
            pred.add_new_points_or_box(st, 0, obj_id=1,
                                       box=[1.0, 1.0, 9.0, 9.0],
                                       clear_old_points=False)
        with pytest.raises(ValueError, match="together"):
            pred.add_new_points_or_box(st, 0, obj_id=1,
                                       points=[[1.0, 1.0]])
        with pytest.raises(ValueError, match="at least one"):
            pred.add_new_points_or_box(st, 0, obj_id=1)

    def test_rel_coordinates(self, pred):
        st = pred.init_state(_frames())
        pred.add_new_points_or_box(st, 0, obj_id=2,
                                   points=[[0.5, 0.25]], labels=[1],
                                   rel_coordinates=True)
        pts, _ = st["objects"][2]["points"][0]
        np.testing.assert_allclose(pts[0], [32, 16])

    def test_points_without_segmenter_raise(self):
        trk, tv = _tiny_tracker()
        pred = InteractiveVideoPredictor(trk, tv)
        st = pred.init_state(_frames())
        with pytest.raises(RuntimeError, match="InteractiveSegmenter"):
            pred.add_new_points_or_box(st, 0, 1, points=[[1.0, 1.0]],
                                       labels=[1])

    def test_clear_and_remove(self, pred):
        st = pred.init_state(_frames())
        m = np.zeros((64, 64), bool)
        m[8:24, 8:24] = True
        pred.add_new_mask(st, 0, obj_id=1, mask=m)
        pred.add_new_points_or_box(st, 2, obj_id=1,
                                   points=[[16.0, 16.0]], labels=[1])
        assert set(st["objects"][1]["cond"]) == {0, 2}
        pred.clear_all_points_in_frame(st, 2, 1)
        assert set(st["objects"][1]["cond"]) == {0}
        pred.clear_all_points_in_video(st)
        assert set(st["objects"][1]["cond"]) == {0}  # mask prompt stays
        pred.remove_object(st, 1)
        assert 1 not in st["objects"]
        with pytest.raises(KeyError):
            pred.remove_object(st, 1, strict=True)
        pred.remove_object(st, 1)  # non-strict is a no-op

    def test_closest_cond_frames_selected(self, pred):
        st = pred.init_state(_frames(T=9))
        m = np.zeros((64, 64), bool)
        m[8:24, 8:24] = True
        for t in (0, 4, 8):
            pred.add_new_mask(st, t, obj_id=3, mask=m)
        outs = list(pred.propagate_in_video(st, start_frame_idx=5,
                                            max_frame_num_to_track=1))
        assert len(outs) == 2
        # frame 5: closest before = 4, closest at-or-after = 8
        assert sorted(st["last_cond_selected"]) == [4, 8]


@pytest.mark.skipif(not FIXTURE.exists(), reason="fixture not built")
class TestCommittedTrackerBehavior:
    @pytest.fixture(scope="class")
    def setup(self):
        import make_tracker_fixture as mtf

        trk = MaskMemoryTracker(features=mtf.TRK_FEATURES,
                                num_heads=mtf.TRK_HEADS,
                                mem_slots=mtf.TRK_SLOTS)
        _, trk_vars = mtf.load_fixture(FIXTURE)
        pred = InteractiveVideoPredictor(trk, trk_vars,
                                         max_cond_frames=2, num_recent=2)
        return pred, mtf

    def _grid_iou(self, logits, gt_mask, gh, gw):
        ys = ((np.arange(gh) + 0.5) * gt_mask.shape[0] / gh).astype(int)
        xs = ((np.arange(gw) + 0.5) * gt_mask.shape[1] / gw).astype(int)
        gt = gt_mask[ys[:, None], xs[None, :]]
        pm = logits > 0
        return (pm & gt).sum() / max((pm | gt).sum(), 1)

    def test_mask_prompt_tracks_object(self, setup):
        pred, mtf = setup
        frames, _, masks, _ = mtf.synth_clip(901, T=8, n_obj=2,
                                             min_sep=1.5)
        st = pred.init_state(frames)
        pred.add_new_mask(st, 0, obj_id=0, mask=masks[0, 0])
        pred.add_new_mask(st, 0, obj_id=1, mask=masks[0, 1])
        gh, gw = st["grid_hw"]
        ious = {0: [], 1: []}
        for o in pred.propagate_in_video(st):
            for k, obj_id in enumerate(o["obj_ids"]):
                t = o["frame_index"]
                ious[obj_id].append(
                    (self._grid_iou(o["logits"][k], masks[t, obj_id],
                                    gh, gw),
                     self._grid_iou(o["logits"][k],
                                    masks[t, 1 - obj_id], gh, gw)))
        for obj_id in (0, 1):
            own = np.asarray([a for a, _ in ious[obj_id]])
            other = np.asarray([b for _, b in ious[obj_id]])
            assert own.mean() > 0.5, (obj_id, own)
            assert (own > other).mean() > 0.85, (obj_id, own, other)

    def test_reverse_propagation_tracks(self, setup):
        pred, mtf = setup
        frames, _, masks, _ = mtf.synth_clip(902, T=6, n_obj=2,
                                             min_sep=1.5)
        st = pred.init_state(frames)
        pred.add_new_mask(st, 5, obj_id=0, mask=masks[5, 0])
        gh, gw = st["grid_hw"]
        ious = []
        for o in pred.propagate_in_video(st, reverse=True):
            t = o["frame_index"]
            ious.append(self._grid_iou(o["logits"][0], masks[t, 0],
                                       gh, gw))
        assert [o for o in ious] and np.mean(ious) > 0.5, ious

    def test_correction_switches_object(self, setup):
        """Prompt the WRONG object, then correct with a new conditioning
        mask mid-clip — frames after the correction follow the corrected
        object (the reference's interactive-refinement workflow)."""
        pred, mtf = setup
        frames, _, masks, _ = mtf.synth_clip(903, T=8, n_obj=2,
                                             min_sep=1.8)
        st = pred.init_state(frames)
        pred.add_new_mask(st, 0, obj_id=7, mask=masks[0, 1])  # wrong: g1
        # user notices, clears the bad prompt and reconditions — the
        # tiny fixture net was never trained on CONFLICTING conditioning
        # memories, so the honest correction clears first
        pred.clear_all_points_in_frame(st, 0, 7)
        pred.add_new_mask(st, 3, obj_id=7, mask=masks[3, 0])  # correct: g0
        gh, gw = st["grid_hw"]
        post = []
        for o in pred.propagate_in_video(st, start_frame_idx=3):
            t = o["frame_index"]
            post.append((self._grid_iou(o["logits"][0], masks[t, 0],
                                        gh, gw),
                         self._grid_iou(o["logits"][0], masks[t, 1],
                                        gh, gw)))
        own = np.asarray([a for a, _ in post])
        other = np.asarray([b for _, b in post])
        assert own.mean() > 0.5 and (own > other).all(), post
