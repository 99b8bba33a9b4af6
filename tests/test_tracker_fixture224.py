"""2×-grid committed tracker fixture (VERDICT-r4 #9).

The 112 px fixture's DetA is bounded by its 14×14 tracker feature grid
(test_tracker_fixture.py measured HOTA 0.527 with AssA_alpha 0.94 but
DetA decaying at high α). This companion fixture trains the SAME tiny
architectures on the SAME synthetic-disk distribution at a 224 px world
(28×28 tracker grid, 16×16 detector grid) — one step closer to realistic
scale — and asserts the resolution bound moves: detection AP and HOTA
floors sit ABOVE the 112 px fixture's measured values.

Fixture: ``tests/fixtures/tracker_tiny224.npz``, trained by
``scripts/make_tracker_fixture.py --size 224``. Skipped when absent.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

FIXTURE = Path(__file__).parent / "fixtures" / "tracker_tiny224.npz"
sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))

pytestmark = pytest.mark.skipif(
    not FIXTURE.exists(), reason="224 px fixture not trained/committed")


@pytest.fixture(scope="module")
def world224():
    import make_tracker_fixture as mtf

    mtf.set_world_size(224)
    yield mtf
    mtf.set_world_size(112)


@pytest.fixture(scope="module")
def fixture_models(world224):
    mtf = world224
    from skix.tracking.memory_tracker import MaskMemoryTracker
    from skix.tracking.sam3_detector import Sam3Detector

    det = Sam3Detector.tiny(img_size=224)
    trk = MaskMemoryTracker(features=mtf.TRK_FEATURES,
                            num_heads=mtf.TRK_HEADS,
                            mem_slots=mtf.TRK_SLOTS)
    det_vars, trk_vars = mtf.load_fixture(FIXTURE)
    return det, det_vars, trk, trk_vars


@pytest.fixture(scope="module")
def masklet(fixture_models):
    from skix.tracking.masklet import MaskletConfig, MaskletVideoModel

    det, det_vars, trk, trk_vars = fixture_models
    # same operating point as the 112 px fixture (test_tracker_fixture.py)
    cfg = MaskletConfig(max_objects=4, max_dets=6,
                        score_threshold_detection=0.25,
                        new_det_thresh=0.45,
                        det_nms_thresh=0.6,
                        assoc_iou_thresh=0.2,
                        trk_assoc_iou_thresh=0.2,
                        hotstart_delay=1000,
                        hotstart_unmatch_thresh=4,
                        hotstart_dup_thresh=2)
    mdl = MaskletVideoModel(det, det_vars, trk, trk_vars, cfg)
    return mdl


class TestTrackerFixture224:
    def test_detector_coco_ap_held_out(self, world224, fixture_models):
        from skix.metrics.detection_eval import mean_average_precision

        mtf = world224
        det, det_vars, _, _ = fixture_models
        prompt = mtf._prompt(det)
        fwd = jax.jit(lambda img: det.apply(det_vars, img, prompt[None]))

        def to_xyxy(b):
            b = np.asarray(b)
            return np.stack([b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2,
                             b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2],
                            -1)

        pb, ps, gb = [], [], []
        for s in range(16):
            fr, bx, _mk, vl = mtf.synth_scene(30_000 + s)
            out = fwd(jnp.asarray(fr)[None])
            pb.append(to_xyxy(np.asarray(out.boxes_cxcywh[0])))
            ps.append(np.asarray(out.scores[0]))
            gb.append(to_xyxy(bx[vl]))
        res = mean_average_precision(pb, ps, gb)
        # floors = the 112 px fixture's MEASURED values (AP50 0.835 /
        # mAP 0.595) — the point of the 2x fixture is to clear them
        assert res["AP50"] > 0.835, res
        assert res["mAP"] > 0.595, res

    def test_propagation_miou_held_out(self, world224, fixture_models):
        mtf = world224
        _, _, trk, trk_vars = fixture_models
        miou, identity_acc = mtf.eval_tracker(trk, trk_vars, n=4,
                                              seed0=31_000)
        # 112 px fixture floor was 0.5 — the 28x28 grid must beat it
        assert miou > 0.6, miou
        assert identity_acc > 0.9, identity_acc

    def test_hota_on_held_out_clips(self, world224, masklet):
        from tests.test_tracker_fixture import (_boxes_ids_from_outputs,
                                                _gt_boxes_ids)

        from skix.metrics.tracking_eval import evaluate_hota

        mtf = world224
        mdl = masklet
        prompt = mtf._prompt(mdl.detector)
        pb, pi, gb, gi = [], [], [], []
        for seed in (5000, 5001, 5002):
            frames, _, masks, valid = mtf.synth_clip(seed, T=12, n_obj=2)
            outs = list(mdl.propagate(
                (frames * 255).astype(np.uint8), prompt))
            b, i = _boxes_ids_from_outputs(outs)
            g, gid = _gt_boxes_ids(masks, valid)
            pb += b
            pi += [x + 100 * seed for x in i]
            gb += g
            gi += [x + 100 * seed for x in gid]
        res = evaluate_hota(pb, pi, gb, gi)
        # 112 px fixture measured HOTA 0.527 (DetA grid-bound). The 2x
        # grid must clear it; association must stay near-perfect.
        assert res["HOTA"] > 0.53, res
        assert res["DetA"] > 0.35, res
        assert res["AssA_alpha"][0] > 0.85, res
