"""Keypoint R-CNN (D2-slot 2D source): RoIAlign math, converter seam,
fixed-shape two-stage forward, keypoint-head training (VERDICT r2 #4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.models.keypoint_rcnn import (
    KeypointRCNN, apply_deltas, box_head_loss,
    convert_detectron2_keypoint_rcnn, decode_keypoint_heatmaps,
    keypoint_head_loss, level_anchors, multilevel_roi_align,
    reference_state_dict_spec, roi_align)


def _converted_variables(seed=0, scale=0.03):
    """Fast variables via the converter (no giant init compile)."""
    rng = np.random.default_rng(seed)
    spec = reference_state_dict_spec()
    sd = {k: rng.normal(size=s).astype(np.float32) * scale
          for k, s in spec.items()}
    for k in sd:
        if k.endswith("running_var"):
            sd[k] = np.abs(sd[k]) + 1.0
        if k.endswith("running_mean"):
            sd[k] = sd[k] * 0.0
    return convert_detectron2_keypoint_rcnn(sd), sd


class TestRoiAlign:
    def test_linear_ramp_exact(self):
        H = W = 32
        yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        feat = jnp.asarray(np.stack([xx, yy], -1).astype(np.float32))
        crop = roi_align(feat, jnp.asarray([[4.0, 8.0, 20.0, 24.0]]), 4,
                         stride=1)
        exp_x = 4 + (np.arange(4) + 0.5) * 4 - 0.5
        exp_y = 8 + (np.arange(4) + 0.5) * 4 - 0.5
        np.testing.assert_allclose(np.asarray(crop[0, 0, :, 0]), exp_x,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(crop[0, :, 0, 1]), exp_y,
                                   atol=1e-4)

    def test_stride_scaling(self):
        rng = np.random.default_rng(3)
        feat = jnp.asarray(rng.random((16, 16, 3)), jnp.float32)
        a = roi_align(feat, jnp.asarray([[8.0, 8.0, 40.0, 40.0]]), 7,
                      stride=4)
        b = roi_align(feat, jnp.asarray([[2.0, 2.0, 10.0, 10.0]]), 7,
                      stride=1)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_multilevel_blend_selects_by_area(self):
        feats = [jnp.full((64 // s, 64 // s, 1), float(i))
                 for i, s in enumerate((4, 8, 16, 32))]
        # tiny box → level P2 (value 0); huge box → P5 (value 3)
        small = multilevel_roi_align(feats, jnp.asarray([[1., 1., 9., 9.]]),
                                     2)
        np.testing.assert_allclose(np.asarray(small), 0.0, atol=1e-5)
        big = multilevel_roi_align(
            feats, jnp.asarray([[0., 0., 600., 600.]]), 2)
        np.testing.assert_allclose(np.asarray(big), 3.0, atol=1e-5)


class TestGeometry:
    def test_apply_deltas_identity_and_shift(self):
        anchors = jnp.asarray([[10., 10., 30., 50.]])
        out = apply_deltas(anchors, jnp.zeros((1, 4)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(anchors),
                                   atol=1e-5)
        out = apply_deltas(anchors, jnp.asarray([[0.5, 0., 0., 0.]]))
        np.testing.assert_allclose(np.asarray(out[0, 0]), 20.0, atol=1e-4)

    def test_level_anchors_d2_offset_zero(self):
        # detectron2 DefaultAnchorGenerator offset=0.0: centers at
        # x*stride, NOT cell-centered — converted RPN deltas were
        # regressed against these anchors
        a = level_anchors(2, 2, stride=8, size=32, ratios=(1.0,))
        c = (a[:, :2] + a[:, 2:]) / 2
        np.testing.assert_allclose(c[0], [0.0, 0.0])
        np.testing.assert_allclose(c[-1], [8.0, 8.0])
        np.testing.assert_allclose(a[0, 2] - a[0, 0], 32.0)

    def test_heatmap_decode_maps_bin_to_box(self):
        heat = np.full((1, 56, 56, 17), -10.0, np.float32)
        heat[0, 14, 42, :] = 10.0          # row 14, col 42
        boxes = jnp.asarray([[100., 200., 156., 312.]])   # w=56 h=112
        kp = np.asarray(decode_keypoint_heatmaps(jnp.asarray(heat), boxes))
        np.testing.assert_allclose(kp[0, 0, 0], 100 + (42 + .5), atol=1e-3)
        np.testing.assert_allclose(kp[0, 0, 1], 200 + (14 + .5) * 2,
                                   atol=1e-3)
        assert kp[0, 0, 2] > 0.9


class TestConverter:
    def test_tree_match_and_value_mapping(self):
        cv, sd = _converted_variables()
        m = KeypointRCNN(pre_nms_topk=32, post_nms_topk=8, detections=4)
        # structural check against a torch-shaped spec without the giant
        # init: the forward must accept the converted tree
        out = jax.jit(m.apply)(cv, jnp.zeros((1, 64, 64, 3)))
        assert out.boxes_xyxy.shape == (1, 4, 4)
        assert out.keypoints.shape == (1, 4, 17, 3)
        assert np.isfinite(np.asarray(out.keypoints)).all()
        np.testing.assert_allclose(
            np.asarray(cv["params"]["backbone"]["stem_conv1"]["kernel"]),
            sd["backbone.bottom_up.stem.conv1.weight"].transpose(2, 3, 1, 0))
        # deconv kernel spatially flipped (lax.conv_transpose mirrors)
        np.testing.assert_allclose(
            np.asarray(cv["params"]["kpt_head"]["score_lowres"]["kernel"]),
            sd["roi_heads.keypoint_head.score_lowres.weight"]
            .transpose(2, 3, 0, 1)[::-1, ::-1])

    def test_structure_matches_init(self):
        """Converted tree == module init tree (run once; R50 init is the
        slow part, so one shared check covers every submodule)."""
        cv, _ = _converted_variables()
        m = KeypointRCNN()
        v = jax.eval_shape(
            lambda: m.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3))))
        pi = {jax.tree_util.keystr(p): x.shape
              for p, x in jax.tree_util.tree_leaves_with_path(v)}
        pc = {jax.tree_util.keystr(p): x.shape
              for p, x in jax.tree_util.tree_leaves_with_path(cv)}
        assert pi == pc

    def test_missing_key_raises(self):
        rng = np.random.default_rng(5)
        spec = reference_state_dict_spec()
        sd = {k: rng.normal(size=s).astype(np.float32)
              for k, s in spec.items()}
        del sd["roi_heads.keypoint_head.conv_fcn4.weight"]
        with pytest.raises(KeyError):
            convert_detectron2_keypoint_rcnn(sd)


@pytest.mark.slow
class TestTraining:
    def test_keypoint_head_overfits_gt_proposals(self):
        """detectron2 training regime: keypoint head trained on GT boxes
        — loss ↓ and decoded keypoints land within 2 heatmap bins."""
        import optax

        cv, _ = _converted_variables(seed=7)
        m = KeypointRCNN()
        rng = np.random.default_rng(11)
        img = jnp.asarray(rng.random((1, 128, 128, 3)), jnp.float32)
        feats, _ = jax.jit(
            lambda v, x: m.apply(v, x, method=m.backbone_forward))(cv, img)
        feats = jax.tree.map(jax.lax.stop_gradient, feats)
        boxes = jnp.asarray([[[20., 16., 84., 112.]]])
        kx = rng.uniform(24, 80, 17).astype(np.float32)
        ky = rng.uniform(20, 108, 17).astype(np.float32)
        gt = jnp.asarray(np.stack([kx, ky, np.ones(17)], -1)[None, None])
        valid = jnp.ones((1, 1), bool)

        kpt_params = cv["params"]["kpt_head"]
        tx = optax.adam(1e-3)
        opt = tx.init(kpt_params)

        def loss_fn(kp):
            full = {"params": {**cv["params"], "kpt_head": kp}}
            _, _, heat = m.apply(full, feats, boxes,
                                 method=m.heads_on_boxes)
            return keypoint_head_loss(heat, boxes, gt, valid)

        @jax.jit
        def step(kp, o):
            l, g = jax.value_and_grad(loss_fn)(kp)
            up, o2 = tx.update(g, o)
            return optax.apply_updates(kp, up), o2, l

        l0 = None
        for i in range(120):
            kpt_params, opt, loss = step(kpt_params, opt)
            if l0 is None:
                l0 = float(loss)
        assert float(loss) < 0.3 * l0

        full = {"params": {**cv["params"], "kpt_head": kpt_params}}
        _, _, heat = m.apply(full, feats, boxes, method=m.heads_on_boxes)
        kp = np.asarray(decode_keypoint_heatmaps(heat[0], boxes[0]))
        bin_w = (84 - 20) / 56
        bin_h = (112 - 16) / 56
        ex = np.abs(kp[0, :, 0] - kx) / bin_w
        ey = np.abs(kp[0, :, 1] - ky) / bin_h
        assert float(np.median(ex)) <= 2.0 and float(np.median(ey)) <= 2.0

    def test_box_head_loss_finite_grad(self):
        cv, _ = _converted_variables(seed=9)
        m = KeypointRCNN()
        rng = np.random.default_rng(13)
        img = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
        feats, _ = m.apply(cv, img, method=m.backbone_forward)
        boxes = jnp.asarray([[[8., 8., 40., 56.], [2., 2., 30., 30.]]])
        gt = jnp.asarray([[[10., 6., 42., 58.], [0., 0., 1., 1.]]])
        valid = jnp.asarray([[True, False]])

        def f(bh):
            full = {"params": {**cv["params"], "box_head": bh}}
            scores, deltas, _ = m.apply(full, feats, boxes,
                                        method=m.heads_on_boxes)
            return box_head_loss(scores, deltas, boxes, gt, valid)

        loss, grads = jax.value_and_grad(f)(cv["params"]["box_head"])
        assert np.isfinite(float(loss))
        g = jnp.sqrt(sum(jnp.sum(x ** 2) for x in jax.tree.leaves(grads)))
        assert float(g) > 0 and np.isfinite(float(g))
