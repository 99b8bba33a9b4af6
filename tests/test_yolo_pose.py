"""YOLO-class pose detector: architecture, converter seam, TAL loss,
COCO data pipeline, and the train-CLI overfit gate (VERDICT r2 #4/#5)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.models.yolo_loss import pose_detection_loss, task_aligned_assign
from skix.models.yolo_pose import (YoloDetect, YoloPose, YoloSeg,
                                   convert_ultralytics_detect,
                                   convert_ultralytics_pose,
                                   convert_ultralytics_seg,
                                   crop_masks_to_boxes, decode_boxes,
                                   detect, detect_boxes, detect_seg,
                                   reference_state_dict_spec,
                                   reference_state_dict_spec_detect,
                                   reference_state_dict_spec_seg)


def _tiny_variables(model, hw=64):
    return jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3)), train=True))()


class TestArchitecture:
    def test_forward_shapes_and_anchor_count(self):
        m = YoloPose(scale="n")
        v = _tiny_variables(m)
        raw = m.apply(v, jnp.zeros((2, 64, 64, 3)))
        A = (64 // 8) ** 2 + (64 // 16) ** 2 + (64 // 32) ** 2
        assert raw.box_dist.shape == (2, A, 4, 16)
        assert raw.cls_logits.shape == (2, A, 1)
        assert raw.kpt_raw.shape == (2, A, 17, 3)
        assert raw.anchors.shape == (A, 2)
        assert raw.strides.shape == (A,)
        # stride blocks ordered P3, P4, P5
        assert np.allclose(np.asarray(raw.strides[:64]), 8)
        assert np.allclose(np.asarray(raw.strides[-4:]), 32)

    def test_detect_static_shapes(self):
        m = YoloPose(scale="n")
        v = _tiny_variables(m)
        raw = m.apply(v, jnp.zeros((1, 64, 64, 3)))
        det = detect(raw, top_k=6)
        assert det.boxes_xyxy.shape == (1, 6, 4)
        assert det.keypoints.shape == (1, 6, 17, 3)
        assert det.valid.dtype == bool

    def test_nms_pool_keeps_weaker_second_object(self):
        """Duplicate anchors of a dominant object must not evict a
        weaker real object from the detection pool: NMS runs on a large
        candidate pool FIRST, then truncates to top_k (ultralytics
        order). With top-k-before-NMS, object B below would vanish."""
        from skix.models.yolo_pose import RawPredictions

        A, reg_max = 10, 16
        # 9 coincident anchors → 9 identical boxes for object A
        anchors = np.full((A, 2), 2.0, np.float32)
        anchors[9] = (10.0, 10.0)                  # object B, disjoint
        box_dist = np.full((1, A, 4, reg_max), -20.0, np.float32)
        box_dist[..., 1] = 20.0                    # ltrb = 1 grid unit
        cls = np.full((1, A, 1), 2.2, np.float32)  # dups ≈ 0.90
        cls[0, 9, 0] = 0.0                         # object B: 0.50
        raw = RawPredictions(
            box_dist=jnp.asarray(box_dist), cls_logits=jnp.asarray(cls),
            kpt_raw=jnp.zeros((1, A, 17, 3)),
            anchors=jnp.asarray(anchors),
            strides=jnp.ones((A,), jnp.float32))
        det = detect(raw, top_k=4, score_threshold=0.25, nms_iou=0.7)
        valid = np.asarray(det.valid[0])
        boxes = np.asarray(det.boxes_xyxy[0])[valid]
        assert valid.sum() == 2, valid
        assert any(np.allclose(b, [9, 9, 11, 11]) for b in boxes), boxes
        assert any(np.allclose(b, [1, 1, 3, 3]) for b in boxes), boxes

    def test_scale_table_widths(self):
        chs, n3, n6 = YoloPose(scale="s").widths()
        assert chs == [32, 64, 128, 256, 512]
        assert (n3, n6) == (1, 2)
        chm, m3, m6 = YoloPose(scale="m").widths()
        assert chm == [48, 96, 192, 384, 576]
        assert (m3, m6) == (2, 4)


class TestConverter:
    def test_synthetic_ultralytics_checkpoint_round_trip(self):
        """The converter consumes every tensor of an ultralytics-named
        pose state dict and reproduces the exact init tree (ultralytics
        itself is a pip dep the reference does not vendor — the spec
        enumerates the canonical names/shapes)."""
        rng = np.random.default_rng(100)
        spec = reference_state_dict_spec("n")
        sd = {k: rng.normal(size=s).astype(np.float32) * 0.05
              for k, s in spec.items()}
        for k in sd:
            if k.endswith("running_var"):
                sd[k] = np.abs(sd[k]) + 1.0
        cv = convert_ultralytics_pose(sd, scale="n")

        m = YoloPose(scale="n")
        v = _tiny_variables(m)
        flat_i = jax.tree_util.tree_leaves_with_path(v)
        flat_c = jax.tree_util.tree_leaves_with_path(cv)
        pi = {jax.tree_util.keystr(p): x.shape for p, x in flat_i}
        pc = {jax.tree_util.keystr(p): x.shape for p, x in flat_c}
        assert pi == pc
        # value mapping spot check: stem conv kernel transposes OIHW→HWIO
        np.testing.assert_allclose(
            np.asarray(cv["params"]["b0"]["conv"]["kernel"]),
            sd["model.0.conv.weight"].transpose(2, 3, 1, 0))
        out = m.apply(cv, jnp.zeros((1, 64, 64, 3)))
        assert np.isfinite(np.asarray(out.cls_logits)).all()

    def test_all_spec_keys_are_consumed(self):
        """Removing any single tensor from the checkpoint must break the
        conversion — i.e. the converter truly reads every entry."""
        rng = np.random.default_rng(101)
        spec = reference_state_dict_spec("n")
        sd = {k: rng.normal(size=s).astype(np.float32)
              for k, s in spec.items()}
        victim = sorted(spec)[len(spec) // 2]
        del sd[victim]
        with pytest.raises(KeyError):
            convert_ultralytics_pose(sd, scale="n")


class TestSeg:
    """YoloSeg — the reference YOLOv11Mask capability
    (prepare_dataset/model/yolov11_mask.py:75)."""

    def test_forward_shapes(self):
        m = YoloSeg(scale="n")
        v = _tiny_variables(m)
        raw = m.apply(v, jnp.zeros((2, 64, 64, 3)))
        A = (8 * 8 + 4 * 4 + 2 * 2)
        assert raw.protos.shape == (2, 16, 16, 32)       # stride 4
        assert raw.mask_coefs.shape == (2, A, 32)
        assert raw.box_dist.shape == (2, A, 4, 16)
        det = detect_seg(raw, top_k=4)
        assert det.masks.shape == (2, 4, 16, 16)
        assert det.boxes_xyxy.shape == (2, 4, 4)

    def test_mask_is_coef_proto_product_cropped(self):
        """A detection's mask must equal sigmoid(coefs · protos) zeroed
        outside its box (ultralytics process_mask semantics). Craft raw
        predictions where the sole confident anchor selects proto
        channel 0 with weight 1."""
        from skix.models.yolo_pose import RawSegPredictions

        A, reg_max, nm, Hp = 4, 16, 8, 8
        rng = np.random.default_rng(3)
        protos = rng.normal(size=(1, Hp, Hp, nm)).astype(np.float32)
        coefs = np.zeros((1, A, nm), np.float32)
        coefs[0, 0, 0] = 1.0                       # anchor 0 → channel 0
        cls = np.full((1, A, 1), -10.0, np.float32)
        cls[0, 0, 0] = 5.0
        box_dist = np.full((1, A, 4, reg_max), -20.0, np.float32)
        box_dist[..., 2] = 20.0                    # ltrb = 2 grid units
        anchors = np.full((A, 2), 3.0, np.float32)
        raw = RawSegPredictions(
            box_dist=jnp.asarray(box_dist), cls_logits=jnp.asarray(cls),
            mask_coefs=jnp.asarray(coefs), protos=jnp.asarray(protos),
            anchors=jnp.asarray(anchors),
            strides=jnp.full((A,), 4.0, jnp.float32))
        det = detect_seg(raw, top_k=1, score_threshold=0.5)
        assert bool(det.valid[0, 0])
        # box: (anchor 3,3 ± 2 grid units) * stride 4 = [4, 4, 20, 20] px
        np.testing.assert_allclose(np.asarray(det.boxes_xyxy[0, 0]),
                                   [4.0, 4.0, 20.0, 20.0], atol=1e-4)
        expect = 1.0 / (1.0 + np.exp(-protos[0, ..., 0]))
        grid = np.arange(Hp)
        inside = ((grid[None, :] >= 1) & (grid[None, :] < 5)
                  & (grid[:, None] >= 1) & (grid[:, None] < 5))
        np.testing.assert_allclose(np.asarray(det.masks[0, 0]),
                                   expect * inside, atol=1e-5)

    def test_crop_masks_to_boxes(self):
        m = jnp.ones((1, 8, 8))
        out = crop_masks_to_boxes(m, jnp.asarray([[8.0, 4.0, 16.0, 12.0]]))
        a = np.asarray(out[0])
        assert a[1:3, 2:4].min() == 1.0            # inside
        assert a[:, :2].max() == 0.0 and a[:1].max() == 0.0

    def test_converter_round_trip(self):
        """The seg converter consumes the full ultralytics -seg naming
        and reproduces the exact init tree, incl. the proto upsample
        ConvTranspose kernel flip."""
        rng = np.random.default_rng(200)
        spec = reference_state_dict_spec_seg("n")
        sd = {k: rng.normal(size=s).astype(np.float32) * 0.05
              for k, s in spec.items()}
        for k in sd:
            if k.endswith("running_var"):
                sd[k] = np.abs(sd[k]) + 1.0
        cv = convert_ultralytics_seg(sd, scale="n")
        m = YoloSeg(scale="n")
        v = _tiny_variables(m)
        pi = {jax.tree_util.keystr(p): x.shape
              for p, x in jax.tree_util.tree_leaves_with_path(v)}
        pc = {jax.tree_util.keystr(p): x.shape
              for p, x in jax.tree_util.tree_leaves_with_path(cv)}
        assert pi == pc
        out = m.apply(cv, jnp.zeros((1, 64, 64, 3)))
        assert np.isfinite(np.asarray(out.protos)).all()
        # any missing tensor must break conversion (full consumption)
        victim = "model.22.proto.upsample.weight"
        del sd[victim]
        with pytest.raises(KeyError):
            convert_ultralytics_seg(sd, scale="n")

    def test_proto_upsample_matches_torch(self):
        """lax.conv_transpose does not mirror the kernel; torch does.
        The converter's spatial flip must make the flax ConvTranspose
        reproduce torch ConvTranspose2d exactly."""
        import torch

        import flax.linen as fnn

        rng = np.random.default_rng(7)
        x = rng.normal(size=(1, 5, 5, 3)).astype(np.float32)
        t = torch.nn.ConvTranspose2d(3, 4, 2, 2, 0, bias=True)
        with torch.no_grad():
            ref = t(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        w = t.weight.detach().numpy()              # (in, out, kh, kw)
        b = t.bias.detach().numpy()
        mod = fnn.ConvTranspose(4, (2, 2), strides=(2, 2))
        vars_ = {"params": {
            "kernel": jnp.asarray(w.transpose(2, 3, 0, 1)[::-1, ::-1]),
            "bias": jnp.asarray(b)}}
        out = mod.apply(vars_, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2),
            ref.numpy(), atol=1e-5)

    def test_mask_selection_core(self):
        """_mask_select_core picks each frame's athlete mask by the seg
        model's own selection and hole-fills invalid frames."""
        from skix.pipelines.prepare_dataset import _mask_select_core

        T, K, Hp = 3, 2, 4
        boxes = np.zeros((T, K, 4), np.float32)
        boxes[..., 2:] = 10.0                       # all same area
        boxes[0, 1, 2:] = 20.0                      # frame 0: slot 1 bigger
        valid = np.ones((T, K), bool)
        valid[1] = False                            # frame 1: no detection
        masks = np.zeros((T, K, Hp, Hp), np.float32)
        masks[0, 1] = 0.9
        masks[2, 0] = 0.7
        m = np.asarray(_mask_select_core(jnp.asarray(boxes),
                                         jnp.asarray(valid),
                                         jnp.asarray(masks)))
        np.testing.assert_allclose(m[0], 0.9)       # largest-area slot
        np.testing.assert_allclose(m[1], 0.7)       # hole-filled w/ next
        np.testing.assert_allclose(m[2], 0.7)


class TestDetectOnly:
    """YoloDetect — the reference's plain ``yolo11x.pt`` bbox task
    (prepare_dataset/model/yolov11_bbox.py:77, classes=0 person filter
    at :118)."""

    def test_forward_shapes(self):
        m = YoloDetect(scale="n", num_classes=80)
        v = _tiny_variables(m)
        raw = m.apply(v, jnp.zeros((2, 64, 64, 3)))
        A = (64 // 8) ** 2 + (64 // 16) ** 2 + (64 // 32) ** 2
        assert raw.box_dist.shape == (2, A, 4, 16)
        assert raw.cls_logits.shape == (2, A, 80)
        assert not hasattr(raw, "kpt_raw")

    def test_person_class_filter(self):
        rng = np.random.default_rng(7)
        m = YoloDetect(scale="n", num_classes=80)
        v = _tiny_variables(m)
        img = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
        raw = m.apply(v, img)
        filt = detect_boxes(raw, top_k=4, score_threshold=-1.0,
                            classes=(0,))
        assert np.all(np.asarray(filt.cls) == 0)
        # the filtered scores are exactly the class-0 probabilities
        probs = np.asarray(jax.nn.sigmoid(raw.cls_logits))[0, :, 0]
        assert np.all(np.isin(np.round(np.asarray(filt.scores[0]), 6),
                              np.round(probs, 6)))
        # unfiltered random-init logits pick many non-person classes
        unfilt = detect_boxes(raw, top_k=4, score_threshold=-1.0)
        assert np.asarray(unfilt.cls).max() > 0

    @pytest.mark.parametrize("version", [8, 11])
    def test_converter_round_trip(self, version):
        rng = np.random.default_rng(102)
        spec = reference_state_dict_spec_detect("n", version=version)
        assert not any(".cv4." in k for k in spec)
        sd = {k: rng.normal(size=s).astype(np.float32) * 0.05
              for k, s in spec.items()}
        for k in sd:
            if k.endswith("running_var"):
                sd[k] = np.abs(sd[k]) + 1.0
        cv = convert_ultralytics_detect(sd, scale="n", version=version)
        m = YoloDetect(scale="n", version=version)
        v = _tiny_variables(m)
        pi = {jax.tree_util.keystr(p): x.shape
              for p, x in jax.tree_util.tree_leaves_with_path(v)}
        pc = {jax.tree_util.keystr(p): x.shape
              for p, x in jax.tree_util.tree_leaves_with_path(cv)}
        assert pi == pc
        out = m.apply(cv, jnp.zeros((1, 64, 64, 3)))
        assert np.isfinite(np.asarray(out.cls_logits)).all()

    def test_all_spec_keys_are_consumed(self):
        rng = np.random.default_rng(103)
        spec = reference_state_dict_spec_detect("n", version=11)
        sd = {k: rng.normal(size=s).astype(np.float32)
              for k, s in spec.items()}
        victim = sorted(spec)[len(spec) // 2]
        del sd[victim]
        with pytest.raises(KeyError):
            convert_ultralytics_detect(sd, scale="n", version=11)


class TestLoss:
    def _setup(self):
        m = YoloPose(scale="n")
        v = _tiny_variables(m, 64)
        raw = m.apply(v, jnp.zeros((1, 64, 64, 3)))
        gt_boxes = jnp.asarray([[[8., 8., 40., 56.], [0., 0., 0., 0.]]])
        kp = np.zeros((1, 2, 17, 3), np.float32)
        kp[0, 0, :, 0] = np.linspace(10, 38, 17)
        kp[0, 0, :, 1] = np.linspace(10, 54, 17)
        kp[0, 0, :, 2] = 1.0
        gt_valid = jnp.asarray([[True, False]])
        return m, v, raw, gt_boxes, jnp.asarray(kp), gt_valid

    def test_assignment_respects_validity_and_box(self):
        _, _, raw, gt_boxes, _, gt_valid = self._setup()
        gt_cls = jnp.zeros((1, 2), jnp.int32)
        assigned, fg, tscores = task_aligned_assign(raw, gt_boxes, gt_cls,
                                                    gt_valid)
        fg_np = np.asarray(fg[0])
        assert fg_np.any()
        # every fg anchor center lies inside the (only valid) GT box
        centers = np.asarray(raw.anchors * raw.strides[:, None])
        inside = ((centers[:, 0] > 8) & (centers[:, 0] < 40)
                  & (centers[:, 1] > 8) & (centers[:, 1] < 56))
        assert (inside | ~fg_np).all()
        assert (np.asarray(assigned[0])[fg_np] == 0).all()
        assert float(tscores.max()) <= 1.0 + 1e-6

    def test_loss_finite_and_differentiable(self):
        m, v, _, gt_boxes, gt_kpts, gt_valid = self._setup()

        def f(p):
            raw = m.apply({"params": p, "batch_stats": v["batch_stats"]},
                          jnp.full((1, 64, 64, 3), 0.5))
            total, _ = pose_detection_loss(raw, gt_boxes, gt_kpts, gt_valid)
            return total

        loss, grads = jax.value_and_grad(f)(v["params"])
        assert np.isfinite(float(loss))
        gnorm = jnp.sqrt(sum(jnp.sum(g ** 2)
                             for g in jax.tree.leaves(grads)))
        assert np.isfinite(float(gnorm)) and float(gnorm) > 0

    def test_no_valid_gt_gives_finite_loss(self):
        _, _, raw, gt_boxes, gt_kpts, _ = self._setup()
        none_valid = jnp.zeros((1, 2), bool)
        total, aux = pose_detection_loss(raw, gt_boxes, gt_kpts, none_valid)
        assert np.isfinite(float(total))
        assert float(aux["num_fg"]) == 0


def _write_coco_fixture(root, n_images=3, size=96, seed=7):
    """Tiny on-disk COCO keypoints dataset: one bright person blob per
    image with deterministic keypoints."""
    import cv2

    rng = np.random.default_rng(seed)
    (root / "img").mkdir(parents=True, exist_ok=True)
    images, anns = [], []
    gt = {}
    for i in range(n_images):
        img = (rng.random((size, size, 3)) * 40).astype(np.uint8)
        x0, y0 = int(rng.integers(8, 24)), int(rng.integers(8, 20))
        w, h = int(rng.integers(40, 56)), int(rng.integers(52, 68))
        img[y0:y0 + h, x0:x0 + w] = (rng.random((h, w, 3)) * 120
                                     + 100).astype(np.uint8)
        kx = rng.uniform(x0 + 4, x0 + w - 4, 17)
        ky = rng.uniform(y0 + 4, y0 + h - 4, 17)
        for j in range(17):  # keypoint beacons the conv can latch onto
            cv2.circle(img, (int(kx[j]), int(ky[j])), 2,
                       (int(255 * (j % 3 == 0)), int(255 * (j % 3 == 1)),
                        int(255 * (j % 3 == 2))), -1)
        cv2.imwrite(str(root / "img" / f"{i}.png"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        images.append({"id": i, "file_name": f"img/{i}.png",
                       "width": size, "height": size})
        kflat = np.stack([kx, ky, np.full(17, 2.0)], -1).reshape(-1)
        anns.append({"id": i, "image_id": i, "category_id": 1,
                     "bbox": [x0, y0, w, h], "iscrowd": 0,
                     "area": w * h,
                     "keypoints": [float(v) for v in kflat],
                     "segmentation": [[x0, y0, x0 + w, y0,
                                       x0 + w, y0 + h, x0, y0 + h]]})
        gt[i] = {"box": [x0, y0, x0 + w, y0 + h],
                 "kpts": np.stack([kx, ky], -1)}
    (root / "fixture.json").write_text(json.dumps({
        "images": images, "annotations": anns,
        "categories": [{"id": 1, "name": "person",
                        "keypoints": ["k"] * 17}]}))
    return root / "fixture.json", gt


class TestCocoData:
    def test_parse_and_example(self, tmp_path):
        from skix.data import CocoDataset

        jp, gt = _write_coco_fixture(tmp_path)
        ds = CocoDataset(jp, image_root=tmp_path)
        assert len(ds) == 3
        rec = ds.example(0)
        assert rec["image"].shape == (96, 96, 3)
        np.testing.assert_allclose(rec["boxes"][0], gt[0]["box"])
        np.testing.assert_allclose(rec["keypoints"][0, :, :2],
                                   gt[0]["kpts"], atol=1e-4)
        # polygon mask covers the box interior
        x0, y0, x1, y1 = [int(v) for v in gt[0]["box"]]
        assert rec["masks"][0, (y0 + y1) // 2, (x0 + x1) // 2]
        assert not rec["masks"][0, 0, 0]

    def test_hflip_swaps_pairs_and_mirrors(self, tmp_path):
        from skix.data import CocoDataset, hflip_record

        jp, _ = _write_coco_fixture(tmp_path)
        rec = CocoDataset(jp, image_root=tmp_path).example(1)
        fl = hflip_record(rec)
        W = rec["image"].shape[1]
        # left-eye (1) ↔ right-eye (2), x mirrored
        np.testing.assert_allclose(fl["keypoints"][0, 1, 0],
                                   W - rec["keypoints"][0, 2, 0])
        np.testing.assert_allclose(fl["boxes"][0, 0],
                                   W - rec["boxes"][0, 2])
        assert np.array_equal(fl["image"], rec["image"][:, ::-1])

    def test_crop_marks_outside_kpts_invisible(self, tmp_path):
        from skix.data import CocoDataset, random_resize_crop

        jp, _ = _write_coco_fixture(tmp_path)
        rec = CocoDataset(jp, image_root=tmp_path).example(0)
        rng = np.random.default_rng(0)
        out = random_resize_crop(rec, rng, scale_range=(1.0, 1.0),
                                 out_hw=(40, 40))
        k = out["keypoints"][0]
        vis = k[:, 2] > 0
        assert (k[vis, 0] >= 0).all() and (k[vis, 0] < 40).all()
        assert (out["boxes"] >= 0).all() and (out["boxes"] <= 40).all()

    def test_collate_fixed_shapes_and_slot_order(self, tmp_path):
        from skix.data import CocoDataset, CocoLoader

        jp, _ = _write_coco_fixture(tmp_path)
        ds = CocoDataset(jp, image_root=tmp_path)
        loader = CocoLoader(ds, batch_size=2, image_size=64, max_objects=4,
                            augment=False)
        batch = next(iter(loader))
        assert batch["images"].shape == (2, 64, 64, 3)
        assert batch["boxes"].shape == (2, 4, 4)
        assert batch["keypoints"].shape == (2, 4, 17, 3)
        assert batch["masks"].shape == (2, 4, 16, 16)
        assert batch["valid"].shape == (2, 4)
        assert batch["valid"][:, 0].all() and not batch["valid"][:, 1].any()
        # deterministic (augment off): same loader config → same batch
        batch2 = next(iter(CocoLoader(ds, batch_size=2, image_size=64,
                                      max_objects=4, augment=False)))
        assert np.array_equal(batch["images"], batch2["images"])

    def test_loader_smaller_than_batch_still_yields(self, tmp_path):
        """A dataset smaller than batch_size must yield one wrap-around
        batch per epoch — an empty epoch() range would make the infinite
        __iter__ spin forever without yielding (train CLI freeze)."""
        from skix.data import CocoDataset, CocoLoader

        jp, _ = _write_coco_fixture(tmp_path)
        ds = CocoDataset(jp, image_root=tmp_path)        # 3 examples
        loader = CocoLoader(ds, batch_size=8, image_size=64,
                            max_objects=4, augment=False)
        batch = next(iter(loader))
        assert batch["images"].shape == (8, 64, 64, 3)
        assert batch["valid"][:, 0].all()                # every slot filled
        assert len(list(loader.epoch())) == 1


@pytest.mark.slow
class TestTrainCLI:
    def test_overfit_fixture_below_2px(self, tmp_path):
        """VERDICT r2 #4 done-gate: the train CLI overfits the fixture to
        <2 px mean keypoint error through the real stage entry point."""
        from skix.config import load_config
        from skix.pipelines import train_pose

        jp, _ = _write_coco_fixture(tmp_path, n_images=3, size=96)
        cdir = tmp_path / "configs"
        cdir.mkdir()
        (cdir / "train_pose.yaml").write_text(f"""
paths:
  checkpoint_dir: {tmp_path / 'ckpt'}
coco_json: {jp}
image_root: {tmp_path}
scale: n
image_size: 96
batch_size: 3
max_objects: 4
steps: 420
lr: 0.003
weight_decay: 0.0
augment: false
log_every: 100
ckpt_every: 1000
final_eval: true
seed: 0
""")
        cfg = load_config("train_pose", config_dir=cdir)
        train_pose.main.__wrapped__(cfg)
        err = float((tmp_path / "ckpt" / "final_eval.txt").read_text())
        assert err < 2.0, f"overfit keypoint error {err:.2f} px"
        # checkpoint round-trips through the shared flat-npz loader
        from skix.models.yolo_pose import YoloPose
        from skix.pipelines.videopose3d import load_checkpoint

        ck = sorted((tmp_path / "ckpt").glob("yolo_pose_*.npz"))[-1]
        v = load_checkpoint(str(ck))
        m = YoloPose(scale="n")
        raw = m.apply(v, jnp.zeros((1, 96, 96, 3)))
        assert np.isfinite(np.asarray(raw.cls_logits)).all()


# ---------------------------------------------------------------------------
# YOLO11 (version=11): C3k2/C2PSA blocks, DW-separable cls head, converter
# ---------------------------------------------------------------------------


def _torch_ultralytics_blocks():
    """Hand-transcribed torch oracles for the ultralytics v11 blocks
    (ultralytics is not installed; these reproduce
    ultralytics/nn/modules/{conv,block}.py semantics with the SAME
    state-dict names so convert_ultralytics_pose consumes them)."""
    import torch
    import torch.nn as tnn

    class Conv(tnn.Module):
        def __init__(self, c1, c2, k=1, s=1, g=1, act=True):
            super().__init__()
            self.conv = tnn.Conv2d(c1, c2, k, s, k // 2, groups=g,
                                   bias=False)
            self.bn = tnn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
            self.act = tnn.SiLU() if act else tnn.Identity()

        def forward(self, x):
            return self.act(self.bn(self.conv(x)))

    class Bottleneck(tnn.Module):
        def __init__(self, c1, c2, shortcut=True, k=(3, 3), e=1.0):
            super().__init__()
            c_ = int(c2 * e)
            self.cv1 = Conv(c1, c_, k[0], 1)
            self.cv2 = Conv(c_, c2, k[1], 1)
            self.add = shortcut and c1 == c2

        def forward(self, x):
            y = self.cv2(self.cv1(x))
            return x + y if self.add else y

    class C3k(tnn.Module):
        def __init__(self, c1, c2, n=1, shortcut=True, e=0.5, k=3):
            super().__init__()
            c_ = int(c2 * e)
            self.cv1 = Conv(c1, c_, 1, 1)
            self.cv2 = Conv(c1, c_, 1, 1)
            self.cv3 = Conv(2 * c_, c2, 1)
            self.m = tnn.Sequential(*(
                Bottleneck(c_, c_, shortcut, k=(k, k), e=1.0)
                for _ in range(n)))

        def forward(self, x):
            import torch
            return self.cv3(torch.cat((self.m(self.cv1(x)),
                                       self.cv2(x)), 1))

    class C3k2(tnn.Module):
        def __init__(self, c1, c2, n=1, c3k=False, e=0.5, shortcut=True):
            super().__init__()
            self.c = int(c2 * e)
            self.cv1 = Conv(c1, 2 * self.c, 1, 1)
            self.cv2 = Conv((2 + n) * self.c, c2, 1)
            self.m = tnn.ModuleList(
                C3k(self.c, self.c, 2, shortcut) if c3k
                # ultralytics block.py C3k2: plain Bottleneck keeps the
                # DEFAULT e=0.5 (half-width cv1), unlike C2f's e=1.0
                else Bottleneck(self.c, self.c, shortcut, k=(3, 3), e=0.5)
                for _ in range(n))

        def forward(self, x):
            import torch
            y = list(self.cv1(x).chunk(2, 1))
            y.extend(m(y[-1]) for m in self.m)
            return self.cv2(torch.cat(y, 1))

    class Attention(tnn.Module):
        def __init__(self, dim, num_heads=8, attn_ratio=0.5):
            super().__init__()
            self.num_heads = num_heads
            self.head_dim = dim // num_heads
            self.key_dim = int(self.head_dim * attn_ratio)
            self.scale = self.key_dim ** -0.5
            nh_kd = self.key_dim * num_heads
            h = dim + nh_kd * 2
            self.qkv = Conv(dim, h, 1, act=False)
            self.proj = Conv(dim, dim, 1, act=False)
            self.pe = Conv(dim, dim, 3, 1, g=dim, act=False)

        def forward(self, x):
            B, C, H, W = x.shape
            N = H * W
            qkv = self.qkv(x)
            q, k, v = qkv.view(
                B, self.num_heads, self.key_dim * 2 + self.head_dim,
                N).split([self.key_dim, self.key_dim, self.head_dim],
                         dim=2)
            attn = (q.transpose(-2, -1) @ k) * self.scale
            attn = attn.softmax(dim=-1)
            x = (v @ attn.transpose(-2, -1)).view(B, C, H, W) + \
                self.pe(v.reshape(B, C, H, W))
            return self.proj(x)

    class PSABlock(tnn.Module):
        def __init__(self, c, attn_ratio=0.5, num_heads=4, shortcut=True):
            super().__init__()
            self.attn = Attention(c, attn_ratio=attn_ratio,
                                  num_heads=num_heads)
            self.ffn = tnn.Sequential(Conv(c, c * 2, 1),
                                      Conv(c * 2, c, 1, act=False))
            self.add = shortcut

        def forward(self, x):
            x = x + self.attn(x) if self.add else self.attn(x)
            x = x + self.ffn(x) if self.add else self.ffn(x)
            return x

    class C2PSA(tnn.Module):
        def __init__(self, c1, c2, n=1, e=0.5):
            super().__init__()
            self.c = int(c1 * e)
            self.cv1 = Conv(c1, 2 * self.c, 1, 1)
            self.cv2 = Conv(2 * self.c, c1, 1)
            self.m = tnn.Sequential(*(
                PSABlock(self.c, attn_ratio=0.5,
                         num_heads=max(1, self.c // 64))
                for _ in range(n)))

        def forward(self, x):
            a, b = self.cv1(x).split((self.c, self.c), dim=1)
            b = self.m(b)
            import torch
            return self.cv2(torch.cat((a, b), 1))

    return Conv, Bottleneck, C3k, C3k2, Attention, PSABlock, C2PSA


def _randomize_torch(mod, seed):
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in mod.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        for b in mod.buffers():
            if b.dtype.is_floating_point:
                b.copy_(torch.rand(b.shape, generator=g) * 0.5 + 0.75)
    mod.eval()


class TestYolo11Blocks:
    def test_c3k2_matches_torch_oracle(self):
        """The C3k2 flax block + _c3k2 converter reproduce the
        ultralytics block (both c3k variants) to ≤1e-4."""
        import torch

        from skix.models.yolo_pose import C3k2 as FlaxC3k2
        from skix.models.yolo_pose import _c3k2

        *_, TC3k2, _, _, _ = _torch_ultralytics_blocks()
        rng = np.random.default_rng(11)

        for c3k, e in ((False, 0.25), (True, 0.5)):
            tm = TC3k2(16, 24, n=2, c3k=c3k, e=e)
            _randomize_torch(tm, 123 + c3k)
            xin = rng.normal(size=(1, 16, 8, 8)).astype(np.float32) * 0.5
            with torch.no_grad():
                ref = tm(torch.from_numpy(xin)).numpy()
            sd = {f"x.{k}": v.numpy() for k, v in tm.state_dict().items()}
            p, s = _c3k2(sd, "x", 2, c3k)
            fm = FlaxC3k2(24, 2, c3k, e)
            out = fm.apply({"params": p, "batch_stats": s},
                           jnp.asarray(xin.transpose(0, 2, 3, 1)))
            np.testing.assert_allclose(
                np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-4)

    def test_c2psa_matches_torch_oracle(self):
        """C2PSA (attention + FFN residual stack) parity ≤1e-4 incl. the
        qkv head layout, softmax scaling, and the depthwise pe term."""
        import torch

        from skix.models.yolo_pose import C2PSA as FlaxC2PSA
        from skix.models.yolo_pose import _c2psa

        *_, TC2PSA = _torch_ultralytics_blocks()
        rng = np.random.default_rng(12)
        dim = 256   # hidden c=128 → 2 heads of 64
        x = rng.normal(size=(1, dim, 4, 4)).astype(np.float32) * 0.5
        tm = TC2PSA(dim, dim, n=2)
        _randomize_torch(tm, 77)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()
        sd = {f"x.{k}": v.numpy() for k, v in tm.state_dict().items()}
        p, s = _c2psa(sd, "x", 2)
        out = FlaxC2PSA(dim, 2).apply(
            {"params": p, "batch_stats": s},
            jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-4)

    def test_v11_forward_shapes(self):
        m = YoloPose(scale="n", version=11)
        v = _tiny_variables(m)
        out = m.apply(v, jnp.zeros((1, 64, 64, 3)))
        A = (64 // 8) ** 2 + (64 // 16) ** 2 + (64 // 32) ** 2
        assert out.cls_logits.shape == (1, A, 1)
        assert out.kpt_raw.shape == (1, A, 17, 3)

    def test_v11_scale_table(self):
        """yolo11 scale plan: m/l/x clamp at 512 channels; x widens 1.5×."""
        ch_n, n_n, _ = YoloPose(scale="n", version=11).widths()
        ch_x, n_x, _ = YoloPose(scale="x", version=11).widths()
        assert ch_n == [16, 32, 64, 128, 256]
        assert n_n == 1
        assert ch_x == [96, 192, 384, 768, 768]
        assert n_x == 2

    @pytest.mark.parametrize("scale", ["n", "m"])
    def test_v11_converter_round_trip(self, scale):
        """The v11 converter consumes a full yolo11-pose layout (incl.
        the C2PSA stage and DW-separable cls branch) and reproduces the
        exact init tree. 'm' exercises the forced-c3k m/l/x path."""
        rng = np.random.default_rng(200)
        spec = reference_state_dict_spec(scale, version=11)
        sd = {k: rng.normal(size=s).astype(np.float32) * 0.05
              for k, s in spec.items()}
        for k in sd:
            if k.endswith("running_var"):
                sd[k] = np.abs(sd[k]) + 1.0
        cv = convert_ultralytics_pose(sd, scale=scale, version=11)

        m = YoloPose(scale=scale, version=11)
        v = _tiny_variables(m)
        flat_i = jax.tree_util.tree_leaves_with_path(v)
        flat_c = jax.tree_util.tree_leaves_with_path(cv)
        pi = {jax.tree_util.keystr(p): x.shape for p, x in flat_i}
        pc = {jax.tree_util.keystr(p): x.shape for p, x in flat_c}
        assert pi == pc
        out = m.apply(cv, jnp.zeros((1, 64, 64, 3)))
        assert np.isfinite(np.asarray(out.cls_logits)).all()

    def test_v11_all_spec_keys_consumed(self):
        rng = np.random.default_rng(201)
        spec = reference_state_dict_spec("n", version=11)
        sd = {k: rng.normal(size=s).astype(np.float32)
              for k, s in spec.items()}
        victim = sorted(spec)[len(spec) // 3]
        del sd[victim]
        with pytest.raises(KeyError):
            convert_ultralytics_pose(sd, scale="n", version=11)

    def test_v11_seg_converter_round_trip(self):
        rng = np.random.default_rng(202)
        spec = reference_state_dict_spec_seg("n", version=11)
        sd = {k: rng.normal(size=s).astype(np.float32) * 0.05
              for k, s in spec.items()}
        for k in sd:
            if k.endswith("running_var"):
                sd[k] = np.abs(sd[k]) + 1.0
        cv = convert_ultralytics_seg(sd, scale="n", version=11)
        m = YoloSeg(scale="n", version=11)
        v = _tiny_variables(m)
        flat_i = jax.tree_util.tree_leaves_with_path(v)
        flat_c = jax.tree_util.tree_leaves_with_path(cv)
        pi = {jax.tree_util.keystr(p): x.shape for p, x in flat_i}
        pc = {jax.tree_util.keystr(p): x.shape for p, x in flat_c}
        assert pi == pc
        out = m.apply(cv, jnp.zeros((1, 64, 64, 3)))
        assert np.isfinite(np.asarray(out.protos)).all()
