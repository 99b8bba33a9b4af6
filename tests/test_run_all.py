"""End-to-end orchestrator test: the FULL reference dataflow on one
synthetic Unity-style fixture — the integration test the reference never
had (videopose3d → triangulation → bundle_adjustment → fuse → front_side
→ angle → metrics), asserting fused MPJPE beats single-view."""

import json

import numpy as np

rng = np.random.default_rng(121)


def _make_fixture(tmp_path, T=24):
    from skix.io import PTInfo, save_pt_info

    pt_root = tmp_path / "pt" / "p01"
    pt_root.mkdir(parents=True)
    base = rng.uniform(500, 1400, (1, 17, 2)) + rng.normal(
        size=(T, 17, 2)).cumsum(0) * 2
    for view in ("osmo_1", "osmo_2"):
        kpts = (base + rng.normal(size=base.shape)).astype(np.float32)
        score = np.ones((T, 17), np.float32)
        info = PTInfo(video_name=view, frame_count=T, img_shape=(1080, 1920),
                      fps=30.0, duration=T / 30.0,
                      d2_keypoints=np.concatenate(
                          [kpts, score[..., None]], -1),
                      d2_keypoints_score=score)
        save_pt_info(pt_root / f"{view}.npz", info)

    # Unity-style GT 3D sequence + two noisy side views of it: the right
    # view lives in a rigidly-misaligned frame (fuse must Umeyama it back)
    gt = rng.normal(size=(1, 70, 3)) * 0.3 + rng.normal(
        size=(T, 70, 3)).cumsum(0) * 0.01
    left = gt + rng.normal(size=gt.shape) * 0.02
    ang = 0.3
    R_mis = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    right = gt @ R_mis.T + np.array([0.5, -0.2, 1.0]) \
        + rng.normal(size=gt.shape) * 0.02
    sam3d = tmp_path / "sam3d" / "p01"
    sam3d.mkdir(parents=True)
    np.save(sam3d / "left_view.npy", left.astype(np.float32))
    np.save(sam3d / "right_view.npy", right.astype(np.float32))

    # front SAM3 person track (prepare_front_results output schema)
    front = tmp_path / "front" / "p01"
    front.mkdir(parents=True)
    xs = np.linspace(300, 900, T)
    bboxes = np.stack([xs, np.full(T, 400.0), xs + 80, np.full(T, 700.0)],
                      axis=-1)
    np.save(front / "person_bboxes.npy", bboxes.astype(np.float32))
    return gt, left


def test_run_all_full_chain(tmp_path):
    from skix.pipelines.run_all import main

    T = 24
    gt, left = _make_fixture(tmp_path, T)
    work = tmp_path / "work"
    cdir = tmp_path / "configs"
    cdir.mkdir()
    (cdir / "run_all.yaml").write_text(f"""
paths:
  pt_root: {tmp_path / 'pt'}
  work_root: {work}
  video_root: null
  sam3d_root: {tmp_path / 'sam3d'}
  front_root: {tmp_path / 'front'}
stages: [videopose3d, triangulation, bundle_adjustment, fuse, front_side,
         angle, metrics]
lifter_checkpoint: null
filter_widths: [3, 3]
channels: 32
kpt_source: detectron2
baseline_m: 20.0
tri_methods: [fixed]
single_view: false
ba_max_steps: 8
ba_cg_iters: 10
plots: false
render_video: false
gt_root: null
""")
    main([f"--config-dir={cdir}"])

    timing = json.loads((work / "pipeline_timing.json").read_text())
    for stage in ("videopose3d", "triangulation", "bundle_adjustment",
                  "fuse", "front_side", "metrics"):
        assert stage in timing and timing[stage]["total_s"] > 0, stage

    # per-stage artifacts
    assert (work / "videopose3d" / "p01" / "p01_fused.npz").exists()
    assert (work / "joints_3d" / "p01" / "joints_3d_fixed.json").exists()
    assert (work / "joints_3d" / "p01" / "ba_input_fixed.npz").exists()
    ba_reports = json.loads((work / "ba" / "ba_summary.json").read_text())
    assert ba_reports, "bundle adjustment produced no reports"
    for rep in ba_reports.values():
        assert rep["final_cost"] <= rep["initial_cost"]
    assert (work / "fused" / "p01" / "p01_smoothed.npy").exists()
    assert (work / "front_side" / "p01" / "p01_world.npy").exists()
    assert (work / "front_side" / "p01" / "p01_feet_bev.npy").exists()
    assert (work / "angle" / "angle_summary.json").exists()
    rep = json.loads((work / "metrics" / "metrics_report.json").read_text())
    assert "p01" in rep and "smoothed" in rep["p01"]

    # THE integration claim: fused output beats the single (left) view
    # against the synthetic GT (the reference's <50 mm fusion story,
    # doc/process_documentation.md:202 — here relative, not absolute)
    fused = np.load(work / "fused" / "p01" / "p01_fused.npy")
    mpjpe_fused = float(np.mean(np.linalg.norm(fused - gt, axis=-1)))
    mpjpe_left = float(np.mean(np.linalg.norm(left - gt, axis=-1)))
    assert mpjpe_fused < mpjpe_left, (mpjpe_fused, mpjpe_left)
    # absolute accuracy at the reference's claimed operating point
    # (<50 mm fusion MPJPE, doc/process_documentation.md:202; the fixture
    # is meter-scale with 20 mm per-view noise)
    assert mpjpe_fused < 0.050, mpjpe_fused


def test_run_all_with_tiny_vggt(tmp_path):
    """The vggt stage wiring: frames-bearing records through a tiny VGGT
    → cameras → triangulation → live BA, orchestrated."""
    from skix.io import PTInfo, save_pt_info
    from skix.pipelines.run_all import main

    T, H, W = 8, 56, 56
    pt_root = tmp_path / "pt" / "p01"
    pt_root.mkdir(parents=True)
    base = rng.uniform(10, 40, (1, 17, 2)) + rng.normal(size=(T, 17, 2))
    for view in ("osmo_1", "osmo_2"):
        kpts = (base + rng.normal(size=base.shape)).astype(np.float32)
        score = np.ones((T, 17), np.float32)
        info = PTInfo(video_name=view, frame_count=T, img_shape=(H, W),
                      fps=30.0, duration=T / 30.0,
                      frames=rng.integers(0, 255,
                                          (T, H, W, 3)).astype(np.uint8),
                      d2_keypoints=np.concatenate(
                          [kpts, score[..., None]], -1),
                      d2_keypoints_score=score)
        save_pt_info(pt_root / f"{view}.npz", info)

    work = tmp_path / "work"
    cdir = tmp_path / "configs"
    cdir.mkdir()
    (cdir / "run_all.yaml").write_text(f"""
paths:
  pt_root: {tmp_path / 'pt'}
  work_root: {work}
  video_root: null
  sam3d_root: null
stages: [vggt]
kpt_source: detectron2
vggt_img_size: 28
vggt_embed_dim: 32
vggt_depth: 2
vggt_num_heads: 2
vggt_taps: [0, 0, 1, 1]
vggt_frame_stride: 30
vggt_checkpoint: null
""")
    main([f"--config-dir={cdir}"])
    out = work / "vggt" / "p01" / "multi_view_refined.npz"
    assert out.exists()
    with np.load(out) as z:
        assert z["X3d"].shape == (T, 17, 3)
        assert z["final_cost"] <= z["initial_cost"]
