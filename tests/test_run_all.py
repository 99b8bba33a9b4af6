"""End-to-end orchestrator test: full chain on one synthetic dataset."""

import json

import numpy as np

rng = np.random.default_rng(121)


def test_run_all_chain(tmp_path):
    from skix.io import PTInfo, save_pt_info
    from skix.pipelines.run_all import main

    # dataset: 2-view records + sam3d-style sequences for one person
    T = 24
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

    sam3d = tmp_path / "sam3d" / "p01"
    sam3d.mkdir(parents=True)
    seq = rng.normal(size=(T, 70, 3)).cumsum(0) * 0.02
    np.save(sam3d / "left_view.npy", seq.astype(np.float32))
    np.save(sam3d / "right_view.npy",
            (seq + rng.normal(size=seq.shape) * 0.01).astype(np.float32))

    work = tmp_path / "work"
    cdir = tmp_path / "configs"
    cdir.mkdir()
    (cdir / "run_all.yaml").write_text(f"""
paths:
  pt_root: {tmp_path / 'pt'}
  work_root: {work}
  video_root: null
  sam3d_root: {tmp_path / 'sam3d'}
stages: [videopose3d, triangulation, fuse, angle, metrics]
lifter_checkpoint: null
filter_widths: [3, 3]
channels: 32
kpt_source: detectron2
baseline_m: 20.0
tri_methods: [fixed]
single_view: false
plots: false
gt_root: null
""")
    main([f"--config-dir={cdir}"])

    timing = json.loads((work / "pipeline_timing.json").read_text())
    for stage in ("videopose3d", "triangulation", "fuse", "metrics"):
        assert stage in timing and timing[stage]["total_s"] > 0
    assert (work / "videopose3d" / "p01" / "p01_fused.npz").exists()
    assert (work / "joints_3d" / "p01" / "joints_3d_fixed.json").exists()
    assert (work / "fused" / "p01" / "p01_smoothed.npy").exists()
    rep = json.loads((work / "metrics" / "metrics_report.json").read_text())
    assert "p01" in rep and "smoothed" in rep["p01"]
    # the angle stage consumes the 70-joint fused output only when it has
    # the MHR-70 target subset; it reports per-person summaries regardless
    assert (work / "angle" / "angle_summary.json").exists()
