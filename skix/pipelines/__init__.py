"""Config-driven CLI stages mirroring the reference's entry points.

Each stage runs as ``python -m skix.pipelines.<stage> [key=value ...]`` with
its YAML in ``configs/`` (reference: Hydra entries enumerated in
.vscode/launch.json — prepare_dataset, VideoPose3D, triangulation, vggt,
bundle_adjustment, front_side, fuse, angle, metrics, vis_3d_kpt,
camera_calibration, image_edit).
"""
