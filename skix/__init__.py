"""skix — TPU-native skiing motion analysis framework.

A brand-new JAX / XLA / Pallas / pjit implementation of the capabilities of
ChenKaiXuSan/Skiing_Analysis_PyTorch (multi-camera ski-video analysis: video
preprocessing, 2D→3D lifting, multi-view geometry, bundle adjustment,
confidence-weighted fusion, biomechanics, evaluation), redesigned TPU-first.

Subpackages
-----------
- ``skix.geometry``  — pure-jnp geometry core (DLT, Umeyama, projection,
  epipolar, smoothing, skeleton metadata). One library serving triangulation,
  fusion, bundle adjustment, metrics and angle (the reference implements these
  4+ times; see SURVEY.md §2).
- ``skix.models``    — Flax models: VideoPose3D-style temporal-conv lifter,
  VGGT-style alternating-attention multi-view transformer, DPT heads.
- ``skix.ops``       — Pallas / XLA kernels: flash attention, NMS,
  connected components, fused conv blocks.
- ``skix.solvers``   — Levenberg–Marquardt bundle adjustment under ``jit``.
- ``skix.fuse``      — confidence-weighted cross-view fusion + adaptive EMA.
- ``skix.angle``     — joint-angle biomechanics + turn segmentation.
- ``skix.metrics``   — MPJPE / temporal-consistency evaluation.
- ``skix.parallel``  — device-mesh / sharding utilities (DP/TP/SP over ICI).
- ``skix.pipelines`` — config-driven CLI stages mirroring the reference's
  entry points (prepare_dataset, videopose3d, triangulation, fuse, angle, …).
- ``skix.io``        — data contracts (.npz schema compatible with the
  reference's ``pt_info``), video IO.
"""

__version__ = "0.1.0"
