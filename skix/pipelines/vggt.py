"""Stage CLI: VGGT multi-view transformer reconstruction.

Reference entries (SURVEY.md §2.6): vggt/main.py:47 (subject scan, pairs
(left, right)), single-view driver vggt/single_view_process.py:90 (every
Nth frame batched → camera extrinsics/intrinsics → ``R, t, C`` →
``*_multi_view_3d_info.npz``), multi-view driver
vggt/multi_view_process.py:68 (per frame: VGGT on {left, right}, optional
right hflip, person re-centering, DLT with VGGT cameras, ICP refinement,
re-triangulation) — whose BA invocation is dead code there
(:321-353, undefined ``run_local_ba``) and **live here** via
skix.solvers.bundle_adjust.

TPU-first: frames batch through one jitted VGGT forward; triangulation/BA
are the shared geometry/solver libraries.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import numpy as np

from skix.config import cli_main, iter_person_dirs

log = logging.getLogger(__name__)


def build_model(cfg):
    import jax.numpy as jnp

    from skix.models.vggt import VGGT

    return VGGT(
        img_size=int(cfg.get("img_size", 518)),
        patch_size=int(cfg.get("patch_size", 14)),
        embed_dim=int(cfg.get("embed_dim", 1024)),
        depth=int(cfg.get("depth", 24)),
        num_heads=int(cfg.get("num_heads", 16)),
        intermediate_layer_idx=tuple(cfg.get("intermediate_layer_idx",
                                             (4, 11, 17, 23))),
        enable_point=bool(cfg.get("enable_point", True)),
        enable_depth=bool(cfg.get("enable_depth", True)),
        dtype=jnp.bfloat16 if str(cfg.get("dtype", "bfloat16")) == "bfloat16"
        else jnp.float32,
    )


def load_or_init_variables(model, cfg):
    import jax
    import jax.numpy as jnp

    ckpt = cfg.get("checkpoint")
    if ckpt and Path(ckpt).exists():
        from skix.pipelines.videopose3d import load_checkpoint

        return load_checkpoint(ckpt)
    log.warning("no VGGT checkpoint configured — random init (smoke mode)")
    size = int(cfg.get("img_size", 518))
    return jax.jit(model.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, 2, size, size, 3)))


def preprocess_frames(frames_u8: np.ndarray, img_size: int) -> np.ndarray:
    """Resize + [0,1] normalize a (S, H, W, 3) frame set for VGGT input."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(frames_u8, jnp.float32) / 255.0
    S = x.shape[0]
    return np.asarray(jax.image.resize(x, (S, img_size, img_size, 3),
                                       "bilinear"))


def cameras_from_pose_enc(pose_enc, image_hw):
    """pose_enc (S, 9) → dict of extrinsic/intrinsic/R/t/C arrays."""
    import jax.numpy as jnp

    from skix.models.vggt import pose_encoding_to_extri_intri
    from skix.solvers.ba import camera_centers

    extr, K = pose_encoding_to_extri_intri(jnp.asarray(pose_enc)[None],
                                           image_hw)
    extr = np.asarray(extr[0])
    K = np.asarray(K[0])
    R = extr[:, :3, :3]
    t = extr[:, :3, 3]
    C = np.asarray(camera_centers(R, t))
    return {"extrinsic": extr, "intrinsic": K, "R": R, "t": t, "C": C}


def process_single_view(model, variables, video_path: Path, out_dir: Path,
                        cfg) -> dict:
    """Every Nth frame batched through VGGT → per-frame cameras npz
    (reference single_view_process.py:90,130 — every-30th-frame default)."""
    import jax
    import jax.numpy as jnp

    from skix.io.video import read_video

    stride = int(cfg.get("frame_stride", 30))
    size = int(cfg.get("img_size", 518))
    frames = read_video(video_path, max_frames=cfg.get("max_frames"))
    sel = frames[::stride]
    if len(sel) == 0:
        raise ValueError(f"no frames in {video_path}")
    x = preprocess_frames(sel, size)

    from skix.utils.jitapply import apply_model
    fwd = lambda v, b: apply_model(model, None, v, b)  # noqa: E731
    out = fwd(variables, jnp.asarray(x)[None])
    cams = cameras_from_pose_enc(np.asarray(out["pose_enc"][0]),
                                 (size, size))
    # rescale intrinsics from the VGGT input size to the VIDEO size —
    # the reference saves frame-resolution K (infer.py scale_intrinsics
    # before writing), and the multi-view branch below already does
    H, W = frames.shape[1], frames.shape[2]
    K = cams["intrinsic"].copy()
    K[:, 0, :] *= W / size
    K[:, 1, :] *= H / size
    cams["intrinsic"] = K
    out_dir.mkdir(parents=True, exist_ok=True)
    npz_path = out_dir / f"{video_path.stem}_multi_view_3d_info.npz"
    np.savez(npz_path, frame_indices=np.arange(len(sel)) * stride, **cams)
    return {"frames_processed": int(len(sel)), "npz": str(npz_path)}


def process_multi_view(model, variables, rec_left, rec_right, out_dir: Path,
                       cfg) -> dict:
    """Two-view reconstruction: VGGT cameras per frame pair + DLT of 2D
    keypoints + LM bundle adjustment (the reference's intended-but-dead
    pipeline, multi_view_process.py:68,321)."""
    import jax
    import jax.numpy as jnp

    from skix.geometry.triangulate import triangulate_sequence
    from skix.pipelines.videopose3d import load_2d_keypoints
    from skix.solvers import BAConfig, bundle_adjust

    size = int(cfg.get("img_size", 518))
    stride = int(cfg.get("frame_stride", 30))
    kpts_l, score_l, (H, W) = load_2d_keypoints(str(rec_left),
                                                cfg.get("kpt_source", "detectron2"))
    kpts_r, score_r, (H_r, W_r) = load_2d_keypoints(
        str(rec_right), cfg.get("kpt_source", "detectron2"))
    T = min(len(kpts_l), len(kpts_r))
    idxs = np.arange(0, T, stride)

    from skix.io import load_pt_info

    info_l = load_pt_info(rec_left)
    info_r = load_pt_info(rec_right)
    if info_l.frames is None or info_r.frames is None:
        raise ValueError("multi-view VGGT needs frames stored in the records")

    from skix.utils.jitapply import apply_model
    fwd = lambda v, b: apply_model(model, None, v, b)  # noqa: E731
    Rs, ts, Ks = [], [], []
    for i in idxs:
        pair = np.stack([
            preprocess_frames(info_l.frames[i][None], size)[0],
            preprocess_frames(info_r.frames[i][None], size)[0],
        ])
        out = fwd(variables, jnp.asarray(pair)[None])
        cams = cameras_from_pose_enc(np.asarray(out["pose_enc"][0]),
                                     (size, size))
        # rescale intrinsics from the VGGT input size to EACH video's
        # own size (reference infer.py:127 scale_intrinsics) — the two
        # records may have different resolutions/zoom
        K = cams["intrinsic"].copy()
        K[0, 0, :] *= W / size
        K[0, 1, :] *= H / size
        K[1, 0, :] *= W_r / size
        K[1, 1, :] *= H_r / size
        Rs.append(cams["R"])
        ts.append(cams["t"])
        Ks.append(K)
    R = np.median(np.stack(Rs), axis=0)  # robust static-camera estimate
    # re-orthonormalize the medianed rotations via SVD with the det sign
    # correction (nearest ROTATION, not reflection)
    u, _, vt = np.linalg.svd(R)
    det = np.linalg.det(u @ vt)
    u[:, :, -1] *= np.sign(det)[:, None]
    R = u @ vt
    t = np.median(np.stack(ts), axis=0)
    K = np.median(np.stack(Ks), axis=0)

    # relative pose right w.r.t. left: P_l = K_l [I|0], P_r = K_r [R|t]
    R_rel = R[1] @ R[0].T
    t_rel = t[1] - R_rel @ t[0]
    X = triangulate_sequence(jnp.asarray(kpts_l[:T]), jnp.asarray(kpts_r[:T]),
                             jnp.asarray(K[0]), jnp.asarray(R_rel),
                             jnp.asarray(t_rel),
                             w_a=jnp.asarray(score_l[:T]),
                             w_b=jnp.asarray(score_r[:T]),
                             K_b=jnp.asarray(K[1]))

    # bundle adjustment over (X, cameras) — alive, under jit; K is the
    # per-camera (C, 3, 3) stack the solver expects
    ba_cfg = BAConfig(mode=str(cfg.get("ba_mode", "pose_only")),
                      method="lm",
                      max_steps=int(cfg.get("ba_max_steps", 30)))
    x2d = np.stack([kpts_l[:T], kpts_r[:T]], axis=1)
    conf = np.stack([score_l[:T], score_r[:T]], axis=1)
    R_pair = np.stack([np.eye(3), R_rel])
    t_pair = np.stack([np.zeros(3), t_rel])
    res = bundle_adjust(np.asarray(X), R_pair, t_pair, K, x2d, conf,
                        cfg=ba_cfg)

    out_dir.mkdir(parents=True, exist_ok=True)
    np.savez(out_dir / "multi_view_refined.npz",
             X3d=np.asarray(res.X), R=np.asarray(res.R), t=np.asarray(res.t),
             K=K[0], K_right=K[1],
             initial_cost=float(res.initial_cost),
             final_cost=float(res.final_cost))
    return {"frames": int(T), "vggt_pairs": int(len(idxs)),
            "ba_initial_cost": float(res.initial_cost),
            "ba_final_cost": float(res.final_cost)}


def process_sfm_tracks(model, variables, video_path: Path, out_dir: Path,
                       cfg) -> dict:
    """Feed-forward SfM: VGGT cameras/point-maps + point tracks → COLMAP
    sparse reconstruction (the reference's vggt/vggt/dependency/ flow:
    track_predict.py predict_tracks over VGGSfM-tracker features +
    np_to_pycolmap.py batch_np_matrix_to_pycolmap).

    The track head is the reference-structure
    ``skix.models.track_head.TrackHead`` (DPT feature extractor +
    CoTracker/VGGSfM iterative refiner, converter-parity-tested) driven
    by the aggregator's four intermediate TAP tensors
    (``return_taps``); query keypoints default to the on-device
    Shi–Tomasi extractor (weight-free; the learned ALIKED/SuperPoint
    architectures exist with converter seams — pass weights via
    ``initialize_feature_extractors`` — but no pretrained checkpoints
    are reachable in this zero-egress environment)."""
    import jax
    import jax.numpy as jnp

    from skix.io.colmap_export import (build_reconstruction,
                                       write_reconstruction_text)
    from skix.models.track_head import TrackHead
    from skix.perception.sfm_tracks import predict_tracks
    from skix.utils.jitapply import apply_model
    from skix.io.video import read_video

    size = int(cfg.get("img_size", 518))
    stride = int(cfg.get("frame_stride", 30))
    frames = read_video(video_path, max_frames=cfg.get("max_frames"))
    sel = frames[::stride][: int(cfg.get("sfm_max_frames", 8))]
    if len(sel) < 2:
        raise ValueError(f"need ≥2 frames for SfM, got {len(sel)}")
    x = preprocess_frames(sel, size)

    sfm_model = model.clone(return_tokens=True, return_taps=True)
    out = apply_model(sfm_model, None, variables, jnp.asarray(x)[None])
    cams = cameras_from_pose_enc(np.asarray(out["pose_enc"][0]),
                                 (size, size))
    tokens = np.asarray(out["tokens"][0], np.float32)  # (S, gh, gw, 2E)
    taps = np.stack([np.asarray(t[0], np.float32)
                     for t in out["taps"]])            # (4, S, P, 2E)
    conf = np.asarray(out["world_points_conf"][0], np.float32)
    p3d_map = np.asarray(out["world_points"][0], np.float32)[..., :3]

    # corr pyramid levels must not collapse below 1 px on small inputs
    hh = size // 2
    max_levels = max(1, int(np.floor(np.log2(max(hh, 1)))) + 1)
    head = TrackHead(
        dim_in=taps.shape[-1],
        patch_size=int(cfg.get("patch_size", 14)),
        features=int(cfg.get("track_dim", 128)),
        iters=int(cfg.get("track_iters", 4)),
        hidden_size=int(cfg.get("track_hidden", 384)),
        corr_levels=min(int(cfg.get("track_corr_levels", 7)), max_levels),
        img_hw=(size, size),
        patch_start_idx=int(out["patch_start_idx"]))
    head_vars = load_or_init_track_head(head, taps.shape, cfg)
    tracks = predict_tracks(
        head, head_vars, x, taps, conf=conf, points_3d=p3d_map,
        frame_rank_feats=tokens.mean(axis=(1, 2)),
        max_query_pts=int(cfg.get("sfm_max_query_pts", 512)),
        query_frame_num=int(cfg.get("sfm_query_frames", 3)),
        conf_thresh=float(cfg.get("sfm_conf_thresh", 1.2)),
        min_vis=int(cfg.get("sfm_min_vis", 500)),
        extractor_method=str(cfg.get("sfm_extractor", "sp")),
        superpoint=_load_superpoint(cfg.get("sfm_superpoint_checkpoint")),
        aliked=_load_aliked(cfg.get("sfm_aliked_checkpoint"),
                            str(cfg.get("sfm_aliked_model",
                                        "aliked-n16"))))

    extr = np.concatenate([cams["R"], cams["t"][..., None]], axis=-1)
    masks = tracks.vis_scores > float(cfg.get("sfm_vis_thresh", 0.05))
    points3d = (tracks.points_3d if tracks.points_3d is not None
                else np.zeros((tracks.tracks.shape[1], 3)))
    recon, valid = build_reconstruction(
        points3d, extr, cams["intrinsic"], tracks.tracks,
        image_size=(size, size), masks=masks,
        max_reproj_error=cfg.get("sfm_max_reproj_error"),
        shared_camera=bool(cfg.get("sfm_shared_camera", False)),
        camera_type=str(cfg.get("sfm_camera_type", "SIMPLE_PINHOLE")),
        min_inlier_per_frame=int(cfg.get("sfm_min_inlier_per_frame", 8)),
        points_rgb=tracks.colors)

    out_dir.mkdir(parents=True, exist_ok=True)
    np.savez(out_dir / f"{video_path.stem}_sfm_tracks.npz",
             tracks=tracks.tracks, vis=tracks.vis_scores,
             colors=tracks.colors, R=cams["R"], t=cams["t"],
             K=cams["intrinsic"],
             **({"points_3d": tracks.points_3d}
                if tracks.points_3d is not None else {}))
    report = {"frames": int(len(sel)),
              "num_tracks": int(tracks.tracks.shape[1]),
              "reconstruction": recon is not None}
    if recon is not None:
        valid = np.asarray(valid)
        if bool(cfg.get("sfm_ba", True)) and valid.any():
            # LM bundle adjustment over (points, cameras) against the track
            # observations — the role pycolmap.bundle_adjustment plays after
            # batch_np_matrix_to_pycolmap in the reference flow.
            from skix.solvers import BAConfig, bundle_adjust

            obs = tracks.tracks[:, valid]          # (N, P', 2)
            w = masks[:, valid].astype(np.float32)
            ba_cfg = BAConfig(mode=str(cfg.get("sfm_ba_mode", "full")),
                              method="lm", bones=(),  # point cloud, no rig
                              max_steps=int(cfg.get("ba_max_steps", 30)))
            res = bundle_adjust(points3d[valid][None],
                                extr[:, :, :3], extr[:, :, 3],
                                cams["intrinsic"],
                                obs[None], w[None], cfg=ba_cfg)
            pts_ref = points3d.copy()
            pts_ref[valid] = np.asarray(res.X[0])
            extr_ref = np.concatenate(
                [np.asarray(res.R), np.asarray(res.t)[..., None]], axis=-1)
            recon, valid = build_reconstruction(
                pts_ref, extr_ref, cams["intrinsic"], tracks.tracks,
                image_size=(size, size), masks=masks,
                max_reproj_error=cfg.get("sfm_max_reproj_error"),
                shared_camera=bool(cfg.get("sfm_shared_camera", False)),
                camera_type=str(cfg.get("sfm_camera_type",
                                        "SIMPLE_PINHOLE")),
                min_inlier_per_frame=int(
                    cfg.get("sfm_min_inlier_per_frame", 8)),
                points_rgb=tracks.colors)
            report["ba_initial_cost"] = float(res.initial_cost)
            report["ba_final_cost"] = float(res.final_cost)
    # Re-set after the (possible) post-BA rebuild: refined poses can drop a
    # frame below min_inlier_per_frame and null the reconstruction.
    report["reconstruction"] = recon is not None
    if recon is not None:
        sparse_dir = write_reconstruction_text(
            recon, out_dir / f"{video_path.stem}_sparse")
        report["sparse_dir"] = str(sparse_dir)
        report["valid_tracks"] = int(np.asarray(valid).sum())
    return report


def _load_superpoint(ckpt):
    """(SuperPoint, variables) from a converted-or-torch checkpoint, or
    None (→ initialize_feature_extractors warns and falls back to
    shi_tomasi). Accepts the public magicleap/lightglue ``.pth`` layout
    or a ``.npz`` with the same key names."""
    if not ckpt or not Path(ckpt).exists():
        return None
    from skix.perception.superpoint import SuperPoint, convert_superpoint

    p = str(ckpt)
    if p.endswith((".pt", ".pth")):
        import torch

        sd = torch.load(p, map_location="cpu", weights_only=True)
        sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
    else:
        import numpy as _np

        sd = dict(_np.load(p))
    return SuperPoint(), convert_superpoint(sd)


def _load_aliked(ckpt, model_name="aliked-n16"):
    """(ALIKED, variables) from a lightglue-layout checkpoint, or None
    (→ initialize_feature_extractors warns and drops the method). See
    skix/perception/aliked.py for the converter-verification caveat."""
    if not ckpt or not Path(ckpt).exists():
        return None
    from skix.perception.aliked import ALIKED, convert_aliked

    p = str(ckpt)
    if p.endswith((".pt", ".pth")):
        import torch

        sd = torch.load(p, map_location="cpu", weights_only=True)
        sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
    else:
        import numpy as _np

        sd = dict(_np.load(p))
    backbone_vars, _sddh = convert_aliked(sd, model_name)
    return ALIKED(model_name=model_name), backbone_vars


def load_or_init_track_head(head, taps_shape, cfg):
    """Converted reference track-head weights when provided (a torch
    ``.pt`` state dict converts via ``convert_track_head`` — the
    ``track_head.*`` slice of a full VGGT-1B checkpoint, or the
    downloadable vggsfm tracker; zero-egress-blocked here), random init
    otherwise."""
    import jax
    import jax.numpy as jnp

    ckpt = cfg.get("track_checkpoint")
    if ckpt and Path(ckpt).exists():
        if str(ckpt).endswith((".pt", ".pth")):
            import torch

            from skix.models.vggt_convert import convert_track_head

            sd = torch.load(ckpt, map_location="cpu", weights_only=True)
            sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
            prefix = ("track_head."
                      if any(k.startswith("track_head.") for k in sd)
                      else "")
            return {"params": jax.tree.map(
                jnp.asarray, convert_track_head(sd, prefix=prefix))}
        from skix.pipelines.videopose3d import load_checkpoint

        return load_checkpoint(ckpt)
    _, S, P, C = taps_shape
    dummy_taps = tuple(jnp.zeros((1, S, P, C)) for _ in range(4))
    dummy_q = jnp.zeros((1, 4, 2))
    return head.init(jax.random.PRNGKey(0), dummy_taps, dummy_q)


@cli_main("vggt")
def main(cfg):
    logging.basicConfig(level=logging.INFO)
    mode = str(cfg.get("mode", "single"))
    if mode not in ("single", "multi", "sfm"):
        raise ValueError(f"unknown vggt mode {mode!r} — expected "
                         "'single', 'multi', or 'sfm'")
    model = build_model(cfg)
    variables = load_or_init_variables(model, cfg)
    if mode in ("single", "multi"):
        # these modes read only pose_enc — skip the (dominant) DPT
        # point/depth heads instead of computing and discarding them
        # (extra params in `variables` are ignored by flax apply)
        model = model.clone(enable_point=False, enable_depth=False)
    out_root = Path(cfg.paths.out_root)
    reports = {}
    if mode in ("single", "sfm"):
        fn = process_single_view if mode == "single" else process_sfm_tracks
        root = Path(cfg.paths.video_root)
        for person_dir in iter_person_dirs(root, cfg):
            for video in sorted(person_dir.glob("*.mp4")):
                try:
                    reports[f"{person_dir.name}/{video.stem}"] = \
                        fn(model, variables, video,
                           out_root / person_dir.name, cfg)
                except Exception:  # noqa: BLE001
                    log.exception("%s failed", video)
    else:
        root = Path(cfg.paths.pt_root)
        for person_dir in iter_person_dirs(root, cfg):
            recs = sorted(person_dir.glob("*.npz")) + sorted(person_dir.glob("*.pt"))
            if len(recs) < 2:
                continue
            try:
                reports[person_dir.name] = process_multi_view(
                    model, variables, recs[0], recs[1],
                    out_root / person_dir.name, cfg)
            except Exception:  # noqa: BLE001
                log.exception("person %s failed", person_dir.name)
    out_root.mkdir(parents=True, exist_ok=True)
    (out_root / "vggt_summary.json").write_text(json.dumps(reports, indent=2))
    log.info("vggt %s mode: %d items", mode, len(reports))


if __name__ == "__main__":
    main()
