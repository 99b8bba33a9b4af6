"""SfM track prediction: query keypoints → multi-frame point tracks.

Capability parity with the reference's VGGSfM tracking dependency
(SURVEY.md §2.6 "Tracking dependency": vggt/vggt/dependency/
{track_predict.py, vggsfm_utils.py, vggsfm_tracker.py}) rebuilt
TPU-first:

- ``initialize_feature_extractors`` mirrors vggsfm_utils.py:189 (a
  ``+``-joined method string → {name: extractor} dict whose keypoints
  are UNIONED per query frame, :228 extract_keypoints): all three of
  the reference's extractor slots hold real implementations —
  ``aliked`` (:mod:`skix.perception.aliked`, the reference default;
  converter targets the lightglue layout, see that module's
  verification caveat), ``sp`` the learned
  :class:`skix.perception.superpoint.SuperPoint` (converter VERIFIED
  vs a torch oracle), ``sift`` (cv2 backend, weight-free) — plus
  ``shi_tomasi``, a jit-safe fixed-shape min-eigenvalue corner
  detector with on-device local-max NMS + top-k as the weight-free
  on-device fallback.
- ``rank_frames_by_similarity`` = generate_rank_by_dino semantics
  (vggsfm_utils.py:51-117): feature-similarity matrix → most-connected
  frame → farthest-point sampling. Takes precomputed per-frame features
  (e.g. pooled VGGT aggregator tokens) instead of loading a hub DINO.
- ``farthest_point_sampling`` reproduces vggsfm_utils.py:119-151
  exactly (parity-tested vs the imported reference function).
- ``predict_tracks`` = track_predict.py:12-132 semantics: rank query
  frames (frame 0 forced first), per query frame extract keypoints,
  shuffle, sample colors, gate by point-map confidence (>1.2, kept only
  when >512 survive — track_predict.py:196-202), swap the query frame to
  position 0 (calculate_index_mappings/switch_tensor_order), run the
  track head over fixed-size query chunks (predict_tracks_in_chunks),
  swap back; then ``_augment_non_visible_frames`` (track_predict.py:232)
  re-queries frames whose visible-track count stays under ``min_vis``,
  with the reference's one-at-a-time → same-frame-failed-twice →
  final all-in-trial escalation.

The track head itself is ``skix.models.track_head.TrackHead`` (the
CoTracker-style refiner). Chunks are padded to a fixed size so every
chunk hits one jit cache entry regardless of how many corners fired.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from skix.utils.jitapply import apply_model


# ---------------------------------------------------------------------------
# Keypoint extraction (ALIKED/SuperPoint/SIFT + Shi-Tomasi fallback)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_pts", "nms_radius"))
def _shi_tomasi_core(gray, max_pts: int, nms_radius: int, det_thres):
    """gray (H, W) f32 → (xy (max_pts, 2), score (max_pts,), valid)."""
    H, W = gray.shape
    # Sobel gradients.
    kx = jnp.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]])
    ky = kx.T
    pad = jnp.pad(gray, 1, mode="edge")[None, :, :, None]

    def conv(img, k):
        return jax.lax.conv_general_dilated(
            img, k[:, :, None, None], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]

    ix = conv(pad, kx)
    iy = conv(pad, ky)
    # Structure tensor, 5×5 box window.
    ones5 = jnp.ones((5, 5)) / 25.0

    def smooth(img):
        return conv(jnp.pad(img, 2, mode="edge")[None, :, :, None], ones5)

    a = smooth(ix * ix)
    b = smooth(ix * iy)
    c = smooth(iy * iy)
    # Min eigenvalue of [[a, b], [b, c]].
    tr = 0.5 * (a + c)
    det_part = jnp.sqrt(jnp.maximum((0.5 * (a - c)) ** 2 + b * b, 0.0))
    score = tr - det_part

    # Local-max NMS over a (2r+1)² window.
    k = 2 * nms_radius + 1
    local_max = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (k, k), (1, 1),
        [(nms_radius, nms_radius)] * 2)
    peak = (score >= local_max) & (score > det_thres * jnp.max(score))
    # Suppress a 4-px image border (gradient window support).
    yy, xx = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    interior = (xx >= 4) & (xx < W - 4) & (yy >= 4) & (yy < H - 4)
    masked = jnp.where(peak & interior, score, -jnp.inf)

    flat = masked.reshape(-1)
    top, idx = jax.lax.top_k(flat, max_pts)
    valid = top > -jnp.inf
    xy = jnp.stack([(idx % W).astype(jnp.float32),
                    (idx // W).astype(jnp.float32)], axis=-1)
    return xy, jnp.where(valid, top, 0.0), valid


def shi_tomasi_keypoints(image, max_pts: int = 512, det_thres: float = 0.005,
                         nms_radius: int = 2):
    """Fixed-shape corner detector. ``image`` (H, W) or (H, W, 3) in [0, 1].

    Returns ``(xy (max_pts, 2) float32, score (max_pts,), valid (max_pts,))``
    with (x, y) pixel coordinates sorted by decreasing corner strength.
    """
    img = jnp.asarray(image, jnp.float32)
    if img.ndim == 3:
        img = img @ jnp.array([0.299, 0.587, 0.114])
    return _shi_tomasi_core(img, max_pts, nms_radius, det_thres)


def sift_keypoints(image, max_pts: int = 512):
    """Classical SIFT keypoints (the reference's ``sift`` extractor,
    vggsfm_utils.py:212 — lightglue's SIFT wraps the same OpenCV
    detector; ``max_num_keypoints`` caps by response). Host-side cv2,
    fixed-``max_pts`` slot convention matching the other extractors:
    returns (xy (max_pts, 2) f32, score (max_pts,) f32, valid bool)."""
    import cv2

    img = np.asarray(image)
    was_uint8 = img.dtype == np.uint8
    if img.ndim == 3:
        img = img.astype(np.float32) @ np.array([0.299, 0.587, 0.114],
                                                np.float32)
    if was_uint8:
        img = np.clip(np.rint(img), 0, 255).astype(np.uint8)
    elif img.dtype != np.uint8:
        img = np.clip(img * 255.0 if img.max() <= 1.0 + 1e-6 else img,
                      0, 255).astype(np.uint8)
    kps = cv2.SIFT_create(nfeatures=int(max_pts)).detect(img, None)
    kps = sorted(kps, key=lambda k: -k.response)[:max_pts]
    xy = np.zeros((max_pts, 2), np.float32)
    score = np.zeros((max_pts,), np.float32)
    valid = np.zeros((max_pts,), bool)
    for i, kp in enumerate(kps):
        xy[i] = kp.pt
        score[i] = kp.response
        valid[i] = True
    return xy, score, valid


def initialize_feature_extractors(max_query_pts: int = 512,
                                  det_thres: float = 0.005,
                                  extractor_method: str = "shi_tomasi",
                                  superpoint=None, aliked=None) -> dict:
    """``+``-joined method string → {name: extractor(image) →
    (xy, score, valid)} (vggsfm_utils.py:189 semantics; per-frame
    keypoints of every configured extractor are unioned, :228).

    Methods: ``aliked`` (the reference's DEFAULT learned extractor —
    needs ``aliked=(model, variables)``; see
    :mod:`skix.perception.aliked` for the converter-verification
    caveat), ``sp``/``superpoint`` (needs ``superpoint=(model,
    variables)`` — converted lightglue/magicleap weights, the
    converter-VERIFIED learned extractor), ``sift`` (the reference's
    classical member, cv2 backend, weight-free) and ``shi_tomasi``
    (classical, weight-free). Unknown methods warn and are ignored; an
    empty result falls back to shi_tomasi, mirroring the reference's
    ALIKED fallback."""
    import logging

    extractors = {}
    for method in str(extractor_method).lower().split("+"):
        method = method.strip()
        if method == "aliked":
            if aliked is None:
                logging.getLogger(__name__).warning(
                    "aliked extractor requested but no weights "
                    "provided — ignoring")
                continue
            from skix.perception.aliked import aliked_keypoints

            al_model, al_vars = aliked

            def al_extract(image, _m=al_model, _v=al_vars):
                return aliked_keypoints(_m, _v, image,
                                        max_pts=max_query_pts,
                                        det_thres=det_thres)

            extractors["aliked"] = al_extract
        elif method in ("sp", "superpoint"):
            if superpoint is None:
                logging.getLogger(__name__).warning(
                    "superpoint extractor requested but no weights "
                    "provided — ignoring")
                continue
            from skix.perception.superpoint import superpoint_keypoints

            sp_model, sp_vars = superpoint

            def sp_extract(image, _m=sp_model, _v=sp_vars):
                return superpoint_keypoints(_m, _v, image,
                                            max_pts=max_query_pts,
                                            det_thres=det_thres)

            extractors["sp"] = sp_extract
        elif method == "sift":
            extractors["sift"] = partial(
                sift_keypoints, max_pts=max_query_pts)
        elif method == "shi_tomasi":
            extractors["shi_tomasi"] = partial(
                shi_tomasi_keypoints, max_pts=max_query_pts,
                det_thres=det_thres)
        else:
            logging.getLogger(__name__).warning(
                "unknown feature extractor %r, ignoring", method)
    if not extractors:
        extractors["shi_tomasi"] = partial(
            shi_tomasi_keypoints, max_pts=max_query_pts,
            det_thres=det_thres)
    return extractors


def extract_keypoints(image, extractors: dict) -> np.ndarray:
    """Union the valid keypoints of every extractor on one image
    (vggsfm_utils.py:228 ``extract_keypoints``, round_keypoints=True:
    coordinates are rounded). Returns (N, 2) float32, N data-dependent
    (host side — the query loop is host-driven like the reference's)."""
    parts = []
    for fn in extractors.values():
        xy, _score, valid = fn(image)
        parts.append(np.round(np.asarray(xy)[np.asarray(valid)]))
    return (np.concatenate(parts, axis=0).astype(np.float32)
            if parts else np.zeros((0, 2), np.float32))


# ---------------------------------------------------------------------------
# Query-frame ranking (generate_rank_by_dino semantics)
# ---------------------------------------------------------------------------

def farthest_point_sampling(distance_matrix, num_samples: int,
                            start_index: int = 0) -> list[int]:
    """Exact numpy transcription of vggsfm_utils.py:119 (parity-tested)."""
    dm = np.maximum(np.asarray(distance_matrix, np.float64), 0.0)
    n = dm.shape[0]
    selected = [int(start_index)]
    check = dm[selected].reshape(-1)  # row of the start frame
    while len(selected) < num_samples:
        farthest = int(np.argmax(check))
        selected.append(farthest)
        check = dm[farthest].copy()
        check[selected] = 0.0
        if len(selected) == n:
            break
    return selected


def rank_frames_by_similarity(feats, query_frame_num: int,
                              spatial_similarity: bool = False) -> list[int]:
    """Rank frames by representativeness (vggsfm_utils.py:51-117).

    ``feats``: (S, D) per-frame descriptors (CLS-style) or (S, P, D) patch
    tokens when ``spatial_similarity``. Returns ``query_frame_num`` frame
    indices: the most-connected frame first, then farthest-point samples.
    """
    f = np.asarray(feats, np.float64)
    if spatial_similarity:
        # Reference normalizes over dim=1 — the TOKEN axis of (S, P, D)
        # (vggsfm_utils.py:87 F.normalize(frame_feat, p=2, dim=1)), then
        # means token-wise frame similarity over tokens.
        fn = f / (np.linalg.norm(f, axis=1, keepdims=True) + 1e-12)
        sim = np.einsum("spd,tpd->pst", fn, fn).mean(axis=0)
    else:
        fn = f / (np.linalg.norm(f, axis=-1, keepdims=True) + 1e-12)
        sim = fn @ fn.T
    distance = 100.0 - sim
    sim = sim.copy()
    np.fill_diagonal(sim, -100.0)
    most_common = int(np.argmax(sim.sum(axis=1)))
    return farthest_point_sampling(distance, query_frame_num, most_common)


def calculate_index_mappings(query_index: int, n: int) -> np.ndarray:
    """Order that swaps [query_index] and [0] (vggsfm_utils.py:153)."""
    order = np.arange(n)
    order[0] = query_index
    order[query_index] = 0
    return order


# ---------------------------------------------------------------------------
# Track prediction (track_predict.py semantics)
# ---------------------------------------------------------------------------

class SfmTracks(NamedTuple):
    tracks: np.ndarray        # (S, P, 2) pixel positions
    vis_scores: np.ndarray    # (S, P) in [0, 1]
    confs: Optional[np.ndarray]      # (P,) point-map confidence at query
    points_3d: Optional[np.ndarray]  # (P, 3) unprojected points at query
    colors: np.ndarray        # (P, 3) uint8


def _tracks_for_query(track_model, variables, images_np, features,
                      query_index, *, extractors, chunk,
                      conf=None, points_3d=None, conf_thresh=1.2,
                      min_conf_keep=512, rng=None):
    """One query frame → (tracks (S, Nq, 2), vis, confs, p3d, colors)."""
    S, H, W = images_np.shape[:3]
    xy = extract_keypoints(images_np[query_index], extractors)
    if len(xy) == 0:
        return None
    if rng is not None:
        xy = xy[rng.permutation(len(xy))]

    ixy = np.clip(np.round(xy).astype(np.int64), 0,
                  [W - 1, H - 1])
    colors = (np.asarray(images_np[query_index])[ixy[:, 1], ixy[:, 0]]
              * 255.0).astype(np.uint8)
    if colors.ndim == 1:  # grayscale input
        colors = np.repeat(colors[:, None], 3, axis=1)

    q_conf = q_p3d = None
    if conf is not None and points_3d is not None:
        cmap = np.asarray(conf)
        if cmap.ndim == 4:      # (S, 1, H, W) reference layout
            cmap = cmap[:, 0]
        pmap = np.asarray(points_3d)
        ch, cw = cmap.shape[-2:]
        sx, sy = cw / W, ch / H
        qx = np.clip(np.round(xy[:, 0] * sx).astype(np.int64), 0, cw - 1)
        qy = np.clip(np.round(xy[:, 1] * sy).astype(np.int64), 0, ch - 1)
        q_conf = cmap[query_index][qy, qx]
        q_p3d = pmap[query_index][qy, qx]
        keep = q_conf > conf_thresh  # track_predict.py:198 heuristic
        if keep.sum() > min_conf_keep:
            xy, colors = xy[keep], colors[keep]
            q_conf, q_p3d = q_conf[keep], q_p3d[keep]

    # Swap query frame to position 0 so the head's t=0 anchor is the
    # query. The permutation runs ON DEVICE (jnp.take over the S axis):
    # a host-side fancy-index + re-upload of the (4, S, P, C) tap stack
    # costs hundreds of MB through the axon relay PER QUERY FRAME.
    order = calculate_index_mappings(query_index, S)
    order_idx = jnp.asarray(np.asarray(order))
    taps = tuple(jnp.take(jnp.asarray(f), order_idx, axis=0)[None]
                 for f in features)

    # Fixed-size padded chunks → one jit cache entry per chunk shape;
    # `query_valid` masks the pad slots out of the tracker's space
    # attention (the reference runs exact-size chunks — unmasked pads
    # would perturb the real tracks through the virtual-track pool).
    n = len(xy)
    tracks_parts, vis_parts = [], []
    for s in range(0, n, chunk):
        part = xy[s:s + chunk]
        m = len(part)
        pad = np.zeros((chunk - m, 2), np.float32)
        q = jnp.asarray(np.concatenate([part, pad], 0))[None]
        qv = jnp.asarray(np.arange(chunk) < m)[None]
        coords_list, vis, _conf = apply_model(track_model, None, variables,
                                              taps, q, qv)
        tracks_parts.append(np.asarray(coords_list[-1][0])[:, :m])
        vis_parts.append(np.asarray(vis[0])[:, :m])
    tracks = np.concatenate(tracks_parts, axis=1)   # (S, n, 2)
    vis = np.concatenate(vis_parts, axis=1)
    inv = order  # the swap is its own inverse
    return tracks[inv], vis[inv], q_conf, q_p3d, colors


def predict_tracks(track_model, variables, images, features, *,
                   conf=None, points_3d=None,
                   max_query_pts: int = 512, query_frame_num: int = 3,
                   chunk: int = 256, det_thres: float = 0.005,
                   conf_thresh: float = 1.2, min_conf_keep: int = 512,
                   complete_non_vis: bool = True, min_vis: int = 500,
                   non_vis_thresh: float = 0.1,
                   final_max_pts: int = 2048, seed: int = 0,
                   frame_rank_feats=None,
                   extractor_method: str = "shi_tomasi",
                   superpoint=None, aliked=None) -> SfmTracks:
    """Predict point tracks across a clip (track_predict.py:12 semantics).

    ``images`` (S, H, W[, 3]) in [0, 1]; ``features`` (4, S, P, C) stacked
    aggregator TAP tensors for the reference-structure track head (the
    VGGT model's ``return_taps`` output, special tokens included).
    ``frame_rank_feats`` optionally overrides the per-frame descriptors used
    for query-frame ranking (default: token mean of the last tap).
    ``extractor_method``/``superpoint``/``aliked`` select the query
    keypoint extractors (:func:`initialize_feature_extractors`) — pass
    ``extractor_method="sp"`` with converted SuperPoint weights for the
    converter-verified learned path, or ``"aliked"`` with an
    ``(ALIKED, variables)`` pair for the reference's default extractor.
    """
    images_np = np.asarray(images)
    S = images_np.shape[0]
    rng = np.random.default_rng(seed)

    rank_feats = (np.asarray(frame_rank_feats) if frame_rank_feats is not None
                  else np.asarray(features[-1]).mean(axis=1))
    query_frames = rank_frames_by_similarity(
        rank_feats, min(query_frame_num, S))
    if 0 in query_frames:
        query_frames.remove(0)
    query_frames = [0, *query_frames]

    # Build the extractor dict ONCE per call (not per query frame) — the
    # missing-weights fallback warning fires once and the dict is reused.
    extractors = initialize_feature_extractors(
        max_query_pts, det_thres, extractor_method, superpoint,
        aliked=aliked)
    kw = dict(extractors=extractors, chunk=chunk,
              conf=conf, points_3d=points_3d, conf_thresh=conf_thresh,
              min_conf_keep=min_conf_keep, rng=rng)
    tracks_l, vis_l, conf_l, p3d_l, color_l = [], [], [], [], []
    for q in query_frames:
        out = _tracks_for_query(track_model, variables, images_np, features,
                                q, **kw)
        if out is None:
            continue
        t, v, c, p, col = out
        tracks_l.append(t); vis_l.append(v); color_l.append(col)
        if c is not None:
            conf_l.append(c); p3d_l.append(p)

    if complete_non_vis and tracks_l:
        _augment_non_visible_frames(
            track_model, variables, images_np, features,
            tracks_l, vis_l, conf_l, p3d_l, color_l,
            base_kw=kw, min_vis=min_vis, non_vis_thresh=non_vis_thresh,
            final_max_pts=final_max_pts,
            final_extractors=partial(
                initialize_feature_extractors, final_max_pts, det_thres,
                extractor_method, superpoint, aliked=aliked))

    if not tracks_l:
        # No query frame yielded any keypoint (flat/low-texture clip):
        # return an empty result instead of crashing on np.concatenate.
        return SfmTracks(np.zeros((S, 0, 2), np.float32),
                         np.zeros((S, 0), np.float32), None, None,
                         np.zeros((0, 3), np.uint8))
    tracks = np.concatenate(tracks_l, axis=1)
    vis = np.concatenate(vis_l, axis=1)
    confs = np.concatenate(conf_l, axis=0) if conf_l else None
    p3d = np.concatenate(p3d_l, axis=0) if p3d_l else None
    colors = np.concatenate(color_l, axis=0)
    return SfmTracks(tracks, vis, confs, p3d, colors)


def _augment_non_visible_frames(track_model, variables, images_np, features,
                                tracks_l, vis_l, conf_l, p3d_l, color_l, *,
                                base_kw, min_vis, non_vis_thresh,
                                final_max_pts, final_extractors):
    """Re-query low-visibility frames (track_predict.py:232-326 semantics:
    one frame at a time; if the same frame fails twice, one final all-in
    trial with a bigger keypoint budget, then stop)."""
    last_query = -1
    final_trial = False
    kw = dict(base_kw)
    while True:
        vis_array = np.concatenate(vis_l, axis=1)
        sufficient = (vis_array > non_vis_thresh).sum(axis=-1)
        non_vis = np.where(sufficient < min_vis)[0].tolist()
        if not non_vis:
            break
        if non_vis[0] == last_query:
            final_trial = True
            # bigger keypoint budget → the extractors rebuild once here
            kw = dict(base_kw, extractors=final_extractors())
            query_list = non_vis
        else:
            query_list = [non_vis[0]]
        last_query = non_vis[0]
        for q in query_list:
            out = _tracks_for_query(track_model, variables, images_np,
                                    features, q, **kw)
            if out is None:
                continue
            t, v, c, p, col = out
            tracks_l.append(t); vis_l.append(v); color_l.append(col)
            if c is not None:
                conf_l.append(c); p3d_l.append(p)
        if final_trial:
            break
