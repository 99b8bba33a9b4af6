"""SAM2-style interactive video-object-segmentation predictor.

Capability parity with the reference's tracking predictor
(prepare_front_results/sam3/model/sam3_tracking_predictor.py):
per-object prompts on ANY frame — ``add_new_points_or_box`` (:179, box
prepended as two corner points with labels 2/3, ``clear_old_points``
concat semantics, correction clicks against the existing mask) and
``add_new_mask`` (:342) — become CONDITIONING memory; ``propagate_in_
video`` streams per-object masks forward or in reverse with the
memory-conditioned tracker; ``clear_all_points_in_frame`` (:906),
``clear_all_points_in_video`` (:978) and ``remove_object`` (:1181)
complete the session surface. Conditioning-frame selection per step uses
:func:`skix.tracking.point_sampling.select_closest_cond_frames`
(reference select_closest_cond_frames, sam3_tracker_utils.py:270).

TPU-native restatement: the reference keeps per-object python dicts of
torch tensors and re-runs its heads ad hoc; here every device step is
one of three cached jitted programs (frame encode / memory attend+decode
/ memory encode — `skix.utils.jitapply.apply_model`, so repeated
sessions never recompile), the per-step memory bank is a FIXED-SLOT
``MemoryBank`` (max_cond_frames + num_recent slots, invalid slots
masked), and interactive state lives host-side exactly like the
reference's inference_state.

Composition: a :class:`skix.tracking.memory_tracker.MaskMemoryTracker`
propagates; an optional :class:`skix.tracking.sam_prompt_encoder.
InteractiveSegmenter` (shared-trunk SAM head) turns clicks/boxes into
masks — without it, ``add_new_mask`` is the prompting surface.
"""

from __future__ import annotations

import functools
import logging
from typing import Iterator, Optional

import numpy as np

log = logging.getLogger(__name__)

import jax
import jax.numpy as jnp

from skix.tracking.memory_tracker import MemoryBank
from skix.tracking.point_sampling import select_closest_cond_frames
from skix.utils.jitapply import apply_model

_TOP_LEFT, _BOTTOM_RIGHT = 2, 3      # SAM box-corner point labels


@functools.partial(jax.jit, static_argnums=(0,))
def _seg_predict(seg, variables, feats, points, labels, mask_in):
    return seg.apply(variables, feats, points, labels, None, mask_in,
                     method=seg.predict_from_embedding)


class InteractiveVideoPredictor:
    """Interactive VOS session driver (see module docstring)."""

    def __init__(self, tracker, trk_variables, segmenter=None,
                 seg_variables=None, max_cond_frames: int = 2,
                 num_recent: int = 2, max_points: int = 8,
                 max_cond_slots: int = 16):
        self.tracker = tracker
        self.trk_variables = trk_variables
        self.segmenter = segmenter
        self.seg_variables = seg_variables
        if max_cond_frames < 2:
            # select_closest_cond_frames asserts >= 2 deep inside the
            # propagation loop — fail loudly at construction instead
            raise ValueError("max_cond_frames must be >= 2 "
                             f"(got {max_cond_frames})")
        self.max_cond_frames = int(max_cond_frames)
        self.num_recent = int(num_recent)
        self.max_points = int(max_points)
        self.max_cond_slots = int(max_cond_slots)

    # ------------------------------------------------------------ state

    def init_state(self, frames: np.ndarray) -> dict:
        """``frames (T, H, W, 3)`` uint8 or float in [0, 1]."""
        f = np.asarray(frames)
        if f.dtype == np.uint8:
            f = f.astype(np.float32) / 255.0
        probe = jax.eval_shape(
            lambda v, x: self.tracker.apply(
                v, x, method=self.tracker.encode_frame),
            self.trk_variables,
            jax.ShapeDtypeStruct((1, *f.shape[1:]), jnp.float32))
        return {
            "frames": f,
            "num_frames": f.shape[0],
            "grid_hw": (probe.shape[1], probe.shape[2]),
            "feats": {},            # frame_idx -> (1, gh, gw, C)
            "seg_feats": {},        # frame_idx -> segmenter embedding
            "objects": {},          # obj_id -> per-object dict
            "last_cond_selected": None,   # introspection for tests
        }

    def _obj(self, state: dict, obj_id: int) -> dict:
        if obj_id not in state["objects"]:
            state["objects"][obj_id] = {
                "cond": {},          # frame_idx -> (gh, gw, C) memory
                "cond_logits": {},   # frame_idx -> (gh, gw) grid logits
                "points": {},        # frame_idx -> (coords list, labels)
                "masks": {},         # frame_idx -> (gh, gw) grid logits
            }
        return state["objects"][obj_id]

    def _feats(self, state: dict, t: int):
        if t not in state["feats"]:
            img = jnp.asarray(state["frames"][t])[None]
            state["feats"][t] = apply_model(
                self.tracker, "encode_frame", self.trk_variables, img)
        return state["feats"][t]

    def _encode_memory(self, state: dict, t: int, grid_logits):
        feats = self._feats(state, t)
        return apply_model(self.tracker, "encode_memory",
                           self.trk_variables, feats[0],
                           jnp.asarray(grid_logits))

    # ---------------------------------------------------------- prompts

    def add_new_mask(self, state: dict, frame_idx: int, obj_id: int,
                     mask: np.ndarray):
        """Condition ``obj_id`` on a binary ``mask (H, W)`` at
        ``frame_idx`` (reference :342). Returns the conditioning grid
        logits ``(gh, gw)``."""
        obj = self._obj(state, obj_id)
        gh, gw = state["grid_hw"]
        m = jnp.asarray(mask, jnp.float32)
        grid = jax.image.resize(m, (gh, gw), "nearest") * 20.0 - 10.0
        obj["cond"][frame_idx] = self._encode_memory(state, frame_idx,
                                                     grid)
        obj["cond_logits"][frame_idx] = grid
        obj["masks"][frame_idx] = grid
        obj["points"].pop(frame_idx, None)
        return grid

    def add_new_points_or_box(self, state: dict, frame_idx: int,
                              obj_id: int, points=None, labels=None,
                              box=None, clear_old_points: bool = True,
                              rel_coordinates: bool = False):
        """Click/box prompting (reference :179): decode a mask for this
        frame with the SAM head (correcting the existing mask when the
        frame was already tracked), then pin it as conditioning memory.
        Returns the grid logits ``(gh, gw)``."""
        if self.segmenter is None:
            raise RuntimeError(
                "point/box prompts need an InteractiveSegmenter; use "
                "add_new_mask or construct with segmenter=")
        if (points is None) != (labels is None):
            raise ValueError("points and labels must be provided together")
        if points is None and box is None:
            raise ValueError(
                "at least one of points or box must be provided as input")
        obj = self._obj(state, obj_id)
        H, W = state["frames"].shape[1:3]
        s = float(self.segmenter.img_size)

        pts = (np.zeros((0, 2), np.float32) if points is None
               else np.asarray(points, np.float32).reshape(-1, 2))
        lab = (np.zeros((0,), np.int32) if labels is None
               else np.asarray(labels, np.int32).reshape(-1))
        if rel_coordinates:
            pts = pts * np.asarray([W, H], np.float32)
            if box is not None:
                box = np.asarray(box, np.float32) * np.asarray(
                    [W, H, W, H], np.float32)
        if box is not None:
            # box prompt must precede any accumulated points — the SAM
            # training convention the reference enforces (:224-231)
            if not clear_old_points:
                raise ValueError(
                    "cannot add box without clearing old points, since "
                    "box prompt must be provided before any point prompt "
                    "(please use clear_old_points=True instead)")
            corners = np.asarray(box, np.float32).reshape(2, 2)
            pts = np.concatenate([corners, pts], axis=0)
            lab = np.concatenate(
                [np.asarray([_TOP_LEFT, _BOTTOM_RIGHT], np.int32), lab])

        old_p, old_l = ((np.zeros((0, 2), np.float32),
                         np.zeros((0,), np.int32))
                        if clear_old_points or frame_idx not in
                        obj["points"] else obj["points"][frame_idx])
        pts = np.concatenate([old_p, pts], axis=0)
        lab = np.concatenate([old_l, lab], axis=0)
        obj["points"][frame_idx] = (pts, lab)

        # fixed prompt slots (−1 = padding)
        P = self.max_points
        pad_p = np.zeros((1, P, 2), np.float32)
        pad_l = np.full((1, P), -1, np.int32)
        n = min(len(lab), P)
        if n < len(lab):
            log.warning("prompt slots full (%d clicks > %d): keeping the "
                        "FIRST %d — box corner points (labels 2/3) sit at "
                        "the front and must survive truncation", len(lab),
                        P, n)
        scale = np.asarray([s / W, s / H], np.float32)
        # keep the HEAD: the box corner pair (labels 2/3) is placed first
        # and a lone trailing corner would feed the SAM head a malformed
        # half-box prompt
        pad_p[0, :n] = pts[:n] * scale
        pad_l[0, :n] = lab[:n]

        if frame_idx not in state["seg_feats"]:
            img = jnp.asarray(state["frames"][frame_idx])
            img = jax.image.resize(img, (int(s), int(s), 3), "bilinear")
            state["seg_feats"][frame_idx] = apply_model(
                self.segmenter, "encode_image", self.seg_variables,
                img[None])
        feats = state["seg_feats"][frame_idx]

        # correction clicks run against the existing mask (the reference
        # conditions on memory; the SAM head's mask_in prompt carries the
        # same signal)
        mask_in = None
        prev = obj["masks"].get(frame_idx, obj["cond_logits"].get(
            frame_idx))
        if prev is not None:
            fh, fw = feats.shape[1], feats.shape[2]
            mask_in = jax.image.resize(
                jnp.asarray(prev), (4 * fh, 4 * fw),
                "bilinear")[None, :, :, None]

        out = _seg_predict(self.segmenter, self.seg_variables, feats,
                           jnp.asarray(pad_p), jnp.asarray(pad_l),
                           mask_in)
        sel = out.mask_logits[0]   # stability/IoU-selected mask logits
        gh, gw = state["grid_hw"]
        grid = jax.image.resize(sel, (gh, gw), "bilinear")
        obj["cond"][frame_idx] = self._encode_memory(state, frame_idx,
                                                     grid)
        obj["cond_logits"][frame_idx] = grid
        obj["masks"][frame_idx] = grid
        return grid

    # ----------------------------------------------------- maintenance

    def clear_all_points_in_frame(self, state: dict, frame_idx: int,
                                  obj_id: int) -> None:
        """Drop the clicks AND the conditioning they produced on one
        frame (reference :906)."""
        obj = self._obj(state, obj_id)
        obj["points"].pop(frame_idx, None)
        obj["cond"].pop(frame_idx, None)
        obj["cond_logits"].pop(frame_idx, None)
        obj["masks"].pop(frame_idx, None)

    def clear_all_points_in_video(self, state: dict) -> None:
        """Reference :978 — every object keeps its identity but loses
        its click-derived conditioning."""
        for obj_id in list(state["objects"]):
            for t in list(self._obj(state, obj_id)["points"]):
                self.clear_all_points_in_frame(state, t, obj_id)

    def remove_object(self, state: dict, obj_id: int,
                      strict: bool = False) -> None:
        if obj_id not in state["objects"]:
            if strict:
                raise KeyError(f"unknown obj_id {obj_id}")
            return
        del state["objects"][obj_id]

    # ----------------------------------------------------- propagation

    def _bank_for(self, state: dict, obj: dict, frame_idx: int,
                  recents: list) -> MemoryBank:
        gh, gw = state["grid_hw"]
        C = self.tracker.features
        M = self.max_cond_frames + self.num_recent
        mem = jnp.zeros((M, gh, gw, C))
        valid = jnp.zeros((M,), bool)

        cond_ts = sorted(obj["cond"])
        S = self.max_cond_slots
        if len(cond_ts) > S:
            # fixed slots: keep the S cond frames NEAREST the current
            # frame (the earlier [:S] slice both crashed the assignment
            # and could exclude the closest conditioning entirely)
            log.warning("%d conditioning frames > %d slots — keeping the "
                        "%d nearest to frame %d", len(cond_ts), S, S,
                        frame_idx)
            cond_ts = sorted(sorted(cond_ts,
                                    key=lambda t: abs(t - frame_idx))[:S])
        t_slots = np.zeros(S, np.int32)
        v_slots = np.zeros(S, bool)
        t_slots[:len(cond_ts)] = cond_ts
        v_slots[:len(cond_ts)] = True
        sel, _ = select_closest_cond_frames(
            frame_idx, t_slots, v_slots, self.max_cond_frames
            if len(cond_ts) > self.max_cond_frames else -1)
        chosen = [int(t) for t, s in zip(t_slots, np.asarray(sel)) if s]
        state["last_cond_selected"] = chosen
        i = 0
        for t in chosen[:self.max_cond_frames]:
            mem = mem.at[i].set(obj["cond"][t])
            valid = valid.at[i].set(True)
            i += 1
        for feat in recents[-self.num_recent:]:
            mem = mem.at[i].set(feat)
            valid = valid.at[i].set(True)
            i += 1
        return MemoryBank(mem=mem, valid=valid,
                          ring_pos=jnp.asarray(1))

    def propagate_in_video(self, state: dict,
                           start_frame_idx: Optional[int] = None,
                           max_frame_num_to_track: Optional[int] = None,
                           reverse: bool = False) -> Iterator[dict]:
        """Stream per-object masks (reference propagate_in_video):
        yields ``{"frame_index", "obj_ids", "masks" (N, H, W) bool,
        "logits" (N, gh, gw)}`` starting at ``start_frame_idx`` (default:
        the earliest conditioning frame — latest when ``reverse``)."""
        objs = {k: v for k, v in state["objects"].items() if v["cond"]}
        if not objs:
            raise RuntimeError("no prompted objects to propagate")
        T = state["num_frames"]
        cond_all = [t for o in objs.values() for t in o["cond"]]
        if start_frame_idx is None:
            start_frame_idx = max(cond_all) if reverse else min(cond_all)
        step = -1 if reverse else 1
        end = -1 if reverse else T
        frame_ids = list(range(start_frame_idx, end, step))
        if max_frame_num_to_track is not None:
            frame_ids = frame_ids[:max_frame_num_to_track + 1]

        H, W = state["frames"].shape[1:3]
        recents: dict = {k: [] for k in objs}
        for t in frame_ids:
            feats = self._feats(state, t)
            obj_ids, logits_list, masks_list = [], [], []
            for obj_id, obj in objs.items():
                if t in obj["cond"]:
                    lg = jnp.asarray(obj["cond_logits"][t])
                    # the conditioning memory for this frame already
                    # lives in obj["cond"][t]: re-encoding it AND
                    # appending to recents double-counted the frame in
                    # subsequent banks (SAM2 keeps cond outputs out of
                    # the non-cond list)
                    obj["masks"][t] = lg
                else:
                    bank = self._bank_for(state, obj, t, recents[obj_id])
                    lg2, _ = apply_model(self.tracker, "attend_decode",
                                         self.trk_variables, feats, bank)
                    lg = lg2[0]
                    obj["masks"][t] = lg
                    recents[obj_id].append(
                        self._encode_memory(state, t, lg))
                    recents[obj_id] = recents[obj_id][-self.num_recent:]
                obj_ids.append(obj_id)
                logits_list.append(np.asarray(lg))
                masks_list.append(np.asarray(
                    jax.image.resize(lg, (H, W), "bilinear") > 0))
            yield {"frame_index": t, "obj_ids": obj_ids,
                   "logits": np.stack(logits_list),
                   "masks": np.stack(masks_list)}
