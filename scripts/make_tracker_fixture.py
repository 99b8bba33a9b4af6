"""Train the committed video-tracking fixture on a synthetic disk world.

Produces ``tests/fixtures/tracker_tiny.npz``: a tiny ``Sam3Detector``
(boxes + maskformer masks, trained with the library's
``sam3_detection_loss`` + ``sam3_mask_loss``) and a tiny
``MaskMemoryTracker`` (memory propagation trained teacher-forced on
3-frame clips with a distractor object), both at the configurations
``tests/test_tracker_fixture.py`` rebuilds.

The zero-egress build env cannot download the reference's SAM3 weights,
so this committed checkpoint is the end-to-end evidence that the masklet
video stack (detect → mask-IoU associate → memory-propagate → lifecycle,
reference sam3_video_base.py:151) actually TRACKS: the fixture test runs
``MaskletVideoModel.propagate`` on held-out crossing clips and asserts
HOTA + identity-through-crossing.

World: 1-3 moving anti-aliased disks with per-object colors over a noisy
gray background (constant velocity, wall bounces, later-index disks
occlude earlier ones — visible/modal GT masks).

Run on the TPU (default; ~4 jit programs, a few minutes) or --cpu.
"""

from __future__ import annotations

import argparse
import functools
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

H = W = 112
SCALE = 1.0       # geometry scale factor (= H / 112)
MAXG = 3          # GT slots
D_MODEL = 64      # Sam3Detector.tiny d_model
PROMPT_LEN = 4
TRK_FEATURES = 48
TRK_HEADS = 2
TRK_SLOTS = 3


# ---------------------------------------------------------------- world

def set_world_size(size: int) -> None:
    """Re-scale the synthetic world (VERDICT-r4 #9: the committed 112 px
    fixture's DetA is bounded by its 14×14 tracker grid — a 224 px world
    doubles the grid). Every geometric constant in the synth functions
    multiplies by ``SCALE`` so the 112 px distribution is reproduced at
    any resolution. Call before synthesizing or training; tests restore
    112 afterwards."""
    global H, W, SCALE
    H = W = int(size)
    SCALE = H / 112.0


def _render(pos, radii, colors, rng, noise=0.03):
    """pos (n,2) xy, radii (n,), colors (n,3) → frame (H,W,3) f32,
    visible masks (n,H,W) bool (later disks occlude earlier)."""
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    frame = 0.3 + noise * rng.normal(size=(H, W, 3)).astype(np.float32)
    n = len(radii)
    disks = np.zeros((n, H, W), bool)
    for k in range(n):
        d2 = (xs - pos[k, 0]) ** 2 + (ys - pos[k, 1]) ** 2
        disks[k] = d2 <= radii[k] ** 2
        frame = np.where(disks[k][..., None],
                         colors[k] + noise * rng.normal(
                             size=(H, W, 3)).astype(np.float32),
                         frame)
    vis = disks.copy()
    for k in range(n):
        for j in range(k + 1, n):
            vis[k] &= ~disks[j]
    return np.clip(frame, 0.0, 1.0), vis


def _boxes_from_masks(masks):
    """(n,H,W) bool → cxcywh in [0,1]; empty mask → zeros."""
    out = np.zeros((len(masks), 4), np.float32)
    for k, m in enumerate(masks):
        if not m.any():
            continue
        ys, xs = np.where(m)
        x1, x2 = xs.min(), xs.max() + 1.0
        y1, y2 = ys.min(), ys.max() + 1.0
        out[k] = [(x1 + x2) / 2 / W, (y1 + y2) / 2 / H,
                  (x2 - x1) / W, (y2 - y1) / H]
    return out


def synth_scene(seed: int, n_obj: int | None = None):
    """One random frame → (frame, boxes (MAXG,4), masks (MAXG,H,W),
    valid (MAXG,))."""
    rng = np.random.default_rng(seed)
    n = n_obj or int(rng.integers(1, MAXG + 1))
    radii = (rng.uniform(9, 15, n) * SCALE).astype(np.float32)
    pos = rng.uniform(18 * SCALE, W - 18 * SCALE, (n, 2)).astype(np.float32)
    colors = rng.uniform(0.55, 1.0, (n, 3)).astype(np.float32)
    frame, vis = _render(pos, radii, colors, rng)
    boxes = np.zeros((MAXG, 4), np.float32)
    masks = np.zeros((MAXG, H, W), bool)
    valid = np.zeros(MAXG, bool)
    boxes[:n] = _boxes_from_masks(vis)
    masks[:n] = vis
    valid[:n] = vis.reshape(n, -1).any(1)
    return frame, boxes, masks, valid


def synth_clip(seed: int, T: int = 16, n_obj: int = 2, min_sep: float = 2.2,
               vel=None, pos0=None, same_color: bool = False,
               crossing: bool = False):
    """Constant-velocity bouncing clip → (frames (T,H,W,3) f32,
    boxes (T,MAXG,4) cxcywh01, masks (T,MAXG,H,W) bool, valid (T,MAXG)).
    ``same_color=True`` paints every disk the same color (appearance
    gives no identity signal — the memory must carry position)."""
    rng = np.random.default_rng(seed)
    radii = (rng.uniform(9, 14, n_obj) * SCALE).astype(np.float32)
    if pos0 is None:
        for _ in range(100):
            pos = rng.uniform(20 * SCALE, W - 20 * SCALE,
                              (n_obj, 2)).astype(np.float32)
            if n_obj < 2 or np.linalg.norm(
                    pos[0] - pos[1]) > min_sep * radii.max():
                break
    else:
        pos = np.asarray(pos0, np.float32).copy() * SCALE
    if vel is not None:
        vel = np.asarray(vel, np.float32) * SCALE
    elif crossing and n_obj >= 2:
        # head-on pass: trajectories meet mid-clip (the occlusion /
        # identity stress the memory must survive)
        d = (pos[1] - pos[0]) / max(T * 0.55, 1.0)
        vel = np.zeros((n_obj, 2), np.float32)
        vel[0] = d * rng.uniform(1.0, 1.6)
        vel[1] = -d * rng.uniform(0.4, 1.2)
        vel += rng.uniform(-0.5, 0.5, (n_obj, 2)) * SCALE
        speed = np.linalg.norm(vel, axis=1, keepdims=True)
        vel *= np.minimum(1.0, 6.0 * SCALE / np.maximum(speed, 1e-6))
    else:
        vel = (rng.uniform(-3.0, 3.0, (n_obj, 2)) * SCALE).astype(np.float32)
    vel = vel.astype(np.float32)
    colors = rng.uniform(0.55, 1.0, (n_obj, 3)).astype(np.float32)
    if same_color:
        colors[:] = colors[:1]

    frames = np.zeros((T, H, W, 3), np.float32)
    boxes = np.zeros((T, MAXG, 4), np.float32)
    masks = np.zeros((T, MAXG, H, W), bool)
    valid = np.zeros((T, MAXG), bool)
    for t in range(T):
        frame, vis = _render(pos, radii, colors, rng)
        frames[t] = frame
        boxes[t, :n_obj] = _boxes_from_masks(vis)
        masks[t, :n_obj] = vis
        valid[t, :n_obj] = vis.reshape(n_obj, -1).any(1)
        pos = pos + vel
        for k in range(n_obj):
            for a in range(2):
                lim = (W if a == 0 else H) - radii[k]
                if pos[k, a] < radii[k] or pos[k, a] > lim:
                    vel[k, a] = -vel[k, a]
                    pos[k, a] = np.clip(pos[k, a], radii[k], lim)
    return frames, boxes, masks, valid


def synth_crossing_clip(seed: int = 0, T: int = 24):
    """Two disks crossing paths mid-clip (the identity stress case)."""
    return synth_clip(seed, T=T, n_obj=2,
                      pos0=[[22.0, 46.0], [90.0, 62.0]],
                      vel=[[3.1, 0.6], [-3.1, -0.6]])


# ------------------------------------------------------------- training

def _models():
    from skix.tracking.memory_tracker import MaskMemoryTracker
    from skix.tracking.sam3_detector import Sam3Detector

    det = Sam3Detector.tiny(img_size=H)   # pos-embed grid follows the world
    trk = MaskMemoryTracker(features=TRK_FEATURES, num_heads=TRK_HEADS,
                            mem_slots=TRK_SLOTS)
    return det, trk


def _prompt(det):
    import jax.numpy as jnp

    from skix.tracking.detector import embed_text_prompt

    return jnp.tile(embed_text_prompt("person", det.d_model)[None],
                    (PROMPT_LEN, 1))


def train_detector(det, steps: int, batch: int, seed0: int, lr: float):
    import jax
    import jax.numpy as jnp
    import optax

    from skix.tracking.matcher import sam3_detection_loss, sam3_mask_loss

    prompt = _prompt(det)
    variables = jax.jit(det.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), prompt[None])
    params = variables["params"]
    # Cold-start recipe: plain focal + lr 2e-4 — the reference's shipped
    # IABCE(w=20)+presence recipe is a FINE-TUNING config whose IoU-aware
    # soft targets collapse the scores when boxes start random (target
    # t = clip(p^α·IoU^(1-α), 0.01) ≈ 0.01 at IoU≈0); measured: IABCE
    # from scratch plateaus, focal converges (P 1.0/R 0.95 overfit).
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=min(100, steps // 10),
        decay_steps=steps, end_value=lr * 0.1)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(sched, weight_decay=1e-4))
    opt_state = opt.init(params)
    text = jnp.tile(prompt[None], (batch, 1, 1))

    @jax.jit
    def step(params, opt_state, imgs, gtb, gtm, gtv):
        def loss_fn(p):
            out = det.apply({"params": p}, imgs, text,
                            with_aux_scores=True)
            l_det = sam3_detection_loss(out, gtb, gtv)
            l_msk = sam3_mask_loss(out, gtb, gtm, gtv)
            return l_det + l_msk

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    for i in range(steps):
        fr, bx, mk, vl = zip(*(synth_scene(seed0 + i * batch + b)
                               for b in range(batch)))
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(np.stack(fr)),
            jnp.asarray(np.stack(bx)), jnp.asarray(np.stack(mk)),
            jnp.asarray(np.stack(vl)))
        if i % 50 == 0 or i == steps - 1:
            print(f"  det step {i:4d}  loss {float(loss):.4f}", flush=True)
    return {"params": params}


def eval_detector(det, det_vars, n: int = 16, seed0: int = 10_000,
                  score_thresh: float = 0.0, iou_thresh: float = 0.5):
    """Held-out box precision/recall at IoU 0.5."""
    import jax
    import jax.numpy as jnp

    prompt = _prompt(det)
    fwd = jax.jit(lambda img: det.apply(det_vars, img, prompt[None]))
    tp = fp = fn = 0
    for s in range(n):
        fr, bx, mk, vl = synth_scene(seed0 + s)
        out = fwd(jnp.asarray(fr)[None])
        scores = np.asarray(out.scores[0])
        boxes = np.asarray(out.boxes_cxcywh[0])
        keep = scores > score_thresh
        pred = boxes[keep]
        gts = bx[vl]
        used = np.zeros(len(gts), bool)
        for b in pred[np.argsort(-scores[keep])]:
            best, bi = 0.0, -1
            for gi, g in enumerate(gts):
                if used[gi]:
                    continue
                i = _iou_cxcywh(b, g)
                if i > best:
                    best, bi = i, gi
            if best >= iou_thresh:
                used[bi] = True
                tp += 1
            else:
                fp += 1
        fn += int((~used).sum())
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    print(f"  det eval: P {prec:.3f} R {rec:.3f} (tp {tp} fp {fp} fn {fn})")
    return prec, rec


def _iou_cxcywh(a, b):
    ax1, ay1 = a[0] - a[2] / 2, a[1] - a[3] / 2
    ax2, ay2 = a[0] + a[2] / 2, a[1] + a[3] / 2
    bx1, by1 = b[0] - b[2] / 2, b[1] - b[3] / 2
    bx2, by2 = b[0] + b[2] / 2, b[1] + b[3] / 2
    iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
    ih = max(0.0, min(ay2, by2) - max(ay1, by1))
    inter = iw * ih
    u = a[2] * a[3] + b[2] * b[3] - inter
    return inter / max(u, 1e-9)


def train_tracker(trk, steps: int, batch: int, seed0: int, lr: float):
    """Teacher-forced propagation: memory conditioned on the GT mask of
    object 0 at t=0 (with a distractor disk in frame), then two steps
    supervised with BCE+dice at the feature grid."""
    import jax
    import jax.numpy as jnp
    import optax

    from skix.tracking.memory_tracker import init_memory

    gh = gw = H // 8

    variables = jax.jit(functools.partial(trk.init, method=trk.step))(
        jax.random.PRNGKey(1), jnp.zeros((1, H, W, 3)),
        init_memory(TRK_SLOTS, gh, gw, TRK_FEATURES))
    params = variables["params"]
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=min(50, steps // 10),
        decay_steps=steps, end_value=lr * 0.01)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adam(sched))
    opt_state = opt.init(params)

    def bce_dice(logits, gt):
        p = jax.nn.sigmoid(logits)
        bce = optax.sigmoid_binary_cross_entropy(logits, gt).mean()
        dice = 1.0 - (2.0 * (p * gt).sum() + 1.0) / (
            p.sum() + gt.sum() + 1.0)
        return bce + dice

    UNROLL = 5

    def clip_loss(p, frames, gt_full, gt_low):
        v = {"params": p}
        bank = init_memory(TRK_SLOTS, gh, gw, TRK_FEATURES)
        bank = trk.apply(v, frames[:1], gt_full[:1], bank,
                         method=trk.init_from_mask)
        loss = 0.0
        for t in range(1, UNROLL + 1):
            lg, _, bank = trk.apply(v, frames[t:t + 1], bank,
                                    method=trk.step)
            loss = loss + bce_dice(lg[0], gt_low[t])
        return loss / UNROLL

    @jax.jit
    def step(params, opt_state, frames, gt_full, gt_low):
        def loss_fn(p):
            return jnp.mean(jax.vmap(
                lambda f, gf, gl: clip_loss(p, f, gf, gl))(
                frames, gt_full, gt_low))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    for i in range(steps):
        fs, gfs, gls = [], [], []
        for b in range(batch):
            seed = seed0 + i * batch + b
            # hard distribution: near-touching disks, 40% of clips CROSS
            # mid-unroll (occlusion survival), the tracked object
            # alternates, and 10% of clips are same-color (position-only
            # identity) — kept small: crossing disambiguation NEEDS
            # appearance, and a large same-color fraction trains the
            # memory to ignore it (measured: 1/3 same-color → identity
            # flips at crossings)
            fr, _, mk, _ = synth_clip(seed, T=6, n_obj=2, min_sep=0.8,
                                      same_color=(seed % 10 == 0),
                                      crossing=(seed % 5 < 2))
            gt = mk[:, seed % 2]
            gt_low = np.stack([
                np.asarray(jax_resize(g, gh, gw)) for g in gt])
            fs.append(fr)
            gfs.append(gt.astype(np.float32))
            gls.append(gt_low.astype(np.float32))
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(np.stack(fs)),
            jnp.asarray(np.stack(gfs)), jnp.asarray(np.stack(gls)))
        if i % 50 == 0 or i == steps - 1:
            print(f"  trk step {i:4d}  loss {float(loss):.4f}", flush=True)
    return {"params": params}


def jax_resize(mask_bool, gh, gw):
    """Nearest-resize a (H,W) bool mask host-side."""
    ys = (np.arange(gh) + 0.5) * H / gh
    xs = (np.arange(gw) + 0.5) * W / gw
    return mask_bool[ys.astype(int)[:, None], xs.astype(int)[None, :]]


def eval_tracker(trk, trk_vars, n: int = 8, seed0: int = 20_000):
    """Held-out propagation quality: mask mIoU vs the tracked object AND
    identity accuracy (propagated mask closer to the tracked object than
    to the distractor)."""
    from skix.tracking.memory_tracker import propagate_object

    gh = gw = H // 8
    ious, correct = [], []
    for s in range(n):
        fr, _, mk, _ = synth_clip(seed0 + s, T=6, n_obj=2, min_sep=1.5)
        for k in (0, 1):
            logits, _ = propagate_object(trk, trk_vars, fr, mk[0, k])
            for t in range(1, 6):
                pred = logits[t] > 0

                def _iou(g):
                    gt = jax_resize(g, gh, gw)
                    return (pred & gt).sum() / max((pred | gt).sum(), 1)

                self_iou = _iou(mk[t, k])
                ious.append(self_iou)
                correct.append(self_iou > _iou(mk[t, 1 - k]))
    miou = float(np.mean(ious))
    acc = float(np.mean(correct))
    print(f"  trk eval: propagation mIoU {miou:.3f}, identity acc "
          f"{acc:.3f} over {n} clips x 2 objects")
    return miou, acc


# ------------------------------------------------------------ save/load

def save_fixture(path: Path, det_vars, trk_vars):
    import jax

    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}", v)
        else:
            arr = np.asarray(node)
            # f16 storage halves the committed artifact; the fixture
            # test re-validates quality after the round-trip
            flat[prefix] = (arr.astype(np.float16)
                            if arr.dtype == np.float32 else arr)

    walk("det", jax.device_get(det_vars))
    walk("trk", jax.device_get(trk_vars))
    np.savez_compressed(path, **flat)
    print(f"saved {path} ({path.stat().st_size / 1024:.0f} KiB, "
          f"{len(flat)} arrays)")


def load_fixture(path: Path):
    """→ (det_variables, trk_variables) nested dicts."""
    det, trk = {}, {}
    with np.load(path) as z:
        for key in z.files:
            parts = key.split("/")
            node = det if parts[0] == "det" else trk
            for p in parts[1:-1]:
                node = node.setdefault(p, {})
            arr = z[key]
            node[parts[-1]] = (arr.astype(np.float32)
                               if arr.dtype == np.float16 else arr)
    return det, trk


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--det-steps", type=int, default=8000)
    ap.add_argument("--trk-steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--det-lr", type=float, default=2e-4)
    ap.add_argument("--trk-lr", type=float, default=7e-4)
    ap.add_argument("--out", default=str(
        REPO / "tests" / "fixtures" / "tracker_tiny.npz"))
    ap.add_argument("--reuse-det", default=None,
                    help="load detector weights from an existing fixture "
                         "npz instead of training")
    ap.add_argument("--size", type=int, default=112,
                    help="world resolution (224 = the 2x-grid fixture, "
                         "VERDICT-r4 #9; geometry scales with it)")
    args = ap.parse_args()
    if args.size != 112:
        set_world_size(args.size)
        if args.out == str(REPO / "tests" / "fixtures" /
                           "tracker_tiny.npz"):
            args.out = str(REPO / "tests" / "fixtures" /
                           f"tracker_tiny{args.size}.npz")
    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    print("devices:", jax.devices(), flush=True)

    det, trk = _models()
    if args.reuse_det:
        print(f"reusing detector from {args.reuse_det}", flush=True)
        det_vars, _ = load_fixture(Path(args.reuse_det))
    else:
        print("training detector ...", flush=True)
        det_vars = train_detector(det, args.det_steps, args.batch, 0,
                                  args.det_lr)
    eval_detector(det, det_vars)
    print("training tracker ...", flush=True)
    trk_vars = train_tracker(trk, args.trk_steps, max(args.batch // 2, 2),
                             1_000_000, args.trk_lr)
    eval_tracker(trk, trk_vars)
    save_fixture(Path(args.out), det_vars, trk_vars)


if __name__ == "__main__":
    sys.exit(main())
