"""YOLO-pose + Keypoint R-CNN inference throughput at 1080p on one chip
(VERDICT r2 #4 done-gate: measured fps at 1080p in PERF.md).

1080p pads to 1088×1920 (/32). Honest timing: chained batches + host
readback.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, steps=10):
    # warm up with a HOST READBACK: block_until_ready returns early
    # under the axon relay, so the first timed window otherwise absorbs
    # compile + backend warm-up (CLAUDE.md honest-timing rule)
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.time()
    acc = None
    for _ in range(steps):
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0].astype(jnp.float32)
        acc = leaf if acc is None else acc + leaf
    float(jnp.sum(acc))
    return (time.time() - t0) / steps


def bench_yolo(scale: str, batch: int, dtype):
    from skix.models.yolo_pose import YoloPose, detect

    m = YoloPose(scale=scale, dtype=dtype)
    H, W = 1088, 1920
    x = jnp.asarray(np.random.default_rng(0).random((batch, H, W, 3)),
                    jnp.float32)
    v = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x[:1]))()

    @jax.jit
    def run(vv, xx):
        det = detect(m.apply(vv, xx), top_k=8)
        return det.boxes_xyxy, det.keypoints, det.scores

    t = timeit(lambda: run(v, x))
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(v["params"]))
    print(f"yolo-{scale} {np.dtype(dtype).name} B={batch}: "
          f"{t / batch * 1000:.2f} ms/frame = {batch / t:.1f} fps @1080p "
          f"({n_params / 1e6:.1f}M params)", flush=True)


def bench_rcnn(batch: int, dtype):
    from skix.models.keypoint_rcnn import (KeypointRCNN,
                                           convert_detectron2_keypoint_rcnn,
                                           reference_state_dict_spec)

    rng = np.random.default_rng(1)
    spec = reference_state_dict_spec()
    sd = {k: rng.normal(size=s).astype(np.float32) * 0.03
          for k, s in spec.items()}
    for k in sd:
        if k.endswith("running_var"):
            sd[k] = np.abs(sd[k]) + 1.0
    v = convert_detectron2_keypoint_rcnn(sd)
    m = KeypointRCNN(pre_nms_topk=1000, post_nms_topk=100, detections=8)
    H, W = 1088, 1920
    x = jnp.asarray(rng.random((batch, H, W, 3)), jnp.float32)

    @jax.jit
    def run(vv, xx):
        out = m.apply(vv, xx)
        return out.boxes_xyxy, out.keypoints, out.scores

    t = timeit(lambda: run(v, x), steps=5)
    print(f"keypoint-rcnn R50-FPN B={batch}: "
          f"{t / batch * 1000:.2f} ms/frame = {batch / t:.1f} fps @1080p "
          f"(59.2M params, topk 1000/100/8)", flush=True)


if __name__ == "__main__":
    for scale in ("s", "m"):
        for dtype in (jnp.bfloat16,):
            bench_yolo(scale, 8, dtype)
    bench_yolo("s", 8, jnp.float32)
    bench_rcnn(2, jnp.float32)
